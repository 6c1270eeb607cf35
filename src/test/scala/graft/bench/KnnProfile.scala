package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for sim_knn_graph at the sf~1 rung: isolates the pair
  * join + cosine from the heap aggregate and A/Bs the block size, to find
  * where the 60s at 50k vectors actually goes. */
object KnnProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft_smoke_sf1")

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($r)")
    }

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
    e.cache().count()
    println("cells: " + e.groupBy("label").count().orderBy("label")
      .collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))

    def pairs(block: Long) = {
      val fan = e.groupBy(col("label").as("flabel"))
        .agg(ceil(count(lit(1)).cast("double") / block).cast("int").as("fan"))
      val q = e.join(broadcast(fan), col("label") === col("flabel"))
        .select(col("vec_id").as("src"), col("label"),
          col("embedding").as("qe"),
          pmod(hash(col("vec_id")), col("fan")).as("qsalt"),
          explode(sequence(lit(0), col("fan") - 1)).as("csalt"))
      val c = e.join(broadcast(fan), col("label") === col("flabel"))
        .select(col("vec_id").as("dst"), col("label").as("clabel"),
          col("embedding").as("ce"),
          pmod(hash(col("vec_id")), col("fan")).as("c_csalt"),
          explode(sequence(lit(0), col("fan") - 1)).as("c_qsalt"))
      q.join(c,
          col("label") === col("clabel") && col("qsalt") === col("c_qsalt") &&
            col("csalt") === col("c_csalt") && col("src") =!= col("dst"))
        .select(col("src"), col("label"),
          round(graft.functions.CosineSimilarity(col("qe"), col("ce")), 4)
            .as("cos"), col("dst"))
    }

    def rq(df: org.apache.spark.sql.DataFrame) =
      df.repartition(col("label"), col("qsalt"), col("csalt"))
    def pairsR(block: Long) = {
      val fan = e.groupBy(col("label").as("flabel"))
        .agg(ceil(count(lit(1)).cast("double") / block).cast("int").as("fan"))
      val q = rq(e.join(broadcast(fan), col("label") === col("flabel"))
        .select(col("vec_id").as("src"), col("label"),
          col("embedding").as("qe"),
          pmod(hash(col("vec_id")), col("fan")).as("qsalt"),
          explode(sequence(lit(0), col("fan") - 1)).as("csalt")))
      val c = e.join(broadcast(fan), col("label") === col("flabel"))
        .select(col("vec_id").as("dst"), col("label").as("clabel"),
          col("embedding").as("ce"),
          pmod(hash(col("vec_id")), col("fan")).as("c_csalt"),
          explode(sequence(lit(0), col("fan") - 1)).as("c_qsalt"))
      q.join(c,
          col("label") === col("clabel") && col("qsalt") === col("c_qsalt") &&
            col("csalt") === col("c_csalt") && col("src") =!= col("dst"))
        .select(col("src"), col("label"),
          round(graft.functions.CosineSimilarity(col("qe"), col("ce")), 4)
            .as("cos"), col("dst"))
    }
    time("pairs(repart) + sum(cos)") {
      pairsR(1024).agg(sum("cos")).head().get(0)
    }
    time("pairs(repart) + heap top-3, UNPRUNED (sum of scores)") {
      pairsR(1024).groupBy(col("src"), col("label"))
        .agg(graft.functions.TopKByScore.topK(col("cos"), col("dst"), 3).as("top"))
        .select(explode(col("top")).as("t")).agg(sum("t.score")).head().get(0)
    }
    spark.stop()
  }
}
