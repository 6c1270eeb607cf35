package graft.bench

import graft.operators.Routing
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the micro-batch latency floor: times the pieces of
  * a 1-row batch through the same plan shape the streaming pipeline runs,
  * to see what a micro-batch's addBatch is actually made of. */
object FloorProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val one = Seq(("I", """{"user_id":"7","event_type":"click"}""",
      "pg", "public.click", 1700000000L, "0/1000", 4096L))
      .toDF("op", "data", "source", "resource", "commit_ts", "lsn", "lsn_num")

    def time(label: String)(f: => Unit): Unit = {
      (1 to 12).foreach(_ => f) // warm
      val ts = (1 to 20).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"$label%-34s p50=${ts(10)}%7.1f ms  min=${ts.head}%7.1f ms")
    }

    // 1. bare 1-row job, no plan complexity
    time("bare noop write (1 row)") {
      one.write.format("noop").mode("overwrite").save()
    }
    // 2. + serialize (JSON envelope)
    val ser = one.withColumn("value",
      graft.serialization.JsonEnvelope.envelopeCol(col("op"), col("data"),
        col("resource"), col("commit_ts"), col("lsn")))
    time("+ serialize") {
      ser.write.format("noop").mode("overwrite").save()
    }
    // 3. + broadcast routing join
    val routed = Routing.route(ser, Routing.streamsDF(spark, Routing.fixtureStreams))
    time("+ routing broadcast join") {
      routed.write.format("noop").mode("overwrite").save()
    }
    // 4. full kafkaFrame (routing + key extraction)
    val frame = StreamingPipeline.kafkaFrame(one, Routing.fixtureStreams)
    time("full kafkaFrame") {
      frame.write.format("noop").mode("overwrite").save()
    }
    // 5. full kafkaFrame without broadcast-join reuse (fresh plan each time,
    //    as a micro-batch would build)
    time("fresh kafkaFrame plan each run") {
      StreamingPipeline.kafkaFrame(one, Routing.fixtureStreams)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
