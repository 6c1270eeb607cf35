package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Object-agg hash capacity (r19): the engine's typed-imperative
      // aggregates (TopK heaps, MinOrd/MaxOrd) carry O(k)-bounded buffers
      // (tens of bytes-to-~2 KB each), but Spark's default
      // objectHashAggregate fallback threshold (128 in-memory keys) demotes
      // them to sort-based on any high-cardinality group — re-introducing
      // exactly the per-group sort the heap form exists to avoid. 64k keys
      // x ~2 KB worst-case heap = ~128 MB per task upper bound, scale-
      // independent (buffer size is bounded by k, not data); env-overridable
      // for A/B (GRAFT_OBJ_AGG_FALLBACK).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("GRAFT_OBJ_AGG_FALLBACK", "65536"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // GRAFT_VERIFY_ONLY=name1,name2 restricts the dump (builder-side
    // iteration aid, e.g. re-checking one query at sf0.1); the driver's
    // full run leaves it unset.
    val only = sys.env.get("GRAFT_VERIFY_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // output written ⇒ this query's owned checkpoints are consumable
      finally graft.util.Checkpoints.releaseOwned(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.queries.ExtQueries.invalidateKnnEdges(spark) // release checkpoint blocks
    spark.stop()
  }
}
