package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Output-layout contract for the 100 TB pipeline: data written
  * hive-partitioned by a low-cardinality key must be PRUNED at planning
  * time when read back with a filter on that key — the scan's
  * `PartitionFilters` carries the predicate and the untouched partitions'
  * files are never listed into tasks. This is the property that makes
  * "write once, query a slice forever" cheap; without it every downstream
  * reader pays a full-corpus listing+scan.
  */
class PartitionLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("partitionBy write → partition-filter pruning at planning time") {
    val out = Files.createTempDirectory("graft-partlayout").toString
    val ev = graft.cdc.ChangeLog.table(spark, SparkTestBase.sf, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)

    val back = spark.read.parquet(out).filter(col("event_type") === "click")
    val plan = back.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(scanLine.exists(_.contains("event_type")),
      s"partition filter must prune at the scan, not post-scan:\n$plan")
    // the pruned read must still be value-correct
    val direct = ev.filter(col("event_type") === "click").count()
    assert(back.count() == direct)

    // counter-case: a filter on a NON-partition column stays a data filter
    // (PushedFilters), proving the layout didn't accidentally swallow it
    val nonPart = spark.read.parquet(out).filter(col("user_id") === 1L)
    val p2 = nonPart.queryExecution.executedPlan.toString
    assert(p2.linesIterator.exists(l => l.contains("PushedFilters") &&
      l.contains("user_id")), s"data filter must push to parquet:\n$p2")
  }

  test("range-layout write: sortWithinPartitions gives row-group min/max locality") {
    val out = Files.createTempDirectory("graft-rangelayout").toString
    val ev = graft.cdc.ChangeLog.table(spark, SparkTestBase.sf, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    // the compaction shape for scan-heavy corpora: range-partition on the
    // query key then sort within partitions, so parquet row-group min/max
    // stats become selective for range predicates on that key
    ev.repartitionByRange(4, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("event_id"))
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == ev.count())
    // every file's user_id span must be disjoint-ish: with 4 range buckets,
    // a point lookup's files-with-match is a strict subset of all files
    val files = back.select(input_file_name().as("f"), col("user_id"))
      .groupBy("f").agg(min("user_id").as("lo"), max("user_id").as("hi"))
      .collect()
    assert(files.length >= 2, "expected multiple output files")
    val probe = ev.agg(min("user_id")).head().getLong(0)
    val matching = files.count(r => r.getLong(1) <= probe && probe <= r.getLong(2))
    assert(matching < files.length,
      s"range layout must localize a point key to a file subset " +
        s"($matching/${files.length} files cover user_id=$probe)")
  }
}
