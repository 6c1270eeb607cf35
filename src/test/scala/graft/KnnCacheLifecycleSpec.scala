package graft

import graft.queries.ExtQueries
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle contract of the shared knn edge-frame cache (r10 VERDICT #3):
  * the cache must not pin SparkSessions (string keys), its localCheckpoint
  * blocks must be released by [[ExtQueries.invalidateKnnEdges]], and a
  * released entry must rebuild transparently with identical results.
  */
class KnnCacheLifecycleSpec extends AnyFunSuite {
  // a PRIVATE session (own UUID, shared context): suites run in parallel in
  // this JVM and the graph-tier specs read the shared session's cached
  // frame — invalidating THAT mid-run would race them. Distinct UUID ⇒
  // distinct cache keys ⇒ this test only ever touches its own entries.
  private val spark = SparkTestBase.spark.newSession()
  private val dir = SparkTestBase.sf

  // Test-scope introspection (moved out of ExtQueries per r11 VERDICT #7 —
  // the main jar carries no test-only surface): the checkpoint RDD ids of
  // every cache entry belonging to `s`'s session UUID.
  private def knnCachedRddIds(s: org.apache.spark.sql.SparkSession): Seq[Int] = {
    import scala.jdk.CollectionConverters._
    val prefix = org.apache.spark.sql.graft.ColumnBridge.sessionUuid(s) + "|"
    ExtQueries.knnEdgeCache.asScala.collect {
      case (k, df) if k.startsWith(prefix) =>
        graft.util.Checkpoints.rdds(df).map(_.id)
    }.flatten.toSeq
  }

  test("invalidateKnnEdges releases the tier's checkpoint blocks and the " +
      "next consumer rebuilds with identical rows") {
    // populate the cache through a consumer query
    val before = SparkEntry.queries("graph_kcore")(spark, dir).collect()
      .map(_.toString).sorted
    val ids = knnCachedRddIds(spark)
    assert(ids.nonEmpty, "consumer query did not populate the knn cache")
    val persisted = spark.sparkContext.getPersistentRDDs
    assert(ids.forall(persisted.contains),
      s"cached frame's checkpoint RDDs $ids not in persistent set")

    val released = ExtQueries.invalidateKnnEdges(spark)
    assert(released >= 1)
    assert(knnCachedRddIds(spark).isEmpty,
      "entries survived invalidate")
    // the released ids must leave the persistent-RDD registry (unpersist is
    // async with blocking=false; bounded wait)
    val deadline = System.nanoTime() + 10000000000L
    def stillPersisted = ids.filter(spark.sparkContext.getPersistentRDDs.contains)
    while (stillPersisted.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(stillPersisted.isEmpty,
      s"checkpoint RDDs $stillPersisted still persisted after invalidate")

    // double invalidate is a no-op; the next consumer rebuilds identically
    assert(ExtQueries.invalidateKnnEdges(spark) == 0)
    val after = SparkEntry.queries("graph_kcore")(spark, dir).collect()
      .map(_.toString).sorted
    assert(after.sameElements(before), "rebuild changed results")
    assert(knnCachedRddIds(spark).nonEmpty, "rebuild did not cache")
  }
}
