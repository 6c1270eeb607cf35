package graft

import graft.queries.ExtQueries
import graft.sim.AnnIndexStore
import graft.streaming.AnnServeStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The persisted-index lifecycle: train once → save → load → serve must
  * equal the in-session trained serving query, and the frozen-codebook
  * incremental encoder must produce bit-identical codes to the trainer's
  * own corpus encode — so appending new vectors NEVER needs a retrain and
  * never drifts from what a full re-encode would build. */
class AnnIndexStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def vecs() = spark.read
    .parquet(s"${SparkTestBase.sf}/embeddings.parquet")
    .select(col("vec_id"), col("label"), col("embedding"))

  test("save → load → serveFast equals the in-session trained serving query") {
    val truth = SparkEntry.queries("sim_ivfpq_trained")(spark, SparkTestBase.sf)
      .collect().toSet
    graft.util.Checkpoints.releaseOwned(spark)
    val (_, codes, carr) = ExtQueries.pqTrainedIndex(spark, SparkTestBase.sf)
    val dir = Files.createTempDirectory("graft-annidx").toString
    AnnIndexStore.save(codes, carr, dir)
    graft.util.Checkpoints.releaseOwned(spark)
    val idx = AnnIndexStore.load(spark, dir)
    try {
      val got = AnnServeStream
        .serveFast(vecs().filter(col("vec_id") < 10), idx)
        .collect().toSet
      assert(got == truth,
        s"loaded-index serving diverged: missing=${(truth -- got).take(3)} " +
          s"extra=${(got -- truth).take(3)}")
    } finally {
      idx.release()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("frozen-codebook encode is bit-identical to the trainer's corpus encode") {
    val (_, codes, carr) = ExtQueries.pqTrainedIndex(spark, SparkTestBase.sf)
    val trained = codes.collect().toSet
    val encoded = AnnIndexStore.encode(vecs(), carr).collect().toSet
    graft.util.Checkpoints.releaseOwned(spark)
    assert(encoded == trained,
      s"encode drifted from the trainer: missing=${(trained -- encoded).take(3)} " +
        s"extra=${(encoded -- trained).take(3)}")
  }

  test("append-encode new vectors: saved old + appended new == full encode") {
    val (_, codes, carr) = ExtQueries.pqTrainedIndex(spark, SparkTestBase.sf)
    val full = codes.collect().toSet
    val dir = Files.createTempDirectory("graft-annidx-app").toString
    // save an index holding only the OLD half of the corpus...
    AnnIndexStore.save(codes.filter(col("vec_id") >= 10), carr, dir)
    graft.util.Checkpoints.releaseOwned(spark)
    // ...then the NEW half arrives and is appended WITHOUT retraining
    AnnIndexStore.append(spark, dir, vecs().filter(col("vec_id") < 10))
    try {
      val after = spark.read.parquet(s"$dir/codes.parquet").collect().toSet
      assert(after == full,
        "appended index diverged from a full encode: " +
          s"missing=${(full -- after).take(3)} extra=${(after -- full).take(3)}")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
