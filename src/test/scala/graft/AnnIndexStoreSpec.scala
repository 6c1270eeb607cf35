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
      val after = spark.read
        .parquet(s"${AnnIndexStore.resolve(dir)}/codes.parquet")
        .collect().toSet
      assert(after == full,
        "appended index diverged from a full encode: " +
          s"missing=${(full -- after).take(3)} extra=${(after -- full).take(3)}")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("lifecycle: save → N appends → compact (identical) → retrain (re-pinned)") {
    val (_, codes, carr) = ExtQueries.pqTrainedIndex(spark, SparkTestBase.sf)
    val full = codes.collect().toSet
    val dir = Files.createTempDirectory("graft-annidx-life").toString
    try {
      // save the index for the older corpus slice, stream in 3 append
      // batches — each append lands at least one new parquet file
      // (save consumes `codes` BEFORE the owned checkpoints release)
      AnnIndexStore.save(codes.filter(col("vec_id") >= 30), carr, dir)
      graft.util.Checkpoints.releaseOwned(spark)
      assert(AnnIndexStore.currentVersion(dir) == 1)
      (0 until 3).foreach { b =>
        AnnIndexStore.append(spark, dir,
          vecs().filter(col("vec_id") >= b * 10 && col("vec_id") < b * 10 + 10))
      }
      val filesBefore = AnnIndexStore.codesFileCount(dir)
      assert(filesBefore >= 4, s"appends should accrete files, saw $filesBefore")
      val preHash = AnnIndexStore.contentHash(spark, AnnIndexStore.resolve(dir))

      // compact: new version, FEWER files, content fingerprint identical
      // (compact itself gates the CURRENT flip on it — this re-checks from
      // the reader's side), and the row set still equals the full encode
      val v2 = AnnIndexStore.compact(spark, dir, targetFiles = 2)
      assert(v2 == 2 && AnnIndexStore.currentVersion(dir) == 2)
      assert(AnnIndexStore.codesFileCount(dir) < filesBefore)
      assert(AnnIndexStore.contentHash(spark, AnnIndexStore.resolve(dir)) ==
        preHash, "compact changed the index content")
      val compacted = spark.read
        .parquet(s"${AnnIndexStore.resolve(dir)}/codes.parquet").collect().toSet
      assert(compacted == full)

      // retrain: a deliberate version swap — the on-disk result must equal
      // a fresh in-session train+encode (the sim_pq_codes_trained-gated
      // derivation) by content fingerprint
      val v3 = AnnIndexStore.retrain(spark, dir, vecs())
      assert(v3 == 3 && AnnIndexStore.currentVersion(dir) == 3)
      val retrained = spark.read
        .parquet(s"${AnnIndexStore.resolve(dir)}/codes.parquet").collect().toSet
      assert(retrained == full,
        "retrained version diverged from the fresh-trained derivation: " +
          s"missing=${(full -- retrained).take(3)} " +
          s"extra=${(retrained -- full).take(3)}")
      // old-version GC (r18 ADVICE): the flip to v3 keeps v2 one cycle
      // (an in-flight reader may still be scanning it) and deletes v1
      assert(!Files.isDirectory(java.nio.file.Paths.get(dir, "v1")),
        "v1 should be garbage-collected after the flip to v3")
      assert(Files.isDirectory(java.nio.file.Paths.get(dir, "v2")),
        "v2 (just superseded) is kept one cycle for in-flight readers")
    } finally {
      graft.util.Checkpoints.releaseOwned(spark)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("drift-gated decision: in-distribution appends, shifted batch retrains") {
    val (_, codes, carr) = ExtQueries.pqTrainedIndex(spark, SparkTestBase.sf)
    val corpus = vecs()
    val dir = Files.createTempDirectory("graft-annidx-drift").toString
    try {
      AnnIndexStore.save(codes, carr, dir)
      graft.util.Checkpoints.releaseOwned(spark)
      // an in-distribution batch (a resample of the corpus itself under
      // fresh ids): centroid shift ~0 ⇒ append, codebook untouched
      val sameDist = corpus.filter(col("vec_id") % 7 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L)
      val d1 = AnnIndexStore.appendOrRetrain(spark, dir, corpus, sameDist,
        barE12 = 1000000000000L)
      assert(d1.action == "appended", s"expected append, got $d1")
      assert(d1.maxShiftE12 <= 1000000000000L)
      // a shifted batch (+0.5 on every dim ⇒ per-label shift ≈ 64·(5e5)²
      // = 1.6e13 e12-units, far above the bar) ⇒ retrain on corpus ∪ batch
      val shifted = corpus.filter(col("vec_id") % 7 === 0)
        .withColumn("vec_id", col("vec_id") + 2000000L)
        .withColumn("embedding",
          expr("transform(embedding, x -> x + CAST(0.5 AS FLOAT))"))
      val vBefore = AnnIndexStore.currentVersion(dir)
      val d2 = AnnIndexStore.appendOrRetrain(spark, dir, corpus, shifted,
        barE12 = 1000000000000L)
      assert(d2.action == "retrained", s"expected retrain, got $d2")
      assert(d2.maxShiftE12 > 1000000000000L)
      assert(d2.version == vBefore + 1)
      graft.util.Checkpoints.releaseOwned(spark)
    } finally {
      graft.util.Checkpoints.releaseOwned(spark)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("novel-label batch forces retrain even at zero shared-label drift") {
    // r18 ADVICE (medium): driftByLabel can only price labels both sides
    // share, so a wholly out-of-distribution batch under labels the
    // codebook never saw read as zero drift and APPENDED — the exact
    // degradation the gate exists to catch. Novel labels now force the
    // retrain branch and their count is Decision data.
    val (_, codes, carr) = ExtQueries.pqTrainedIndex(spark, SparkTestBase.sf)
    val corpus = vecs()
    val dir = Files.createTempDirectory("graft-annidx-novel").toString
    try {
      AnnIndexStore.save(codes, carr, dir)
      graft.util.Checkpoints.releaseOwned(spark)
      // in-distribution vectors under labels absent from the corpus
      val maxLabel =
        corpus.agg(max(col("label"))).head().getAs[Number](0).longValue()
      val novelBatch = corpus.filter(col("vec_id") % 11 === 0)
        .withColumn("vec_id", col("vec_id") + 3000000L)
        .withColumn("label",
          (col("label") + maxLabel + 1L).cast("int")) // keep corpus type
      assert(AnnIndexStore.novelLabelCount(corpus, novelBatch) > 0)
      val d = AnnIndexStore.appendOrRetrain(spark, dir, corpus, novelBatch,
        barE12 = 1000000000000L)
      assert(d.action == "retrained",
        s"novel-label batch must retrain, got $d")
      assert(d.novelLabels > 0, s"novel count must be recorded, got $d")
      // the retrained index actually knows the new labels: codes exist
      // for them under the flipped version
      val newCodes = spark.read
        .parquet(s"${AnnIndexStore.resolve(dir)}/codes.parquet")
        .filter(col("label") > maxLabel).count()
      assert(newCodes > 0, "retrained version must encode the novel labels")
      graft.util.Checkpoints.releaseOwned(spark)
    } finally {
      graft.util.Checkpoints.releaseOwned(spark)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("writer lock: a held lock fails a second writer fast; breakLock clears") {
    val (_, codes, carr) = ExtQueries.pqTrainedIndex(spark, SparkTestBase.sf)
    val dir = Files.createTempDirectory("graft-annidx-lock").toString
    try {
      AnnIndexStore.save(codes, carr, dir)
      graft.util.Checkpoints.releaseOwned(spark)
      // simulate a concurrent writer holding the lock
      Files.createFile(java.nio.file.Paths.get(dir, ".writer.lock"))
      val batch = vecs().filter(col("vec_id") < 5)
        .withColumn("vec_id", col("vec_id") + 5000000L)
      val e = intercept[IllegalStateException] {
        AnnIndexStore.append(spark, dir, batch)
      }
      assert(e.getMessage.contains("writer lock"))
      // a crashed writer's stale lock clears and the append proceeds
      AnnIndexStore.breakLock(dir)
      AnnIndexStore.append(spark, dir, batch)
      // the lock released after the append — the next mutator runs
      AnnIndexStore.compact(spark, dir, targetFiles = 2)
    } finally {
      graft.util.Checkpoints.releaseOwned(spark)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
