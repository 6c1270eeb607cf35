package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Persistence + incremental maintenance for the trained PQ index — the
  * missing lifecycle half of the serving story: `pqTrainedIndex` trains
  * (Lloyd rounds over the corpus) and `AnnServeStream` serves, but a real
  * deployment trains ONCE, persists, and serves from the saved index
  * across sessions while new corpus vectors arrive continuously.
  *
  * Layout (plain parquet — any engine can read it, and at 100 TB the
  * codes table is the index: 4 small ints per vector per subspace,
  * partition-prunable, while the codebook is ≤ nSub×8 rows), VERSIONED
  * since r18:
  *   <dir>/CURRENT               — live version number (atomic rename swap)
  *   <dir>/v<N>/codes.parquet    (vec_id, label, subspace, code)
  *   <dir>/v<N>/codebook.parquet (subspace, cid, carr: array<bigint>)
  * A reader resolves CURRENT once and reads an immutable version dir;
  * compact/retrain write a NEW version and flip CURRENT last, so serving
  * never sees a half-rewritten index (the swap is one atomic rename). A
  * pre-r18 flat layout (codes.parquet directly under <dir>) still reads
  * as the implicit version when no CURRENT file exists.
  *
  * Incremental append NEVER retrains: [[encode]] assigns new vectors to
  * the FROZEN codebook with the exact trainer kernels
  * (`pqSubspaceSplit` split, `L2SqLong` distances, the d2·8+cid
  * long-encoded argmin — a codegen HashAggregate, never a struct-min
  * SortAggregate), so appended codes are bit-identical to what a full
  * re-encode of the union would produce (`AnnIndexStoreSpec` pins it).
  * Append = one parquet append of the new rows' codes; the codebook is
  * immutable until a deliberate retrain replaces the index version.
  *
  * The r18 lifecycle closes append's two long-run costs (r17 VERDICT #5):
  *  - [[compact]]: one parquet append per streamed batch accretes small
  *    files; past a file-count threshold the codes rewrite into a new
  *    version, hash-verified IDENTICAL in content before CURRENT flips.
  *  - [[retrain]]: a frozen codebook degrades as the corpus drifts.
  *    [[driftByLabel]] reuses `emb_centroid_shift`'s exact integer
  *    arithmetic between the indexed corpus and a candidate batch;
  *    [[appendOrRetrain]] records the decision and either appends
  *    (below the bar) or trains a new version on the full corpus with
  *    the SAME trainer the oracle-gated queries run.
  */
object AnnIndexStore {

  /** The recorded lifecycle decision for one candidate batch.
    * `novelLabels` counts batch labels with NO corpus-side centroid
    * (r18 ADVICE: drift is only computable for labels both sides share,
    * so a wholly out-of-distribution batch used to read as zero drift —
    * the exact degradation the gate exists to catch; any novel label now
    * forces the retrain branch and the count is artifact data). */
  final case class Decision(action: String, version: Int,
      maxShiftE12: Long, barE12: Long, compactedFiles: Int,
      novelLabels: Long = 0L)

  // ---- single-writer guard -------------------------------------------------

  /** All mutators ([[append]]/[[compact]]/[[retrain]]/[[appendOrRetrain]])
    * run under an on-disk writer lock (r18 ADVICE): without it, an append
    * running concurrently with a compact lands rows in the OLD version dir
    * after the compact's pre-fingerprint was taken, and the CURRENT flip
    * silently drops them. One writer at a time is the contract; a held
    * lock fails fast instead of corrupting. Readers ([[load]]/[[resolve]])
    * never take it — version dirs are immutable once CURRENT points at
    * them. A crashed writer leaves the lock behind; `breakLock` clears it
    * once the operator has established no writer is alive. */
  private def withWriterLock[A](dir: String)(body: => A): A = {
    Files.createDirectories(Paths.get(dir))
    val lock = Paths.get(dir, ".writer.lock")
    try Files.createFile(lock)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"index writer lock held at $lock — one writer at a time " +
            "(concurrent append during compact/retrain would be silently " +
            "dropped by the CURRENT flip); breakLock() if the holder is dead")
    }
    try body finally Files.deleteIfExists(lock)
  }

  /** Remove a stale writer lock left by a crashed writer. */
  def breakLock(dir: String): Unit =
    Files.deleteIfExists(Paths.get(dir, ".writer.lock"))

  // ---- version bookkeeping (atomic CURRENT swap) --------------------------

  def currentVersion(dir: String): Int = {
    val p = Paths.get(dir, "CURRENT")
    if (Files.exists(p)) Files.readString(p).trim.toInt else 0
  }

  /** Data dir of the live version; version 0 = the pre-r18 flat layout. */
  def resolve(dir: String): String = {
    val v = currentVersion(dir)
    if (v == 0) dir else s"$dir/v$v"
  }

  private def setCurrent(dir: String, v: Int): Unit = {
    val tmp = Paths.get(dir, ".CURRENT.tmp")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(tmp, v.toString)
    Files.move(tmp, Paths.get(dir, "CURRENT"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def writeVersion(codes: DataFrame, carr: DataFrame, dir: String,
      v: Int): Unit = {
    val vd = s"$dir/v$v"
    codes.write.mode("overwrite").parquet(s"$vd/codes.parquet")
    carr.write.mode("overwrite").parquet(s"$vd/codebook.parquet")
  }

  /** Create a fresh index at version 1 (CURRENT flips after the data is
    * durable — a crash mid-save leaves no live index, never a torn one). */
  def save(codes: DataFrame, carr: DataFrame, dir: String): Unit = {
    writeVersion(codes, carr, dir, 1)
    setCurrent(dir, 1)
  }

  /** Append-encode new vectors into the live version (frozen codebook). */
  def append(spark: SparkSession, dir: String, newVecs: DataFrame): Unit =
    withWriterLock(dir)(appendLocked(spark, dir, newVecs))

  private def appendLocked(spark: SparkSession, dir: String,
      newVecs: DataFrame): Unit = {
    val vd = resolve(dir)
    val carr = spark.read.parquet(s"$vd/codebook.parquet")
    encode(newVecs, carr).write.mode("append").parquet(s"$vd/codes.parquet")
  }

  /** Delete superseded version dirs after a successful CURRENT flip
    * (r18 ADVICE: compact/retrain used to leave every v<N> behind —
    * unbounded disk growth across lifecycle cycles). The version just
    * superseded (`newV - 1`) is KEPT one cycle: a reader that resolved
    * CURRENT moments before the flip may still be scanning it; by the
    * next flip it is two versions stale and goes. */
  private def gcVersions(dir: String, newV: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return
    val it = Files.list(root)
    val stale =
      try it.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.startsWith("v") && n.drop(1).forall(_.isDigit) &&
          n.drop(1).nonEmpty && n.drop(1).toInt < newV - 1
      }.toList
      finally it.close()
    stale.foreach { p =>
      org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
    }
  }

  /** Load the live version into the prepared serving form
    * (pre-partitioned persisted codes + collected literal codebook — see
    * [[graft.streaming.AnnServeStream.prepare]]). */
  def load(spark: SparkSession, dir: String, numPartitions: Int = 0)
      : graft.streaming.AnnServeStream.TrainedServeIndex = {
    val vd = resolve(dir)
    graft.streaming.AnnServeStream.prepare(
      spark.read.parquet(s"$vd/codes.parquet"),
      spark.read.parquet(s"$vd/codebook.parquet"), numPartitions)
  }

  /** Assign `(vec_id, label, embedding)` rows to a FROZEN codebook:
    * (vec_id, label, subspace, code). THE trainer's kernels, not copies —
    * the exactness contract is that encode(frozen, new rows) equals the
    * rows a full re-encode would produce for them. */
  def encode(vecs: DataFrame, carr: DataFrame): DataFrame = {
    val vsub = vecs
      .select(col("vec_id"), col("label"),
        explode(graft.queries.ExtQueries
          .pqSubspaceSplit(4, "subspace", "varr")).as("p"))
      .select(col("vec_id"), col("label"), col("p.subspace").as("subspace"),
        col("p.varr").as("varr"))
    vsub.join(broadcast(carr), Seq("subspace"))
      .select(col("vec_id"), col("label"), col("subspace"), col("cid"),
        graft.functions.L2SqLong(col("varr"), col("carr")).as("d2"))
      .groupBy(col("vec_id"), col("label"), col("subspace"))
      .agg(min(col("d2") * 8 + col("cid")).as("m"))
      .select(col("vec_id"), col("label"), col("subspace"),
        pmod(col("m"), lit(8L)).as("code"))
  }

  // ---- content verification ------------------------------------------------

  /** Order- and layout-independent content fingerprint of a version dir:
    * (row count, sum of per-row xxhash64) for codes and codebook. Equal
    * fingerprints across a rewrite mean the INDEX is unchanged even
    * though every file is new — the compact gate. Scale shape: one
    * map-side hash + a partial-aggregable sum per table, no shuffle of
    * data rows. */
  def contentHash(spark: SparkSession, dataDir: String)
      : (Long, String, Long, String) = {
    def h(df: DataFrame): (Long, String) = {
      // per-row xxhash64 summed in unbounded decimal — a Long sum of
      // full-range hashes overflows under ANSI arithmetic
      val r = df.agg(count(lit(1)),
        sum(xxhash64(df.columns.sorted.map(col): _*)
          .cast("decimal(38,0)"))).head()
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toPlainString)
    }
    val (cn, ch) = h(spark.read.parquet(s"$dataDir/codes.parquet"))
    val (bn, bh) = h(spark.read.parquet(s"$dataDir/codebook.parquet"))
    (cn, ch, bn, bh)
  }

  /** Parquet data files of the live codes table — the small-file
    * accretion gauge (each streamed append adds at least one). */
  def codesFileCount(dir: String): Int = {
    import scala.jdk.CollectionConverters._
    val d = Paths.get(resolve(dir), "codes.parquet")
    if (!Files.isDirectory(d)) return 0
    val it = Files.list(d)
    try it.iterator().asScala.count { p =>
      val n = p.getFileName.toString
      n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }
    finally it.close()
  }

  /** Rewrite the live codes into a new version with `targetFiles` output
    * files (the codebook copies unchanged), verify the new version's
    * content fingerprint equals the old one, THEN flip CURRENT. Returns
    * the new version. A fingerprint mismatch aborts before the flip —
    * the live index is never replaced by an unverified rewrite. */
  def compact(spark: SparkSession, dir: String, targetFiles: Int = 8): Int =
    withWriterLock(dir)(compactLocked(spark, dir, targetFiles))

  private def compactLocked(spark: SparkSession, dir: String,
      targetFiles: Int): Int = {
    val v = currentVersion(dir)
    val vd = resolve(dir)
    val next = math.max(v, 1) + 1
    val pre = contentHash(spark, vd)
    writeVersion(
      spark.read.parquet(s"$vd/codes.parquet").repartition(targetFiles),
      spark.read.parquet(s"$vd/codebook.parquet"),
      dir, next)
    val post = contentHash(spark, s"$dir/v$next")
    require(post == pre,
      s"compact fingerprint mismatch: pre=$pre post=$post — CURRENT not flipped")
    setCurrent(dir, next)
    gcVersions(dir, next)
    next
  }

  /** Full retrain on `corpus` into a new version (the deliberate
    * index-version swap append never performs): the SAME trainer +
    * encoder the oracle-gated `sim_pq_codes_trained` query runs, so the
    * new version re-pins against that derivation by construction
    * (`AnnIndexStoreSpec` verifies retrained == fresh-trained by
    * fingerprint). CURRENT flips last. Returns the new version. */
  def retrain(spark: SparkSession, dir: String, corpus: DataFrame): Int =
    withWriterLock(dir)(retrainLocked(spark, dir, corpus))

  private def retrainLocked(spark: SparkSession, dir: String,
      corpus: DataFrame): Int = {
    val (_, codes, carr) = graft.queries.ExtQueries.pqTrainedIndexOn(corpus)
    val next = math.max(currentVersion(dir), 1) + 1
    writeVersion(codes, carr, dir, next)
    graft.util.Checkpoints.releaseOwned(spark)
    setCurrent(dir, next)
    gcVersions(dir, next)
    next
  }

  // ---- drift-gated lifecycle step ------------------------------------------

  /** Per-label exact centroid shift between two corpus frames — the
    * `emb_centroid_shift` monitoring query's arithmetic (e6-quantized
    * dims, floor-mean centroids in double, L2² in e12 Longs — every step
    * bit-reproducible) applied to the lifecycle question "does the new
    * batch still look like the corpus the codebook was trained on?".
    * Scale shape: one (label, dim, side) partial aggregate over both
    * frames — output is 64·labels·2 rows regardless of corpus size. */
  def driftByLabel(indexed: DataFrame, newVecs: DataFrame): DataFrame = {
    def sideE6(df: DataFrame, side: Int) = df
      .select(col("label"), lit(side).as("side"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("side"), col("dim"),
        floor(col("x").cast("double") * 1000000).cast("long").as("x_e6"))
    sideE6(indexed, 0).unionByName(sideE6(newVecs, 1))
      .groupBy(col("label"), col("dim"))
      .agg(
        floor(sum(when(col("side") === 0, col("x_e6"))).cast("double") /
          count(when(col("side") === 0, 1))).cast("long").as("c0"),
        floor(sum(when(col("side") === 1, col("x_e6"))).cast("double") /
          count(when(col("side") === 1, 1))).cast("long").as("c1"))
      .filter(col("c0").isNotNull && col("c1").isNotNull)
      .groupBy(col("label"))
      .agg(sum((col("c0") - col("c1")) * (col("c0") - col("c1")))
        .as("shift_l2sq_e12"))
  }

  /** Batch labels with no corpus-side presence. [[driftByLabel]] can only
    * price labels BOTH sides share (a label without a corpus centroid has
    * no shift to measure), so a novel label is definitionally
    * out-of-distribution — the codebook never saw it. One left-anti join
    * of two label-distinct aggregates; output bounded by label
    * cardinality, never corpus size. */
  def novelLabelCount(indexed: DataFrame, newVecs: DataFrame): Long =
    newVecs.select(col("label")).distinct()
      .join(indexed.select(col("label")).distinct(), Seq("label"),
        "left_anti")
      .count()

  /** The recorded retrain/append/compact decision for one candidate
    * batch: drift above `barE12` on any SHARED label, or ANY novel-label
    * rows in the batch (r18 ADVICE — novel labels have no centroid to
    * drift against and are above-bar by definition) ⇒ retrain on
    * corpus ∪ batch (new version); otherwise append, then compact if the
    * live codes table grew past `maxFiles`. `corpus` is the raw indexed
    * corpus (the caller owns it — the index stores codes, not vectors).
    * Every branch returns a [[Decision]] so the choice is artifact data,
    * never implicit. Runs entirely under ONE writer lock — the
    * append-then-compact sequence is atomic w.r.t. other writers. */
  def appendOrRetrain(spark: SparkSession, dir: String, corpus: DataFrame,
      newVecs: DataFrame, barE12: Long, maxFiles: Int = 16): Decision =
    withWriterLock(dir) {
      val shift = driftByLabel(corpus, newVecs)
        .agg(max(col("shift_l2sq_e12"))).head()
      val maxShift = if (shift.isNullAt(0)) 0L else shift.getLong(0)
      val novel = novelLabelCount(corpus, newVecs)
      if (maxShift > barE12 || novel > 0) {
        val v = retrainLocked(spark, dir, corpus.unionByName(newVecs))
        Decision("retrained", v, maxShift, barE12, 0, novel)
      } else {
        appendLocked(spark, dir, newVecs)
        val files = codesFileCount(dir)
        if (files > maxFiles) {
          val v = compactLocked(spark, dir, 8)
          Decision("appended_compacted", v, maxShift, barE12, files, novel)
        } else Decision("appended", currentVersion(dir), maxShift, barE12,
          files, novel)
      }
    }
}
