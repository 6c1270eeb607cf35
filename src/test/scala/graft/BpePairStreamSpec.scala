package graft

import graft.streaming.BpePairStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The streaming pair counter must converge to EXACTLY the batch
  * `text_bpe_pairs` statistics no matter how the stream is chopped into
  * micro-batches — counts are a commutative monoid, so Spark's incremental
  * streaming aggregation is exact, and the BPE trainer's inner loop can run
  * over an unbounded ingest with state bounded by the pair vocabulary.
  */
class BpePairStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val docs = spark.read
    .parquet(s"${SparkTestBase.sf}/documents.parquet")
    .select(col("doc_id"), col("text"))

  // batch truth: the text_bpe_pairs query itself (top-30 by count, pair)
  private lazy val truth =
    SparkEntry.queries("text_bpe_pairs")(spark, SparkTestBase.sf)

  private def runStream(nFiles: Int, name: String): DataFrame = {
    val dir = Files.createTempDirectory(s"graft-bpepair-$name").toString
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val step = maxId / nFiles + 1
    (0 until nFiles).foreach { i =>
      docs.filter(col("doc_id") >= i * step && col("doc_id") < (i + 1) * step)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val q = BpePairStream.pairCounts(
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1").parquet(dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    // same top-30 contract as the batch query
    spark.table(name).orderBy(col("n").desc, col("pair")).limit(30)
  }

  test("one-batch and four-batch splits both converge to the batch statistics") {
    Seq(1 -> "bpepairs1", 4 -> "bpepairs4").foreach { case (n, name) =>
      val got = runStream(n, name)
      assert(got.count() == truth.count(), s"$name: row count")
      assert(got.exceptAll(truth).count() == 0 &&
        truth.exceptAll(got).count() == 0,
        s"$name: streaming pair counts diverged from the batch query")
    }
  }

  test("pickBest fails loudly on an empty pair state (degenerate ingest)") {
    // same contract as the batch trainer's raise_error guard: an ingest
    // where no word ever had >= 2 symbols must not yield a silent
    // all-NULL merge decision
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("pair", "n")
    val ex = intercept[Exception] {
      BpePairStream.pickBest(empty).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("pair state empty")),
      s"expected the degenerate-ingest error, got: ${msgs(ex)}")
  }

  test("state is one count per pair, bounded by the pair vocabulary") {
    // the store's key cardinality on this fixture = distinct pairs; assert
    // it is the pair-vocab size (tiny), not anything corpus-proportional
    val pairVocab = docs
      .select(explode(graft.text.TextAnalysis.tokensCol(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr("transform(sequence(1, length(w) - 1), " +
        "i -> substring(w, CAST(i AS INT), 2))")).as("pair"))
      .distinct().count()
    val corpus = docs.count()
    assert(pairVocab < 40 * 40,
      s"pair vocabulary unexpectedly large: $pairVocab")
    assert(pairVocab < corpus * 10,
      s"sanity: vocab $pairVocab should not track corpus $corpus")
  }
}
