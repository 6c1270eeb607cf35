package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE merge-train operator's two contracts: the merge REWRITE
  * semantics (left-to-right, non-overlapping — the subword-tokenizer
  * standard) and the trainer's per-iteration invariants (monotone corpus
  * compression, positive weighted counts, fixed iteration count). The
  * rewrite is tested directly on crafted symbol sequences because the
  * overlap cases ("aaa", "aaaa") are exactly where a fold and a positional
  * implementation can silently disagree — the DuckDB oracle implements the
  * POSITIONAL reading (mark runs, merge odd offsets), so these fixtures are
  * the cross-engine equivalence argument in unit form.
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def merge(word: String, l: String, r: String): Seq[String] =
    Seq(word).toDF("w")
      .select(graft.text.TextAnalysis.bpeMerge(
        expr("transform(sequence(1, length(w)), " +
          "i -> substring(w, CAST(i AS INT), 1))"), lit(l), lit(r)).as("m"))
      .head().getSeq[String](0)

  test("bpeMerge: left-to-right non-overlapping on run-of-equal symbols") {
    assert(merge("aaa", "a", "a") == Seq("aa", "a"))
    assert(merge("aaaa", "a", "a") == Seq("aa", "aa"))
    assert(merge("aaaaa", "a", "a") == Seq("aa", "aa", "a"))
  }

  test("bpeMerge: distinct-pair merges, including adjacent occurrences") {
    assert(merge("abab", "a", "b") == Seq("ab", "ab"))
    assert(merge("xaby", "a", "b") == Seq("x", "ab", "y"))
    assert(merge("abc", "b", "c") == Seq("a", "bc"))
    assert(merge("abc", "c", "a") == Seq("a", "b", "c")) // no occurrence
  }

  test("bpeMerge: a merge result never re-triggers (l||r != l by construction)") {
    // after merging (a,a) at the front of "aab", the output "aa" must not
    // combine with the following b under a later (a,b) reading — within ONE
    // rewrite only the ORIGINAL pair merges
    assert(merge("aab", "a", "a") == Seq("aa", "b"))
    // merged symbol equal to r: [b, ba, ba] with (b, ba) -> [bba, ba]
    val syms = Seq(Seq("b", "ba", "ba")).toDF("syms")
      .select(graft.text.TextAnalysis.bpeMerge(col("syms"), lit("b"), lit("ba"))
        .as("m")).head().getSeq[String](0)
    assert(syms == Seq("bba", "ba"))
  }

  test("text_bpe_train: degenerate corpus fails loudly, never a NULL merge") {
    // r14 ADVICE: an exhausted pair table used to emit a silent all-NULL
    // merge row on the Spark side while the DuckDB oracle emitted nothing
    // — a confusing cross-engine hash diff. The guard makes it an explicit
    // error. Corpus of single-character words = no pairs in round 1.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bpedegen").toString
    Seq("a b c", "d e").toDF("text").withColumn("doc_id", lit(1L))
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[Exception] {
      SparkEntry.queries("text_bpe_train")(spark, dir).collect()
    }
    graft.util.Checkpoints.releaseOwned(spark)
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) :: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("degenerate")),
      s"expected the explicit degenerate-corpus error, got: ${msgs(e)}")
  }

  test("text_bpe_train: 4 iterations, monotone compression, sane merges") {
    val out = SparkEntry.queries("text_bpe_train")(spark, SparkTestBase.sf)
      .orderBy("iter").collect()
    graft.util.Checkpoints.releaseOwned(spark)
    assert(out.length == 4)
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val counts = out.map(_.getLong(3))
    val corpus = out.map(_.getLong(4))
    assert(counts.forall(_ > 0), s"non-positive pair count: ${counts.toSeq}")
    // each applied merge removes one symbol, merges are bounded by the
    // counted occurrences (strictly fewer only when l = r and runs
    // overlap), and the best pair always occurs somewhere — so corpus_syms
    // strictly decreases, by at most that round's pair_count
    val drops = corpus.indices.drop(1)
      .map(i => corpus(i - 1) - corpus(i))
    assert(drops.forall(_ > 0),
      s"corpus_syms must strictly decrease: ${corpus.toSeq}")
    assert(drops.zip(counts.drop(1)).forall { case (d, c) => d <= c },
      s"a round removed more symbols than its pair count: " +
        s"drops=$drops, counts=${counts.toSeq}")
    // merged symbols are the concatenation of that round's pair
    out.foreach { r =>
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty)
    }
  }

  test("text_bpe_encode: trained merges surface in the token distribution") {
    val trained = SparkEntry.queries("text_bpe_train")(spark, SparkTestBase.sf)
      .collect().map(r => r.getString(1) + r.getString(2)).toSet
    val enc = SparkEntry.queries("text_bpe_encode")(spark, SparkTestBase.sf)
      .collect()
    graft.util.Checkpoints.releaseOwned(spark)
    assert(enc.length <= 20 && enc.nonEmpty)
    // counts are positive and ordered (desc, then token asc on ties)
    val ns = enc.map(_.getLong(1))
    assert(ns.forall(_ > 0))
    assert(ns.zip(ns.drop(1)).forall { case (a, b) => a >= b })
    // every encoded token is a single char or built from a trained merge
    // prefix chain — in particular, any multi-char token in the top-20
    // must be one of the 4 trained merge results (4 merges can compose at
    // most chains of themselves)
    enc.map(_.getString(0)).filter(_.length > 1).foreach { t =>
      assert(trained.contains(t),
        s"top-20 token '$t' is not a trained merge result ($trained)")
    }
  }
}
