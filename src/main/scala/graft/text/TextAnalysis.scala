package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale corpus pipelines: token
  * model, shingling, quality scoring, language heuristics, fingerprints.
  *
  * Everything here is a pure Catalyst column expression (no UDFs): the same
  * operator graph whole-stage-codegens on a 1000-executor cluster and pushes
  * only `text` through the scan. DuckDB-parity notes: md5 hex is identical in
  * both engines and is the only hash primitive used anywhere, so oracle
  * comparison is exact-string, never float-hash.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text. */
  def tokensCol(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word k-shingles (order-free set, for MinHash/Jaccard).
    * 1-based `element_at`; guarded for docs shorter than k tokens. */
  def shinglesCol(tokens: Column, k: Int): Column = {
    val idx = sequence(lit(1), size(tokens) - (k - 1))
    val sh = transform(idx, i =>
      concat_ws(" ", (0 until k).map(o => element_at(tokens, i + o)): _*))
    when(size(tokens) >= k, array_distinct(sh)).otherwise(array().cast("array<string>"))
  }

  /** Count of tokens contained in `words`. */
  def vocabHits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => array_contains(array(words.map(lit): _*), t)))

  /** One BPE merge applied to a symbol sequence: every left-to-right
    * NON-OVERLAPPING adjacent occurrence of (l, r) becomes the single
    * symbol l||r — the standard subword-tokenizer rewrite ("aaa" with
    * merge (a,a) → [aa, a]). Implemented as a left fold over the array:
    * the guard checks the last OUTPUT symbol, which cannot re-trigger a
    * merge because l||r never equals l (r is non-empty) — so greedy
    * left-to-right and the positional odd-offsets-of-a-mark-run rule
    * coincide (BpeTrainSpec pins both readings). Pure Catalyst higher-
    * order function: no UDF, per-row work O(|syms|), no shuffle. */
  def bpeMerge(syms: Column, l: Column, r: Column): Column =
    aggregate(syms, array().cast("array<string>"), (out, x) =>
      when(size(out) > 0 && element_at(out, size(out)) === l && x === r,
        concat(slice(out, lit(1), size(out) - 1), array(concat(l, r))))
        .otherwise(concat(out, array(x))))

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")

  /** Language trigram/stopword profiles for the n-gram language heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  /** Normalized text: lowercase, non-alnum → space, collapsed, trimmed. */
  def normalizedCol(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9]+", " "), " +", " "))
}
