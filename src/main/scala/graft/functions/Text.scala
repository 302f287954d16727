package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis primitives for the training-data-pipeline extensions
  * (SURVEY.md §7.1 step 7). All built from codegen'd
  * `org.apache.spark.sql.functions` — no UDFs — so whole-stage codegen spans
  * stay wide and every derived column is reproducible in the DuckDB oracle
  * (md5 is the cross-engine deterministic hash; both engines emit identical
  * lowercase hex).
  */
object Text {

  /** Whitespace tokens of lowercased text, empty tokens dropped. */
  def tokens(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => t =!= "")

  /** Whitespace-collapsed lowercase normalization (dedup canonical form). */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** BPE-ish subword count: letter runs, digit runs, single punctuation.
    * Same regex semantics in Java and DuckDB's RE2 for this class-only
    * pattern.
    */
  val bpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeishCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit(bpeishPattern), lit(0)))

  /** 60-bit deterministic hash from the md5 hex prefix — numerically
    * identical in DuckDB via `('0x'||substr(md5(x),1,15))::BIGINT`.
    * Non-negative, so min/ordering semantics match across engines.
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Seeded hash family for MinHash: h_i(x) = md5Long(i || ':' || x). */
  def md5LongSeeded(c: Column, seed: Int): Column =
    md5Long(concat(lit(s"$seed:"), c))

  /** Distinct word n-gram shingles (space-joined) of a token array.
    * Empty array when the doc has fewer than n tokens — `sequence` would
    * otherwise count *down* and fabricate negative indices.
    */
  def shingles(tk: Column, n: Int = 3): Column = {
    val grams = transform(
      sequence(lit(1), size(tk) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(tk, i + lit(o))): _*))
    when(size(tk) >= n, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /** Language marker stopword lists for the rule-based language-ID
    * heuristic. Kept disjoint across languages so scoring is unambiguous.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "les", "et", "des", "une", "est", "dans"),
    "es" -> Seq("el", "los", "las", "y", "una", "está", "pero"))

  /** Occurrences of tokens drawn from `words` (bag semantics, not distinct). */
  def markerHits(tk: Column, words: Seq[String]): Column =
    size(filter(tk, t => t.isInCollection(words)))

  /** Rule-based language ID: argmax of marker-word hits, ties broken by the
    * fixed language order above; all-zero → "und" (undetermined).
    */
  def langId(tk: Column): Column = {
    val scores = langMarkers.map { case (lang, words) => (lang, markerHits(tk, words)) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === best && s > 0, lit(lang)).otherwise(els)
    }
  }
}
