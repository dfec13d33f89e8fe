package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for LLM-data-pipeline operators
  * (SURVEY §7.5). All pure `Column` builders over Spark built-ins /
  * higher-order functions — no UDFs, so everything stays on the
  * Tungsten path and scales as ordinary projections.
  */
object TextFunctions {

  /** Whitespace tokens of a trimmed document. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram strings (space-joined), positions 1..len-n+1.
    * Empty array when the doc has fewer than n tokens.
    */
  def wordGrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array())

  /** Exact token count of a word within the token array. */
  def tokenCount(toks: Column, word: String): Column =
    size(filter(toks, t => t === word))

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Deliberately small + ASCII so the oracle SQL can
    * replicate the computation verbatim.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "and", "of", "to"),
    "es" -> Seq("el", "la", "los", "de", "que"),
    "fr" -> Seq("le", "les", "et", "des", "un"),
  )

  /** Stopword-hit score for one language profile. */
  def langScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** MinHash signature (k permutations) over a shingle set: the j-th
    * component is min over shingles of xxhash64(j, shingle). One
    * whole-stage-codegen projection per row — at 100 TB this is
    * embarrassingly parallel with no shuffle.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map(j =>
      array_min(transform(shingles, s => xxhash64(lit(j), s)))): _*)

  /** LSH band hashes from a minhash signature: bands of `rowsPerBand`
    * adjacent components, each hashed to one bucket key. Docs sharing any
    * band bucket are candidate near-duplicates.
    */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      xxhash64((lit(b) +: (0 until rowsPerBand).map(r =>
        element_at(sig, b * rowsPerBand + r + 1))): _*)): _*)

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** 64-bit SimHash from exploded token hashes is assembled in
    * TextQueries (needs a groupBy); this helper gives the per-token hash.
    */
  def tokenHash(token: Column): Column = xxhash64(token)
}
