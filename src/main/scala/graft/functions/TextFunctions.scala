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
    * Empty array when the doc has fewer than n tokens. Backed by the
    * native WordNGrams expression — the equivalent built-in HOF chain
    * (sequence→transform→slice→concat_ws) is interpreted per row and
    * ~10× slower (see graft.functions.expr.WordNGrams).
    */
  def wordGrams(toks: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_word_ngrams", toks, lit(n))

  /** Built-in-only formulation — kept for parity testing. */
  def wordGramsHof(toks: Column, n: Int): Column =
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

  /** ENGINE-PORTABLE base hash into [0, 2³¹−1) for the MinHash chain
    * (r13 — was `pmod(xxhash64, p)`): first 15 hex chars of md5 parsed
    * as a 60-bit integer, reduced mod the Mersenne prime. md5 is
    * bit-identical in Spark and DuckDB and the value stays positive in
    * a signed 64-bit lane, so the SIGNATURES (and with them the band
    * buckets and the exact candidate set) replicate in SQL — what
    * upgrades qd6/qd6b from recall-graded to hash-matched. A second
    * win: inputs < p make the affine maps overflow-free CLEAN field
    * arithmetic (the xxhash64 form relied on Java wrap semantics).
    */
  private val MinhashP = 2147483647L
  def shingleHash31(s: Column): Column =
    pmod(conv(substring(md5(s), 1, 15), 16, 10).cast("long"), lit(MinhashP))

  /** MinHash signature (k permutations) over a shingle set: hash each
    * shingle ONCE ([[shingleHash31]]), then derive the k permutations
    * as affine maps h_j = (a_j·h + b_j) mod p over the Mersenne prime
    * p = 2³¹−1 (a_j ≠ 0 ⇒ bijective on the field) — k× fewer string
    * hashes than hashing per-permutation, the standard trick for
    * corpus-scale minhashing. One whole-stage-codegen projection per
    * row, no shuffle.
    */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val base = transform(shingles, s => shingleHash31(s))
    // native fused loop (graft.functions.expr.MinHashAffine): the HOF
    // form below runs k interpreted array passes per row and dominated
    // qd6 wall time at sf0.1 — output is bit-identical (property-tested)
    call_function("graft_minhash", base, lit(k), lit(0x5EEDL))
  }

  /** Built-in-only fallback (k interpreted HOF passes) — kept for the
    * native/HOF parity property test.
    */
  def minhashSignatureHof(shingles: Column, k: Int): Column = {
    // Affine permutations over the Mersenne prime p=2³¹−1: products stay
    // below 2⁶², so ANSI-mode long arithmetic cannot overflow.
    val p = MinhashP
    val rnd = new scala.util.Random(0x5EED)
    val params = Seq.fill(k)((1L + rnd.nextInt((p - 1).toInt).toLong,
      rnd.nextInt(p.toInt).toLong))
    val base = transform(shingles, s => shingleHash31(s))
    // array_min([]) is NULL; the native expression emits p for an empty
    // shingle set — coalesce keeps the two forms bit-identical on ALL
    // inputs, not just non-empty ones (ADVICE r2).
    array(params.map { case (a, b) =>
      coalesce(
        array_min(transform(base, h => pmod(h * lit(a) + lit(b), lit(p)))),
        lit(p))
    }: _*)
  }

  /** LSH band hashes from a minhash signature: bands of `rowsPerBand`
    * adjacent components, each folded to one bucket key with the
    * portable polynomial combine h ← (h·A + x) mod p seeded with the
    * band index (r13 — was xxhash64, Spark-internal): components are
    * < p, so every partial product stays under 2⁶² and the SQL oracle
    * computes the identical bucket. A fold collision (≈ p⁻¹ per
    * pair-band) only ADDS a candidate, which the verify stage scores
    * anyway — and the oracle replicates the fold, so even that
    * candidate matches.
    */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column = {
    val a = lit(1000000007L)
    array((0 until bands).map { b =>
      (0 until rowsPerBand).foldLeft(lit(b.toLong): Column)((acc, r) =>
        pmod(acc * a + element_at(sig, b * rowsPerBand + r + 1), lit(MinhashP)))
    }: _*)
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Per-token 60-bit hash for SimHash (qd7) — ENGINE-PORTABLE by
    * construction (r13): the first 15 hex chars of md5 parsed as an
    * integer. md5 is bit-identical in Spark and DuckDB (the qd11
    * hash-sampling precedent), and 15 hex chars = 60 bits keeps the
    * value positive in a signed 64-bit lane on both engines — so the
    * whole SimHash fingerprint (bit-votes are integer and order-free)
    * replicates in SQL and qd7 carries a full hash-match oracle.
    * xxhash64 (the previous hash) is Spark-internal; the swap costs
    * ~one md5 per token on a map-only projection and buys the oracle.
    * Fingerprint bits 60–63 are structurally 0 (every token hash has
    * them 0, so their votes are ≤ 0); the band blocking and Hamming
    * verify semantics are unchanged.
    */
  def tokenHash(token: Column): Column =
    conv(substring(md5(token), 1, 15), 16, 10).cast("long")
}
