package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(Float) embedding columns, computed in
  * double via higher-order functions. Left-to-right sequential summation
  * matches the oracle engine's list_dot_product exactly.
  *
  * Scale note: brute-force top-k is O(|Q|·|D|·dim) — fine for small
  * query sets against broadcast; the LSH variant bounds candidates per
  * bucket for corpus-scale ANN (see VectorQueries.qe2).
  */
object VectorFunctions {

  /** Cast a float array to double element-wise (exact). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Resolution-time literal extraction for the constant arguments of
    * the native-expression SQL builders (ADVICE r12): a non-foldable or
    * null argument from ad-hoc SQL otherwise surfaces as a
    * ClassCastException/NPE deep inside eval with no hint which
    * argument was wrong. Foldable-only is the contract — these
    * arguments are index state (centroids, codebooks, filter bytes)
    * that must be one constant per query, never per row.
    */
  private def foldedArg(fn: String, pos: Int,
      e: org.apache.spark.sql.catalyst.expressions.Expression): Any = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument $pos must be a literal/foldable expression " +
          s"(constant index state), got non-foldable ${e.sql}")
    val v = e.eval()
    if (v == null)
      throw new IllegalArgumentException(s"$fn: argument $pos must not be null")
    v
  }

  /** Register the native expressions on a session (idempotent) — query
    * builders call this so any session works.
    */
  def registerNative(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_dot", exprs => graft.functions.expr.DotProduct(exprs(0), exprs(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_centroid_dists",
      exprs => graft.functions.expr.CentroidDistances(exprs(0),
        foldedArg("graft_centroid_dists", 1, exprs(1))
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray(),
        foldedArg("graft_centroid_dists", 2, exprs(2))
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toIntArray(),
        foldedArg("graft_centroid_dists", 3, exprs(3))
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray(),
        foldedArg("graft_centroid_dists", 4, exprs(4)).asInstanceOf[Int]),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_word_ngrams",
      exprs => graft.functions.expr.WordNGrams(exprs(0), exprs(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_minhash",
      exprs => graft.functions.expr.MinHashAffine(exprs(0),
        foldedArg("graft_minhash", 1, exprs(1)).asInstanceOf[Int],
        foldedArg("graft_minhash", 2, exprs(2)).asInstanceOf[Long]),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash",
      exprs => graft.functions.expr.SimHashBits(exprs(0)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_lsh_buckets",
      exprs => graft.functions.expr.LshBandBuckets(exprs(0),
        foldedArg("graft_lsh_buckets", 1, exprs(1)).asInstanceOf[Int],
        foldedArg("graft_lsh_buckets", 2, exprs(2)).asInstanceOf[Int],
        foldedArg("graft_lsh_buckets", 3, exprs(3)).asInstanceOf[Int],
        foldedArg("graft_lsh_buckets", 4, exprs(4)).asInstanceOf[Long]),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_bloom_any",
      exprs => graft.functions.expr.BloomAnyContain(exprs(0),
        foldedArg("graft_bloom_any", 1, exprs(1)).asInstanceOf[Array[Byte]]),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_pq_encode",
      exprs => graft.functions.expr.PqEncode(exprs(0),
        foldedArg("graft_pq_encode", 1, exprs(1))
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray(),
        foldedArg("graft_pq_encode", 2, exprs(2)).asInstanceOf[Int],
        foldedArg("graft_pq_encode", 3, exprs(3)).asInstanceOf[Int]),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_cms_estimate",
      exprs => graft.functions.expr.CmsEstimate(exprs(0),
        foldedArg("graft_cms_estimate", 1, exprs(1)).asInstanceOf[Array[Byte]]),
      "built-in")
  }

  /** Dot product via the native codegen expression
    * (graft.functions.expr.DotProduct): same left-to-right double sum as
    * the HOF form, but whole-stage-codegen'd — the HOF
    * `aggregate(zip_with(...))` evaluates interpreted per row.
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** PQ nearest-centroid codes via the native loop expression
    * (graft.functions.expr.PqEncode) — `codebook` is flat
    * `[sub][code][dim]`.
    */
  def pqEncode(v: Column, codebook: Array[Double], m: Int, ks: Int): Column =
    call_function("graft_pq_encode", v, typedLit(codebook.toSeq), lit(m), lit(ks))

  /** Native per-row `(rounded L2², cid)` struct array against constant
    * centroids — the loop form of the literal centroidCands unroll,
    * which janino stops compiling near K ≈ 100 (see CentroidDistances).
    * |c|² is precomputed HERE with the same `map(x·x).sum` fold the
    * literal form used, so the two are bit-identical (property-pinned).
    */
  def centroidDists(v: Column, cents: Array[(Int, Seq[Double])]): Column =
    call_function("graft_centroid_dists", v,
      typedLit(cents.flatMap(_._2).toSeq),
      typedLit(cents.map(_._1).toSeq),
      typedLit(cents.map(_._2.map(x => x * x).sum).toSeq),
      lit(cents.head._2.length))

  /** Built-in-only fallback (interpreted HOF) — kept for parity tests. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Deterministic pseudo-random hyperplanes for sign-LSH: `planes` rows
    * of `dim` weights in [-0.5, 0.5), seeded — generated driver-side as
    * literals (tiny: planes×dim doubles), broadcast by constant folding.
    */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextDouble() - 0.5))
  }

  /** Symmetric int8 quantization scale: max|x| / 127 — the 4×-smaller
    * storage layout for corpus-scale embedding stores.
    */
  def quantScale(vec: Column): Column =
    array_max(transform(vec, x => abs(x))) / lit(127.0)

  /** Quantized components floor(x/s + 0.5) ∈ [-127, 127], kept as
    * array<double> of exact integers so the native dot product applies
    * and every downstream sum is exact (≤ dim·127² ≪ 2⁵³) — which is
    * what makes quantized similarity bit-reproducible across engines.
    * In cosine the scale cancels, so similarity needs only these
    * integer vectors.
    */
  def quantize8(vec: Column, scale: Column): Column =
    // scale 0 (all-zero vector) would give 0/0 = NaN components;
    // quantize to exact zeros instead so downstream norms are 0, not
    // NaN, and the degenerate case stays engine-agnostic
    when(scale === 0.0, transform(vec, _ => lit(0.0)))
      .otherwise(transform(vec, x => floor(x / scale + lit(0.5)).cast("long").cast("double")))

  /** Sign-LSH bucket id: one bit per hyperplane (dot(v, plane) > 0). */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Banded sign-LSH: `bands` bucket ids of `r` bits each. A pair is a
    * candidate if it collides in ANY band — the OR-of-ANDs construction
    * that trades candidate volume (more bands) against recall, exactly as
    * MinHash banding does for Jaccard. Returned as an array so callers
    * `posexplode` it into a (band, bucket) posting list and self-join on
    * equality — candidate generation is an equi-join, never a cross
    * product.
    *
    * Backed by the native LshBandBuckets expression: the literal-array
    * HOF form below exceeds janino's 64 KB method limit at bands·r ≥
    * ~256 planes, and the resulting interpreted fallback cost qe4b 27 s
    * of its 27.3 s at sf0.1 (BENCH_r02). Planes derive from the seed
    * inside the expression — the identical `hyperplanes` stream.
    */
  def lshBandBuckets(vec: Column, bands: Int, r: Int, dim: Int,
                     seed: Long = 42L): Column =
    call_function("graft_lsh_buckets", vec, lit(bands), lit(r), lit(dim), lit(seed))

  /** Built-in-only formulation (literal plane arrays) — kept for the
    * native/HOF parity property test. Do not use on the hot path: see
    * lshBandBuckets.
    */
  def lshBandBucketsHof(vec: Column, planes: Seq[Seq[Double]],
                        bands: Int, r: Int): Column = {
    require(planes.length == bands * r, s"need ${bands * r} planes")
    array((0 until bands).map { b =>
      (0 until r).map { j =>
        val planeLit = array(planes(b * r + j).map(lit): _*)
        when(dot(vec, planeLit) > 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
    }: _*)
  }
}
