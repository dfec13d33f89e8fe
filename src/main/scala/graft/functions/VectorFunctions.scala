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

  /** Register the native expressions on a session (idempotent) — query
    * builders call this so any vanilla session works. Drives off the
    * SAME registration table as [[graft.GraftExtensions]] (the
    * `spark.sql.extensions` entry point), so the two registration
    * paths can never drift; the foldable/non-null literal guards for
    * constant index-state arguments (ADVICE r12) live in that table's
    * builders.
    */
  def registerNative(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    graft.GraftExtensions.registrations.foreach { case (name, _, builder) =>
      // skip names already present (extension-injected, or an earlier
      // call on this session): every path registers the same shared
      // table, and the replace would WARN-spam once per query into
      // every committed harness artifact tail (VERDICT r13 item 7)
      if (reg.lookupFunctionBuilder(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)).isEmpty)
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
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
    * r13: the md5 closed form (LshBandBuckets.planeWeight) replaces the
    * scala.util.Random stream so a SQL oracle can regenerate the exact
    * matrix; the native expression reads the same formula.
    */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] =
    Seq.tabulate(planes)(p => Seq.tabulate(dim)(d =>
      graft.functions.expr.LshBandBuckets.planeWeight(seed, p * dim + d)))

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
