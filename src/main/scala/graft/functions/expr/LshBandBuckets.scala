package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen banded sign-LSH bucketizer: band b's bucket id has bit
  * j set iff dot(vec, plane[b*r+j]) > 0 — the OR-of-ANDs LSH family for
  * cosine similarity over `bands` bands of `r` hyperplane bits.
  *
  * Why a custom Expression (SURVEY §7.4 / preference order (b)): the
  * built-in formulation — bands·r separate `when(dot(vec, <64-element
  * literal array>) > 0, …)` terms — generates a projection so large that
  * janino dies with "Code grows beyond 64 KB" and the WHOLE stage falls
  * back to interpreted evaluation. Measured on qe4b at sf0.1 (2000
  * vectors, 64×4 bands) that fallback cost 27 s of the query's 27.3 s;
  * this expression is one fused triple loop (band × bit × dim) over a
  * plane matrix held as a codegen reference object, and qe4b drops to
  * ~2 s. Same math, same plane stream (`hyperplanes`'s seeded
  * Random row-major sequence), same left-to-right dot sum — output is
  * bit-identical to the HOF form (property-tested), so candidates cannot
  * change.
  */
case class LshBandBuckets(child: Expression, bands: Int, r: Int, dim: Int,
    seed: Long) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  // identical plane stream to VectorFunctions.hyperplanes(bands*r, dim,
  // seed) — since r13 the md5 closed form (LshBandBuckets.planeWeight),
  // which is ENGINE-PORTABLE: a SQL oracle regenerates the exact same
  // matrix from (seed, flat index), which is what lets qe2/qe4b carry
  // full hash-match oracles (a scala.util.Random stream cannot be
  // replayed in SQL)
  @transient private lazy val planes: Array[Double] =
    Array.tabulate(bands * r * dim)(m => LshBandBuckets.planeWeight(seed, m))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() == dim,
      s"graft_lsh_buckets: dimension mismatch (${v.numElements()} vs $dim)")
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0
      var j = 0
      while (j < r) {
        val off = (b * r + j) * dim
        var s = 0.0
        var i = 0
        while (i < dim) { s += v.getDouble(i) * planes(off + i); i += 1 }
        if (s > 0.0) bucket |= (1 << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val bucket = ctx.freshName("bucket")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "graft_lsh_buckets: dimension mismatch (" + $v.numElements() + " vs $dim)");
         |}
         |int[] $out = new int[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  int $bucket = 0;
         |  for (int $j = 0; $j < $r; $j++) {
         |    int $off = ($b * $r + $j) * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $s += $v.getDouble($i) * $planesRef[$off + $i];
         |    }
         |    if ($s > 0.0) $bucket |= (1 << $j);
         |  }
         |  $out[$b] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBandBuckets =
    copy(child = newChild)
}

object LshBandBuckets {

  /** Plane weight for flat index `m` (row-major [plane][dim]): the
    * first 60 bits of md5("seed:m") scaled into [-0.5, 0.5). The exact
    * SQL equivalent is
    * `CAST('0x' || substr(md5(seed || ':' || m), 1, 15) AS BIGINT)
    *  / 1152921504606846976.0 - 0.5`
    * — first 8 digest bytes big-endian shifted right 4 ≡ first 15 hex
    * chars, and both the long→double conversion and the division by
    * 2⁶⁰ round identically under IEEE 754, so the matrices are
    * bit-equal across engines.
    */
  def planeWeight(seed: Long, m: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dg = md.digest(s"$seed:$m".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dg(i) & 0xFFL); i += 1 }
    (h >>> 4).toDouble / 1.152921504606846976e18 - 0.5
  }
}
