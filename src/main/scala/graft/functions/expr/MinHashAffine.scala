package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen k-permutation MinHash over pre-hashed shingles:
  * sig[j] = min_i (a_j·h_i + b_j) mod p, p = 2³¹−1.
  *
  * Why a custom Expression (SURVEY §7.4 / preference order (b)): the
  * built-in formulation — k separate `array_min(transform(...))` HOF
  * passes — evaluates k·|shingles| interpreted lambdas per row and
  * allocates k intermediate arrays. Measured on sf0.1 (5000 docs, ~200
  * shingles, k = 64) the signature projection dominated qd6 at ~48 s;
  * this expression is one fused primitive loop inside whole-stage
  * codegen. Same affine-over-Mersenne-prime math (products < 2⁶² — no
  * long overflow), bit-identical output to the HOF form
  * (property-tested), so swapping it in cannot change candidates.
  */
case class MinHashAffine(child: Expression, k: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  private val P = 2147483647L

  // identical parameter stream to TextFunctions.minhashSignature
  @transient private lazy val params: (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var j = 0
    while (j < k) {
      as(j) = 1L + rnd.nextInt((P - 1).toInt).toLong
      bs(j) = rnd.nextInt(P.toInt).toLong
      j += 1
    }
    (as, bs)
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val (as, bs) = params
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (as(j) * hs.getLong(i) + bs(j)) % P
        if (v < m) m = v
        i += 1
      }
      out(j) = if (n == 0) P else m
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (as, bs) = params
    val asRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, h => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
         |int $n = $h.numElements();
         |long[] $out = new long[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  long $m = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = ($asRef[$j] * $h.getLong($i) + $bsRef[$j]) % ${P}L;
         |    if ($v < $m) $m = $v;
         |  }
         |  $out[$j] = ($n == 0) ? ${P}L : $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashAffine =
    copy(child = newChild)
}
