package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native product-quantization encoder: nearest-centroid code per
  * subspace over an array<double> vector, against a constant flat
  * codebook (layout `[sub][code][dim]`, i.e. index
  * `(sub·ks + code)·subDim + j`).
  *
  * Why a custom Expression (builder preference order (b)): the
  * declarative formulations both fail at M·K' scale — a literal
  * argmin (`array_min` over M×K' `struct(d², code)` candidates with
  * `typedLit` centroids) generates a doConsume past janino's 64 KB
  * method limit and silently falls back to interpreted eval (measured:
  * 16 codegen-failure events and 8.2 s for qe14 at sf0.1), and the
  * join+window formulation shuffles the exploded subvector frame once
  * per Lloyd round. This compiles to three nested primitive loops with
  * the codebook as a referenced `double[]` — whole-stage-codegen'd,
  * map-only, O(M·K'·subDim) per row.
  *
  * Ties break to the LOWER code (strict `<`), deterministically; the
  * distances are pure per-row arithmetic, so codes are independent of
  * partitioning. 8th native expression.
  */
case class PqEncode(child: Expression, codebook: Array[Double], m: Int, ks: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    require(dim % m == 0 && codebook.length == ks * dim,
      s"graft_pq_encode: dim $dim not divisible into $m subspaces " +
        s"matching a ${codebook.length}-entry codebook")
    val sd = dim / m
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        val base = (sub * ks + c) * sd
        var d = 0.0
        var j = 0
        while (j < sd) {
          val diff = v.getDouble(sub * sd + j) - codebook(base + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(sub) = best
      sub += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
      val dim = ctx.freshName("dim")
      val sd = ctx.freshName("sd")
      val codes = ctx.freshName("codes")
      val sub = ctx.freshName("sub")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val base = ctx.freshName("base")
      s"""
         |int $dim = $v.numElements();
         |if ($dim % $m != 0 || $cb.length != $ks * $dim) {
         |  throw new IllegalArgumentException(
         |    "graft_pq_encode: dim " + $dim + " not divisible into $m subspaces" +
         |    " matching a " + $cb.length + "-entry codebook");
         |}
         |int $sd = $dim / $m;
         |int[] $codes = new int[$m];
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $ks; $c++) {
         |    int $base = ($sub * $ks + $c) * $sd;
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $sd; $j++) {
         |      double $diff = $v.getDouble($sub * $sd + $j) - $cb[$base + $j];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$sub] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
