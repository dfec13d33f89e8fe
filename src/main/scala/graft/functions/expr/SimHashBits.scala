package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen 64-bit SimHash over pre-hashed tokens: bit j of the
  * fingerprint is set iff more token hashes have bit j set than unset
  * (the classic signed bit-vote, ties → 0).
  *
  * Why a custom Expression: the built-in formulation needs
  * explode(tokens) → groupBy(doc) with 64 conditional-sum aggregators —
  * a full shuffle of every token row plus 64 aggregation buffers per
  * group. This is one fused per-row loop in whole-stage codegen, so the
  * fingerprint becomes a map-only projection and the shuffle disappears
  * from qd7's plan. Bit-vote math is integer and order-independent —
  * output is bit-identical to the aggregation form (tested).
  */
case class SimHashBits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val hv = ctx.freshName("hv")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $h.numElements();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $hv = $h.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($hv >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $fp |= (1L << $j);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}
