package graft.functions.expr

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** True iff ANY element of a string array might be in the serialized
  * `spark.util.sketch.BloomFilter` — the probe side of broadcast-sketch
  * decontamination (qd13b): the small eval-side filter rides into the
  * plan as a binary literal, the corpus scan stays map-only, and the
  * per-row loop short-circuits on the first hit.
  *
  * Why a custom Expression (SURVEY §7.4 preference order (b)): Spark
  * exposes no SQL surface for probing a sketch-module Bloom filter
  * (the internal BloomFilterMightContain is reserved for runtime-filter
  * rewrites and takes one scalar, not an array), and the built-in
  * alternative — `exists(grams, g -> ...)` over a UDF — would leave
  * codegen for an interpreted per-element lambda. Membership semantics:
  * `mightContainBinary(UTF8 bytes)` is exactly how the builder's
  * `putString` inserted the gram, so the probe is bit-compatible with
  * `DataFrameStatFunctions.bloomFilter` output regardless of filter
  * version. No false negatives by construction; false-positive rate is
  * the builder's fpp.
  */
case class BloomAnyContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_any"

  // Deserialized once per JVM-side instance; the expression (with its
  // byte payload) is what ships to executors, so codegen references
  // `this` and calls bloomFilter() — dodging any question of the
  // sketch impl's own Java-serializability.
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  def bloomFilter: BloomFilter = bloom

  // Null ELEMENTS are skipped (a null gram is not in any filter):
  // inputTypes admits ArrayType(StringType, containsNull = true), so a
  // caller of the registered SQL function can legally pass
  // array('x', NULL) — that must probe 'x', not NPE.
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) &&
        bloom.mightContainBinary(a.getUTF8String(i).getBytes)) return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomAnyContain", this,
      "graft.functions.expr.BloomAnyContain")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val hit = ctx.freshName("hit")
      s"""
         |boolean $hit = false;
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n && !$hit; $i++) {
         |  $hit = !$a.isNullAt($i) && $self.bloomFilter().mightContainBinary(
         |    $a.getUTF8String($i).getBytes());
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomAnyContain =
    copy(child = newChild)
}
