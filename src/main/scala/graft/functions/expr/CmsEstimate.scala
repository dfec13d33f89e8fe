package graft.functions.expr

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.util.sketch.CountMinSketch

/** Estimated occurrence count of a string in a serialized
  * `spark.util.sketch.CountMinSketch` — the probe side of
  * sketch-based frequency monitoring (qd21b): the fixed-size sketch is
  * built in one distributed pass (`df.stat.countMinSketch`, partials
  * merged cell-wise) and rides into the plan as a binary payload, so
  * estimating a watchlist's frequencies costs a map over the watchlist
  * instead of re-shuffling the token stream.
  *
  * Why a custom Expression (SURVEY §7.4 preference order (b)): Spark's
  * SQL surface exposes `count_min_sketch()` for BUILDING the sketch
  * but nothing for querying one — the estimate API exists only on the
  * driver-side sketch object. Probing with `estimateCount(String)`
  * matches how `DataFrameStatFunctions.countMinSketch` inserted string
  * values, so estimates carry the CMS guarantee: never under the true
  * count, over by at most eps*N with the builder's confidence
  * (SketchSpec pins both sides against the exact twin).
  */
case class CmsEstimate(child: Expression, cmsBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  // Deserialized once per JVM-side instance; the expression (with its
  // byte payload) ships to executors, and codegen references `this` —
  // same lifecycle as BloomAnyContain.
  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(cmsBytes))

  def sketch: CountMinSketch = cms

  override def nullSafeEval(input: Any): Any =
    cms.estimateCount(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cmsEstimate", this,
      "graft.functions.expr.CmsEstimate")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $self.sketch().estimateCount($t.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}
