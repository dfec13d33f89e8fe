package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Config-driven bucketization (reference: `np.select` over configured
  * ranges, /root/reference/src/reporte_cxc.py:402-433 and
  * /root/reference/src/analytics.py:113-127). Emitted as a chained
  * `when(...)` Column — a plain expression tree that stays inside
  * whole-stage codegen; no UDF (SURVEY §2.10).
  */
object Buckets {

  /** Build a label column from inclusive integer ranges.
    * `default` replicates the reference's per-call-site default mismatch
    * (SURVEY §7.6.7): "" in reporte vs "Fuera de rango" in analytics.
    */
  def bucketize(
      days: Column,
      ranges: Seq[(Option[Int], Option[Int], String)],
      default: String = "",
  ): Column = {
    val chained = ranges.foldLeft(Option.empty[Column]) { case (acc, (lo, hi, label)) =>
      val cond = (lo, hi) match {
        case (Some(l), Some(h)) => days >= l && days <= h
        case (Some(l), None)    => days >= l
        case (None, Some(h))    => days <= h
        case (None, None)       => lit(true)
      }
      Some(acc.fold(when(cond, label))(_.when(cond, label)))
    }
    chained.fold(lit(default))(_.otherwise(default))
  }

  /** Ordinal of a bucket label — sort key replacing the reference's
    * ordered-Categorical trick (/root/reference/src/analytics.py:161-165).
    */
  def bucketOrdinal(
      label: Column,
      ranges: Seq[(Option[Int], Option[Int], String)],
  ): Column = {
    val chained = ranges.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, ((_, _, l), i)) =>
        Some(acc.fold(when(label === l, i))(_.when(label === l, i)))
    }
    chained.fold(lit(ranges.size))(_.otherwise(ranges.size))
  }

  /** Equivalent SQL CASE expression for a DuckDB oracle, kept adjacent so
    * Spark and oracle bucketization can never drift.
    */
  def bucketizeSql(
      daysExpr: String,
      ranges: Seq[(Option[Int], Option[Int], String)],
      default: String = "",
  ): String = {
    val arms = ranges.map { case (lo, hi, label) =>
      val cond = (lo, hi) match {
        case (Some(l), Some(h)) => s"$daysExpr BETWEEN $l AND $h"
        case (Some(l), None)    => s"$daysExpr >= $l"
        case (None, Some(h))    => s"$daysExpr <= $h"
        case (None, None)       => "TRUE"
      }
      s"WHEN $cond THEN '$label'"
    }
    s"CASE ${arms.mkString(" ")} ELSE '$default' END"
  }

  def bucketOrdinalSql(
      labelExpr: String,
      ranges: Seq[(Option[Int], Option[Int], String)],
  ): String = {
    val arms = ranges.zipWithIndex.map { case ((_, _, l), i) =>
      s"WHEN $labelExpr = '$l' THEN $i"
    }
    s"CASE ${arms.mkString(" ")} ELSE ${ranges.size} END"
  }
}
