package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Presentation helpers kept out of the engine core (SURVEY §2.4 A19,
  * §2.6 O2; reference appends literal TOTAL rows at ~8 call sites, e.g.
  * /root/reference/src/analytics.py:167-174).
  */
object TotalRow {

  /** Append one TOTAL row: `labelCol` ← "TOTAL", every column in `sums`
    * ← its column-sum, remaining columns ← null. Single extra scalar
    * aggregate unioned on — no driver materialization.
    */
  def withTotalRow(
      df: DataFrame,
      labelCol: String,
      sums: Map[String, Column],
  ): DataFrame = {
    // the count guard drops the all-NULL row a global aggregate emits
    // over an empty relation — an empty view stays empty (the reference
    // returns an empty frame, not a TOTAL-of-nothing row)
    val aggs = sums.map { case (name, c) => sum(c).as(name) }.toSeq :+
      count(lit(1)).as("_n")
    val totals = df
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("_n") > 0)
      .drop("_n")
      .withColumn(labelCol, lit("TOTAL"))
    df.unionByName(totals, allowMissingColumns = true)
  }

  /** Dual sort (O2, /root/reference/src/analytics.py:238-242 et al.):
    * rows with value > 0 first ordered desc by value, then the rest
    * ordered asc by name — expressed as ONE orderBy, no union.
    * Returns an explicit rank so the ordering itself is testable under
    * hash comparison.
    */
  def dualSortKey(value: Column, name: Column): Seq[Column] = Seq(
    (value > 0).desc,
    when(value > 0, -value).asc_nulls_last,
    name.asc_nulls_last,
  )
}
