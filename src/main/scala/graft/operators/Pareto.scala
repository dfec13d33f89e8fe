package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Rounding.dround

import graft.GraftConf

/** Pareto / ABC concentration (SURVEY §2.4 A13 + §2.5 W2;
  * /root/reference/src/kpis.py:117-161).
  *
  * Faithfully replicates the two reference quirks (SURVEY §7.6.8):
  *  - the first-ranked row is ALWAYS class "A" even if its own share
  *    exceeds the A threshold;
  *  - the final row's cumulative share is force-set to exactly 1.0.
  *
  * The ranking window is global (single partition). That is correct at the
  * reference's cardinality (accounts, not facts) — the input here is
  * already one row per account produced by a distributed groupBy. At
  * 100 TB the account dimension is still orders of magnitude smaller than
  * the fact table; if account cardinality itself explodes, swap the global
  * window for a two-phase prefix sum: range-repartition by value desc,
  * per-partition partial sums, broadcast per-partition offsets, then add.
  */
object Pareto {

  def abc(
      perKey: DataFrame,
      keyCol: Column,
      valueCol: Column,
  ): DataFrame = {
    val w = Window
      .orderBy(valueCol.desc, keyCol.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rn  = row_number().over(Window.orderBy(valueCol.desc, keyCol.asc))
    val n   = count(lit(1)).over(wAll)
    val tot = sum(valueCol).over(wAll)
    val cum = sum(valueCol).over(w)
    perKey
      .withColumn("rnk", rn.cast("int"))
      .withColumn("pct", dround(valueCol / tot, 6))
      .withColumn("_cum_raw", cum / tot)
      .withColumn("_n", n)
      .withColumn(
        "pct_acumulado",
        when(col("rnk") === col("_n"), lit(1.0)).otherwise(dround(col("_cum_raw"), 6)),
      )
      .withColumn(
        "clase_abc",
        when(col("rnk") === 1, "A")
          .when(col("_cum_raw") <= GraftConf.abcA, "A")
          .when(col("_cum_raw") <= GraftConf.abcB, "B")
          .otherwise("C"),
      )
      .drop("_cum_raw", "_n")
  }
}
