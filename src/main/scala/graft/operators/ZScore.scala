package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Rounding.dround

/** Two-pass z-score outlier flagging (SURVEY §2.4 A16;
  * /root/reference/src/reporte_cxc.py:219-281,
  * /root/reference/src/auditor.py:173-265).
  *
  * pandas `.std()` is sample std (ddof=1) → `stddev_samp`, NOT
  * `stddev_pop` (SURVEY §7.6.3). Guards match the reference: n ≥ 3 and
  * σ > 0, else no flags.
  *
  * Distributed shape: pass 1 is a scalar aggregate (map-side partial,
  * single tiny result) broadcast back via a cross join with a 1-row
  * DataFrame — no collect, no driver round-trip in the plan, and the
  * projection stays in whole-stage codegen.
  */
object ZScore {

  def withZScore(
      df: DataFrame,
      value: Column,
      zName: String,
      flagName: String,
      threshold: Double,
  ): DataFrame = {
    val stats = df.agg(
      avg(value).as("_mu"),
      stddev_samp(value).as("_sigma"),
      count(value).as("_nn"),
    )
    df.crossJoin(broadcast(stats))
      .withColumn(
        zName,
        when(
          col("_nn") >= 3 && col("_sigma") > 0,
          dround(abs((value - col("_mu")) / col("_sigma")), 4),
        ),
      )
      .withColumn(flagName, coalesce(col(zName) > threshold, lit(false)))
      .drop("_mu", "_sigma", "_nn")
  }
}
