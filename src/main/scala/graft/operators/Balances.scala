package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Rounding.dround

/** Settlement-balance and running-balance operators — the structural core
  * of the reference engine (SURVEY §2.4 A2/J2 and §2.5 W1).
  *
  * Reference semantics: a "payment" row carries the id of the "charge" it
  * settles (`DOCTO_CC_ACR_ID`, /root/reference/src/reporte_cxc.py:346-355);
  * the charge balance is its amount minus the sum of linked payments, and
  * the per-account running balance is a grouped ordered cumulative sum
  * (/root/reference/src/reporte_cxc.py:362-373).
  *
  * Scale notes (100 TB design intent):
  *  - `settlementBalance` is one shuffle on the link key (partial
  *    aggregation is map-side) plus one equi-join on the charge id. Both
  *    sides hash-partition on the same key domain, so AQE can convert to a
  *    co-partitioned join; no driver-side state.
  *  - `runningBalance` partitions by account — per-account history must be
  *    sort-local, which is exactly what a window over
  *    partitionBy(account) gives. Skewed accounts are bounded by account
  *    history length, not table size.
  */
object Balances {

  /** charge.amount − Σ linked payment amounts, per charge.
    * @param charges   one row per charge, `chargeId` unique
    * @param payments  child rows carrying `linkKey` = settled charge id
    */
  def settlementBalance(
      charges: DataFrame,
      payments: DataFrame,
      chargeId: String,
      linkKey: String,
      chargeAmount: Column,
      paymentAmount: Column,
      outName: String = "saldo",
  ): DataFrame = {
    val paid = payments
      .groupBy(col(linkKey).as("_link"))
      .agg(sum(paymentAmount).as("_paid"))
    charges
      .join(paid, charges(chargeId) === paid("_link"), "left")
      .withColumn(outName, dround(chargeAmount - coalesce(col("_paid"), lit(0.0)), 2))
      .drop("_link", "_paid")
  }

  /** Ordered per-group cumulative sum (W1). Caller supplies a total order
    * within the partition (SURVEY §7.6.1: include a unique id as the final
    * tiebreaker so the running values are deterministic).
    */
  def runningBalance(
      df: DataFrame,
      partitionCols: Seq[Column],
      orderCols: Seq[Column],
      signedAmount: Column,
      outName: String = "running_balance",
  ): DataFrame = {
    val w = Window
      .partitionBy(partitionCols: _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outName, dround(sum(signedAmount).over(w), 2))
  }

  /** Alternating presentation bands (W3,
    * /root/reference/src/reporte_cxc.py:442-462): rows sharing a group key
    * alternate 0/1 in global display order. `dense_rank % 2` replaces the
    * reference's lag+cumsum idiom. NOTE: a partition-less window — this is
    * a presentation-layer operator for already-small report output, not
    * for raw fact tables (SURVEY §4.3.3).
    */
  def bandGroups(df: DataFrame, orderCols: Seq[Column], outName: String = "band"): DataFrame =
    // display-order banding is global by definition; the dense rank
    // goes through Pareto's two-phase dispatch so a fact-scale frame
    // range-partitions instead of single-partitioning (VERDICT r10
    // item 4)
    Pareto.denseRankBy(df, orderCols, "_band_rank")
      .withColumn(outName, (col("_band_rank") % 2).cast("int"))
      .drop("_band_rank")
}
