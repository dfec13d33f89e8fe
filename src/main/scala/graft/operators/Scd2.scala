package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 maintenance as a pair of generic
  * operators: `init` opens a dimension from a first snapshot, `merge`
  * applies the NEXT snapshot incrementally against an existing
  * dimension — the production CDC loop a warehouse runs daily, where a
  * per-run batch rebuild over all snapshots (the reference re-derives
  * its master frame from scratch on every pipeline invocation,
  * /root/reference/src/data_transformer.py:160-197) stops being viable
  * the moment history outgrows one job.
  *
  * Dimension schema contract: `key`, the tracked `attrs`, then
  * `valid_from`/`valid_to` (int epochs, half-open `[from, to)`,
  * `to IS NULL` = open) and `is_current`. `merge` semantics per key:
  *
  *   - in both, attrs unchanged  → current row untouched
  *   - in both, attrs changed    → current row closed at `epoch`,
  *                                 new open row `[epoch, NULL)`
  *   - only in dimension (delete)→ current row closed at `epoch`
  *   - only in snapshot (insert, including a key REAPPEARING after a
  *     delete — no current row exists) → new open row `[epoch, NULL)`
  *   - already-closed history    → passes through untouched
  *
  * Attribute comparison is null-safe (`IS DISTINCT FROM`), so a
  * NULL→value transition versions correctly instead of vanishing in
  * three-valued logic.
  *
  * Scale: closed history never reshuffles — only the CURRENT slice
  * (≤ one row per live key) full-outer-joins the incoming snapshot on
  * the key; one key-shuffle per run (zero with bucketed dim/snapshot),
  * and output size is history + the day's delta. The parity property
  * (`Scd2Spec`) pins that chaining `init`+`merge` over the snapshots
  * reproduces CoreQueries.q48's batch rebuild row-for-row; q48b runs
  * the operator as the oracle-checked incremental apply.
  */
object Scd2 {

  private val intNull = lit(null).cast("int")

  /** Open every snapshot row as the key's first version `[epoch, NULL)`. */
  def init(snapshot: DataFrame, key: String, attrs: Seq[String],
      epoch: Int): DataFrame =
    snapshot.select((key +: attrs).map(col): _*)
      .withColumn("valid_from", lit(epoch))
      .withColumn("valid_to", intNull)
      .withColumn("is_current", lit(true))

  /** Incremental apply of `snapshot` (state as of `epoch`) to `dim`. */
  def merge(dim: DataFrame, snapshot: DataFrame, key: String,
      attrs: Seq[String], epoch: Int): DataFrame = {
    val closed = dim.filter(!col("is_current"))
    // presence markers survive the full-outer join where the payload
    // columns may be legitimately NULL
    val cur = dim.filter(col("is_current"))
      .select((key +: attrs :+ "valid_from").map(col): _*)
      .withColumn("__cur", lit(1))
    val snap = snapshot
      .select(col(key) +: attrs.map(a => col(a).as(s"__new_$a")): _*)
      .withColumn("__snap", lit(1))
    val j = cur.join(snap, Seq(key), "full_outer")
    val changed = attrs.map(a => !(col(a) <=> col(s"__new_$a"))).reduce(_ || _)
    // surviving / closing version of every key that HAD a current row
    val fromCur = j.filter(col("__cur").isNotNull)
      .select(col(key) +: attrs.map(col) :+ col("valid_from") :+
        when(col("__snap").isNull || changed, lit(epoch)).otherwise(intNull)
          .as("valid_to"): _*)
    // new open version for inserts and changed keys
    val opened = j.filter(col("__snap").isNotNull &&
        (col("__cur").isNull || changed))
      .select(col(key) +: attrs.map(a => col(s"__new_$a").as(a)) :+
        lit(epoch).as("valid_from") :+ intNull.as("valid_to"): _*)
    closed.unionByName(
      fromCur.unionByName(opened).withColumn("is_current", col("valid_to").isNull))
  }
}
