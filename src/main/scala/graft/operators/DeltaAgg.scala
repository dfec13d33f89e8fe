package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of per-key additive aggregates (count + sum)
  * from a classified CDC delta — the companion of [[Scd2]] for the FACT
  * side: where Scd2.merge folds a snapshot into a dimension's history,
  * `maintain` folds a change feed into a materialized aggregate without
  * rescanning the base. Reference analog: the per-run full recompute of
  * every summary frame (/root/reference/src/data_transformer.py:160-197
  * rebuilds all aggregates from the master on each invocation) — the
  * pattern this operator replaces once facts reach cluster scale.
  *
  * Contract: `baseAgg(key, n, s)` is the materialized aggregate of the
  * old snapshot; `delta` carries one row per changed key instance with
  * `op ∈ {insert, delete, update}`, the pre-image value for deletes/
  * updates and the post-image for inserts/updates (exactly the classes
  * the q39 snapshot-diff emits). Only ADDITIVE aggregates are
  * delta-maintainable under retraction: count and sum here (avg/ratios
  * derive at read time). min/max are NOT — a deleted extremum needs a
  * per-key recompute; route those keys through a rebuild, or restrict
  * to append-only feeds where max is maintainable as greatest(old, new).
  * The grouping key must be immutable in the feed: a key-changing
  * update is two rows (delete@old_key + insert@new_key).
  *
  * Scale: the base FACTS are never read — `baseAgg` is keyspace-sized
  * and `delta` is day-sized, so the merge is one delta-sized partial
  * aggregate plus a key-equi-join against the materialized frame; with
  * the aggregate bucketed by key on disk the whole run is
  * exchange-free on the base side. Values are Long (cents-quantized
  * upstream) so maintenance is exact at any depth of compounding —
  * float drift would otherwise accumulate run over run.
  */
object DeltaAgg {

  /** Maintain `baseAgg(key, n, s)` with `delta(key, op, old_v, new_v)`:
    * returns the (key, n, s) aggregate of the post-delta snapshot. Keys
    * whose count reaches 0 drop out (all rows retracted); keys absent
    * from the base insert fresh. `old_v` must be non-null for
    * delete/update rows and `new_v` for insert/update rows.
    */
  def maintain(baseAgg: DataFrame, delta: DataFrame, key: String): DataFrame = {
    val dn = when(col("op") === "insert", 1L)
      .when(col("op") === "delete", -1L).otherwise(0L)
    val ds = when(col("op") === "insert", col("new_v"))
      .when(col("op") === "delete", -col("old_v"))
      .otherwise(col("new_v") - col("old_v"))
    val deltaAgg = delta.groupBy(key).agg(sum(dn).as("dn"), sum(ds).as("ds"))
    baseAgg.join(deltaAgg, Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"))
      .filter(col("n") > 0)
  }
}
