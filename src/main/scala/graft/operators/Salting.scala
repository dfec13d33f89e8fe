package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting (the 100 TB skew playbook the
  * builder mandate names alongside AQE skew-join).
  *
  * Shape: the SKEWED (big) side gets a deterministic salt in [0, S)
  * derived from a high-cardinality disambiguator column, so one hot key
  * fans out over S shuffle partitions; the small side is replicated S×
  * (explode of a literal range) with every salt value. The join key
  * becomes (key, salt) — same rows as the plain join, but no single
  * reducer owns a hot key.
  *
  * When to use which: AQE's skew-join handles MOST skew at runtime by
  * splitting oversized partitions, and needs no code change — prefer it.
  * Salting is for the cases AQE cannot split: skewed keys feeding an
  * aggregation-after-join on the same key, deterministic partition
  * sizing for spill control, or engines/paths with AQE off. The cost is
  * an S× replication of the small side — keep S near the hot-key
  * partition overflow factor, not 100.
  */
object Salting {

  /** Join `big` (skewed) with `small` on `key`, salted S ways.
    * `disambig` must be a column of `big` whose value varies within a
    * key group (a row id, a line number, an amount) — the salt is
    * `pmod(hash(disambig), S)`, deterministic so retries/speculative
    * tasks agree.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      disambig: Column,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full outer would emit every unmatched small-side row once
    // per replica — only join types that never null-pad the replicated
    // side are equivalent to the plain join
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin does not support joinType=$joinType (replicated side would duplicate)")
    val salted = big.withColumn("_salt", pmod(hash(disambig), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
