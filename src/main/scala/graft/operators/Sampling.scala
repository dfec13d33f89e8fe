package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling for training-data pipelines.
  *
  * `df.sample()` is NOT reproducible at scale: its Bernoulli draw is
  * seeded per-partition, so any repartition, AQE re-plan, or input
  * split change yields a different sample — poison for dataset
  * versioning. Hash sampling decides membership from the ROW KEY alone
  * (md5 → first 8 hex chars → integer bucket), so the same row lands on
  * the same side of the cut on any cluster layout, any engine (md5 is
  * engine-agnostic — the DuckDB oracle reproduces it verbatim), any
  * run. This is the standard train/validation split + downsampling
  * shape for 100 TB corpora: a pure map-side projection, no shuffle, no
  * state.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the key's md5. 8 hex chars =
    * 32 bits — plenty below long overflow, and cheap to reproduce in
    * SQL: `CAST('0x' || substr(md5(key), 1, 8) AS BIGINT) % buckets`.
    */
  def hashBucket(key: Column, buckets: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Keep ~`fraction` of rows, decided by key hash (deterministic). */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
      buckets: Int = 1000000): DataFrame =
    df.filter(hashBucket(key, buckets) < (fraction * buckets).toLong)

  /** Per-stratum fractions (e.g. language rebalancing: en→0.3, rest→
    * 0.1). Unlisted strata fall back to `defaultFraction`. Same
    * map-side determinism — the threshold is a when-chain on the
    * stratum column, not a per-stratum shuffle.
    */
  def stratifiedHashSample(df: DataFrame, stratum: Column, key: Column,
      fractions: Map[String, Double], defaultFraction: Double,
      buckets: Int = 1000000): DataFrame = {
    val threshold = fractions.foldLeft(lit((defaultFraction * buckets).toLong)) {
      case (acc, (s, f)) => when(stratum === s, lit((f * buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(key, buckets) < threshold)
  }

  /** Deterministic dataset mixture: each source is replayed at its
    * weight — floor(w) full epochs plus a hash-sampled partial epoch for
    * the fraction (the standard corpus-mixing recipe for training runs,
    * e.g. wiki×2.5 + web×0.3). The partial epoch's sample is salted
    * with the epoch number, so which rows the fractional epoch keeps is
    * independent of the full epochs — and everything is a pure function
    * of (key, epoch): reproducible on any partitioning, no RNG state.
    * Output carries `_source` and `_epoch` so readers can audit the mix.
    * Schemas must match (unionByName); at scale this plans as a union
    * of map-side-filtered scans — no shuffle.
    */
  def mixture(sources: Seq[(String, DataFrame, Double)], key: String,
      buckets: Int = 1000000): DataFrame = {
    require(sources.nonEmpty, "mixture of zero sources")
    val parts = sources.flatMap { case (name, df, w) =>
      require(w >= 0, s"negative weight for $name")
      val fullEpochs = math.floor(w).toInt
      val frac = w - fullEpochs
      val copies = (0 until fullEpochs).map(e =>
        df.withColumn("_epoch", lit(e)))
      val partial =
        if (frac > 1e-12) {
          val salted = concat(col(key).cast("string"), lit(s"#$fullEpochs"))
          Seq(df.filter(hashBucket(salted, buckets) < (frac * buckets).toLong)
            .withColumn("_epoch", lit(fullEpochs)))
        } else Seq.empty
      (copies ++ partial).map(_.withColumn("_source", lit(name)))
    }
    parts.reduce(_ unionByName _)
  }
}
