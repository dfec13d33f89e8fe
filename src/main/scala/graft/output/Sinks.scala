package graft.output

import org.apache.spark.sql.DataFrame

/** Engine-side sinks (SURVEY §2.1 S7: the canonical sink is columnar
  * files; Excel/PDF styling is a presentation concern outside the
  * engine). Partitioned parquet is the 100 TB-correct default — writers
  * take explicit partition columns so downstream scans prune.
  */
object Sinks {

  /** Write a view as parquet, optionally hash-partitioned by columns
    * (directory partitioning → partition pruning on read).
    */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** CSV with header — for report-sized outputs only (no pushdown,
    * row-oriented; never for fact tables).
    */
  def csv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** Write every named view of a pipeline run under one root. */
  def writeViews(views: Map[String, DataFrame], root: String): Unit =
    views.foreach { case (name, df) => parquet(df, s"$root/$name") }

  /** Bucketed parquet table (catalog-registered): pre-shuffles the data
    * into `buckets` files per the key and sorts within buckets, so a
    * later equi-join or aggregation on that key needs NO exchange — the
    * co-located-join layout for fact tables that are joined on the same
    * key query after query (SURVEY scale mandate: "bucketing for
    * co-located joins"). Both sides must share key + bucket count.
    */
  def bucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: String): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Training-shard layout: exactly `numShards` parquet files with rows
    * assigned by deterministic key hash (operators.Sampling.hashBucket)
    * — the reproducible equivalent of "shuffle and shard" for training
    * readers. Key-hash assignment (not round-robin/repartition(n)) so
    * the shard membership of every row is a pure function of the data:
    * re-running the pipeline on a differently-partitioned upstream
    * yields byte-identical shard contents. Within-shard order is fixed
    * by sorting on the key hash then key — deterministic but
    * hash-scrambled, which is exactly the "pre-shuffled" property
    * sequential training readers want.
    */
  def trainingShards(df: DataFrame, path: String, numShards: Int,
      key: String): Unit = {
    import org.apache.spark.sql.functions._
    val bucket = graft.operators.Sampling.hashBucket(col(key), numShards)
    df.withColumn("_shard", bucket)
      .repartition(numShards, col("_shard"))
      .sortWithinPartitions(md5(col(key).cast("string")), col(key))
      .write.mode("overwrite")
      .partitionBy("_shard")
      .parquet(path)
  }
}
