package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DeltaAgg

/** Streaming maintenance of a materialized per-key count+sum aggregate
  * from a CDC micro-batch feed — [[graft.operators.DeltaAgg]] driven by
  * `foreachBatch`. Where [[BatchIndex]] manages APPEND-ONLY history
  * (each batch adds rows that stay true forever), an aggregate is
  * SUPERSEDING state: each batch replaces the whole frame. The layout
  * is therefore a chain of complete snapshots keyed by batchId:
  *
  *   <root>/v=<batchId>   — the aggregate AFTER applying that batch
  *
  * Exactly-once under foreachBatch's at-least-once contract falls out
  * of the chain by construction, with NO transactional sink: batch N
  * always reads its PREDECESSOR version (newest complete id < N, never
  * itself) and rewrites `v=N` deterministically, so a replay — even
  * over a torn, `_SUCCESS`-less write from the crashed attempt —
  * produces the identical frame. This is the parquet-only analog of a
  * lakehouse MERGE's snapshot isolation.
  *
  * Scale: each batch costs one delta-sized partial aggregate + a
  * key-equi-join against the keyspace-sized current version (see
  * DeltaAgg); the base FACTS are never read. Old versions are
  * vacuumed past the replay horizon (`keepVersions`), bounding the
  * directory over an unbounded stream — the BatchIndex discipline.
  * Values must be additive Longs (cents-quantized): maintenance
  * compounds run over run, so float drift would accumulate.
  */
object AggMaintenance {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versions(spark: SparkSession, root: String): Seq[(Long, String)] = {
    val p = new Path(root)
    val f = fs(spark, p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toIndexedSeq.flatMap { st =>
      val name = st.getPath.getName
      if (name.startsWith("v="))
        name.stripPrefix("v=").toLongOption.map(_ -> st.getPath.toString)
      else None
    }
  }

  private def isComplete(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir, "_SUCCESS")
    fs(spark, p).exists(p)
  }

  /** Newest complete version as (batchId, path), if any. */
  def latest(spark: SparkSession, root: String): Option[(Long, String)] =
    versions(spark, root).filter { case (_, p) => isComplete(spark, p) }
      .sortBy(_._1).lastOption

  /** The current aggregate (newest complete version). */
  def current(spark: SparkSession, root: String): Option[DataFrame] =
    latest(spark, root).map { case (_, p) => spark.read.parquet(p) }

  /** Apply one micro-batch of classified CDC rows
    * (`key, op, old_v, new_v` — DeltaAgg's contract) to the chain.
    * Reads the newest complete version with id < batchId (NEVER the
    * batch's own possibly-torn write), maintains, rewrites
    * `<root>/v=<batchId>`, then vacuums complete versions older than
    * the `keepVersions` replay horizon and any incomplete garbage
    * below the new version. Safe as a `foreachBatch` body.
    */
  def processBatch(spark: SparkSession, delta: DataFrame, root: String,
      key: String, batchId: Long, keepVersions: Int = 2): Unit = {
    val prior = versions(spark, root)
      .filter { case (id, p) => id < batchId && isComplete(spark, p) }
      .sortBy(_._1)
    val base = prior.lastOption match {
      case Some((_, p)) => spark.read.parquet(p)
      case None => delta.select(col(key)).limit(0)
        .withColumn("n", lit(0L)).withColumn("s", lit(0L))
    }
    DeltaAgg.maintain(base, delta, key)
      .write.mode("overwrite").parquet(s"$root/v=$batchId")
    // vacuum: keep the newest `keepVersions` complete predecessors for
    // the replay horizon; drop older ones and any incomplete garbage
    // strictly below the version just written
    val f = fs(spark, new Path(root))
    prior.dropRight(keepVersions)
      .foreach { case (_, p) => f.delete(new Path(p), true) }
    versions(spark, root).foreach { case (id, p) =>
      if (id < batchId && !isComplete(spark, p)) f.delete(new Path(p), true)
    }
  }
}
