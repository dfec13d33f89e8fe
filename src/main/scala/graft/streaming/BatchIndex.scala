package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lifecycle of a batchId-keyed streaming index directory
  * (`<dir>/batch=<id>` written once per microbatch by TextStreaming /
  * VectorStreaming) — listing the strictly-prior history and COMPACTING
  * old batches so the directory count stays bounded over an unbounded
  * stream (VERDICT r3→r5 carried item).
  *
  * Layout: live batches stay under `<dir>/batch=<id>`; compaction unions
  * batches `id ≤ hi` into a BASE SEGMENT at `<dir>_base/hi=<hi>` (a
  * SIBLING root — mixing `base=`/`batch=` subdirs under one root would
  * break Spark's partition discovery for whole-directory reads). Bases
  * are cumulative supersets, so a reader needs only the NEWEST
  * `_SUCCESS`-complete base plus the live dirs above its high-water id.
  *
  * Crash safety, stated as invariants:
  *  - a base is visible only once `_SUCCESS` exists (incomplete writes
  *    are ignored and garbage-collected by the next compact);
  *  - after a new base lands, live dirs `id ≤ hi` are EXCLUDED by the
  *    reader even before they are deleted (no double-count window);
  *  - deletion happens strictly after the new base is complete, so a
  *    crash anywhere leaves a readable, duplicate-free view.
  *
  * Replay interaction: the strictly-prior-batch rule requires batch N's
  * history to exclude batches ≥ N. A base therefore must never absorb a
  * batch that can still be REPLAYED — foreachBatch replays at most the
  * latest uncommitted batch, and `keepLast` (default 3) keeps well more
  * than that live. A replay deeper than the compaction horizon is a
  * contract violation and fails loudly rather than serving corrupted
  * history.
  */
object BatchIndex {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def baseRoot(dir: String) = s"${dir.stripSuffix("/")}_base"

  private def listIds(spark: SparkSession, root: String, prefix: String): Seq[(Long, String)] = {
    val p = new Path(root)
    val f = fs(spark, p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toIndexedSeq.flatMap { st =>
      val name = st.getPath.getName
      if (name.startsWith(prefix))
        name.stripPrefix(prefix).toLongOption.map(_ -> st.getPath.toString)
      else None
    }
  }

  private def isComplete(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir, "_SUCCESS")
    fs(spark, p).exists(p)
  }

  /** Newest complete base segment as (hi, path), if any. */
  private def newestBase(spark: SparkSession, dir: String): Option[(Long, String)] =
    listIds(spark, baseRoot(dir), "hi=")
      .filter { case (_, p) => isComplete(spark, p) }
      .sortBy(_._1).lastOption

  /** The strictly-prior history of `batchId`: newest base (all batches
    * ≤ hi) + live batch dirs with hi < id < batchId. None when empty.
    */
  def historyBefore(spark: SparkSession, dir: String, batchId: Long): Option[DataFrame] = {
    val base = newestBase(spark, dir)
    base.foreach { case (hi, _) =>
      require(hi < batchId,
        s"batch $batchId replayed below the compaction horizon (base hi=$hi): " +
          "history would include the batch itself; raise keepLast")
    }
    val lo = base.map(_._1).getOrElse(Long.MinValue)
    val live = listIds(spark, dir, "batch=")
      .collect { case (id, p) if id > lo && id < batchId => p }
    val paths = base.map(_._2).toSeq ++ live
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  /** Compact live batches into a new base segment, keeping the
    * `keepLast` newest live (the replay horizon) and only acting once
    * `minEligible` dirs are compactable (amortization). Idempotent and
    * safe to call after every batch.
    *
    * `onBaseWritten` is a crash-injection point for tests: it runs
    * after the new base is complete and BEFORE the input dirs are
    * retired — throwing there models a process kill in the window the
    * crash-safety invariants are stated for. Production callers leave
    * the default no-op.
    */
  def compact(spark: SparkSession, dir: String,
      keepLast: Int = 3, minEligible: Int = 8,
      onBaseWritten: () => Unit = () => ()): Unit = {
    val root = new Path(dir)
    val f = fs(spark, root)
    val base = newestBase(spark, dir)
    val baseHi = base.map(_._1).getOrElse(Long.MinValue)
    // garbage: incomplete bases and live dirs already absorbed by a base
    listIds(spark, baseRoot(dir), "hi=").foreach { case (hi, p) =>
      if (hi < baseHi || !isComplete(spark, p)) f.delete(new Path(p), true)
    }
    val live = listIds(spark, dir, "batch=").sortBy(_._1)
    live.foreach { case (id, p) => if (id <= baseHi) f.delete(new Path(p), true) }
    val ids = live.map(_._1).filter(_ > baseHi)
    if (ids.isEmpty) return
    val cutoff = ids.max - keepLast
    val eligible = live.filter { case (id, _) => id > baseHi && id <= cutoff }
    if (eligible.size < minEligible) return
    val newHi = eligible.map(_._1).max
    val target = s"${baseRoot(dir)}/hi=$newHi"
    spark.read.parquet(base.map(_._2).toSeq ++ eligible.map(_._2): _*)
      .write.mode("overwrite").parquet(target)
    onBaseWritten()
    // new base is complete: retire its inputs (reader already ignores
    // them, this just reclaims space)
    eligible.foreach { case (_, p) => f.delete(new Path(p), true) }
    base.foreach { case (_, p) => f.delete(new Path(p), true) }
  }
}
