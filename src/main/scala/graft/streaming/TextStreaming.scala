package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.queries.TextQueries

/** Streaming near-duplicate deduplication of a document stream — the
  * continuous-crawl-ingest shape of the batch MinHash dedup (qd6/qd6b):
  * every microbatch is checked against ALL history, not just a window.
  *
  * Design choice, stated for scale: dedup-against-history has state
  * proportional to the corpus, so holding signatures in executor
  * memory (mapGroupsWithState) is a leak by construction — watermarks
  * cannot evict anything because an old document never stops being a
  * dedup target. Instead each microbatch runs through `foreachBatch`
  * against a DISK-backed signature index (the qd6b parquet artifact):
  * band-join the batch's signatures against the index (plus the batch
  * against itself), emit per-doc verdicts, append the batch's
  * signatures to the index. State lives in parquet — bounded by disk,
  * not heap; the per-batch cost is one band equi-join against an
  * ever-growing but indexed (bucket-keyed) posting list. Signature
  * parameters are TextQueries.signaturesOf — the same single
  * definition the batch operators use.
  */
object TextStreaming {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
  ))

  /** File-source stream of a documents table (one file = one microbatch
    * locally; any file/queue source with the same schema on a cluster).
    */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(s"$dir/documents.parque[t]")

  /** Process one microbatch: verdicts appended to `outPath`
    * (doc_id, dup_of nullable, jac_est nullable), signatures appended
    * to `indexPath/signatures`. Exposed so tests can drive batches
    * directly; `start` wires it into foreachBatch.
    *
    * A document is a duplicate iff some band bucket pairs it with an
    * indexed OR same-batch-smaller-id document at signature-estimated
    * Jaccard ≥ `threshold`; `dup_of` is the smallest such partner (the
    * canonical survivor under keep-first semantics).
    */
  def processBatch(spark: SparkSession, batch: DataFrame, indexPath: String,
      outPath: String, threshold: Double = 0.5): Unit = {
    graft.functions.VectorFunctions.registerNative(spark)
    val sigDir = s"$indexPath/signatures"
    // localCheckpoint: the batch's signatures feed BOTH the verdict join
    // and the index append — and the append must not observe a
    // re-evaluated plan after the verdict (single evaluation, like the
    // Pareto two-phase materialization)
    val newSigs = TextQueries.signaturesOf(batch)
      .select("doc_id", "sig", "bands").localCheckpoint()
    val hasIndex = {
      val d = new java.io.File(sigDir)
      d.isDirectory && d.listFiles().exists(_.getName.endsWith(".parquet"))
    }
    // posting lists carry ONLY (id, band, hash) — candidate pairs are
    // deduped as bare id pairs and the 64-long signatures fetched by id
    // afterwards, same rule as the batch operators
    def posts(df: DataFrame, side: String): DataFrame =
      df.select(col("doc_id").as(s"${side}_id"),
        posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val newPosts = posts(newSigs, "new")
    // candidates: batch vs indexed history (any id), plus batch vs
    // batch (smaller id only — keep-first within the batch)
    val selfPairs = newPosts.as("a")
      .join(posts(newSigs, "old").as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.new_id") > col("b.old_id"))
      .select(col("a.new_id"), col("b.old_id"))
    val pairs =
      (if (hasIndex)
        selfPairs.unionByName(
          newPosts.join(posts(spark.read.parquet(sigDir), "old"),
            Seq("band_idx", "band_hash"))
            .select(col("new_id"), col("old_id")))
      else selfPairs)
        .distinct()
    val oldSigs =
      (if (hasIndex)
        newSigs.select("doc_id", "sig")
          .unionByName(spark.read.parquet(sigDir).select("doc_id", "sig"))
      else newSigs.select("doc_id", "sig"))
        .select(col("doc_id").as("old_id"), col("sig").as("old_sig"))
    val verdicts = pairs
      .join(newSigs.select(col("doc_id").as("new_id"), col("sig").as("new_sig")),
        Seq("new_id"))
      .join(oldSigs, Seq("old_id"))
      .withColumn("jac_est",
        TextQueries.sigEstimate(col("new_sig"), col("old_sig")))
      .filter(col("jac_est") >= threshold)
      .groupBy(col("new_id").as("doc_id"))
      .agg(min(col("old_id")).as("dup_of"), max(col("jac_est")).as("jac_est"))
    newSigs.select("doc_id")
      .join(verdicts, Seq("doc_id"), "left")
      .write.mode("append").parquet(outPath)
    newSigs.select("doc_id", "sig", "bands")
      .write.mode("append").parquet(sigDir)
  }

  /** Start the continuous dedup query (AvailableNow for drain-and-stop
    * runs; drop the trigger for a long-lived stream).
    */
  def start(spark: SparkSession, docsStream: DataFrame, indexPath: String,
      outPath: String, checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, indexPath, outPath)
      }
      .start()
}
