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

  /** Streaming chunking — qd26's sliding token-window transform applied
    * to a document stream (the continuous-ingest shape of passage
    * extraction for a retrieval index). The transform is STATELESS
    * (per-row explode, no aggregation, no history), so it needs no
    * watermark and no state store, runs in Append mode, and the
    * end-of-stream output equals the batch operator on the same rows by
    * construction — one shared definition (TextQueries.chunkDocs), not
    * a re-implementation that could drift.
    */
  def chunkDocs(docsStream: DataFrame): DataFrame =
    TextQueries.chunkDocs(docsStream)

  /** Streaming Gopher-rules gate — qd29's composite keep/drop verdict on
    * a document stream (the ingest-time quality filter). Stateless like
    * [[chunkDocs]]: same shared batch definition, Append mode, no
    * watermark, stream ≡ batch by construction.
    */
  def gopherFilter(docsStream: DataFrame): DataFrame =
    TextQueries.gopherGate(docsStream)

  /** Streaming per-source vocabulary NDV (qd20b's sketch, incremental):
    * the running approximate distinct-token count per source over a
    * document stream. HLL registers merge by max — a commutative
    * monoid — so however the stream is sliced into microbatches, the
    * end-of-stream table equals the batch sketch EXACTLY (tested
    * bit-for-bit against qd20b). Unlike the dedup paths there is no
    * unbounded history problem: state is K registers per source
    * regardless of stream length, so this needs no watermark, no
    * external index, no compaction — the textbook case for a streaming
    * aggregation over mergeable sketch state.
    */
  def vocabularyNdv(docsStream: DataFrame): DataFrame =
    docsStream
      .select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("source")
      .agg(
        approx_count_distinct(col("tok"), 0.02).as("ndv_approx"),
        count(lit(1)).as("total_tokens"))

  /** Process one microbatch: verdicts written to
    * `outPath/batch=<id>/` (doc_id, dup_of nullable, jac_est
    * nullable), signatures to `indexPath/signatures/batch=<id>/`.
    * Exposed so tests can drive batches directly; `start` wires it
    * into foreachBatch.
    *
    * Exactly-once under foreachBatch's at-least-once contract: both
    * writes go to batchId-keyed subdirectories with mode("overwrite"),
    * so a replayed batch REPLACES its own previous (possibly partial)
    * output instead of appending a second copy — no marker files, no
    * read-side dedup. The history join also excludes the doc's own id,
    * so a source-level re-delivery in a LATER batch cannot flag a doc
    * as its own duplicate.
    *
    * A document is a duplicate iff some band bucket pairs it with an
    * indexed OR same-batch-smaller-id document at signature-estimated
    * Jaccard ≥ `threshold`; `dup_of` is the smallest such partner (the
    * canonical survivor under keep-first semantics).
    */
  def processBatch(spark: SparkSession, batch: DataFrame, indexPath: String,
      outPath: String, batchId: Long, threshold: Double = 0.5): Unit = {
    graft.functions.VectorFunctions.registerNative(spark)
    val sigDir = s"$indexPath/signatures"
    // Explicit persist + eager materialization: the batch's signatures
    // feed BOTH the verdict join and the index write, which must see one
    // evaluation. Released in the finally — a per-batch localCheckpoint
    // would pin blocks for the session's lifetime and leak storage
    // across an unbounded stream (the qd6 lesson applied here).
    // persist() is a lazy marking (no job), so the val can sit outside
    // the try; the materializing count() must be INSIDE it — if the
    // signature computation fails, the finally still unpersists, or a
    // foreachBatch retry loop leaks one pinned block set per attempt
    // (ADVICE r6)
    val newSigs = TextQueries.signaturesOf(batch)
      .select("doc_id", "sig", "bands")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    newSigs.count()
    // history = STRICTLY PRIOR batches (batch < batchId), not merely
    // "not this batch": a replayed batch must see exactly the history
    // its original run saw — including its own previous write (replay
    // self-match) and any LATER batches (which would flip verdicts
    // against arrival order) are both excluded by the strict bound.
    // BatchIndex resolves base segments + live dirs through the Hadoop
    // FS API (HDFS/S3-safe) and enforces the compaction horizon.
    val history = BatchIndex.historyBefore(spark, sigDir, batchId)
    // posting lists carry ONLY (id, band, hash) — candidate pairs are
    // deduped as bare id pairs and the 64-long signatures fetched by id
    // afterwards, same rule as the batch operators
    def posts(df: DataFrame, side: String): DataFrame =
      df.select(col("doc_id").as(s"${side}_id"),
        posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    // within-batch candidates: the SAME generator the batch operators
    // use (keep-first: new = larger id, old = smaller)
    val selfPairs = TextQueries.bandCollisionPairs(newSigs)
      .select(col("doc_b").as("new_id"), col("doc_a").as("old_id"))
    val pairs =
      history.map { hist =>
        selfPairs.unionByName(
          posts(newSigs, "new").join(posts(hist, "old"),
            Seq("band_idx", "band_hash"))
            // a re-delivered doc must not match its own indexed signature
            .filter(col("new_id") =!= col("old_id"))
            .select(col("new_id"), col("old_id")))
      }.getOrElse(selfPairs)
        .distinct()
    val oldSigs =
      history.map(h => newSigs.select("doc_id", "sig")
        .unionByName(h.select("doc_id", "sig")))
        .getOrElse(newSigs.select("doc_id", "sig"))
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
      .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
    newSigs.select("doc_id", "sig", "bands")
      .write.mode("overwrite").parquet(s"$sigDir/batch=$batchId")
    } finally newSigs.unpersist(blocking = false)
  }

  /** Streaming train-order novelty — qd48's stream twin: what fraction
    * of each incoming document's distinct word-3-grams has never been
    * seen in any EARLIER arrival? Same state argument as dedup: the
    * seen-gram set grows with the corpus and nothing ever expires, so
    * it lives in a disk-backed [[BatchIndex]] gram set, not executor
    * memory. Per batch: within-batch first occurrences (min doc_id, the
    * qd48 rule batch-locally) anti-join the strictly-prior gram
    * history; verdicts land in `outPath/batch=<id>` and only the
    * batch's UNSEEN grams append to the index (set membership is all
    * later batches need — the index is bounded by corpus-distinct
    * grams, not corpus volume). batchId-keyed overwrites + the
    * strictly-prior history bound make at-least-once replays no-ops.
    *
    * Parity contract (pinned by the spec): over batches arriving in
    * doc_id order, the union of verdicts equals batch qd48 exactly;
    * under out-of-order arrival the semantics are "first seen in
    * ARRIVAL order" — the honest streaming reading of train order.
    */
  def noveltyBatch(spark: SparkSession, batch: DataFrame, indexPath: String,
      outPath: String, batchId: Long): Unit = {
    graft.functions.VectorFunctions.registerNative(spark)
    val gramDir = s"$indexPath/grams"
    // persist: grams feed the verdict rollup AND the index write (the
    // processBatch persist/unpersist discipline, ADVICE r6)
    val g = TextQueries.gramSets(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      g.count()
      val firstInBatch = g
        .select(col("doc_id"), explode(col("grams")).as("gram"))
        .groupBy("gram").agg(min("doc_id").as("doc_id"))
      val fresh = BatchIndex.historyBefore(spark, gramDir, batchId)
        .map(h => firstInBatch.join(h.select("gram"), Seq("gram"), "left_anti"))
        .getOrElse(firstInBatch)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        fresh.count()
        val novel = fresh.groupBy("doc_id").agg(count(lit(1)).as("novel"))
        TextQueries.noveltyRollup(g, novel)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        fresh.select("gram")
          .write.mode("overwrite").parquet(s"$gramDir/batch=$batchId")
      } finally fresh.unpersist(blocking = false)
    } finally g.unpersist(blocking = false)
  }

  /** Stateless streaming decontamination: probe every incoming doc's
    * grams against the persisted eval-suite Bloom filter (qd13b's
    * artifact, rebuilt offline per eval-suite release). The filter is
    * resolved ONCE at stream start and rides into the incremental plan
    * as a literal, so this stage is a pure map — no state store, no
    * watermark, no shuffle, and exact parity with the batch operator
    * by construction (unlike dedup, decontamination needs no history:
    * the reference set is fixed, which is why THIS streaming shape is
    * trivially safe where dedup needed the disk-backed index).
    */
  def decontaminate(spark: SparkSession, docsStream: DataFrame,
      dir: String): DataFrame = {
    graft.functions.VectorFunctions.registerNative(spark)
    val bytes = TextQueries.bloomFilterBytes(spark, dir)
    // probe column is TextQueries.bloomProbe — the SAME definition the
    // batch qd13b selects, so gram derivation cannot drift between the
    // batch and streaming paths
    docsStream.select(col("doc_id"),
      TextQueries.bloomProbe(bytes).as("contaminated"))
  }

  /** Streaming CASCADE twin of batch qd13b (r13): the stateless Bloom
    * probe decides WHICH incoming docs pay the exact verify, and the
    * verify itself is map-only — the distinct doc grams intersected
    * against the (tiny, static) eval gram set riding in as a broadcast
    * one-row array via a stream-static join. No stateful aggregation,
    * no watermark, Append-mode safe: per-doc n_shared is a pure row
    * expression, so the stream stays exactly-once under replay for
    * free. Output (doc_id, n_shared, contaminated) is row-for-row
    * batch-qd13b parity on corpus docs (spec-pinned); eval-slice docs
    * flag by construction (their grams ARE the filter's content).
    *
    * Scale: the Bloom stage is the kilobyte constant the clean
    * majority pays; only survivors evaluate the intersect against the
    * eval array (the eval suite is fixed and small by hypothesis —
    * the same argument as bloomBuild's).
    */
  def decontaminateVerified(spark: SparkSession, docsStream: DataFrame,
      dir: String): DataFrame = {
    graft.functions.VectorFunctions.registerNative(spark)
    val bytes = TextQueries.bloomFilterBytes(spark, dir)
    val evalArr = broadcast(TextQueries.evalGrams(spark, dir)
      .agg(sort_array(collect_list(col("gram"))).as("eval_grams"))
      .withColumn("one", lit(1)))
    val grams = array_distinct(
      graft.functions.TextFunctions.wordGrams(
        graft.functions.TextFunctions.tokens(col("text")), 5))
    docsStream
      .withColumn("pre", TextQueries.bloomProbe(bytes))
      .withColumn("one", lit(1))
      .join(evalArr, Seq("one"), "left")
      .withColumn("n_shared",
        when(!col("pre"), lit(0L))
          .otherwise(size(array_intersect(grams, col("eval_grams"))).cast("long")))
      .select(col("doc_id"), col("n_shared"),
        (col("n_shared") > 0).as("contaminated"))
  }

  /** Bound the one-dir-per-microbatch index growth (safe after every
    * batch; see BatchIndex for the crash/replay invariants).
    */
  def compactIndex(spark: SparkSession, indexPath: String,
      keepLast: Int = 3, minEligible: Int = 8): Unit =
    BatchIndex.compact(spark, s"$indexPath/signatures", keepLast, minEligible)

  /** Same bound for the novelty gram set ([[noveltyBatch]]'s index). */
  def compactNoveltyIndex(spark: SparkSession, indexPath: String,
      keepLast: Int = 3, minEligible: Int = 8): Unit =
    BatchIndex.compact(spark, s"$indexPath/grams", keepLast, minEligible)

  /** Start the continuous dedup query (AvailableNow for drain-and-stop
    * runs; drop the trigger for a long-lived stream).
    */
  def start(spark: SparkSession, docsStream: DataFrame, indexPath: String,
      outPath: String, checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, indexPath, outPath, batchId)
        compactIndex(spark, indexPath)
      }
      .start()
}
