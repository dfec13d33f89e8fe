package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions._
import graft.operators.Rounding.dround
import graft.queries.TextQueries

/** Streaming near-duplicate dedup of an EMBEDDING stream — the vector
  * twin of TextStreaming, at the realistic dedup operating point
  * (cos ≥ 0.8, 64×16 sign-LSH bands: near-linear candidates, < 1e-5
  * miss for a true cos-0.9 near-dup — qe4c's parameters). Same
  * architecture and for the same reason: dedup history is unevictable,
  * so state is a disk-backed index (vec_id, vector, norm, band
  * buckets), batchId-keyed for replay idempotence. Candidates come
  * from the band equi-join; verification is EXACT cosine — unlike
  * text (where re-fetching grams would mean re-reading documents), the
  * 64-dim vectors are compact enough that the index itself carries
  * them, so the verify costs one id-join, no source re-read.
  */
object VectorStreaming {

  private val BANDS = 64
  private val RBITS = 16

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("label", StringType),
    StructField("embedding", ArrayType(FloatType)),
  ))

  def readEmbeddings(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(embSchema).parquet(s"$dir/embeddings.parque[t]")

  /** Process one microbatch (exactly-once via batchId-keyed overwrite,
    * as in TextStreaming.processBatch). Verdicts: (vec_id, dup_of
    * nullable, cos nullable) under `outPath/batch=<id>`; index rows
    * (vec_id, vec, nrm, bands) under `indexPath/vectors/batch=<id>`.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, indexPath: String,
      outPath: String, batchId: Long, threshold: Double = 0.8): Unit = {
    registerNative(spark)
    val vecDir = s"$indexPath/vectors"
    // explicit persist + eager materialization, released in the finally
    // (a per-batch localCheckpoint would leak block-manager storage over
    // an unbounded stream — see TextStreaming.processBatch)
    val newVecs = batch
      .withColumn("vec", toDouble(col("embedding")))
      .withColumn("nrm", norm(col("vec")))
      .withColumn("bands", lshBandBuckets(col("vec"), BANDS, RBITS, 64))
      .select("vec_id", "vec", "nrm", "bands")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materializing count() inside the try: a failure here must still
    // hit the finally unpersist (ADVICE r6; see TextStreaming)
    try {
    newVecs.count()
    // strictly prior batches only — a replay must see exactly the
    // history its original run saw (see TextStreaming.processBatch);
    // base segments + live dirs resolved by BatchIndex
    val history = BatchIndex.historyBefore(spark, vecDir, batchId)
    def posts(df: DataFrame, side: String): DataFrame =
      df.select(col("vec_id").as(s"${side}_id"),
        posexplode(col("bands")).as(Seq("band", "bucket")))
    // within-batch: reuse the shared band-collision generator (rename
    // to its (doc_id, bands) contract), keep-first orientation
    val selfPairs = TextQueries.bandCollisionPairs(
        newVecs.select(col("vec_id").as("doc_id"), col("bands")))
      .select(col("doc_b").as("new_id"), col("doc_a").as("old_id"))
    val pairs =
      history.map { hist =>
        selfPairs.unionByName(
          posts(newVecs, "new").join(posts(hist, "old"), Seq("band", "bucket"))
            .filter(col("new_id") =!= col("old_id"))
            .select(col("new_id"), col("old_id")))
      }.getOrElse(selfPairs)
        .distinct()
    val allVecs =
      history.map(h => newVecs.select("vec_id", "vec", "nrm")
        .unionByName(h.select("vec_id", "vec", "nrm")))
        .getOrElse(newVecs.select("vec_id", "vec", "nrm"))
    val verdicts = pairs
      .join(newVecs.select(col("vec_id").as("new_id"),
        col("vec").as("va"), col("nrm").as("na")), Seq("new_id"))
      .join(allVecs.select(col("vec_id").as("old_id"),
        col("vec").as("vb"), col("nrm").as("nb")), Seq("old_id"))
      .withColumn("cos", dround(cosine(col("va"), col("vb"), col("na"), col("nb")), 6))
      .filter(col("cos") >= threshold)
      .groupBy(col("new_id").as("vec_id"))
      .agg(min(col("old_id")).as("dup_of"), max(col("cos")).as("cos"))
    newVecs.select("vec_id")
      .join(verdicts, Seq("vec_id"), "left")
      .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
    newVecs
      .write.mode("overwrite").parquet(s"$vecDir/batch=$batchId")
    } finally newVecs.unpersist(blocking = false)
  }

  /** Bound the one-dir-per-microbatch index growth (see BatchIndex). */
  def compactIndex(spark: SparkSession, indexPath: String,
      keepLast: Int = 3, minEligible: Int = 8): Unit =
    BatchIndex.compact(spark, s"$indexPath/vectors", keepLast, minEligible)

  def start(spark: SparkSession, embStream: DataFrame, indexPath: String,
      outPath: String, checkpoint: String): StreamingQuery =
    embStream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, indexPath, outPath, batchId)
        compactIndex(spark, indexPath)
      }
      .start()
}
