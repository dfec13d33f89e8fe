package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §7.5): media as opaque `binary`
  * columns + typed metadata, with decode/feature-extraction staged as
  * per-partition batch transforms.
  *
  * The container has no image/audio codecs, so `FakeDecoder` is a
  * clearly-marked deterministic stand-in — the Spark-side shapes (schema,
  * partition-level batching, feature struct) are real and tested. A
  * production decoder drops in by replacing `Decoder` only; nothing in
  * the plan changes.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the schema a 100 TB
    * media lake would carry; payloads in parquet binary or file pointers).
    */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      meta_source: String)

  case class MediaFeatures(media_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, channels: Int, mean_intensity: Double)

  /** Decode stage contract: payload bytes → (width, height, channels,
    * mean intensity). Real impl would wrap an image codec.
    */
  trait Decoder extends Serializable {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Double)
  }

  /** STUB decoder — deterministic fake: dimensions derived from payload
    * length, intensity from a byte average. Replace with a codec-backed
    * Decoder in production; everything else is unchanged.
    */
  object FakeDecoder extends Decoder {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Double) = {
      val n = payload.length
      val w = math.max(1, math.min(4096, n % 1021))
      val h = math.max(1, math.min(4096, n % 769))
      val c = if (kind == "image") 3 else 1
      val mean = if (n == 0) 0.0 else payload.map(b => (b & 0xff).toDouble).sum / n
      (w, h, c, mean)
    }
  }

  /** Build a media table from the documents corpus (text bytes as the
    * opaque payload) — the testdata stand-in for a binary media lake.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source").as("meta_source"))

  /** Decode/feature-extract as a per-partition batch transform
    * (mapPartitions ≈ the JVM twin of pandas-UDF batching: one decoder
    * instance per partition, rows streamed through it).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      decoder: Decoder = FakeDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val (w, h, c, mean) = decoder.decode(kind, payload)
          MediaFeatures(id, kind, payload.length, w, h, c, mean)
        }
      }
  }

  /** Resized media row: payload replaced by the resampled bytes. */
  case class ResizedMedia(media_id: Long, kind: String, width: Int, height: Int,
      payload: Array[Byte])

  /** Resampler contract (the resize stage's codec boundary). */
  trait Resampler extends Serializable {
    def resize(kind: String, payload: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** STUB resampler — deterministic fake: strided byte take sized w*h.
    * The partition-batched staging (one resampler per partition, rows
    * streamed) is the real contract; a codec-backed Resampler drops in.
    */
  object FakeResampler extends Resampler {
    def resize(kind: String, payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(1, w * h)
      if (payload.isEmpty) new Array[Byte](0)
      else Array.tabulate(math.min(target, payload.length))(i =>
        payload((i.toLong * payload.length / math.min(target, payload.length)).toInt
          .min(payload.length - 1)))
    }
  }

  /** Resize stage: per-partition batch transform to a fixed target
    * geometry — the schema/batching twin of a pandas-UDF image resize.
    */
  def resizeStage(spark: SparkSession, media: DataFrame, w: Int, h: Int,
      resampler: Resampler = FakeResampler): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          ResizedMedia(id, kind, w, h, resampler.resize(kind, payload, w, h))
        }
      }
  }

  /** Frame sampling, fully declarative (qm2): treat each document's text
    * as a framed stream of 256-character frames and keep every 4th frame
    * — sequence → filter → explode → substr, all codegen built-ins, no
    * UDF. Character frames (not bytes) deliberately: the oracle engine
    * cannot slice BLOBs, and character semantics agree exactly across
    * both engines (md5 over the frame's UTF-8 bytes).
    */
  def frameSample(spark: SparkSession, dir: String,
      frameChars: Int = 256, every: Int = 4): DataFrame =
    graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"), col("text"))
      .withColumn("nf", ceil(length(col("text")) / lit(frameChars.toDouble)).cast("int"))
      .withColumn("idxs",
        when(col("nf") > 0,
          filter(sequence(lit(0), col("nf") - 1), i => i % every === 0))
          .otherwise(array().cast("array<int>")))
      .select(col("media_id"), col("text"), explode(col("idxs")).as("frame_idx"))
      .withColumn("frame",
        col("text").substr(col("frame_idx") * frameChars + 1, lit(frameChars)))
      .select(
        col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
        length(col("frame")).as("frame_chars"),
        md5(encode(col("frame"), "UTF-8")).as("frame_hash"))

  val frameSampleSql: String =
    """SELECT media_id, CAST(i AS INT) AS frame_idx,
      | CAST(length(substring(text, CAST(i AS INT)*256 + 1, 256)) AS INT) AS frame_chars,
      | md5(substring(text, CAST(i AS INT)*256 + 1, 256)) AS frame_hash
      |FROM (SELECT doc_id AS media_id, text,
      |             CAST(ceil(length(text)/256.0) AS INT) AS nf FROM documents),
      | UNNEST(range(0, nf)) AS t(i)
      |WHERE i % 4 = 0""".stripMargin

  /** Oracle-checkable slice of the media pipeline: pure-SQL features
    * (byte length + content hash) — everything except the decode stub.
    */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    mediaFromDocuments(spark, dir)
      .select(
        col("media_id"), col("kind"),
        length(col("payload")).as("byte_len"),
        md5(col("payload")).as("content_hash"),
        col("meta_source"))

  val mediaStatsSql: String =
    """SELECT doc_id AS media_id,
      | CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
      | CAST(octet_length(encode(text)) AS INT) AS byte_len,
      | md5(text) AS content_hash,
      | source AS meta_source
      |FROM documents""".stripMargin
}
