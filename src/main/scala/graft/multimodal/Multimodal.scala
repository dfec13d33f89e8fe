package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §7.5): media as opaque `binary`
  * columns + typed metadata, with decode/feature-extraction staged as
  * per-partition batch transforms.
  *
  * Decode is REAL: images via JDK `javax.imageio` (PNG/BMP/GIF/JPEG —
  * zero external deps), audio via JDK `javax.sound.sampled` (WAV/AU/
  * AIFF PCM). Fixtures are rendered deterministically from `doc_id` so
  * the decoded statistics have exact closed-form SQL oracles: the qm3/
  * qm4 gates round-trip the actual codecs (render → encode → decode →
  * aggregate) and compare bit-exact against DuckDB arithmetic.
  *
  * Reference analog: image/chart rendering in
  * /root/reference/src/reporte_pdf.py:97-193 (matplotlib render → PNG
  * bytes → embedded in a report); here the same binary-column shape is
  * decoded and featurized at scale instead.
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
    * mean intensity). For audio, width = frame count and height = 1.
    */
  trait Decoder extends Serializable {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Double)
  }

  /** JDK-codec decoder: `ImageIO` for images, `AudioSystem` for audio.
    * No executor disk cache (`setUseCache(false)`) — decode stays
    * in-memory per task. Headless-safe: raster access only, no display.
    */
  object JdkDecoder extends Decoder {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Double) =
      kind match {
        case "audio" => decodeAudio(payload)
        case _ => decodeImage(payload)
      }

    def decodeImage(payload: Array[Byte]): (Int, Int, Int, Double) = {
      ImageIO.setUseCache(false)
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, s"undecodable image payload (${payload.length} bytes)")
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val bands = raster.getNumBands
      // row-wise getPixels: one JNI-free bulk copy per scanline
      val row = new Array[Int](w * bands)
      var sum = 0.0
      var y = 0
      while (y < h) {
        raster.getPixels(0, y, w, 1, row)
        var i = 0
        var rowSum = 0L
        while (i < row.length) { rowSum += row(i); i += 1 }
        sum += rowSum.toDouble
        y += 1
      }
      (w, h, bands, sum / (w.toLong * h * bands))
    }

    def decodeAudio(payload: Array[Byte]): (Int, Int, Int, Double) = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val frames = ais.getFrameLength.toInt
        val bytes = ais.readAllBytes()
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
        (frames, 1, fmt.getChannels, if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length)
      } finally ais.close()
    }
  }

  // ---- deterministic fixtures -------------------------------------------
  // Rendered from doc_id alone so every decoded statistic has an exact
  // closed form the DuckDB oracle can compute without any codec.

  /** Checkerboard PNG: even width (equal a/b pixel counts per row) so the
    * gray mean is exactly (a+b)/2; all three channels carry the same
    * value. PNG is lossless → decode recovers the render bit-exact.
    */
  def pngPayload(id: Long): Array[Byte] = {
    val w = (16 + (id % 16) * 2).toInt // even: 16..46
    val h = (8 + id % 8).toInt // 8..15
    val a = (id % 256).toInt
    val b = ((id * 7) % 256).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = if (((x + y) & 1) == 0) a else b
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.setUseCache(false)
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Sawtooth WAV (8-bit unsigned PCM mono): a whole number of 256-sample
    * periods of the permutation (id+i) mod 256 — every sample is read to
    * verify the sum, which is exactly 32640 per period.
    */
  def wavPayload(id: Long): Array[Byte] = {
    val periods = (2 + id % 3).toInt
    val n = 256 * periods
    val samples = Array.tabulate(n)(i => ((id + i) % 256).toByte)
    val fmt = new AudioFormat(8000f, 8, 1, false, false) // unsigned 8-bit mono
    val ais = new AudioInputStream(new ByteArrayInputStream(samples), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Synthetic media lake over the documents ids: even ids carry a real
    * PNG payload, odd ids a real WAV payload. The test-scale stand-in for
    * a binary media column read straight from parquet.
    */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          if (id % 2 == 0) MediaRow(id, "image", pngPayload(id), "synthetic")
          else MediaRow(id, "audio", wavPayload(id), "synthetic")
        }
      }.toDF()
  }

  /** Build a media table from the documents corpus (text bytes as the
    * opaque payload) — the opaque-binary-column stand-in used by the
    * qm1 stats slice (no decode).
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
      decoder: Decoder = JdkDecoder): Dataset[MediaFeatures] = {
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

  /** JDK Java2D resampler: decode → bilinear scale → lossless PNG
    * re-encode. Deterministic within a JVM; headless-safe.
    */
  object ImageIoResampler extends Resampler {
    def resize(kind: String, payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      ImageIO.setUseCache(false)
      val src = ImageIO.read(new ByteArrayInputStream(payload))
      require(src != null, s"undecodable $kind payload (${payload.length} bytes)")
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }
  }

  /** Resize stage: per-partition batch transform to a fixed target
    * geometry — the schema/batching twin of a pandas-UDF image resize.
    */
  def resizeStage(spark: SparkSession, media: DataFrame, w: Int, h: Int,
      resampler: Resampler = ImageIoResampler): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          ResizedMedia(id, kind, w, h, resampler.resize(kind, payload, w, h))
        }
      }
  }

  /** qm3: real image decode gate — render deterministic PNGs, decode
    * them through the JDK codec, emit per-image pixel statistics. The
    * oracle recomputes every statistic arithmetically: width/height from
    * the id formulas, mean = (a+b)/2 exactly (even-width checkerboard).
    * byte_len is PNG-encoder-dependent and deliberately excluded.
    */
  def imageDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, c, mean) = JdkDecoder.decodeImage(pngPayload(id))
          (id, w, h, c, mean)
        }
      }.toDF("media_id", "width", "height", "channels", "mean_intensity")
  }

  val imageDecodeSql: String =
    """SELECT doc_id AS media_id,
      | CAST(16 + (doc_id % 16) * 2 AS INT) AS width,
      | CAST(8 + doc_id % 8 AS INT) AS height,
      | 3 AS channels,
      | ((doc_id % 256) + ((doc_id * 7) % 256)) / 2.0 AS mean_intensity
      |FROM documents""".stripMargin

  /** qm4: real audio decode gate — deterministic sawtooth WAVs decoded
    * through `AudioSystem`; frame count, channel layout, sample rate,
    * and the full-stream amplitude sum all have exact closed forms
    * (sum of one 256-period = 0+1+…+255 = 32640).
    */
  def audioDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val ais = AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(wavPayload(id)))
          try {
            val fmt = ais.getFormat
            val frames = ais.getFrameLength.toInt
            val bytes = ais.readAllBytes()
            var sum = 0L
            var i = 0
            while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
            (id, frames, fmt.getChannels, fmt.getSampleRate.toInt,
              sum, sum.toDouble / frames)
          } finally ais.close()
        }
      }.toDF("media_id", "n_frames", "channels", "sample_rate",
        "sum_amplitude", "mean_amplitude")
  }

  val audioDecodeSql: String =
    """SELECT doc_id AS media_id,
      | CAST(256 * (2 + doc_id % 3) AS INT) AS n_frames,
      | 1 AS channels,
      | 8000 AS sample_rate,
      | CAST(32640 * (2 + doc_id % 3) AS BIGINT) AS sum_amplitude,
      | 127.5 AS mean_amplitude
      |FROM documents""".stripMargin

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
    * (byte length + content hash) over the opaque-binary media table.
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

  /** qm5: shot-boundary detection over the framed stream — per-media,
    * the dissimilarity between each CONSECUTIVE frame pair (1 − Jaccard
    * of the frames' distinct token sets), with a boundary flag where
    * content shifts past the threshold. This is the cut-detection pass
    * a video pipeline runs before per-shot sampling (qm2 keeps every
    * k-th frame; shot-aware sampling keeps one per detected cut) —
    * frame features and pairwise distance are declarative built-ins
    * over the same 256-char framing qm2 defines, no UDF.
    *
    * Shape: frames explode map-side; the consecutive pairing is a lead()
    * window partitioned BY MEDIA (frame counts per asset are bounded, so
    * partitions are tiny and uniform — never a global window); one
    * shuffle on media_id. Full DuckDB oracle.
    */
  def shotBoundaries(spark: SparkSession, dir: String,
      frameChars: Int = 256, threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"), col("text"))
      .withColumn("nf", ceil(length(col("text")) / lit(frameChars.toDouble)).cast("int"))
      .filter(col("nf") > 1) // single-frame media has no cuts by definition
      .select(col("media_id"), col("text"),
        explode(sequence(lit(0), col("nf") - 1)).as("frame_idx"))
      .withColumn("words", array_distinct(split(
        trim(col("text").substr(col("frame_idx") * frameChars + 1, lit(frameChars))),
        " +")))
      .select("media_id", "frame_idx", "words")
    val w = Window.partitionBy("media_id").orderBy("frame_idx")
    frames
      .withColumn("next_words", lead("words", 1).over(w))
      .filter(col("next_words").isNotNull)
      .withColumn("dist", graft.operators.Rounding.dround(
        lit(1.0) - size(array_intersect(col("words"), col("next_words")))
          / size(array_union(col("words"), col("next_words"))).cast("double"), 6))
      .select(
        col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
        col("dist"), (col("dist") > threshold).as("boundary"))
  }

  /** qm6: windowed audio energy + silence detection — the VAD-style
    * pre-filter an audio curation pipeline runs before transcription
    * (drop silent/near-silent spans, keep speech-dense ones): decode the
    * WAV through `AudioSystem` (the real codec path, same as qm4), cut
    * the sample stream into fixed 128-sample windows, and score each
    * window's mean amplitude against a quiet threshold. Because the
    * fixture sawtooth is the permutation (id+i) mod 256, every window
    * sum has a closed form in (id + 128k) mod 256 — so the whole
    * decode → window → flag pipeline is hash-checked end to end, not
    * just plumbing-tested.
    *
    * Shape: decode is a per-partition batch transform (one codec
    * instance per partition); windows flat-map out map-side, bounded
    * per asset — no shuffle at all until a downstream consumer groups.
    */
  def audioEnergy(spark: SparkSession, dir: String, winSamples: Int = 128,
      quietMean: Double = 96.0): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val ais = AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(wavPayload(id)))
          val bytes = try ais.readAllBytes() finally ais.close()
          val nw = bytes.length / winSamples
          (0 until nw).map { k =>
            var sum = 0L
            var i = k * winSamples
            val end = i + winSamples
            while (i < end) { sum += (bytes(i) & 0xff); i += 1 }
            // /128 = /2^7: exact in double, no rounding discipline needed
            (id, k, sum, sum.toDouble / winSamples)
          }
        }
      }.toDF("media_id", "win_idx", "win_sum", "mean_amp")
      .withColumn("is_quiet", col("mean_amp") < quietMean)
  }

  /** Closed form for qm6's window sums: the 128 samples starting at
    * offset 128k of the (id+i) mod 256 sawtooth begin at s =
    * (id + 128k) mod 256; without wraparound (s <= 128) the run sums to
    * 128s + 8128, with wraparound it splits at 255/0.
    */
  /** qm7: perceptual-hash image dedup — a 64-bit block-mean hash (the
    * aHash family) computed from the REAL decoded raster: global mean
    * intensity, then an 8x8 grid of sampled pixels, bit = sample > mean,
    * rendered as a 64-char bit string (no 1<<63 sign games). Images with
    * equal hashes are perceptual duplicates; `keep` marks the min-id
    * canonical per hash bucket. The checkerboard fixtures make every bit
    * a closed form of doc_id, so the whole decode → hash → bucket chain
    * is DuckDB-oracle-graded end to end.
    *
    * Scale: decode + hash is partition-local map work (the mapInPandas /
    * mapPartitions batch shape); the dedup is one hash-partitioned
    * window on a 16-byte key — the qd1 exact-dedup shape, applied to
    * pixels instead of text.
    */
  /** Block-mean 64-bit perceptual hash of a decoded raster (the qm7
    * kernel, shared with qm9's rendition pipeline).
    */
  private def phashOf(img: BufferedImage): String = {
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val bands = raster.getNumBands
    val row = new Array[Int](w * bands)
    var sum = 0L
    var y = 0
    while (y < h) {
      raster.getPixels(0, y, w, 1, row)
      var i = 0
      while (i < row.length) { sum += row(i); i += 1 }
      y += 1
    }
    val mean = sum.toDouble / (w.toLong * h * bands)
    val bits = new StringBuilder(64)
    var k = 0
    while (k < 64) {
      val px = (k % 8) * w / 8
      val py = (k / 8) * h / 8
      bits.append(if (raster.getSample(px, py, 0) > mean) '1' else '0')
      k += 1
    }
    bits.toString
  }

  def imagePhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val hashed = graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { id =>
          (id, phashOf(ImageIO.read(new ByteArrayInputStream(pngPayload(id)))))
        }
      }.toDF("media_id", "phash")
    val w = Window.partitionBy("phash")
    hashed
      .withColumn("n_same_hash", count(lit(1)).over(w))
      .withColumn("keep", col("media_id") === min("media_id").over(w))
  }

  /** The closed-form phash of the synthetic raster (shared by the qm7
    * and qm9 oracles).
    */
  private val phashCoreSql: String =
    """SELECT doc_id AS media_id,
      |    array_to_string(list_transform(range(0, 64), k ->
      |      CASE WHEN (CASE WHEN ((((k % 8) * (16 + (doc_id % 16) * 2)) // 8)
      |                            + (((k // 8) * (8 + doc_id % 8)) // 8)) % 2 = 0
      |                      THEN doc_id % 256 ELSE (doc_id * 7) % 256 END)
      |                 > ((doc_id % 256) + ((doc_id * 7) % 256)) / 2.0
      |            THEN '1' ELSE '0' END), '') AS phash
      |  FROM documents""".stripMargin

  val imagePhashSql: String =
    s"""SELECT media_id, phash,
       | CAST(count(*) OVER (PARTITION BY phash) AS BIGINT) AS n_same_hash,
       | media_id = min(media_id) OVER (PARTITION BY phash) AS keep
       |FROM (
       |  $phashCoreSql)""".stripMargin

  /** qm9: perceptual NEAR-duplicate pairs — qm7's bucket dedup only
    * sees bit-identical hashes; re-encodes and light edits land 1-3
    * bits away and survive it. The media lake here holds each original
    * PLUS a re-encoded rendition produced by a REAL raster edit
    * (decode → repaint the sampled pixel of 1-3 hash cells to the
    * opposite tone → rehash), so the near relation is genuine decoded-
    * pixel distance, while staying closed-form for the oracle: pixel
    * values remain in the original two-tone set, the block mean stays
    * strictly between the tones, and exactly the repainted cells flip
    * (ids with a degenerate single-tone raster, id % 128 == 0, yield a
    * bit-identical rendition and correctly produce no near pair).
    *
    * The exact→near cascade collapses exact-duplicate classes to their
    * canonical FIRST (qm7 owns exact classes — and the synthetic
    * corpus has large ones, which would otherwise explode the join
    * quadratically), then generates candidates by multi-index Hamming
    * blocking (Norouzi et al., "Fast Search in Hamming Space with
    * Multi-Index Hashing"): the 64-bit hash splits into 4 bands of 16
    * bits, and by pigeonhole ANY pair within Hamming distance 3 agrees
    * on at least one whole band — the band equi-join has STRUCTURAL
    * recall 1.0 at the [[PhashMaxHamming]]=3 threshold, so the oracle
    * can use the identical blocking without losing pairs.
    *
    * Scale: the inverted band index is one hash shuffle on (band,
    * 16-bit value) over DISTINCT hashes; candidate volume is bounded
    * by band-bucket sizes (the qd6b/qd34 inverted-index discipline),
    * never all-pairs; the decode+edit runs once, partition-local.
    */
  private val PhashMaxHamming = 3
  private val RendOffset = 1000000000L

  def imagePhashNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val assets = graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.flatMap { id =>
          val img = ImageIO.read(new ByteArrayInputStream(pngPayload(id)))
          val orig = phashOf(img)
          // rendition: repaint the sampled pixel of bits
          // (id%64 + j) % 64, j ≤ id%3, to the opposite tone — a REAL
          // raster edit on the decoded image, then rehash
          val (w, h) = (img.getWidth, img.getHeight)
          val (a, b) = ((id % 256).toInt, ((id * 7) % 256).toInt)
          var j = 0L
          while (j <= id % 3) {
            val k = ((id % 64 + j) % 64).toInt
            val px = (k % 8) * w / 8
            val py = (k / 8) * h / 8
            val v = img.getRaster.getSample(px, py, 0)
            val o = a + b - v
            img.setRGB(px, py, (o << 16) | (o << 8) | o)
            j += 1
          }
          Seq((id, orig), (id + RendOffset, phashOf(img)))
        }
      }.toDF("media_id", "phash")
    // exact→near cascade: collapse exact-duplicate classes to their
    // canonical first (qm7 owns exact classes), then band-join the
    // DISTINCT hashes
    val canon = assets.groupBy("phash").agg(min("media_id").as("media_id"))
    val bands = canon.select(col("media_id"), col("phash"), explode(expr(
      "transform(sequence(0, 3), b -> struct(b as band, " +
        "substring(phash, b * 16 + 1, 16) as bv))")).as("bd"))
      .select(col("media_id"), col("phash"), col("bd.band").as("band"),
        col("bd.bv").as("bv"))
    val l = bands.select(col("band"), col("bv"),
      col("media_id").as("media_a"), col("phash").as("ph_a"))
    val r = bands.select(col("band"), col("bv"),
      col("media_id").as("media_b"), col("phash").as("ph_b"))
    l.join(r, Seq("band", "bv"))
      .filter(col("media_a") < col("media_b"))
      .select("media_a", "media_b", "ph_a", "ph_b").distinct()
      .withColumn("hamming", expr(
        "size(filter(sequence(1, 64), " +
          "i -> substring(ph_a, i, 1) <> substring(ph_b, i, 1)))").cast("int"))
      .filter(col("hamming") >= 1 && col("hamming") <= PhashMaxHamming)
      .select("media_a", "media_b", "hamming")
  }

  val imagePhashNeardupSql: String =
    s"""WITH orig AS (
       |  $phashCoreSql),
       |rend AS (
       |  SELECT orig.media_id + $RendOffset AS media_id,
       |    array_to_string(list_transform(range(0, 64), k ->
       |      CASE WHEN orig.media_id % 256 <> (orig.media_id * 7) % 256
       |                AND ((k - orig.media_id % 64) % 64 + 64) % 64
       |                    <= orig.media_id % 3
       |           THEN (CASE substring(phash, CAST(k + 1 AS INT), 1)
       |                 WHEN '1' THEN '0' ELSE '1' END)
       |           ELSE substring(phash, CAST(k + 1 AS INT), 1) END), '') AS phash
       |  FROM orig),
       |assets AS (SELECT media_id, phash FROM rend
       |           UNION ALL SELECT media_id, phash FROM orig),
       |canon AS (SELECT min(media_id) AS media_id, phash
       |          FROM assets GROUP BY phash),
       |bands AS (
       |  SELECT media_id, phash, unnest(range(0, 4)) AS band FROM canon),
       |bv AS (
       |  SELECT media_id, phash, band,
       |         substring(phash, CAST(band * 16 + 1 AS INT), 16) AS bval
       |  FROM bands),
       |cand AS (
       |  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
       |         a.phash AS ph_a, b.phash AS ph_b
       |  FROM bv a JOIN bv b ON a.band = b.band AND a.bval = b.bval
       |   AND a.media_id < b.media_id),
       |scored AS (
       |  SELECT media_a, media_b,
       |    CAST(len(list_filter(range(1, 65),
       |      i -> substring(ph_a, CAST(i AS INT), 1)
       |           <> substring(ph_b, CAST(i AS INT), 1))) AS INT) AS hamming
       |  FROM cand)
       |SELECT media_a, media_b, hamming FROM scored
       |WHERE hamming BETWEEN 1 AND $PhashMaxHamming""".stripMargin

  /** qm8: corruption quarantine — every payload is pushed through the
    * REAL codec and classified healthy/corrupt by whether decode
    * succeeds; the quarantine verdict plus the error class is what a
    * media-lake ingest job writes before anything downstream touches
    * the binary column (a truncated file must die here, not inside a
    * 1000-executor training job). Corruption is planted
    * deterministically (doc_id % 97 == 0 payloads truncated to 10
    * bytes), so the verdict has a closed-form oracle while the decode
    * attempt itself is genuine.
    *
    * Scale: partition-local try-decode (same batch shape as qm3/qm4);
    * output one row per asset. The catch is Exception-narrow — a JVM
    * error still fails the job, as it should.
    */
  def mediaCorruption(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { id =>
          val kind = if (id % 2 == 0) "image" else "audio"
          val full =
            if (id % 2 == 0) pngPayload(id) else wavPayload(id)
          val payload = if (id % 97 == 0) full.take(10) else full
          val ok =
            try { JdkDecoder.decode(kind, payload); true }
            catch { case _: Exception => false }
          (id, kind, payload.length, !ok)
        }
      }.toDF("media_id", "kind", "byte_len", "is_corrupt")
      .select(col("media_id"), col("kind"), col("is_corrupt"))
  }

  val mediaCorruptionSql: String =
    """SELECT doc_id AS media_id,
      | CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
      | doc_id % 97 = 0 AS is_corrupt
      |FROM documents""".stripMargin

  val audioEnergySql: String =
    """WITH w AS (
      |  SELECT doc_id AS media_id,
      |         CAST(k AS INT) AS win_idx,
      |         (doc_id + 128 * k) % 256 AS s
      |  FROM documents, UNNEST(range(0, 2 * (2 + doc_id % 3))) AS t(k)),
      |e AS (
      |  SELECT media_id, win_idx,
      |         CAST(CASE WHEN s <= 128 THEN 128 * s + 8128
      |              ELSE 32640 - s * (s - 1) // 2
      |                   + (s - 128) * (s - 129) // 2 END AS BIGINT) AS win_sum
      |  FROM w)
      |SELECT media_id, win_idx, win_sum,
      |       win_sum / 128.0 AS mean_amp,
      |       win_sum / 128.0 < 96.0 AS is_quiet
      |FROM e""".stripMargin

  val shotBoundariesSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id, text,
      |         CAST(ceil(length(text)/256.0) AS INT) AS nf
      |  FROM documents),
      |f AS (
      |  SELECT media_id,
      |         CAST(i AS INT) AS frame_idx,
      |         list_distinct(regexp_split_to_array(
      |           trim(substring(text, CAST(i AS INT)*256 + 1, 256)), ' +')) AS words
      |  FROM (SELECT media_id, text, nf, unnest(range(0, nf)) AS i
      |        FROM m WHERE nf > 1)),
      |p AS (
      |  SELECT media_id, frame_idx, words,
      |         lead(words) OVER (PARTITION BY media_id ORDER BY frame_idx)
      |           AS next_words
      |  FROM f)
      |SELECT media_id, frame_idx,
      |  round(1.0 - len(list_intersect(words, next_words))
      |          / CAST(len(list_distinct(words || next_words)) AS DOUBLE), 6) AS dist,
      |  round(1.0 - len(list_intersect(words, next_words))
      |          / CAST(len(list_distinct(words || next_words)) AS DOUBLE), 6) > 0.5
      |    AS boundary
      |FROM p WHERE next_words IS NOT NULL""".stripMargin
}
