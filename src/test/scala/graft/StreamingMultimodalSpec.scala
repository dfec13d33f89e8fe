package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.EventsStreaming
import graft.multimodal.Multimodal

class StreamingMultimodalSpec extends AnyFunSuite {
  import SparkSpecBase.{spark, sf}

  test("streaming hourly agg matches batch q20 counts") {
    val stream = EventsStreaming.readEvents(spark, sf)
    val out = EventsStreaming.runToMemory(
      spark, EventsStreaming.hourlyAgg(stream), "hourly_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batch = queries.EventQueries.q20(spark, sf)
      .select("hour", "event_type", "n_events")
    // Append mode + watermark: windows inside the final watermark horizon
    // are not finalized when the source drains — exclude the last 3 hours.
    val cutoff = batch.agg(max("hour")).collect()(0).getString(0).take(13) + ":00:00"
    val horizon = java.time.LocalDateTime
      .parse(cutoff.replace(" ", "T")).minusHours(3).toString.replace("T", " ")
    val joined = out.select("hour", "event_type", "n_events")
      .join(batch.withColumnRenamed("n_events", "n_batch"), Seq("hour", "event_type"), "full_outer")
      .filter(col("hour") < horizon)
      .filter(col("n_events").isNull || col("n_batch").isNull ||
        col("n_events") =!= col("n_batch"))
    assert(joined.count() == 0, "stream/batch hourly counts diverge before watermark horizon")
    // and the stream must have emitted the overwhelming majority of windows
    assert(out.count() >= batch.count() - 20)
  }

  test("stateful sessionizer matches batch q19 session counts") {
    val stream = EventsStreaming.readEvents(spark, sf)
    val out = EventsStreaming.runToMemory(
      spark, EventsStreaming.sessionize(spark, stream), "sess_test")
    // memory sink in Update mode: last row per user wins
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    val last = out.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val batch = queries.EventQueries.q19(spark, sf)
      .select(col("user_id"), col("n_sessions").as("n_batch"))
    val joined = last.join(batch, Seq("user_id"), "full_outer")
      .filter(col("n_sessions").isNull || col("n_batch").isNull ||
        col("n_sessions") =!= col("n_batch"))
    assert(joined.count() == 0, "stream/batch session counts diverge")
  }

  test("streaming watermark dedup emits each event_id once") {
    val stream = EventsStreaming.readEvents(spark, sf)
    val out = EventsStreaming.runToMemory(
      spark, EventsStreaming.dedupeEvents(stream), "dedup_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batchDistinct = Tables.events(spark, sf).select("event_id").distinct().count()
    assert(out.count() == batchDistinct)
    assert(out.select("event_id").distinct().count() == out.count())
  }

  test("multimodal feature extraction: schema + deterministic stub decode") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val feats = Multimodal.extractFeatures(spark, media)
    val n = media.count()
    assert(feats.count() == n)
    val bad = feats.filter(f =>
      f.byte_len <= 0 || f.width < 1 || f.height < 1 ||
        (f.kind == "image" && f.channels != 3) ||
        (f.kind == "audio" && f.channels != 1) ||
        f.mean_intensity <= 0.0)
    assert(bad.count() == 0)
    // determinism: re-run produces identical rows
    val again = Multimodal.extractFeatures(spark, media)
    assert(feats.except(again).count() == 0)
  }

  test("qm1 media stats joins back to documents 1:1") {
    val stats = Multimodal.mediaStats(spark, sf)
    assert(stats.count() == Tables.documents(spark, sf).count())
    assert(stats.select("content_hash").distinct().count() == stats.count())
  }
}
