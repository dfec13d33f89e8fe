package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.{EventsStreaming, TextStreaming}
import graft.multimodal.Multimodal
import graft.operators.EventTime

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

  test("closed-session stream emits exact batch sessions, exhaustively past the horizon") {
    val stream = EventsStreaming.readEvents(spark, sf)
    val out = EventsStreaming.runToMemory(
      spark, EventsStreaming.closedSessions(spark, stream), "closed_sess_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batchEvents = Tables.events(spark, sf)
    val twin = EventsStreaming.sessionsBatch(batchEvents)
    assert(out.count() > 0, "fixture should close at least one session")
    // append-mode contract: every emitted row IS a batch session, once
    assert(out.exceptAll(twin).count() == 0,
      "stream emitted a session the batch twin doesn't have")
    assert(out.count() == out.distinct().count(), "a session was emitted twice")
    // completeness: every session whose inactivity horizon (gap 1 h)
    // plus the watermark delay (2 h) lies strictly before the final
    // watermark MUST have been closed — in-batch or by event-time
    // timeout in the trailing no-data microbatch. Sessions nearer the
    // stream's end may legitimately still be open.
    val maxUs = EventTime.withUs(batchEvents).agg(max("us")).collect()(0).getLong(0)
    val horizonUs = maxUs - 3L * 3600L * 1000000L
    val mustClose = twin.filter(col("end_us") < horizonUs)
    assert(mustClose.exceptAll(out).count() == 0,
      "a session past the watermark+gap horizon was never closed")
  }

  test("streaming funnel matches batch q30 exactly on an in-order stream") {
    val stream = EventsStreaming.readEvents(spark, sf)
    val out = EventsStreaming.runToMemory(
      spark, EventsStreaming.funnelStages(spark, stream), "funnel_test")
    // update-mode end state per user: stage only deepens, v_us only
    // decreases, c_us/p_us are write-once — so max/min aggregates ARE
    // the final row even if several batches emitted updates
    val last = out.groupBy("user_id").agg(
      min("v_us").as("v_us"), min("c_us").as("c_us"), min("p_us").as("p_us"),
      max("stage").as("stage"))
    val batch = queries.EventQueries.q30(spark, sf)
      .select("user_id", "v_us", "c_us", "p_us", "stage")
    assert(last.count() == batch.count())
    assert(last.exceptAll(batch).count() == 0 &&
      batch.exceptAll(last).count() == 0,
      "stream/batch funnel states diverge")
  }

  test("streaming funnel carries stage state across microbatches") {
    // two time-halves as ordered microbatches: a funnel whose view lands
    // in batch 1 and whose click/purchase land in batch 2 must convert
    // from carried state, and the end table must still equal batch q30
    val dir = java.nio.file.Files.createTempDirectory("funnel_two_batches").toFile
    val ev = EventTime.withUs(Tables.events(spark, sf))
    val cutUs = ev.agg(expr("percentile_approx(us, 0.5)")).collect()(0).getLong(0)
    ev.filter(col("us") <= cutUs).drop("us").coalesce(1)
      .write.parquet(s"$dir/half1")
    ev.filter(col("us") > cutUs).drop("us").coalesce(1)
      .write.parquet(s"$dir/half2")
    val files = Seq("half1", "half2").map { h =>
      new java.io.File(s"$dir/$h").listFiles()
        .find(_.getName.endsWith(".parquet")).get
    }
    files.zipWithIndex.foreach { case (f, i) =>
      val dst = new java.io.File(dir, s"part$i.parquet")
      java.nio.file.Files.move(f.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 600000L)
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val halfSchema = spark.read.parquet(s"$dir/part0.parquet").schema
    val stream = EventTime.withUs(spark.readStream
        .schema(halfSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/part*.parquet"))
      .withColumn("ts_ts", timestamp_micros(col("us")))
    val out = EventsStreaming.runToMemory(
      spark, EventsStreaming.funnelStages(spark, stream), "funnel_2b")
    val last = out.groupBy("user_id").agg(
      min("v_us").as("v_us"), min("c_us").as("c_us"), min("p_us").as("p_us"),
      max("stage").as("stage"))
    val batch = queries.EventQueries.q30(spark, sf)
      .select("user_id", "v_us", "c_us", "p_us", "stage")
    assert(last.exceptAll(batch).count() == 0 &&
      batch.exceptAll(last).count() == 0,
      "a funnel split across microbatches lost or forged a stage")
    // the cross-batch path was actually exercised: some user must have
    // deepened its stage between the two batches (two distinct rows)
    assert(out.groupBy("user_id").count().filter(col("count") > 1).count() > 0,
      "no user was updated in both microbatches — the split is vacuous")
  }

  test("streaming anomaly detector equals the prefix-batch twin, exhaustively past the horizon") {
    val stream = EventsStreaming.readEvents(spark, sf)
    val out = EventsStreaming.runToMemory(
      spark, EventsStreaming.anomalyStream(spark, stream), "anomaly_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batchEvents = Tables.events(spark, sf)
    val twin = EventsStreaming.anomaliesPrefixBatch(batchEvents)
    assert(out.count() > 0, "the stream should close at least one hour")
    // append contract: every emitted row IS a prefix-twin row, once —
    // hours close oldest-first, so the stream's fold moments equal the
    // batch window over strictly-earlier hours
    assert(out.exceptAll(twin).count() == 0,
      "stream scored an hour differently than the prefix twin")
    assert(out.count() == out.distinct().count(), "an hour was emitted twice")
    // completeness: every hour whose end + the 2 h watermark delay lies
    // before the final watermark must have been closed and scored
    val maxUs = EventTime.withUs(batchEvents).agg(max("us")).collect()(0).getLong(0)
    val mustClose = twin
      .withColumn("hus", unix_micros(to_timestamp(col("hour"))))
      .filter(col("hus") + lit(3L * 3600L * 1000000L) <= maxUs)
      .drop("hus")
    assert(mustClose.exceptAll(out).count() == 0,
      "an hour past the watermark horizon was never scored")
  }

  test("streaming EWMA equals the q40 batch operator row-for-row past the horizon") {
    val stream = EventsStreaming.readEvents(spark, sf)
    val out = EventsStreaming.runToMemory(
      spark, EventsStreaming.ewmaStream(spark, stream), "ewma_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batchEvents = Tables.events(spark, sf)
    val hourly = EventTime.withUs(batchEvents)
      .select(col("event_type"), expr("us div 3600000000").as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("n_events"))
    val twin = queries.EventQueries.ewmaFrom(spark, hourly)
    assert(out.count() > 0, "the stream should close at least one hour")
    // q40's EWMA is already prefix-semantics, so emitted rows must equal
    // the BATCH operator's rows exactly (not a weaker prefix variant)
    assert(out.exceptAll(twin).count() == 0,
      "stream scored an hour differently than the q40 batch operator")
    assert(out.count() == out.distinct().count(), "an hour was emitted twice")
    // completeness: every hour past the watermark horizon must be scored
    val maxUs = EventTime.withUs(batchEvents).agg(max("us")).collect()(0).getLong(0)
    val mustClose = twin.filter(
      (col("hr") + 1) * lit(3600L * 1000000L) + lit(2L * 3600L * 1000000L) <= maxUs)
    assert(mustClose.exceptAll(out).count() == 0,
      "an hour past the watermark horizon was never scored")
  }

  test("anomaly/EWMA streams drop a late replay of an already-closed hour") {
    // ADVICE r10: a row arriving past the watermark for an hour that
    // already closed must be DISCARDED, or the hour would close a
    // second time (duplicate append row) and double-fold into the
    // anomaly moments. Two layers deliver this: Spark's own
    // sub-watermark row filter under EventTimeTimeout, and the
    // lastClosed guard in state (which keeps emit-once true even if
    // the engine-level filter changes). This spec pins the CONTRACT,
    // whichever layer enforces it.
    // Three ordered microbatches: hours 0-6; then hour 9 (advances the
    // watermark past hours 0-3's close); then a LATE hour-0 replay
    // (arriving when hour 0 is already closed) plus hour 10.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("late_replay").toFile
    val hourNs = 3600L * 1000000000L
    val baseNs = 1709251200L * 1000000000L // 2024-03-01T00:00Z
    def ev(ids: Seq[(Long, Long)]) = ids.map { case (id, h) =>
      (id, baseNs + h * hourNs + 1000L, 1L, "x", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val batches = Seq(
      ev((0L to 6L).map(h => (h, h))),
      ev(Seq((7L, 9L))),
      ev(Seq((8L, 0L), (9L, 10L)))) // the late hour-0 replay
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmp = s"$dir/b$i"
      df.coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, s"part$i.parquet")
      java.nio.file.Files.move(f.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 600000L)
    }
    val stream = EventTime.withUs(spark.readStream
        .schema(EventsStreaming.eventSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/part*.parquet"))
      .withColumn("ts_ts", timestamp_micros(col("us")))
    val anom = EventsStreaming.runToMemory(
      spark, EventsStreaming.anomalyStream(spark, stream), "anomaly_late",
      org.apache.spark.sql.streaming.OutputMode.Append())
    // hours 0..6 close exactly once each, all with n_events=1 — the
    // replay neither duplicates hour 0 nor inflates its count
    assert(anom.count() == 7, s"expected 7 closed hours, got ${anom.count()}")
    assert(anom.groupBy("hour").count().filter(col("count") > 1).count() == 0,
      "an hour was emitted twice after a late replay")
    assert(anom.filter(col("n_events") =!= 1).count() == 0,
      "a late replay was folded into a closed hour's count")
    val ewma = EventsStreaming.runToMemory(
      spark, EventsStreaming.ewmaStream(spark, stream), "ewma_late",
      org.apache.spark.sql.streaming.OutputMode.Append())
    assert(ewma.count() == 7)
    assert(ewma.groupBy("hr").count().filter(col("count") > 1).count() == 0,
      "EWMA emitted an hour twice after a late replay")
    assert(ewma.filter(col("n_events") =!= 1).count() == 0)
  }

  test("closed sessions survive multi-batch streams: state carries across microbatches") {
    // split the events table into two time-halves, streamed as two
    // microbatches (maxFilesPerTrigger=1, modTimes force the order) —
    // sessions spanning the cut must continue from carried state, and
    // batch-1 sessions whose horizon the batch-2 watermark passes must
    // close by event-time timeout, not stay open forever
    val dir = java.nio.file.Files.createTempDirectory("sess_two_batches").toFile
    val ev = EventTime.withUs(Tables.events(spark, sf))
    val cutUs = ev
      .agg(expr("percentile_approx(us, 0.5)")).collect()(0).getLong(0)
    ev.filter(col("us") <= cutUs).drop("us").coalesce(1)
      .write.parquet(s"$dir/half1")
    ev.filter(col("us") > cutUs).drop("us").coalesce(1)
      .write.parquet(s"$dir/half2")
    val files = Seq("half1", "half2").map { h =>
      new java.io.File(s"$dir/$h").listFiles()
        .find(_.getName.endsWith(".parquet")).get
    }
    files.zipWithIndex.foreach { case (f, i) =>
      val dst = new java.io.File(dir, s"part$i.parquet")
      java.nio.file.Files.move(f.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 600000L)
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // declare whatever physical ts type the written halves carry
    val halfSchema = spark.read.parquet(s"$dir/part0.parquet").schema
    val stream = EventTime.withUs(spark.readStream
      .schema(halfSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/part*.parquet"))
      .withColumn("ts_ts", timestamp_micros(col("us")))
    val out = EventsStreaming.runToMemory(
      spark, EventsStreaming.closedSessions(spark, stream), "closed_sess_2b",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val twin = EventsStreaming.sessionsBatch(Tables.events(spark, sf))
    assert(out.count() > 0)
    assert(out.exceptAll(twin).count() == 0,
      "a session split across microbatches was emitted fragmented or duplicated")
    assert(out.count() == out.distinct().count())
    val maxUs = EventTime.withUs(Tables.events(spark, sf))
      .agg(max("us")).collect()(0).getLong(0)
    val mustClose = twin.filter(col("end_us") < maxUs - 3L * 3600L * 1000000L)
    assert(mustClose.exceptAll(out).count() == 0,
      "a closed-horizon session was lost across the batch boundary")
  }

  test("closed-session stream at sf0.1: exact batch sessions against the real events table") {
    // VERDICT r8 item 4: the r8 closed-session additions were exercised
    // only at fixture scale — this runs the soak path against the real
    // sf0.1 events table (~10x the gate's volume, the bench's sf).
    val dir01 = "/root/testdata/sf0.1"
    val stream = EventsStreaming.readEvents(spark, dir01)
    val out = EventsStreaming.runToMemory(
      spark, EventsStreaming.closedSessions(spark, stream), "closed_sess_sf01",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batchEvents = Tables.events(spark, dir01)
    val twin = EventsStreaming.sessionsBatch(batchEvents)
    assert(out.count() > 0)
    assert(out.exceptAll(twin).count() == 0,
      "stream emitted a session the batch twin doesn't have")
    assert(out.count() == out.distinct().count(), "a session was emitted twice")
    val maxUs = EventTime.withUs(batchEvents).agg(max("us")).collect()(0).getLong(0)
    val mustClose = twin.filter(col("end_us") < maxUs - 3L * 3600L * 1000000L)
    assert(mustClose.exceptAll(out).count() == 0,
      "a session past the watermark+gap horizon was never closed at sf0.1")
  }

  test("streaming vocabulary NDV at sf0.1 equals the batch sketch across two microbatches") {
    val dir01 = "/root/testdata/sf0.1"
    val dir = java.nio.file.Files.createTempDirectory("vocab_stream_sf01").toFile
    val docs = Tables.documents(spark, dir01)
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(s"$dir/even")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.parquet(s"$dir/odd")
    Seq("even", "odd").zipWithIndex.foreach { case (h, i) =>
      val f = new java.io.File(s"$dir/$h").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, s"part$i.parquet")
      java.nio.file.Files.move(f.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 600000L)
    }
    val stream = spark.readStream
      .schema(TextStreaming.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/part*.parquet")
    val out = EventsStreaming.runToMemory(
      spark, TextStreaming.vocabularyNdv(stream), "vocab_ndv_sf01",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val twin = queries.TextQueries.qd20b(spark, dir01)
    assert(out.count() > 0)
    assert(out.exceptAll(twin).count() == 0 && twin.exceptAll(out).count() == 0,
      "incremental HLL accumulation diverged from the batch sketch at sf0.1")
  }

  test("streaming chunking equals the batch chunker on the same documents") {
    val dir01 = "/root/testdata/sf0.01"
    val dir = java.nio.file.Files.createTempDirectory("chunk_stream").toFile
    val docs = Tables.documents(spark, dir01)
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(s"$dir/even")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.parquet(s"$dir/odd")
    Seq("even", "odd").zipWithIndex.foreach { case (h, i) =>
      val f = new java.io.File(s"$dir/$h").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, s"part$i.parquet")
      java.nio.file.Files.move(f.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 600000L)
    }
    val stream = spark.readStream
      .schema(TextStreaming.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/part*.parquet")
    val out = EventsStreaming.runToMemory(
      spark, TextStreaming.chunkDocs(stream), "chunk_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val twin = queries.TextQueries.qd26(spark, dir01)
    assert(out.count() > 0)
    assert(out.exceptAll(twin).count() == 0 && twin.exceptAll(out).count() == 0,
      "stateless streaming chunking must equal the batch operator row-for-row")
  }

  test("streaming gopher filter equals the batch gate on the same documents") {
    val dir01 = "/root/testdata/sf0.01"
    val dir = java.nio.file.Files.createTempDirectory("gopher_stream").toFile
    val docs = Tables.documents(spark, dir01)
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(s"$dir/even")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.parquet(s"$dir/odd")
    Seq("even", "odd").zipWithIndex.foreach { case (h, i) =>
      val f = new java.io.File(s"$dir/$h").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, s"part$i.parquet")
      java.nio.file.Files.move(f.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 600000L)
    }
    val stream = spark.readStream
      .schema(TextStreaming.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/part*.parquet")
    val out = EventsStreaming.runToMemory(
      spark, TextStreaming.gopherFilter(stream), "gopher_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val twin = queries.TextQueries.qd29(spark, dir01)
    assert(out.count() > 0)
    assert(out.exceptAll(twin).count() == 0 && twin.exceptAll(out).count() == 0,
      "stateless streaming rule gate must equal the batch operator row-for-row")
  }

  test("streaming vocabulary NDV equals the batch sketch regardless of microbatch slicing") {
    // HLL registers are a commutative monoid: two doc_id-parity halves
    // streamed as separate microbatches must land on EXACTLY the batch
    // qd20b table — the property that lets a continuous ingest keep a
    // running vocabulary profile with K registers per source of state.
    val dir = java.nio.file.Files.createTempDirectory("vocab_stream").toFile
    val docs = Tables.documents(spark, sf)
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(s"$dir/even")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.parquet(s"$dir/odd")
    Seq("even", "odd").zipWithIndex.foreach { case (h, i) =>
      val f = new java.io.File(s"$dir/$h").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, s"part$i.parquet")
      java.nio.file.Files.move(f.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 600000L)
    }
    val stream = spark.readStream
      .schema(TextStreaming.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/part*.parquet")
    val out = EventsStreaming.runToMemory(
      spark, TextStreaming.vocabularyNdv(stream), "vocab_ndv",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val twin = queries.TextQueries.qd20b(spark, sf)
    assert(out.count() > 0)
    assert(out.exceptAll(twin).count() == 0 && twin.exceptAll(out).count() == 0,
      "incremental HLL accumulation diverged from the batch sketch")
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

  test("stream-stream interval join (attribution) matches its batch twin") {
    val stream = EventsStreaming.readEvents(spark, sf)
    val out = EventsStreaming.runToMemory(
      spark, EventsStreaming.attributionJoin(stream), "attr_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batchEvents = EventTime.withUs(Tables.events(spark, sf))
      .withColumn("ts_ts", timestamp_micros(col("us")))
    val twin = EventsStreaming.attributionJoinBatch(batchEvents)
    assert(twin.count() > 0, "fixture should produce click->purchase attributions")
    assert(out.count() == twin.count(),
      "stream-stream join must emit exactly the batch join's pairs")
    assert(out.exceptAll(twin).count() == 0 && twin.exceptAll(out).count() == 0)
    // every emitted lag respects the interval bound
    assert(out.filter(col("lag_us") < 0 || col("lag_us") > 3600L * 1000000L).count() == 0)
  }

  test("sliding windows: each event lands in exactly two windows") {
    val stream = EventsStreaming.readEvents(spark, sf)
    val out = EventsStreaming.runToMemory(
      spark, EventsStreaming.slidingAgg(stream), "sliding_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val total = out.agg(sum("n_events")).collect()(0).getLong(0)
    val horizonLoss = 5 * 8 // emitted windows only; tail windows withheld by watermark
    val nEvents = Tables.events(spark, sf).count()
    assert(total <= 2 * nEvents && total >= 2 * (nEvents - 200),
      s"sliding total $total vs 2x$nEvents (allowing watermark tail, loss cap $horizonLoss)")
  }

  test("watermark drops data later than the horizon across microbatches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_late").toString
    val baseUs = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
    def mkRows(rows: Seq[(Long, Long, Long)]) = // (event_id, us offset, user)
      rows.map { case (id, off, u) =>
        (id, (baseUs + off) * 1000L, u, "click", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val H = 3600L * 1000000L
    // The watermark lags one batch: a batch's max event time only takes
    // effect for the NEXT batch. Drive three explicit microbatches by
    // adding files between processAllAvailable() calls.
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    val stream = spark.readStream
      .schema(EventsStreaming.eventSchema)
      .parquet(s"$dir/in")
      .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
    val q = EventsStreaming.hourlyAgg(stream).writeStream
      .outputMode("append").format("memory").queryName("late_test").start()
    def feed(rows: Seq[(Long, Long, Long)]): Unit = {
      mkRows(rows).repartition(1).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
    }
    // batch 0: hours 0 and 1
    feed(Seq((1L, 0L, 1L), (2L, H + 1, 1L), (3L, H + 2, 2L)))
    // batch 1: hour 6 → after this batch the watermark is hour 4
    feed(Seq((10L, 6 * H, 1L)))
    // batch 2: late hour-0 row (beyond horizon => DROPPED), hour-5 row
    // (window end 6 > watermark 4 => accepted), hour-7 row (flush)
    feed(Seq((12L, 10L, 3L), (13L, 5 * H + 5, 2L), (14L, 7 * H, 1L)))
    q.stop()
    val emitted = spark.table("late_test").select("hour", "n_events").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // hour 0 finalized with ONLY the on-time row (late id=12 dropped)
    assert(emitted.get("2024-01-01 00:00:00").contains(1L),
      s"hour-0 window should finalize with 1 on-time event, got $emitted")
    assert(emitted.get("2024-01-01 01:00:00").contains(2L))
    // the in-horizon late-ish row (hour 5) is accepted, not dropped
    assert(emitted.get("2024-01-01 05:00:00").forall(_ == 1L), s"got $emitted")
  }

  test("checkpoint restart: a stopped query resumes exactly-once from its checkpoint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val baseUs = 1704067200000000L
    def mkRows(rows: Seq[(Long, Long, Long)]) =
      rows.map { case (id, off, u) =>
        (id, (baseUs + off) * 1000L, u, "click", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def stream = spark.readStream
      .schema(EventsStreaming.eventSchema)
      .parquet(s"$dir/in")
      .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
    // durable file sink: the memory sink cannot recover from a
    // checkpoint — parquet + the sink's metadata log is the real
    // exactly-once restart path
    def startQuery() = EventsStreaming.dedupeEvents(stream)
      .select("event_id", "user_id").writeStream
      .outputMode("append").format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    // generation 1: two events (1 is duplicated in-batch)
    mkRows(Seq((1L, 0L, 1L), (1L, 5L, 1L), (2L, 10L, 2L)))
      .repartition(1).write.mode("append").parquet(s"$dir/in")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    val afterGen1 = spark.read.parquet(s"$dir/out").count()
    assert(afterGen1 == 2, s"gen1 should dedupe to 2 events, got $afterGen1")
    // generation 2: RESTART from the same checkpoint; add a replay of
    // event 2 (must be suppressed by restored dedup state) + a new event
    mkRows(Seq((2L, 20L, 2L), (3L, 30L, 3L)))
      .repartition(1).write.mode("append").parquet(s"$dir/in")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val ids = spark.read.parquet(s"$dir/out").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // exactly-once across the restart: replayed id 2 suppressed by the
    // RESTORED dedup state, each id exactly once
    assert(ids == Seq(1L, 2L, 3L),
      s"restart must restore dedup state exactly-once (got $ids)")
  }

  test("incremental streaming dedup: catches dups across AND within microbatches") {
    import spark.implicits._
    import graft.streaming.TextStreaming
    val root = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    val (idx, out) = (s"$root/index", s"$root/out")
    val rnd = new scala.util.Random(11)
    val vocab = Seq("spark", "scan", "join", "agg", "window", "shuffle",
      "batch", "column", "row", "key", "hash", "sort", "merge", "scanline")
    def doc(id: Long) =
      (id, Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" "), "en", "src", 0L)
    val originals = (1L to 10L).map(doc)
    def mutate(t: String) = { // light mutation: a near-dup, not a copy
      val w = t.split(" "); (w.take(29) :+ "MUTANT").++(w.drop(30)).mkString(" ")
    }
    // batch 1: originals + one WITHIN-batch exact dup (id 50 copies id 1)
    val b1 = (originals :+ (50L, originals.head._2, "en", "src", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // batch 2: two CROSS-batch near-dups of batch-1 docs + one fresh doc
    val b2 = Seq(
      (101L, mutate(originals.head._2), "en", "src", 0L),
      (102L, mutate(originals(4)._2), "en", "src", 0L),
      (103L, Seq.fill(60)("fresh").mkString(" "), "en", "src", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    TextStreaming.processBatch(spark, b1, idx, out, batchId = 0)
    TextStreaming.processBatch(spark, b2, idx, out, batchId = 1)
    // at-least-once replay of batch 1 (foreachBatch contract): the
    // batchId-keyed overwrite must leave output and index unchanged —
    // no duplicate verdicts, no self-matches from the previous write
    TextStreaming.processBatch(spark, b2, idx, out, batchId = 1)
    val verdicts = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(verdicts.size == 14, "one verdict per ingested doc")
    assert(verdicts(50L) == Some(1L), "within-batch exact dup must point at the canonical")
    assert(verdicts(101L) == Some(1L), "cross-batch near-dup of doc 1 missed")
    assert(verdicts(102L) == Some(5L), "cross-batch near-dup of doc 5 missed")
    assert(verdicts(103L).isEmpty && verdicts(1L).isEmpty,
      "fresh/canonical docs must not be flagged")
    // the index grew with both batches
    assert(spark.read.parquet(s"$idx/signatures").count() == 14)
  }

  test("streaming novelty over doc-ordered batches == batch qd48 exactly; replay no-op") {
    import graft.streaming.TextStreaming
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft_snov").toString
    val (idx, out) = (s"$root/index", s"$root/out")
    val all = graft.Tables.documents(spark, dir)
    val ids = all.select("doc_id").collect().map(_.getLong(0)).sorted
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    val batches = Seq(
      all.filter(col("doc_id") <= c1),
      all.filter(col("doc_id") > c1 && col("doc_id") <= c2),
      all.filter(col("doc_id") > c2))
    batches.zipWithIndex.foreach { case (b, i) =>
      TextStreaming.noveltyBatch(spark, b, idx, out, i)
    }
    def snap(): Seq[String] =
      spark.read.parquet(out).select("doc_id", "ng", "novel", "novelty")
        .collect().map(_.toString).sorted.toSeq
    val streamed = snap()
    val batch = queries.TextQueries.qd48(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch,
      "doc-ordered streaming novelty must equal the batch operator row-for-row")
    // at-least-once replay of the last batch: verdicts and index
    // unchanged (strictly-prior history + batchId-keyed overwrite)
    TextStreaming.noveltyBatch(spark, batches(2), idx, out, 2)
    assert(snap() == batch, "replay changed the novelty verdicts")
    // the index holds exactly the corpus-distinct gram set
    val distinctGrams = queries.TextQueries.gramSets(all)
      .select(explode(col("grams"))).distinct().count()
    assert(spark.read.parquet(s"$idx/grams").distinct().count() == distinctGrams)
    // compaction folds old batches into a base segment; a replay of the
    // newest batch still sees its exact prior history through the base
    TextStreaming.compactNoveltyIndex(spark, idx, keepLast = 1, minEligible = 1)
    TextStreaming.noveltyBatch(spark, batches(2), idx, out, 2)
    assert(snap() == batch, "replay over the compacted index drifted")
    assert(spark.read.parquet(s"$idx/grams_base").distinct().count() +
      spark.read.parquet(s"$idx/grams/batch=2").distinct().count() == distinctGrams,
      "compacted base + live batch must still cover the gram set")
  }

  test("streaming dedup end-to-end via the file source and foreachBatch") {
    import graft.streaming.TextStreaming
    val root = java.nio.file.Files.createTempDirectory("graft_sdedup2").toString
    val q = TextStreaming.start(spark,
      TextStreaming.readDocs(spark, "/root/testdata/sf0.001"),
      s"$root/index", s"$root/out", s"$root/ckpt")
    q.awaitTermination()
    val out = spark.read.parquet(s"$root/out").cache()
    // one verdict per doc with a non-empty gram set (the signature
    // pipeline's domain), keep-first semantics: dup_of always smaller
    assert(out.count() ==
      queries.TextQueries.qd6b(spark, "/root/testdata/sf0.001").count())
    assert(out.filter(col("dup_of") >= col("doc_id")).count() == 0)
    // agreement with the batch est-based twin (qd6b, same signatures):
    // every flagged doc is a qd6b near-dup member, and every dup clique
    // of size k yields k-1 flagged docs, so flagged >= members/2
    val flagged = out.filter(col("dup_of").isNotNull)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val members = queries.TextQueries.qd6b(spark, "/root/testdata/sf0.001")
      .filter(col("n_near_dups") > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.nonEmpty, "sf0.001 has planted near-dup pairs; none found")
    assert(flagged.subsetOf(members), "streaming flagged a doc qd6b does not")
    assert(flagged.size * 2 >= members.size,
      s"flagged ${flagged.size} vs ${members.size} members: too few for keep-first")
    out.unpersist()
  }

  test("streaming decontamination: stateless Bloom probe matches batch qd13b exactly") {
    import graft.streaming.TextStreaming
    val dir = "/root/testdata/sf0.001"
    val q = TextStreaming.decontaminate(spark, TextStreaming.readDocs(spark, dir), dir)
      .writeStream.format("memory").queryName("decontam_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("decontam_stream").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // the streaming stage probes EVERY incoming doc (eval membership is
    // a batch-construction artifact); corpus docs must agree with the
    // batch PREFILTER stage flag-for-flag (r13: batch qd13b is now the
    // prefilter + exact-verify cascade — the stream is the stateless
    // probe, i.e. the prefilter; a streaming verify would need the
    // eval gram table as a stream-static join, which is batch qd13b's
    // job), and eval-slice docs — whose grams are all IN the filter —
    // must flag by definition
    val batch = queries.TextQueries.qd13bPrefilter(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(batch.nonEmpty && batch.forall { case (id, f) =>
      streamed.get(id).contains(f) }, "streaming flags diverge from the batch prefilter")
    val evalIds = streamed.keys.filter(_ % 50 == 0).toSeq
    assert(evalIds.nonEmpty && evalIds.forall(streamed(_)),
      "an eval-slice doc (grams inserted by construction) was not flagged")
  }

  test("streaming cascade decontamination: Bloom-gated exact verify matches batch qd13b row-for-row") {
    import graft.streaming.TextStreaming
    val dir = "/root/testdata/sf0.001"
    val q = TextStreaming.decontaminateVerified(
        spark, TextStreaming.readDocs(spark, dir), dir)
      .writeStream.format("memory").queryName("decontam_cascade")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("decontam_cascade").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // full 3-column parity on corpus docs: the stream's map-only
    // intersect must agree with batch qd13b's inverted-index verify
    // count-for-count, not just flag-for-flag
    val batch = queries.TextQueries.qd13b(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(batch.nonEmpty && batch.forall { case (id, v) =>
      streamed.get(id).contains(v) },
      "streaming cascade n_shared/flag diverge from batch qd13b")
    // eval-slice docs (their grams ARE the filter's content) must flag
    val evalIds = streamed.keys.filter(_ % 50 == 0).toSeq
    assert(evalIds.nonEmpty && evalIds.forall(id => streamed(id)._2),
      "an eval-slice doc was not flagged by the cascade")
  }

  test("streaming embedding dedup: planted near-copies flagged across batches, replay-idempotent") {
    import spark.implicits._
    import graft.streaming.VectorStreaming
    val root = java.nio.file.Files.createTempDirectory("graft_vdedup").toString
    val (idx, out) = (s"$root/index", s"$root/out")
    val rnd = new scala.util.Random(23)
    def vec() = Seq.fill(64)(rnd.nextGaussian().toFloat)
    val base = (1L to 15L).map(i => (i, "a", vec()))
    def noisy(v: Seq[Float]) = v.map(x => x * (1f + 0.02f * rnd.nextGaussian().toFloat))
    // batch 1: 15 originals + an exact within-batch copy of vec 1
    val b1 = (base :+ (70L, "a", base.head._3))
      .toDF("vec_id", "label", "embedding")
    // batch 2: near-copies of vecs 1 and 7 (cos >> 0.9) + a fresh vector
    val b2 = Seq(
      (201L, "a", noisy(base.head._3)),
      (202L, "a", noisy(base(6)._3)),
      (203L, "a", vec()))
      .toDF("vec_id", "label", "embedding")
    VectorStreaming.processBatch(spark, b1, idx, out, batchId = 0)
    VectorStreaming.processBatch(spark, b2, idx, out, batchId = 1)
    // replay batch 1: overwrite of its own subdirs, nothing changes
    VectorStreaming.processBatch(spark, b1, idx, out, batchId = 0)
    val verdicts = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(verdicts.size == 19, "one verdict per ingested vector")
    assert(verdicts(70L) == Some(1L), "within-batch exact copy must flag")
    assert(verdicts(201L) == Some(1L), "cross-batch near-copy of vec 1 missed")
    assert(verdicts(202L) == Some(7L), "cross-batch near-copy of vec 7 missed")
    assert(verdicts(203L).isEmpty && verdicts(1L).isEmpty,
      "fresh/canonical vectors must not be flagged")
    assert(spark.read.parquet(s"$idx/vectors").count() == 19)
  }

  test("vector streaming compaction: near-dups found through base segments, twin parity") {
    // The text path's compaction is soak-tested above; this pins the
    // VECTOR path's wiring of the same BatchIndex lifecycle (its index
    // rows carry vec/nrm/bands columns — a schema drift in the base
    // union or a wrong subdir in compactIndex would only surface here).
    import spark.implicits._
    import graft.streaming.VectorStreaming
    val root = java.nio.file.Files.createTempDirectory("graft_vcompact").toString
    val (idxA, outA) = (s"$root/a/index", s"$root/a/out") // never compacted
    val (idxB, outB) = (s"$root/b/index", s"$root/b/out") // compacted per batch
    val rnd = new scala.util.Random(29)
    def vec() = Seq.fill(64)(rnd.nextGaussian().toFloat)
    val originals = (1L to 5L).map(i => (i, "a", vec()))
    def noisy(v: Seq[Float]) = v.map(x => x * (1f + 0.02f * rnd.nextGaussian().toFloat))
    // batch k>0: one fresh vector + one near-copy of a batch-0 original
    def mkBatch(k: Long) =
      if (k == 0) originals.toDF("vec_id", "label", "embedding")
      else Seq(
        (k * 100 + 1, "a", vec()),
        (k * 100 + 2, "a", noisy(originals((k % 5).toInt)._3)))
        .toDF("vec_id", "label", "embedding")
    (0L to 12L).foreach { k =>
      val b = mkBatch(k)
      VectorStreaming.processBatch(spark, b, idxA, outA, k)
      VectorStreaming.processBatch(spark, b, idxB, outB, k)
      VectorStreaming.compactIndex(spark, idxB, keepLast = 2, minEligible = 4)
    }
    def dirs(p: String) = Option(new java.io.File(p).listFiles())
      .map(_.map(_.getName).toSeq.sorted).getOrElse(Seq.empty)
    assert(dirs(s"$idxB/vectors").count(_.startsWith("batch=")) <= 6,
      s"live dirs not bounded: ${dirs(s"$idxB/vectors")}")
    assert(dirs(s"$idxB/vectors_base").exists(_.startsWith("hi=")),
      "no base segment written")
    def verdicts(out: String) = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val (va, vb) = (verdicts(outA), verdicts(outB))
    assert(va == vb, s"compaction changed verdicts: ${va.toSet.diff(vb.toSet)}")
    // the batch-12 near-copy's original (vec 3) is only reachable
    // through the base segment by then
    assert(vb(1202L) == Some(3L), "near-dup of a base-segment vector missed")
    // the compacted view (base + unabsorbed live dirs) carries every
    // vector EXACTLY once — neither lost by the union nor duplicated
    // by a retirement miss
    val view = spark.read.parquet(
      (dirs(s"$idxB/vectors_base").map(d => s"$idxB/vectors_base/$d") ++
        dirs(s"$idxB/vectors").filter(_.startsWith("batch="))
          .map(d => s"$idxB/vectors/$d")): _*)
    assert(view.count() == va.size, "compacted view lost or duplicated rows")
    assert(view.select("vec_id").distinct.count() == va.size)
  }

  test("streaming index compaction: bounded dirs, identical verdicts, replay safety") {
    import spark.implicits._
    import graft.streaming.TextStreaming
    val root = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val (idxA, outA) = (s"$root/a/index", s"$root/a/out") // never compacted
    val (idxB, outB) = (s"$root/b/index", s"$root/b/out") // compacted as it goes
    val rnd = new scala.util.Random(37)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def text() = Seq.fill(50)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // batch 0 docs are the dup targets for every later batch: the
    // compacted path must find them THROUGH the base segment
    val batch0 = (1L to 5L).map(i => (i, text(), "en", "s", 0L))
    def mkBatch(k: Long): Seq[(Long, String, String, String, Long)] =
      if (k == 0) batch0
      else Seq(
        (k * 100 + 1, text(), "en", "s", 0L),
        (k * 100 + 2, batch0((k % 5).toInt)._2, "en", "s", 0L)) // exact dup of batch 0
    def df(rows: Seq[(Long, String, String, String, Long)]) =
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    (0L to 10L).foreach { k =>
      TextStreaming.processBatch(spark, df(mkBatch(k)), idxA, outA, k)
      TextStreaming.processBatch(spark, df(mkBatch(k)), idxB, outB, k)
      TextStreaming.compactIndex(spark, idxB, keepLast = 2, minEligible = 4)
    }
    def dirs(p: String) = Option(new java.io.File(p).listFiles())
      .map(_.map(_.getName).toSeq.sorted).getOrElse(Seq.empty)
    // compaction happened and bounded the live dir count
    assert(dirs(s"$idxB/signatures").count(_.startsWith("batch=")) <= 6,
      s"live dirs not bounded: ${dirs(s"$idxB/signatures")}")
    assert(dirs(s"$idxB/signatures_base").exists(_.startsWith("hi=")),
      "no base segment written")
    assert(dirs(s"$idxA/signatures").count(_.startsWith("batch=")) == 11)
    // verdicts agree batch-for-batch — including dups of batch-0 docs
    // found through the base segment
    def verdicts(out: String) = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val (va, vb) = (verdicts(outA), verdicts(outB))
    assert(va == vb, s"compaction changed verdicts: ${va.toSet.diff(vb.toSet)}")
    assert(vb(1002L) == Some(1L), "batch-10 dup of a batch-0 doc missed through the base")
    // replay of a batch inside the horizon is idempotent on the
    // compacted index
    TextStreaming.processBatch(spark, df(mkBatch(10)), idxB, outB, 10)
    assert(verdicts(outB) == vb, "replay changed verdicts on the compacted index")
    // replay BELOW the compaction horizon must fail loudly, not serve
    // corrupted history
    val deep = intercept[IllegalArgumentException] {
      TextStreaming.processBatch(spark, df(mkBatch(1)), idxB, outB, 1)
    }
    assert(deep.getMessage.contains("compaction horizon"))
  }

  test("BatchIndex soak: 35 microbatches with per-batch compaction and a mid-compaction crash") {
    // VERDICT r6 item 6: the unit invariants are stated, this drives
    // them through a long stream. Twin A never compacts; twin B
    // compacts after EVERY batch with a tight horizon, and at batch 17
    // the compaction "process" is killed between the base write and
    // the retirement deletes. Asserts: (a) live dir count stays
    // bounded, (b) keep-first verdicts stay identical to the
    // uncompacted twin the whole way, (c) the crash window leaves a
    // readable duplicate-free view and the next compact GCs the
    // leftovers.
    import spark.implicits._
    import graft.streaming.{BatchIndex, TextStreaming}
    val root = java.nio.file.Files.createTempDirectory("graft_soak").toString
    val (idxA, outA) = (s"$root/a/index", s"$root/a/out")
    val (idxB, outB) = (s"$root/b/index", s"$root/b/out")
    val sigB = s"$idxB/signatures"
    val rnd = new scala.util.Random(41)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def text() = Seq.fill(50)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val batch0 = (1L to 5L).map(i => (i, text(), "en", "s", 0L))
    // every batch k>0 ships one fresh doc and one exact dup of a
    // batch-0 doc, so every batch's verdict depends on history that is
    // eventually only reachable through base segments
    def mkBatch(k: Long): Seq[(Long, String, String, String, Long)] =
      if (k == 0) batch0
      else Seq(
        (k * 100 + 1, text(), "en", "s", 0L),
        (k * 100 + 2, batch0((k % 5).toInt)._2, "en", "s", 0L))
    def df(rows: Seq[(Long, String, String, String, Long)]) =
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    def liveDirs = Option(new java.io.File(sigB).listFiles())
      .map(_.map(_.getName).count(_.startsWith("batch="))).getOrElse(0)
    def baseDirs = Option(new java.io.File(s"${sigB}_base").listFiles())
      .map(_.map(_.getName).toSeq.filter(_.startsWith("hi="))).getOrElse(Seq.empty)
    def verdicts(out: String) = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    case class Crash() extends RuntimeException("injected mid-compaction kill")
    var maxLive = 0
    (0L to 34L).foreach { k =>
      TextStreaming.processBatch(spark, df(mkBatch(k)), idxA, outA, k)
      TextStreaming.processBatch(spark, df(mkBatch(k)), idxB, outB, k)
      if (k == 17)
        // killed between base write and input retirement: old base,
        // absorbed live dirs and the new base all coexist on disk
        intercept[Crash](BatchIndex.compact(spark, sigB, keepLast = 2,
          minEligible = 4, onBaseWritten = () => throw Crash()))
      else
        BatchIndex.compact(spark, sigB, keepLast = 2, minEligible = 4)
      maxLive = math.max(maxLive, liveDirs)
      // (b) verdict parity at EVERY step — including the batches read
      // off the crash-window state, which must not double-count the
      // absorbed-but-undeleted live dirs
      if (k == 17 || k == 18 || k == 34)
        assert(verdicts(outA) == verdicts(outB),
          s"compaction diverged from the uncompacted twin at batch $k")
    }
    // (a) bounded: keepLast=2 + minEligible=4 admits at most ~7 live
    // dirs between compactions (plus the crash batch's leftovers)
    assert(maxLive <= 9, s"live dir count not bounded over the soak: $maxLive")
    assert(liveDirs <= 6, s"final live dirs not compacted: $liveDirs")
    // (c) the post-crash compactions garbage-collected the leftovers:
    // exactly one complete base remains
    assert(baseDirs.size == 1, s"stale bases not GC'd after the crash: $baseDirs")
    // full-history sanity: all 34 planted dups of batch-0 docs were
    // flagged with their batch-0 originals as survivors
    val vb = verdicts(outB)
    (1L to 34L).foreach { k =>
      assert(vb(k * 100 + 2) == Some((k % 5) + 1),
        s"batch-$k planted dup missed (got ${vb(k * 100 + 2)})")
    }
  }

  test("multimodal feature extraction: real JDK codec decode on PNG + WAV payloads") {
    val media = Multimodal.syntheticMedia(spark, sf).cache()
    val feats = Multimodal.extractFeatures(spark, media).cache()
    assert(feats.count() == media.count())
    // image rows: decoded geometry/mean must equal the render formulas
    val badImg = feats.filter(_.kind == "image").filter { f =>
      val id = f.media_id
      f.width != (16 + (id % 16) * 2).toInt || f.height != (8 + id % 8).toInt ||
        f.channels != 3 ||
        f.mean_intensity != ((id % 256) + (id * 7) % 256) / 2.0
    }
    assert(badImg.count() == 0, "decoded PNG stats diverge from the render formulas")
    // audio rows: width carries the frame count, mono, exact sawtooth mean
    val badAud = feats.filter(_.kind == "audio").filter { f =>
      f.width != 256 * (2 + f.media_id % 3).toInt || f.height != 1 ||
        f.channels != 1 || f.mean_intensity != 127.5
    }
    assert(badAud.count() == 0, "decoded WAV stats diverge from the render formulas")
    // determinism: re-run produces identical rows
    val again = Multimodal.extractFeatures(spark, media)
    assert(feats.except(again).count() == 0)
    media.unpersist(); feats.unpersist()
  }

  test("resize stage: real bilinear resample, fixed geometry, deterministic payload") {
    val media = Multimodal.syntheticMedia(spark, sf)
      .filter(col("kind") === "image").cache()
    val resized = Multimodal.resizeStage(spark, media, 8, 8).cache()
    assert(resized.count() == media.count())
    val r = resized.collect()
    assert(r.forall(m => m.width == 8 && m.height == 8))
    // the resized payload is a decodable 8x8 PNG
    val roundTrip = Multimodal.JdkDecoder.decodeImage(r.head.payload)
    assert(roundTrip._1 == 8 && roundTrip._2 == 8 && roundTrip._3 == 3)
    // deterministic across partitionings
    val again = Multimodal.resizeStage(spark, media.repartition(7), 8, 8)
      .collect().map(m => m.media_id -> m.payload.toSeq).toMap
    assert(r.forall(m => again(m.media_id) == m.payload.toSeq))
    media.unpersist(); resized.unpersist()
  }

  test("qm3/qm4 decode gates agree with their closed-form oracles in-process") {
    import spark.implicits._
    val img = Multimodal.imageDecode(spark, sf)
    val imgOracle = Tables.documents(spark, sf).select(
      col("doc_id").as("media_id"),
      (lit(16) + (col("doc_id") % 16) * 2).cast("int").as("width"),
      (lit(8) + col("doc_id") % 8).cast("int").as("height"),
      lit(3).as("channels"),
      ((col("doc_id") % 256 + (col("doc_id") * 7) % 256) / 2.0).as("mean_intensity"))
    assert(img.except(imgOracle).count() == 0 && imgOracle.except(img).count() == 0)
    val aud = Multimodal.audioDecode(spark, sf)
    val audOracle = Tables.documents(spark, sf).select(
      col("doc_id").as("media_id"),
      (lit(256) * (lit(2) + col("doc_id") % 3)).cast("int").as("n_frames"),
      lit(1).as("channels"), lit(8000).as("sample_rate"),
      (lit(32640L) * (lit(2) + col("doc_id") % 3)).as("sum_amplitude"),
      lit(127.5).as("mean_amplitude"))
    assert(aud.except(audOracle).count() == 0 && audOracle.except(aud).count() == 0)
  }

  test("qm2 frame sampling covers every doc and respects the stride") {
    val frames = Multimodal.frameSample(spark, sf).cache()
    assert(frames.filter(col("frame_idx") % 4 =!= 0).count() == 0)
    // every document contributes its frame 0
    assert(frames.filter(col("frame_idx") === 0).count() ==
      Tables.documents(spark, sf).count())
    // frame sizes are the fixed stride except each doc's tail frame
    val oversize = frames.filter(col("frame_chars") > 256).count()
    assert(oversize == 0)
  }

  test("qm7 perceptual hash: well-formed bits, mod-256 twins collide, canonical unique") {
    val out = Multimodal.imagePhash(spark, sf).cache()
    // every hash is exactly 64 bits of '0'/'1'
    assert(out.filter(length(col("phash")) =!= 64).count() == 0)
    assert(out.filter(col("phash").rlike("[^01]")).count() == 0)
    // the fixture geometry and colors are functions of doc_id % 256, so
    // ids congruent mod 256 render identical images -> identical hashes
    val twins = out.as("a").join(out.as("b"),
      col("a.media_id") + 256 === col("b.media_id"))
    assert(twins.count() > 0)
    assert(twins.filter(col("a.phash") =!= col("b.phash")).count() == 0,
      "mod-256 twin images must hash identically")
    // exactly one canonical per hash bucket, and it is the minimum id
    val per = out.groupBy("phash").agg(
      min("media_id").as("mn"), count(lit(1)).as("n"),
      sum(when(col("keep"), 1).otherwise(0)).as("nkeep"),
      first("n_same_hash").as("nsh"))
    assert(per.filter(col("nkeep") =!= 1).count() == 0)
    assert(per.filter(col("n") =!= col("nsh")).count() == 0)
    // the flagged canonical IS the bucket minimum
    assert(out.filter(col("keep")).join(per, Seq("phash"))
      .filter(col("media_id") =!= col("mn")).count() == 0)
    out.unpersist()
  }

  test("qm1 media stats joins back to documents 1:1") {
    val stats = Multimodal.mediaStats(spark, sf)
    assert(stats.count() == Tables.documents(spark, sf).count())
    assert(stats.select("content_hash").distinct().count() == stats.count())
  }
}
