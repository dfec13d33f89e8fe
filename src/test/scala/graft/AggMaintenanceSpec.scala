package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CoreQueries
import graft.streaming.AggMaintenance

/** [[graft.streaming.AggMaintenance]]: the micro-batched chain must land
  * on the SAME aggregate as one batch recompute (order-free additive
  * maintenance), replays must be byte-safe no-ops (the foreachBatch
  * at-least-once contract), torn writes must be invisible, and the
  * vacuum must keep exactly the replay horizon.
  */
class AggMaintenanceSpec extends AnyFunSuite {

  private lazy val spark = SparkSpecBase.spark

  private def direct(sf: String): Seq[String] = {
    val (_, snapNew) = CoreQueries.q53Snaps(spark, sf)
    snapNew.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      .collect().map(_.toString).sorted.toSeq
  }

  private def state(root: String): Seq[String] =
    AggMaintenance.current(spark, root).get
      .collect().map(_.toString).sorted.toSeq

  /** Batch 0 is the initial full load — the old snapshot expressed as
    * an insert feed, exactly how a CDC stream begins — followed by k
    * hash-sliced micro-batches of the old→new delta.
    */
  private def deltaSlices(sf: String, k: Int): Seq[DataFrame] = {
    val (snapOld, _) = CoreQueries.q53Snaps(spark, sf)
    val initFeed = snapOld.select(col("o_custkey"), lit("insert").as("op"),
      lit(null).cast("long").as("old_v"), col("cents").as("new_v"))
    val d = CoreQueries.q53Delta(spark, sf)
    initFeed +: (0 until k).map(i =>
      d.filter(pmod(xxhash64(col("o_custkey")), lit(k)) === i))
  }

  test("initial load + 3 CDC batches == one-shot batch recompute of the new snapshot") {
    val sf = SparkSpecBase.sf
    val root = java.nio.file.Files.createTempDirectory("graft_aggm").toString
    deltaSlices(sf, 3).zipWithIndex.foreach { case (b, i) =>
      AggMaintenance.processBatch(spark, b, root, "o_custkey", i)
    }
    assert(AggMaintenance.latest(spark, root).map(_._1).contains(3L))
    assert(state(root) == direct(sf),
      "micro-batched maintenance must equal the from-scratch aggregate")
  }

  test("replay of the last batch is a no-op, even over a torn write") {
    val sf = SparkSpecBase.sf
    val root = java.nio.file.Files.createTempDirectory("graft_aggm2").toString
    val slices = deltaSlices(sf, 3)
    slices.zipWithIndex.foreach { case (b, i) =>
      AggMaintenance.processBatch(spark, b, root, "o_custkey", i)
    }
    val before = state(root)
    // plain replay (foreachBatch re-delivers batch 3 after a crash)
    AggMaintenance.processBatch(spark, slices(3), root, "o_custkey", 3)
    assert(state(root) == before, "replay changed the aggregate")
    // torn write: v=4 exists without _SUCCESS — readers must ignore it,
    // and the next batch must rebuild from v=3, not the wreckage
    val torn = java.nio.file.Paths.get(root, "v=4")
    java.nio.file.Files.createDirectory(torn)
    java.nio.file.Files.writeString(torn.resolve("part-junk.parquet"), "torn")
    assert(AggMaintenance.latest(spark, root).map(_._1).contains(3L),
      "an incomplete version must not be the visible current")
    AggMaintenance.processBatch(spark, slices(3).limit(0), root, "o_custkey", 4)
    assert(state(root) == before, "empty batch over torn write shifted state")
  }

  test("vacuum keeps exactly the replay horizon") {
    val sf = SparkSpecBase.sf
    val root = java.nio.file.Files.createTempDirectory("graft_aggm3").toString
    deltaSlices(sf, 5).zipWithIndex.foreach { case (b, i) =>
      AggMaintenance.processBatch(spark, b, root, "o_custkey", i)
    }
    val left = new java.io.File(root).list().filter(_.startsWith("v=")).sorted
    // batch 5 keeps its 2 newest complete predecessors (v=3, v=4) + itself
    assert(left.toSeq == Seq("v=3", "v=4", "v=5"), left.mkString(","))
  }

  test("end-to-end: a file-source stream through foreachBatch lands on the batch truth") {
    val sf = SparkSpecBase.sf
    val root = java.nio.file.Files.createTempDirectory("graft_aggm4").toString
    val (in, agg, ckpt) = (s"$root/in", s"$root/agg", s"$root/ckpt")
    new java.io.File(in).mkdirs()
    // stage each slice as one file so maxFilesPerTrigger=1 → 4 microbatches
    // (initial load + 3 CDC batches)
    val schema = CoreQueries.q53Delta(spark, sf).schema
    deltaSlices(sf, 3).zipWithIndex.foreach { case (b, i) =>
      val stage = s"$root/stage$i"
      b.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(in, f"delta_$i%03d.parquet"))
    }
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        AggMaintenance.processBatch(spark, batch, agg, "o_custkey", id)
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(AggMaintenance.latest(spark, agg).map(_._1).contains(3L),
      "expected 4 microbatches")
    assert(state(agg) == direct(sf),
      "streamed maintenance must equal the from-scratch aggregate")
  }
}
