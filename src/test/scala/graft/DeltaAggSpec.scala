package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DeltaAgg
import graft.queries.CoreQueries

/** [[graft.operators.DeltaAgg]]: incremental maintenance of a
  * materialized count+sum aggregate must land on the IDENTICAL frame a
  * direct recompute of the new snapshot produces — bit-exact, because
  * maintenance compounds run over run — plus the per-key retraction
  * semantics (key drains to zero, fresh key inserts, key-move as
  * delete+insert) that the synthetic snapshots don't force. Also pins
  * q54's next-fit-decreasing packing invariants, which the DuckDB
  * oracle replays but does not *prove* (both engines could share a
  * packing bug; the invariants can't).
  */
class DeltaAggSpec extends AnyFunSuite {

  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("q53 incremental maintenance == direct recompute of the new snapshot") {
    val sf = SparkSpecBase.sf
    val (_, snapNew) = CoreQueries.q53Snaps(spark, sf)
    val direct = snapNew.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
    val maintained = CoreQueries.q53(spark, sf)
      .select(col("o_custkey"), col("n_orders").as("n"),
        graft.operators.Rounding.dround(col("revenue") * 100, 0)
          .cast("long").as("s"))
    assert(rows(maintained) == rows(
      direct.select(col("o_custkey"), col("n"), col("s"))),
      "delta-maintained aggregate must equal the from-scratch aggregate")
  }

  private def base(rs: Seq[(Long, Long, Long)]): DataFrame =
    rs.toDF("k", "n", "s")

  private def delta(rs: Seq[(Long, String, Option[Long], Option[Long])]): DataFrame =
    rs.map { case (k, op, o, n) =>
      (k, op, o.map(java.lang.Long.valueOf).orNull,
        n.map(java.lang.Long.valueOf).orNull)
    }.toDF("k", "op", "old_v", "new_v")

  test("key drained to zero by deletes drops out of the aggregate") {
    val out = DeltaAgg.maintain(
      base(Seq((1L, 2L, 30L), (2L, 1L, 5L))),
      delta(Seq((1L, "delete", Some(10L), None), (1L, "delete", Some(20L), None))),
      "k")
    assert(rows(out) == Seq("[2,1,5]"))
  }

  test("key absent from the base inserts fresh; update shifts sum only") {
    val out = DeltaAgg.maintain(
      base(Seq((1L, 2L, 30L))),
      delta(Seq(
        (9L, "insert", None, Some(7L)),
        (1L, "update", Some(10L), Some(13L)))),
      "k")
    assert(rows(out) == Seq("[1,2,33]", "[9,1,7]"))
  }

  test("key-changing update expressed as delete@old + insert@new moves mass") {
    val out = DeltaAgg.maintain(
      base(Seq((1L, 1L, 10L), (2L, 1L, 5L))),
      delta(Seq((1L, "delete", Some(10L), None), (2L, "insert", None, Some(10L)))),
      "k")
    assert(rows(out) == Seq("[2,2,15]"))
  }

  test("q54 packing invariants: totals preserved, no underfull interior bin, " +
    "overflow bounded by one file") {
    val sf = SparkSpecBase.sf
    val plan = CoreQueries.q54(spark, sf).cache()
    try {
      val byMonth = plan.groupBy("ship_month").agg(
        sum("file_bytes").as("total"),
        max("target_bytes").as("t"), min("target_bytes").as("t2"),
        max("bin").as("max_bin"))
        .collect().map(r => (r.getString(0),
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
      assert(byMonth.values.forall { case (_, t, t2, _) => t == t2 && t > 0 },
        "target is a single positive per-month constant")
      val bins = plan.groupBy("ship_month", "bin")
        .agg(sum("file_bytes").as("bb"), max("file_bytes").as("mf"),
          max("bin_bytes").as("bbCol"), min("bin_bytes").as("bbCol2"))
        .collect()
      assert(bins.forall(r => r.getLong(2) == r.getLong(4) &&
        r.getLong(2) == r.getLong(5)), "bin_bytes column == per-bin sum")
      // per month: prefix sums cover (b+1)*target for every interior bin
      // (no underfull bin before the last) and each bin overflows target
      // by at most one file (the straddler).
      bins.groupBy(_.getString(0)).foreach { case (m, rs) =>
        val (total, t, _, maxBin) = byMonth(m)
        val sorted = rs.sortBy(_.getInt(1))
        assert(sorted.map(_.getInt(1)).head == 0, s"$m: first bin is 0")
        var cum = 0L
        sorted.foreach { r =>
          val (b, bb, mf) = (r.getInt(1), r.getLong(2), r.getLong(3))
          assert(bb <= t + mf, s"$m bin $b: bytes $bb > target $t + max file $mf")
          cum += bb
          if (b < maxBin)
            assert(cum >= (b + 1L) * t,
              s"$m bin $b: prefix $cum underfills ${(b + 1) * t}")
        }
        assert(cum == total, s"$m: packed bytes $cum != month total $total")
      }
    } finally plan.unpersist()
  }
}
