package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.EventTime

/** The events-table physical-schema contract (VERDICT r8 item 2).
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed `events.ts`'s physical type once (int64 nanoseconds →
  * TIMESTAMP_NTZ micros), which silently broke every events consumer.
  * This spec is the single place an environment change like that should
  * surface: if the derivation below fails, fix
  * [[graft.operators.EventTime]] — everything else dispatches through
  * it.
  */
class EventSchemaSpec extends AnyFunSuite {
  import SparkSpecBase.{spark, sf}

  test("events.ts physical type is one EventTime supports, and us derives sanely") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = Tables.events(spark, sf)
    val dt = ev.schema("ts").dataType
    assert(Seq(LongType, TimestampType, TimestampNTZType).contains(dt),
      s"events.ts arrived as $dt — teach graft.operators.EventTime the new type")
    val us = EventTime.withUs(ev)
    assert(us.schema("us").dataType == LongType)
    val row = us.agg(min("us"), max("us"), count(lit(1))).collect()(0)
    val (lo, hi, n) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(n > 0, "events table is empty")
    // micros since epoch, not nanos/millis/seconds: the generator's
    // clock lives in recent years (2020-01-01 .. 2040-01-01 in µs)
    assert(lo >= 1577836800000000L && hi < 2208988800000000L,
      s"us range [$lo, $hi] is not micros-since-epoch — unit dispatch is wrong")
  }

  test("all three supported ts encodings derive the identical us column") {
    import spark.implicits._
    // one instant three ways: 2024-03-01 12:34:56.789012 UTC
    val micros = 1709296496789012L
    val asLongNs = Seq(Tuple1(micros * 1000L)).toDF("ts")
    val asTs = Seq(Tuple1(new java.sql.Timestamp(0L))).toDF("ts")
      .select(timestamp_micros(lit(micros)).as("ts"))
    val asNtz = asTs.select(col("ts").cast(TimestampNTZType).as("ts"))
    assert(asTs.schema("ts").dataType == TimestampType)
    assert(asNtz.schema("ts").dataType == TimestampNTZType)
    for (df <- Seq(asLongNs, asTs, asNtz)) {
      val got = EventTime.withUs(df).select("us").collect()(0).getLong(0)
      assert(got == micros,
        s"${df.schema("ts").dataType} derived $got, expected $micros")
    }
    // unsupported types refuse loudly instead of mis-deriving
    val bad = Seq(Tuple1("2024-01-01")).toDF("ts")
    intercept[IllegalArgumentException](EventTime.withUs(bad))
  }

  test("q42 is conf-pure and agrees across both events.ts physical encodings") {
    import spark.implicits._
    // VERDICT r10 item 3: q42 used to conf.set nanosAsLong inside its
    // builder — a session-wide side effect. The flag now lives in
    // GraftConf.bootstrap; this case proves q42 (a) never touches
    // session conf and (b) produces identical output whether events.ts
    // arrives as TIMESTAMP micros or as int64 nanoseconds (LongType is
    // exactly what a TIMESTAMP(NANOS) footer surfaces as under the
    // bootstrap flag — Spark itself cannot write a nanos footer).
    val base = java.nio.file.Files.createTempDirectory("q42enc")
    val rows = (1 to 50).map(i => ((i % 7).toLong, 1709296496789012L + i * 1000000L))
    val dirs = Seq("us", "ns").map { enc =>
      val d = base.resolve(enc); java.nio.file.Files.createDirectories(d)
      for (tbl <- Seq("lineitem", "orders", "documents"))
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$sf/$tbl.parquet"), d.resolve(s"$tbl.parquet"))
      val ev = rows.toDF("user_id", "usv")
      val typed =
        if (enc == "us") ev.select(col("user_id"), timestamp_micros(col("usv")).as("ts"))
        else ev.select(col("user_id"), (col("usv") * 1000L).as("ts"))
      typed.coalesce(1).write.parquet(d.resolve("events.parquet").toString)
      d.toString
    }
    val confBefore = spark.conf.getAll
    val Seq(us, ns) = dirs.map(d =>
      queries.CoreQueries.q42(spark, d).collect().map(_.toString).sorted.toSeq)
    assert(us == ns, "q42 output must not depend on the ts physical encoding")
    assert(spark.conf.getAll == confBefore,
      "q42 mutated session conf — query constructors must stay pure")
  }

  test("int64 values below the nanosecond era fail loudly, not silently divided") {
    import spark.implicits._
    // a generator switch to int64 MILLIS would land ~1.7e12 — div 1000
    // would silently produce year-52000 microseconds; the magnitude
    // guard must turn that into a named error instead
    val asMs = Seq(Tuple1(1709296496789L)).toDF("ts")
    val e = intercept[Exception] {
      EventTime.withUs(asMs).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("too small for nanoseconds"),
      s"expected the magnitude-guard message, got: ${e.getMessage}")
  }
}
