package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical-type dispatch for the `events.ts` column.
  *
  * The driver's testdata generator has shipped `ts` as several physical
  * parquet types across regenerations (int64 nanoseconds, then
  * TIMESTAMP(isAdjustedToUTC=false, MICROS) → Spark `TIMESTAMP_NTZ`).
  * Hard-coding any one of them breaks every events consumer on the next
  * regeneration (this took out q18–q21 and the streaming suite in round
  * 8), so the contract lives here once: derive a canonical
  * `us: Long` (microseconds since epoch, UTC interpretation — matching
  * the DuckDB oracle's `epoch_us(ts)` on a naive timestamp) from
  * whatever type the file declares.
  *
  * All SparkSessions in this project run `spark.sql.session.timeZone =
  * UTC` (Bench/Verify/specs/pipeline); the NTZ branch asserts it
  * because NTZ→TZ casts interpret the naive value in the session zone.
  */
object EventTime {

  /** Microseconds-since-epoch expression for a `ts` column of type `dt`.
    *  - int64: the generator's nanosecond longs → integer `div 1000`
    *    (floor, matching DuckDB's µs truncation; double division loses
    *    ulps on 19-digit values)
    *  - TIMESTAMP / TIMESTAMP_NTZ: `unix_micros` (NTZ via a cast that is
    *    identity under the project-wide UTC session zone)
    */
  def usExpr(dt: DataType): Column = dt match {
    case LongType          =>
      // the int64 branch is only correct for NANOSECONDS. If a future
      // regeneration ships int64 millis/micros instead, `div 1000`
      // would be silently wrong by 10^3–10^6 — so guard on magnitude
      // (any plausible event era is ≥ 1e17 in ns, ≤ 1e16 in µs) and
      // fail with a named message instead of producing wrong sessions.
      // Per-row when-branch: stays codegen'd, no extra job at plan time.
      when(col("ts") >= 100000000000000000L, expr("ts div 1000"))
        .otherwise(raise_error(concat(
          lit("events.ts arrived as int64 but the value "),
          col("ts").cast("string"),
          lit(" is too small for nanoseconds — a generator change to " +
            "millis/micros? Extend EventTime.usExpr rather than " +
            "trusting div 1000."))))
    case TimestampType     => unix_micros(col("ts"))
    case TimestampNTZType  => unix_micros(col("ts").cast(TimestampType))
    case other => throw new IllegalArgumentException(
      s"events.ts arrived as unsupported type $other " +
        "(expected int64 nanos, TIMESTAMP, or TIMESTAMP_NTZ)")
  }

  /** `df` (must carry `ts`) with a canonical `us: Long` micros column. */
  def withUs(df: DataFrame): DataFrame = {
    val dt = df.schema("ts").dataType
    if (dt == TimestampNTZType) {
      val tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
      require(tz == "UTC",
        s"events.ts is TIMESTAMP_NTZ; its UTC-epoch interpretation requires " +
          s"spark.sql.session.timeZone=UTC (got $tz)")
    }
    df.withColumn("us", usExpr(dt))
  }
}
