package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.EventTime
import graft.operators.Rounding.dround

/** Event-stream operators (batch form; the streaming variants live in
  * graft.streaming). The physical type of `events.ts` has varied across
  * testdata regenerations (int64 nanoseconds, TIMESTAMP_NTZ(µs)) — all
  * time arithmetic goes through [[graft.operators.EventTime]], which
  * dispatches on the type the file actually declares and lands on a
  * canonical `us: Long` micros column matching the DuckDB oracle's
  * `epoch_us(ts)`.
  *
  * Scale notes: every operator below is a per-user window or a
  * hash-aggregate — partitioned by user_id / hour, no global state. The
  * as-of join is the union-window formulation (sort-merge within user
  * partitions), NOT a time-range cross join: at 100 TB the cross-join
  * formulation explodes, this one is one shuffle on user_id.
  */
object EventQueries {

  private def ev(s: SparkSession, dir: String): DataFrame = {
    // kept for int64-nanos testdata generations: without it Spark fails
    // the TIMESTAMP(NANOS) footer outright; a no-op for µs timestamps
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    EventTime.withUs(Tables.events(s, dir))
  }

  // ---------------------------------------------------------------- q18
  /** As-of join: for every purchase, the most recent click of the same
    * user at-or-before it. Implemented as tagged-union + per-user ordered
    * window with `last(_, ignoreNulls)` — the scalable as-of formulation.
    * Oracle uses DuckDB's native ASOF LEFT JOIN (semantics: greatest
    * c.ts <= p.ts), which this reproduces exactly: at equal timestamps the
    * click sorts first (tag 0 < 1) and is visible to the purchase.
    */
  def q18(s: SparkSession, dir: String): DataFrame = {
    val base = ev(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("tag", when(col("event_type") === "click", 0).otherwise(1))
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("us").asc, col("tag").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("last_click_us", last(when(col("tag") === 0, col("us")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("us").as("ts_us"), col("last_click_us"))
  }

  private val q18Sql =
    """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
      |       epoch_us(c.ts) AS last_click_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Gap-based sessionization (1 h inactivity): lag + running flag-sum
    * per user, then per-user session stats.
    */
  def q19(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 3600L * 1000000L
    val wo = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    ev(s, dir)
      .withColumn("gap", col("us") - lag("us", 1).over(wo))
      .withColumn("new_sess", when(col("gap").isNull || col("gap") > gapUs, 1).otherwise(0))
      .groupBy("user_id")
      .agg(
        sum("new_sess").as("n_sessions"),
        count(lit(1)).as("n_events"),
        dround(sum("value"), 2).as("sum_value"))
  }

  private val q19Sql =
    """WITH x AS (
      |  SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
      |l AS (
      |  SELECT user_id, value,
      |         us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap
      |  FROM x)
      |SELECT user_id,
      |  CAST(sum(CASE WHEN gap IS NULL OR gap > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events,
      |  round(sum(value), 2) AS sum_value
      |FROM l GROUP BY user_id""".stripMargin

  // ---------------------------------------------------------------- q20
  /** Tumbling-hour aggregation (the batch twin of the streaming windowed
    * agg in graft.streaming.EventsStreaming).
    */
  def q20(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("hour_ts", date_trunc("hour", timestamp_micros(col("us"))))
      .groupBy(
        date_format(col("hour_ts"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        // `value` is cent-granular: sum exact integer cents so group
        // totals and the derived average are association-free (double
        // sums differed from the oracle by an ulp on ~1% of groups at
        // sf0.1 — exactly at the avg's 6-decimal rounding boundary,
        // because cent-valued averages land on x.5e-6 routinely)
        sum(round(col("value") * 100).cast("long")).as("_cents"))
      .select(col("hour"), col("event_type"), col("n_events"), col("n_users"),
        (col("_cents") / 100.0).as("sum_value"),
        dround(col("_cents") / 100.0 / col("n_events"), 6).as("avg_value"))

  private val q20Sql =
    """SELECT hour, event_type, n_events, n_users,
      | cents / 100.0 AS sum_value,
      | round(cents / 100.0 / n_events, 6) AS avg_value
      |FROM (
      |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
      |   event_type,
      |   CAST(count(*) AS BIGINT) AS n_events,
      |   count(DISTINCT user_id) AS n_users,
      |   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events
      |  GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------- q21
  /** JSON extraction from the props column (semi-structured payloads —
    * get_json_object stays codegen'd; at scale prefer from_json with an
    * explicit schema, used in the streaming module).
    */
  def q21(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("k").isNull, 1).otherwise(0)).as("n_null_k"),
        dround(avg("k"), 6).as("avg_k"),
        max("k").as("max_k"))

  private val q21Sql =
    """SELECT event_type, count(*) AS n_events,
      | CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k,
      | round(avg(k), 6) AS avg_k,
      | max(k) AS max_k
      |FROM (SELECT event_type,
      |             CAST(json_extract_string(props, '$.k') AS INT) AS k
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_asof_join" -> (q18 _),
    "q19_sessionize" -> (q19 _),
    "q20_hourly_window" -> (q20 _),
    "q21_json_extract" -> (q21 _),
  )

  val oracle: Map[String, String] = Map(
    "q18_asof_join" -> q18Sql,
    "q19_sessionize" -> q19Sql,
    "q20_hourly_window" -> q20Sql,
    "q21_json_extract" -> q21Sql,
  )
}
