package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  private def ev(s: SparkSession, dir: String): DataFrame =
    // int64-nanos footer readability is a session default
    // (GraftConf.bootstrap) — query constructors stay conf-pure
    EventTime.withUs(Tables.events(s, dir))

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

  // ---------------------------------------------------------------- q30
  /** Ordered funnel analysis (view → click → purchase): for every user,
    * the earliest view, the earliest click at-or-after that view, and the
    * earliest purchase at-or-after that click — the stage-k timestamp is
    * conditioned on stage k−1, so an out-of-order purchase (before the
    * user ever clicked) does NOT convert. `stage` is how deep the user
    * got (0–3).
    *
    * Scale shape: three hash-aggregations and two joins, ALL keyed on
    * user_id — after the first shuffle every stage reuses the same
    * partitioning (no re-exchange between the agg and the join on the
    * same key), and each aggregation is partial (map-side min). No
    * windows, no per-user sort: at 100 TB this is the formulation that
    * survives — the per-user event-sequence window form funnels every
    * user's full history through one sort.
    */
  def q30(s: SparkSession, dir: String): DataFrame =
    funnelFrom(ev(s, dir).select("user_id", "event_type", "us"))

  /** Frame-parameterized twin (tests plant out-of-order sequences):
    * `e` carries (user_id, event_type, us).
    */
  private[graft] def funnelFrom(e: DataFrame): DataFrame = {
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("v_us"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("us") >= col("v_us"))
      .groupBy("user_id").agg(min("us").as("c_us"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("us") >= col("c_us"))
      .groupBy("user_id").agg(min("us").as("p_us"))
    e.select("user_id").distinct()
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(
        col("user_id"), col("v_us"), col("c_us"), col("p_us"),
        when(col("p_us").isNotNull, 3)
          .when(col("c_us").isNotNull, 2)
          .when(col("v_us").isNotNull, 1)
          .otherwise(0).as("stage"))
  }

  private val q30Sql =
    """WITH x AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |v AS (SELECT user_id, min(us) AS v_us FROM x
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT x.user_id, min(us) AS c_us FROM x JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND us >= v_us GROUP BY 1),
      |p AS (SELECT x.user_id, min(us) AS p_us FROM x JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND us >= c_us GROUP BY 1)
      |SELECT u.user_id, v_us, c_us, p_us,
      |  CASE WHEN p_us IS NOT NULL THEN 3
      |       WHEN c_us IS NOT NULL THEN 2
      |       WHEN v_us IS NOT NULL THEN 1 ELSE 0 END AS stage
      |FROM (SELECT DISTINCT user_id FROM x) u
      |LEFT JOIN v USING (user_id)
      |LEFT JOIN c USING (user_id)
      |LEFT JOIN p USING (user_id)""".stripMargin

  // ---------------------------------------------------------------- q31
  /** Signup-cohort retention matrix: users are cohorted by the UTC day of
    * their first `signup` event; every later active day contributes one
    * distinct user to (cohort_day, day_offset). Day arithmetic is pure
    * integer floor-division of epoch-micros — timezone-free and identical
    * on both engines.
    *
    * Scale shape: cohort table = one user_id aggregation; activity =
    * events joined to it on user_id (same partitioning as q30), then a
    * (cohort_day, day_offset) count-distinct — partial-aggregable after
    * the per-(cohort, offset, user) distinct. Output is cohorts × offsets
    * rows: tiny at any corpus scale.
    */
  def q31(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select("user_id", "event_type", "us")
    val cohort = e.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(expr("min(us) div 86400000000").as("c_day"))
    e.join(cohort, Seq("user_id"))
      .withColumn("day_offset", expr("us div 86400000000") - col("c_day"))
      .filter(col("day_offset") >= 0)
      .groupBy("c_day", "day_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .select(
        date_format(date_add(to_date(lit("1970-01-01")), col("c_day").cast("int")),
          "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_users"))
  }

  private val q31Sql =
    """WITH x AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |cohort AS (
      |  SELECT user_id, min(us) // 86400000000 AS c_day FROM x
      |  WHERE event_type = 'signup' GROUP BY 1)
      |SELECT strftime(DATE '1970-01-01' + CAST(c_day AS INT), '%Y-%m-%d')
      |         AS cohort_day,
      |       day_offset, count(*) AS n_users
      |FROM (
      |  SELECT DISTINCT x.user_id, c_day, (us // 86400000000) - c_day AS day_offset
      |  FROM x JOIN cohort USING (user_id)
      |  WHERE (us // 86400000000) >= c_day)
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q32
  /** Exact value percentiles per event type (p50/p90/p99), by the
    * discrete rank formula: the p-quantile is the element at 1-based
    * position ceil(p·n) of the sorted group — pure integer arithmetic
    * (`(k·n + k) div m` = ceil(k·n/m)) over exact cent values, so both
    * engines select the identical element; no interpolation FP to
    * disagree over. This is the oracle ANCHOR of the pair: the scale
    * path is q32b's mergeable sketch, and this window form (per-group
    * sort) is what the sketch replaces at 100 TB — the same
    * exact-twin/sketch-twin discipline as qd20/qd20b and qd21/qd21b.
    */
  def q32(s: SparkSession, dir: String): DataFrame = {
    val base = ev(s, dir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
    base
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(col("cents").asc)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(
        max("n").as("n_events"),
        (max(when(col("rn") === expr("(n + 1) div 2"), col("cents"))) / 100.0).as("p50"),
        (max(when(col("rn") === expr("(9 * n + 9) div 10"), col("cents"))) / 100.0).as("p90"),
        (max(when(col("rn") === expr("(99 * n + 99) div 100"), col("cents"))) / 100.0).as("p99"))
  }

  private val q32Sql =
    """WITH b AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |r AS (
      |  SELECT event_type, cents,
      |         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS n
      |  FROM b)
      |SELECT event_type,
      |  CAST(max(n) AS BIGINT) AS n_events,
      |  max(CASE WHEN rn = (n + 1) // 2 THEN cents END) / 100.0 AS p50,
      |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN cents END) / 100.0 AS p90,
      |  max(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END) / 100.0 AS p99
      |FROM r GROUP BY event_type""".stripMargin

  // --------------------------------------------------------------- q32b
  /** Sketch percentiles — the 100 TB path: `percentile_approx`
    * (Greenwald–Khanna summaries) folds map-side into fixed-size state
    * and merges associatively, so the shuffle carries one summary per
    * group×task instead of the sorted value stream q32's window needs.
    * Rank error is bounded by n/accuracy; SketchSpec pins |approx −
    * exact| against that bound at both sfs (no DuckDB oracle — the
    * sketch state is engine-side, the qd20b/qd21b discipline).
    */
  private val PctAccuracy = 10000

  def q32b(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        percentile_approx(col("cents"), array(lit(0.5), lit(0.9), lit(0.99)),
          lit(PctAccuracy)).as("qs"))
      .select(col("event_type"), col("n_events"),
        (col("qs").getItem(0) / 100.0).as("p50"),
        (col("qs").getItem(1) / 100.0).as("p90"),
        (col("qs").getItem(2) / 100.0).as("p99"))

  // ---------------------------------------------------------------- q33
  /** Hourly traffic anomaly detection: z-score every (hour, event_type)
    * count against that event type's own hourly distribution, flag
    * |z| > 3 — the monitoring pass an event pipeline runs to catch
    * outages (count collapse) and bot floods (count spike). Variance
    * comes from exact integer Σx/Σx² moments in ONE fixed operation
    * order on both engines (never the engine's own stddev_samp, whose
    * summation strategy differs); zero variance or a single hour pins
    * z to 0 rather than NaN (cross-engine NaN ordering is undefined —
    * the qe7 guard).
    *
    * Shape: the hourly rollup is q20's partial-agged shuffle; the
    * per-type moments are a 5-row aggregate broadcast back onto it.
    */
  def q33(s: SparkSession, dir: String): DataFrame =
    anomaliesFrom(
      ev(s, dir)
        .withColumn("hour", date_format(
          date_trunc("hour", timestamp_micros(col("us"))), "yyyy-MM-dd HH:00:00"))
        .groupBy("hour", "event_type").agg(count(lit(1)).as("n_events")))

  /** Frame-parameterized twin (tests plant spikes): `hourly` carries
    * (hour, event_type, n_events).
    */
  private[graft] def anomaliesFrom(hourly: DataFrame): DataFrame = {
    val stats = hourly.groupBy("event_type").agg(
      count(lit(1)).as("nh"),
      sum("n_events").as("sx"),
      sum(col("n_events") * col("n_events")).as("sxx"))
    val mean = col("sx").cast("double") / col("nh")
    val variance = (col("sxx").cast("double") - col("nh") * mean * mean) /
      (col("nh") - 1)
    hourly.join(broadcast(stats), Seq("event_type"))
      .withColumn("z",
        when(col("nh") > 1 && variance > 0,
          dround((col("n_events") - mean) / sqrt(variance), 6))
          .otherwise(lit(0.0)))
      .select(col("hour"), col("event_type"), col("n_events"),
        col("z").as("zscore"), (abs(col("z")) > 3.0).as("is_anomaly"))
  }

  private val q33Sql =
    """WITH hourly AS (
      |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
      |         event_type, CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type,
      |         CAST(count(*) AS BIGINT) AS nh,
      |         CAST(sum(n_events) AS BIGINT) AS sx,
      |         CAST(sum(n_events * n_events) AS BIGINT) AS sxx
      |  FROM hourly GROUP BY event_type),
      |z AS (
      |  SELECT hour, h.event_type, n_events,
      |         CASE WHEN nh > 1 AND
      |                   (CAST(sxx AS DOUBLE)
      |                    - nh * (CAST(sx AS DOUBLE) / nh)
      |                         * (CAST(sx AS DOUBLE) / nh)) / (nh - 1) > 0
      |           THEN round((n_events - CAST(sx AS DOUBLE) / nh)
      |                / sqrt((CAST(sxx AS DOUBLE)
      |                        - nh * (CAST(sx AS DOUBLE) / nh)
      |                             * (CAST(sx AS DOUBLE) / nh)) / (nh - 1)), 6)
      |           ELSE CAST(0.0 AS DOUBLE) END AS zscore
      |  FROM hourly h JOIN stats s ON h.event_type = s.event_type)
      |SELECT hour, event_type, n_events, zscore, abs(zscore) > 3.0 AS is_anomaly
      |FROM z""".stripMargin

  // ---------------------------------------------------------------- q34
  /** RFM customer segmentation over purchase events: recency (days
    * since last purchase, anchored to the corpus' own max event day —
    * no wall clock), frequency (purchase count), monetary (exact cent
    * total), each quintile-scored 1–5 (5 = most recent / frequent /
    * valuable) by the NTILE div-formula over Pareto.rankBy's
    * auto-dispatched global rank, concatenated into the classic "555"
    * segment code. User-id tiebreaks make all three ranks total orders,
    * so the whole segmentation hash-matches DuckDB.
    *
    * Shape: one user_id aggregation, then three user-cardinality ranks
    * (two-phase above threshold — never a single-partition window over
    * a production user base) and a scalar broadcast for the census.
    */
  def q34(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val maxDay = e.agg(expr("max(us) div 86400000000").as("max_day"))
    val pur = e.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(
        expr("max(us) div 86400000000").as("last_day"),
        count(lit(1)).as("n_purchases"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .crossJoin(broadcast(maxDay))
      .withColumn("recency_days", col("max_day") - col("last_day"))
    val census = pur.agg(count(lit(1)).as("nu"))
    val ranked = Seq[(String, Seq[Column])](
      ("rr", Seq(col("recency_days").asc, col("user_id").asc)),
      ("fr", Seq(col("n_purchases").desc, col("user_id").asc)),
      ("mr", Seq(col("cents").desc, col("user_id").asc)))
      .foldLeft(pur) { case (df, (c, keys)) =>
        graft.operators.Pareto.rankBy(df, keys, c)
      }
      .crossJoin(broadcast(census))
    def score(rankCol: String): Column =
      expr(s"cast(5 - ($rankCol - 1) * 5 div nu as int)")
    ranked.select(
      col("user_id"),
      date_format(date_add(to_date(lit("1970-01-01")),
        col("last_day").cast("int")), "yyyy-MM-dd").as("last_purchase_day"),
      col("recency_days"), col("n_purchases"),
      (col("cents") / 100.0).as("monetary"),
      score("rr").as("r_score"), score("fr").as("f_score"),
      score("mr").as("m_score"),
      concat(score("rr").cast("string"), score("fr").cast("string"),
        score("mr").cast("string")).as("segment"))
  }

  private val q34Sql =
    """WITH x AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us, value FROM events),
      |mx AS (SELECT max(us) // 86400000000 AS max_day FROM x),
      |p AS (
      |  SELECT user_id, max(us) // 86400000000 AS last_day,
      |         CAST(count(*) AS BIGINT) AS n_purchases,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM x WHERE event_type = 'purchase' GROUP BY user_id),
      |r AS (
      |  SELECT p.*, mx.max_day - last_day AS recency_days,
      |    CAST(row_number() OVER (
      |      ORDER BY mx.max_day - last_day, user_id) AS INT) AS rr,
      |    CAST(row_number() OVER (
      |      ORDER BY n_purchases DESC, user_id) AS INT) AS fr,
      |    CAST(row_number() OVER (ORDER BY cents DESC, user_id) AS INT) AS mr,
      |    count(*) OVER () AS nu
      |  FROM p, mx)
      |SELECT user_id,
      |  strftime(DATE '1970-01-01' + CAST(last_day AS INT), '%Y-%m-%d')
      |    AS last_purchase_day,
      |  recency_days, n_purchases, cents / 100.0 AS monetary,
      |  CAST(5 - (rr - 1) * 5 // nu AS INT) AS r_score,
      |  CAST(5 - (fr - 1) * 5 // nu AS INT) AS f_score,
      |  CAST(5 - (mr - 1) * 5 // nu AS INT) AS m_score,
      |  CAST(5 - (rr - 1) * 5 // nu AS VARCHAR)
      |    || CAST(5 - (fr - 1) * 5 // nu AS VARCHAR)
      |    || CAST(5 - (mr - 1) * 5 // nu AS VARCHAR) AS segment
      |FROM r""".stripMargin

  // ---------------------------------------------------------------- q35
  /** Click→purchase attribution (interval join): every purchase joined
    * to the same user's clicks in the preceding hour — the batch twin
    * the streaming attribution join (EventsStreaming.attributionJoin)
    * is parity-tested against, lifted onto the oracle-graded surface so
    * the semantics are DuckDB-checked, not just stream≡batch-checked.
    * One definition: this delegates to the streaming module's batch
    * twin, so the three surfaces (stream, batch twin, oracle query)
    * cannot drift. Equi-join on user_id + a two-sided time bound — the
    * shape that lets streaming state evict at the watermark, and a
    * plain co-partitioned join in batch.
    */
  def q35(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventsStreaming.attributionJoinBatch(
      ev(s, dir).withColumn("ts_ts", timestamp_micros(col("us"))))

  private val q35Sql =
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      |       p.value,
      |       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON p.user_id = c.user_id
      | AND epoch_us(p.ts) >= epoch_us(c.ts)
      | AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000""".stripMargin

  // ---------------------------------------------------------------- q36
  /** User-journey transition matrix: counts and row-normalized
    * probabilities of consecutive (from → to) event-type transitions
    * per user — the first-order Markov view of product flows ("what do
    * users do right after an error?"). Consecutive pairing is a
    * per-user lead window (one shuffle on user_id, the q19 shape); the
    * row normalizer joins back as a types-cardinality broadcast, never
    * a global window.
    */
  def q36(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    val c = ev(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("us"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val f = c.groupBy("from_type").agg(sum("n").as("n_from"))
    c.join(broadcast(f), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        dround(col("n").cast("double") / col("n_from"), 6).as("p"))
  }

  private val q36Sql =
    """WITH x AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |t AS (
      |  SELECT event_type AS from_type,
      |         lead(event_type) OVER (
      |           PARTITION BY user_id ORDER BY us, event_id) AS to_type
      |  FROM x),
      |c AS (
      |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |  FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, n,
      |       round(CAST(n AS DOUBLE) / n_from, 6) AS p
      |FROM c JOIN f USING (from_type)""".stripMargin

  // ---------------------------------------------------------------- q37
  /** Rolling engagement: per calendar day, the distinct active users
    * that day (DAU) and over the trailing 7 days (WAU) — the
    * top-of-dashboard engagement pair. The rolling-window distinct is
    * a range join of the tiny calendar-days table (broadcast — its
    * cardinality is the date range, not the data) against the
    * per-(day, user) distinct activity, then a count-distinct per
    * day: the big side streams once, expanded at most 7×. Day
    * arithmetic is integer floor-division of epoch-micros.
    */
  def q37(s: SparkSession, dir: String): DataFrame = {
    val du = ev(s, dir)
      .select(expr("us div 86400000000").as("day"), col("user_id"))
      .distinct()
    val days = du.select("day").distinct()
    val dau = du.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val wau = broadcast(days)
      .join(du.select(col("day").as("aday"), col("user_id")),
        col("aday").between(col("day") - 6, col("day")))
      .groupBy("day").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, Seq("day"))
      .select(
        date_format(date_add(to_date(lit("1970-01-01")), col("day").cast("int")),
          "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"))
  }

  private val q37Sql =
    """WITH du AS (
      |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
      |  FROM events),
      |days AS (SELECT DISTINCT day FROM du),
      |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM du GROUP BY 1),
      |wau AS (
      |  SELECT d.day, count(DISTINCT u.user_id) AS wau
      |  FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
      |  GROUP BY 1)
      |SELECT strftime(DATE '1970-01-01' + CAST(d.day AS INT), '%Y-%m-%d') AS day,
      |       dau.dau, wau.wau
      |FROM days d JOIN dau ON dau.day = d.day JOIN wau ON wau.day = d.day""".stripMargin

  // ---------------------------------------------------------------- q40
  /** EWMA traffic baseline: per event type and hour, an exponentially
    * weighted moving average of the preceding 24 hourly counts (decay 1/2
    * per hour, missing hours contribute no weight), and a spike verdict
    * `n > 2*ewma` once >= 6 history hours exist. Complements q33's GLOBAL
    * z-score with a LOCAL, trend-adaptive baseline.
    *
    * Exactness: weights are the integers 2^(24-d), so numerator and
    * denominator are exact BIGINT sums (order-independent — no float
    * accumulation across Spark partitions) and the spike decision compares
    * integer cross-products, never rounded doubles. The reported `ewma` is
    * one exact-over-exact division, dround-ed at 6dp.
    *
    * Scale: the raw scan reduces to an (event_type, hour) aggregate first;
    * the 24x fan-out (a broadcast of 24 literal offset rows) and the
    * baseline join both operate on that tiny aggregate, co-partitioned on
    * (event_type, hr) — nothing quadratic, nothing resident on the driver.
    */
  def q40(s: SparkSession, dir: String): DataFrame =
    ewmaFrom(s, ev(s, dir)
      .select(col("event_type"), expr("us div 3600000000").as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("n_events")))

  /** Frame-parameterized twin (tests plant series): `hourly` carries
    * (event_type, hr: Long, n_events: Long).
    */
  private[graft] def ewmaFrom(s: SparkSession, hourly: DataFrame): DataFrame = {
    val offs = s.createDataFrame((1 to 24).map(d => (d, 1L << (24 - d))))
      .toDF("d", "wn")
    val baseline = hourly
      .crossJoin(broadcast(offs))
      .select(col("event_type"), (col("hr") + col("d")).as("hr"),
        (col("n_events") * col("wn")).as("wc"), col("wn"))
      .groupBy("event_type", "hr")
      .agg(sum("wc").as("num"), sum("wn").as("den"), count(lit(1)).as("hist"))
    hourly.join(baseline, Seq("event_type", "hr"), "left")
      .select(
        col("event_type"), col("hr"), col("n_events"),
        when(col("den").isNotNull,
          dround(col("num").cast("double") / col("den"), 6)).as("ewma"),
        coalesce(col("hist"), lit(0L)).as("hist"),
        (coalesce(col("hist"), lit(0L)) >= 6 &&
          col("n_events") * col("den") > lit(2L) * col("num")).as("is_spike"))
  }

  private val q40Sql =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
      |         CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2),
      |offs AS (
      |  SELECT CAST(d AS INT) AS d,
      |         CAST(1 AS BIGINT) << (24 - CAST(d AS INT)) AS wn
      |  FROM range(1, 25) t(d)),
      |baseline AS (
      |  SELECT event_type, hr + d AS hr,
      |         CAST(sum(n_events * wn) AS BIGINT) AS num,
      |         CAST(sum(wn) AS BIGINT) AS den,
      |         CAST(count(*) AS BIGINT) AS hist
      |  FROM hourly CROSS JOIN offs
      |  GROUP BY 1, 2)
      |SELECT h.event_type, h.hr, h.n_events,
      |  CASE WHEN b.den IS NOT NULL
      |       THEN round(CAST(b.num AS DOUBLE) / b.den, 6) END AS ewma,
      |  COALESCE(b.hist, CAST(0 AS BIGINT)) AS hist,
      |  COALESCE(b.hist, CAST(0 AS BIGINT)) >= 6
      |    AND h.n_events * b.den > 2 * b.num AS is_spike
      |FROM hourly h
      |LEFT JOIN baseline b ON h.event_type = b.event_type AND h.hr = b.hr""".stripMargin

  // ---------------------------------------------------------------- q41
  /** Top user-journey trigrams: the 20 most common consecutive 3-step
    * event-type sequences across user timelines — q36's first-order
    * transition matrix extended to the sequence-mining artifact a funnel
    * designer actually reads (which 3-step paths dominate).
    *
    * Scale: two leads over the per-user ordered window (one shuffle on
    * user_id), then a #types³-sized aggregation; the top-20 rank runs on
    * that tiny frame. The (us, event_id) order key is a total order per
    * user, so both engines rank the identical sequence multiset.
    */
  def q41(s: SparkSession, dir: String): DataFrame = {
    val wo = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    // global window by design: input is the #event_types^3 aggregate
    // (result cardinality, bounded by the type vocabulary — not n)
    val w = Window.orderBy(col("n").desc, col("s1").asc, col("s2").asc, col("s3").asc)
    ev(s, dir)
      .withColumn("s2", lead("event_type", 1).over(wo))
      .withColumn("s3", lead("event_type", 2).over(wo))
      .filter(col("s3").isNotNull)
      .groupBy(col("event_type").as("s1"), col("s2"), col("s3"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= 20)
  }

  private val q41Sql =
    """WITH seq AS (
      |  SELECT user_id, event_type AS s1,
      |         lead(event_type, 1) OVER w AS s2,
      |         lead(event_type, 2) OVER w AS s3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |tri AS (
      |  SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
      |  FROM seq WHERE s3 IS NOT NULL GROUP BY 1, 2, 3)
      |SELECT s1, s2, s3, n, rnk FROM (
      |  SELECT *, CAST(row_number() OVER (ORDER BY n DESC, s1, s2, s3) AS INT) AS rnk
      |  FROM tri)
      |WHERE rnk <= 20""".stripMargin

  // ---------------------------------------------------------------- q51
  /** Gap-filled hourly series: the q20 hourly aggregate densified onto a
    * complete (hour × event_type) spine from the corpus' first to last
    * hour, with zero-filled counts/values and an explicit is_gap flag —
    * the resample step every downstream time-series consumer (q33's
    * anomaly baseline, charting, seasonal decomposition) needs before
    * lag arithmetic is meaningful.
    *
    * Scale: the only full-data stage is the hourly pre-aggregation (one
    * shuffle, partial aggs map-side); the spine is hours × #types rows
    * built from a 1-row bounds aggregate via `sequence` + `explode`, and
    * the densifying join runs on aggregate-sized frames (types
    * broadcast). The raw corpus is never re-scanned or re-shuffled.
    */
  def q51(s: SparkSession, dir: String): DataFrame = {
    val hourly = ev(s, dir)
      .withColumn("hour_ts", date_trunc("hour", timestamp_micros(col("us"))))
      .groupBy("hour_ts", "event_type")
      .agg(
        count(lit(1)).as("n_events"),
        // integer cents, same rationale as q20
        sum(round(col("value") * 100).cast("long")).as("cents"))
    val spine = hourly
      .agg(min("hour_ts").as("lo"), max("hour_ts").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("hour_ts"))
    val types = hourly.select("event_type").distinct()
    spine.crossJoin(broadcast(types))
      .join(hourly, Seq("hour_ts", "event_type"), "left")
      .select(
        date_format(col("hour_ts"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        (coalesce(col("cents"), lit(0L)) / 100.0).as("sum_value"),
        col("n_events").isNull.as("is_gap"))
  }

  private val q51Sql =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour_ts, event_type,
      |         CAST(count(*) AS BIGINT) AS n_events,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(hour_ts) AS lo, max(hour_ts) AS hi FROM hourly),
      |spine AS (
      |  SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS hour_ts
      |  FROM b),
      |types AS (SELECT DISTINCT event_type FROM hourly)
      |SELECT strftime(s.hour_ts, '%Y-%m-%d %H:00:00') AS hour, t.event_type,
      |       COALESCE(h.n_events, 0) AS n_events,
      |       COALESCE(h.cents, 0) / 100.0 AS sum_value,
      |       h.n_events IS NULL AS is_gap
      |FROM spine s CROSS JOIN types t
      |LEFT JOIN hourly h
      |  ON s.hour_ts = h.hour_ts AND t.event_type = h.event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_asof_join" -> (q18 _),
    "q19_sessionize" -> (q19 _),
    "q20_hourly_window" -> (q20 _),
    "q21_json_extract" -> (q21 _),
    "q30_funnel" -> (q30 _),
    "q31_retention" -> (q31 _),
    "q32_value_percentiles" -> (q32 _),
    "q32b_percentiles_sketch" -> (q32b _),
    "q33_hourly_anomaly" -> (q33 _),
    "q34_rfm_segments" -> (q34 _),
    "q35_attribution" -> (q35 _),
    "q36_transition_matrix" -> (q36 _),
    "q37_active_users" -> (q37 _),
    "q40_ewma_baseline" -> (q40 _),
    "q41_path_trigrams" -> (q41 _),
    "q51_gap_fill" -> (q51 _),
  )

  val oracle: Map[String, String] = Map(
    "q18_asof_join" -> q18Sql,
    "q19_sessionize" -> q19Sql,
    "q20_hourly_window" -> q20Sql,
    "q21_json_extract" -> q21Sql,
    "q30_funnel" -> q30Sql,
    "q31_retention" -> q31Sql,
    "q32_value_percentiles" -> q32Sql,
    "q33_hourly_anomaly" -> q33Sql,
    "q34_rfm_segments" -> q34Sql,
    "q35_attribution" -> q35Sql,
    "q36_transition_matrix" -> q36Sql,
    "q37_active_users" -> q37Sql,
    "q40_ewma_baseline" -> q40Sql,
    "q41_path_trigrams" -> q41Sql,
    "q51_gap_fill" -> q51Sql,
    // q32b omitted: GK-sketch state is engine-side; error bound pinned
    // against the exact q32 twin in SketchSpec.
  )
}
