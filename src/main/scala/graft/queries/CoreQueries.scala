package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftConf, Tables}
import graft.operators.{Balances, Buckets, Pareto, TotalRow, ZScore}
import graft.operators.Rounding.dround

/** Core relational queries — one per SURVEY §2 operator family, expressed
  * over the driver testdata with the charge/payment role mapping of
  * FIXTURES.md §2 (orders = charges, lineitem = settling payments linked
  * by l_orderkey, customer/nation/region = dimensions).
  *
  * Every query has an adjacent DuckDB oracle in `oracle` with identical
  * column aliases. All money aggregates are rounded to 2 decimals and
  * ratios to 6 so cross-engine float-summation-order noise (≈1e-12
  * relative) cannot flip the hash.
  */
object CoreQueries {

  private val asOf = GraftConf.asOfDate

  /** Net settled amount of a lineitem — the "payment" measure. */
  private def net: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))
  private val netSql = "l_extendedprice*(1.0-l_discount)*(1.0+l_tax)"

  /** Per-order settlement balance (A2/J2): o_totalprice − Σ lineitem net. */
  private def saldoDf(s: SparkSession, dir: String): DataFrame =
    Balances.settlementBalance(
      Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
      Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount", "l_tax"),
      chargeId = "o_orderkey",
      linkKey = "l_orderkey",
      chargeAmount = col("o_totalprice"),
      paymentAmount = net,
      outName = "saldo",
    )

  private val saldoSqlCte =
    s"""saldo AS (
       |  SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
       |         round(o.o_totalprice - coalesce(p.paid, 0.0), 2) AS saldo
       |  FROM orders o
       |  LEFT JOIN (SELECT l_orderkey, sum($netSql) AS paid
       |             FROM lineitem GROUP BY 1) p
       |    ON o.o_orderkey = p.l_orderkey)""".stripMargin

  // ---------------------------------------------------------------- q01
  /** TPC-H-Q1-shaped pricing summary: filter + groupBy + sum/avg/count
    * (SURVEY §2.2 P4-analog predicate, §2.4 A1, §2.8 F6/F8).
    */
  def q01(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(to_date(col("l_shipdate")) <= lit("2000-12-31"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dround(sum("l_quantity"), 2).as("sum_qty"),
        dround(sum("l_extendedprice"), 2).as("sum_base_price"),
        dround(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        dround(sum(net), 2).as("sum_charge"),
        dround(avg("l_quantity"), 6).as("avg_qty"),
        dround(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"),
      )

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice*(1.0-l_discount)), 2) AS sum_disc_price,
      | round(sum(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)), 2) AS sum_charge,
      | round(avg(l_quantity), 6) AS avg_qty,
      | round(avg(l_discount), 6) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-31'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** Star join fact→dims (J1): revenue by region/nation. Dims are
    * broadcast (small at any SF); the lineitem⋈orders shuffle is the one
    * genuinely large exchange and both sides hash on the join key.
    */
  /** Memoized per-(dir, projection-key) ANALYZE stats — the catalog a
    * CBO reads (VERDICT r12 item 8): statistics are table-version
    * state, computed once (one small aggregate over the dim side) and
    * consulted by every planning decision after, never re-measured per
    * query. Keyed by a caller-chosen name so distinct projections of
    * one table get distinct entries.
    */
  private val statsCache =
    scala.collection.concurrent.TrieMap[(String, String), graft.operators.CostModel.TableStats]()

  private[graft] def statsOf(dir: String, key: String,
      df: => DataFrame): graft.operators.CostModel.TableStats =
    statsCache.getOrElseUpdate((dir, key), graft.operators.CostModel.analyze(df))

  /** Star join (J1 shape) with STATS-DRIVEN sides: the orders and
    * customer joins go through [[graft.operators.CostModel.dimJoin]],
    * so broadcast-vs-shuffle is a pinned function of the measured
    * ANALYZE stats (q56's pass-1 numbers) rather than Spark's
    * compressed-file-size heuristic. At every test sf both dims fit the
    * 32 MB in-memory budget and broadcast (same plan as the r1–r12
    * hinted form — PlanSpec pins it); the flip to an explicit shuffle
    * join at budget overflow is PlanSpec-pinned on planted frames.
    * nation/region stay unconditionally hinted (25/5 rows — measuring
    * them would cost more than broadcasting them).
    */
  def q02(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CostModel
    val orders = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val customer = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
    val j1 = CostModel.dimJoin(li, orders,
      col("l_orderkey") === col("o_orderkey"),
      statsOf(dir, "orders_keys", orders))
    val j2 = CostModel.dimJoin(j1, customer,
      col("o_custkey") === col("c_custkey"),
      statsOf(dir, "customer_keys", customer))
    j2
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        dround(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"),
      )
  }

  private val q02Sql =
    """SELECT r_name, n_name,
      | round(sum(l_extendedprice*(1.0-l_discount)), 2) AS revenue,
      | count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q03
  /** Settlement balance per charge (A2/J2 — SALDO_FACTURA semantics). */
  def q03(s: SparkSession, dir: String): DataFrame =
    saldoDf(s, dir).select("o_orderkey", "o_custkey", "saldo")

  private val q03Sql =
    s"""WITH $saldoSqlCte
       |SELECT o_orderkey, o_custkey, saldo FROM saldo""".stripMargin

  // ---------------------------------------------------------------- q04
  /** Left-semi join (J4/J5): orders having a returned item. */
  def q04(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(
        Tables.lineitem(s, dir).filter(col("l_returnflag") === "R").select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"),
        "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"), dround(col("o_totalprice"), 2).as("totalprice"))

  private val q04Sql =
    """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS totalprice
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')""".stripMargin

  // ------------------------------------------------------------- q04b
  /** Left-anti join: orders with NO returned item (complement of q04). */
  def q04b(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(
        Tables.lineitem(s, dir).filter(col("l_returnflag") === "R").select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"),
        "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"))

  private val q04bSql =
    """SELECT o_orderkey, o_orderstatus
      |FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')""".stripMargin

  // ---------------------------------------------------------------- q05
  /** Full-outer join of charge-side vs credit-side aggregates (J6,
    * /root/reference/src/analytics.py:322-331), fillna(0).
    */
  def q05(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val cAgg = o.groupBy("o_orderpriority").agg(
      count(lit(1)).as("n_orders"),
      dround(sum("o_totalprice"), 2).as("total_charges"))
    val rAgg = Tables.lineitem(s, dir)
      .join(o.select("o_orderkey", "o_orderpriority"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), dround(sum(net), 2).as("total_credits"))
    cAgg.join(rAgg, Seq("o_orderpriority"), "full_outer")
      .na.fill(0L, Seq("n_orders", "n_items"))
      .na.fill(0.0, Seq("total_charges", "total_credits"))
  }

  private val q05Sql =
    s"""SELECT coalesce(c.o_orderpriority, r.o_orderpriority) AS o_orderpriority,
       | coalesce(c.n_orders, 0) AS n_orders,
       | coalesce(c.total_charges, 0.0) AS total_charges,
       | coalesce(r.n_items, 0) AS n_items,
       | coalesce(r.total_credits, 0.0) AS total_credits
       |FROM (SELECT o_orderpriority, count(*) AS n_orders,
       |             round(sum(o_totalprice), 2) AS total_charges
       |      FROM orders GROUP BY 1) c
       |FULL OUTER JOIN
       |     (SELECT o.o_orderpriority, count(*) AS n_items,
       |             round(sum($netSql), 2) AS total_credits
       |      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |      GROUP BY 1) r
       |  ON c.o_orderpriority = r.o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q06
  /** FLAGSHIP — aging report (antigüedad de cartera, SURVEY §7.3):
    * settlement balance → open charges → days-past-due → 8 configured
    * buckets → count/sum/pct + TOTAL row (A3 + F2/F3 + A19).
    */
  def q06(s: SparkSession, dir: String): DataFrame = {
    val open = saldoDf(s, dir)
      .filter(col("saldo") > 0)
      .withColumn("due", date_add(to_date(col("o_orderdate")), GraftConf.termDays))
      .withColumn("mora", datediff(lit(asOf).cast("date"), col("due")))
    val bucket = Buckets.bucketize(col("mora"), GraftConf.agingRanges, "fuera_de_rango")
    // rollup + grouping_id: bucket rows AND the TOTAL row in ONE pass —
    // a union of agg + re-agg would execute the whole saldo join twice
    // (visible as two identical subtrees in the physical plan).
    val agg = open
      .rollup(bucket.as("categoria_mora"))
      .agg(count(lit(1)).as("n_facturas"), dround(sum("saldo"), 2).as("saldo_total"),
        grouping_id().as("gid"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    agg
      .withColumn("tot", max(when(col("gid") === 1, col("saldo_total"))).over(wAll))
      .select(
        coalesce(col("categoria_mora"), lit("TOTAL")).as("categoria_mora"),
        when(col("gid") === 1, 99)
          .otherwise(Buckets.bucketOrdinal(col("categoria_mora"), GraftConf.agingRanges))
          .cast("int").as("orden"),
        col("n_facturas"),
        col("saldo_total"),
        when(col("gid") === 1, 1.0)
          .otherwise(dround(col("saldo_total") / col("tot"), 6)).as("pct"))
  }

  private val q06Sql = {
    val moraExpr = s"CAST(date_diff('day', due, DATE '$asOf') AS INT)"
    val caseExpr = Buckets.bucketizeSql("mora", GraftConf.agingRanges, "fuera_de_rango")
    val ordExpr = Buckets.bucketOrdinalSql("categoria_mora", GraftConf.agingRanges)
    s"""WITH $saldoSqlCte,
       |open_inv AS (
       |  SELECT *, $moraExpr AS mora
       |  FROM (SELECT *, CAST(o_orderdate AS DATE) + ${GraftConf.termDays} AS due
       |        FROM saldo WHERE saldo > 0)),
       |agg AS (
       |  SELECT categoria_mora, GROUPING(categoria_mora) AS gid,
       |         count(*) AS n_facturas, round(sum(saldo), 2) AS saldo_total
       |  FROM (SELECT saldo, $caseExpr AS categoria_mora FROM open_inv)
       |  GROUP BY ROLLUP(categoria_mora))
       |SELECT coalesce(categoria_mora, 'TOTAL') AS categoria_mora,
       |  CAST(CASE WHEN gid = 1 THEN 99 ELSE $ordExpr END AS INT) AS orden,
       |  n_facturas, saldo_total,
       |  CASE WHEN gid = 1 THEN CAST(1.0 AS DOUBLE)
       |       ELSE round(saldo_total /
       |            max(CASE WHEN gid = 1 THEN saldo_total END) OVER (), 6)
       |  END AS pct
       |FROM agg""".stripMargin
  }

  // ---------------------------------------------------------------- q07
  /** Grouped running balance (W1 — SALDO_CLIENTE): charges(+) and
    * payments(−) of an account, ordered cumulative sum per account.
    */
  def q07(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val ch = o.select(
      col("o_custkey").as("acct"),
      to_date(col("o_orderdate")).as("d"),
      col("o_orderkey").as("docid"),
      lit(0).as("sub"),
      col("o_totalprice").as("amt"))
    val pay = Tables.lineitem(s, dir)
      .join(o.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .select(
        col("o_custkey").as("acct"),
        to_date(col("l_shipdate")).as("d"),
        col("l_orderkey").as("docid"),
        col("l_linenumber").as("sub"),
        (-net).as("amt"))
    // NOTE: (docid, sub) is not unique in the synthetic lineitem data —
    // `amt` is the final tiebreaker that makes the running sum a
    // deterministic multiset (equal-amt ties commute).
    //
    // The ledger runs in INTEGER CENTS: movements are cent-quantized
    // once, then the window sums longs — exact and association-free, so
    // the balance is bit-stable at any scale and against any engine.
    // (Double accumulation differed from the oracle's segment-tree
    // window sum by an ulp on 12 of 750k rows at sf0.1 — enough to flip
    // a x.xx5 rounding boundary.)
    val uni = ch.unionByName(pay)
      .withColumn("amt_cents", round(col("amt") * 100).cast("long"))
    Balances.runningBalance(
      uni,
      partitionCols = Seq(col("acct")),
      orderCols = Seq(col("d").asc, col("docid").asc, col("sub").asc, col("amt").asc),
      signedAmount = col("amt_cents"))
      .select(col("acct"), date_format(col("d"), "yyyy-MM-dd").as("d"),
        col("docid"), col("sub"),
        (col("amt_cents") / 100.0).as("amt"),
        (col("running_balance") / 100.0).as("running_balance"))
  }

  private val q07Sql =
    s"""WITH uni AS (
       |  SELECT o_custkey AS acct, CAST(o_orderdate AS DATE) AS d,
       |         o_orderkey AS docid, 0 AS sub, o_totalprice AS amt
       |  FROM orders
       |  UNION ALL
       |  SELECT o.o_custkey, CAST(l.l_shipdate AS DATE), l.l_orderkey,
       |         l.l_linenumber, -($netSql)
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
       |SELECT acct, strftime(d, '%Y-%m-%d') AS d, docid, sub,
       |  CAST(round(amt * 100) AS BIGINT) / 100.0 AS amt,
       |  CAST(sum(CAST(round(amt * 100) AS BIGINT))
       |       OVER (PARTITION BY acct ORDER BY d, docid, sub, amt
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |       AS BIGINT) / 100.0 AS running_balance
       |FROM uni""".stripMargin

  // ---------------------------------------------------------------- q08
  /** Pareto/ABC concentration (A13/W2) over open balances per account. */
  def q08(s: SparkSession, dir: String): DataFrame = {
    val perC = saldoDf(s, dir)
      .filter(col("saldo") > 0)
      .groupBy("o_custkey")
      .agg(dround(sum("saldo"), 2).as("saldo_pendiente"))
    Pareto.abc(perC, col("o_custkey"), col("saldo_pendiente"))
  }

  private val q08Sql =
    s"""WITH $saldoSqlCte,
       |perc AS (
       |  SELECT o_custkey, round(sum(saldo), 2) AS saldo_pendiente
       |  FROM saldo WHERE saldo > 0 GROUP BY 1),
       |w AS (
       |  SELECT *,
       |    CAST(row_number() OVER (ORDER BY saldo_pendiente DESC, o_custkey) AS INT) AS rnk,
       |    count(*) OVER () AS n,
       |    sum(saldo_pendiente) OVER () AS tot,
       |    sum(saldo_pendiente) OVER (ORDER BY saldo_pendiente DESC, o_custkey
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM perc)
       |SELECT o_custkey, saldo_pendiente, rnk,
       |  round(saldo_pendiente / tot, 6) AS pct,
       |  CASE WHEN rnk = n THEN CAST(1.0 AS DOUBLE)
       |       ELSE round(cum / tot, 6) END AS pct_acumulado,
       |  CASE WHEN rnk = 1 THEN 'A'
       |       WHEN cum / tot <= ${GraftConf.abcA} THEN 'A'
       |       WHEN cum / tot <= ${GraftConf.abcB} THEN 'B'
       |       ELSE 'C' END AS clase_abc
       |FROM w""".stripMargin

  // ---------------------------------------------------------------- q09
  /** Two-pass z-score outlier flags (A16) over order amounts. */
  def q09(s: SparkSession, dir: String): DataFrame =
    ZScore.withZScore(
      Tables.orders(s, dir).select("o_orderkey", "o_totalprice"),
      col("o_totalprice"), "z_totalprice", "atipico", GraftConf.zThreshold)
      .select("o_orderkey", "z_totalprice", "atipico")

  private val q09Sql =
    s"""WITH st AS (SELECT avg(o_totalprice) AS mu,
       |                   stddev_samp(o_totalprice) AS sigma,
       |                   count(o_totalprice) AS nn FROM orders),
       |z AS (
       |  SELECT o_orderkey,
       |    CASE WHEN st.nn >= 3 AND st.sigma > 0
       |         THEN round(abs((o_totalprice - st.mu) / st.sigma), 4) END
       |      AS z_totalprice
       |  FROM orders, st)
       |SELECT o_orderkey, z_totalprice,
       |  coalesce(z_totalprice > ${GraftConf.zThreshold}, false) AS atipico
       |FROM z""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Top-k (O5): top 10 accounts by settled revenue, explicit rank. */
  def q10(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(dround(sum(net), 2).as("revenue"))
    // orderBy+limit plans as TakeOrderedAndProject — per-partition top-k
    // heaps merged on the driver — instead of funnelling EVERY per-account
    // aggregate through one single-partition window task. Only the k
    // survivors (a constant) are then numbered by a window.
    rev.orderBy(col("revenue").desc, col("o_custkey").asc).limit(10)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("revenue").desc, col("o_custkey").asc)))
  }

  private val q10Sql =
    s"""SELECT * FROM (
       |  SELECT o_custkey, revenue,
       |    CAST(row_number() OVER (ORDER BY revenue DESC, o_custkey) AS INT) AS rnk
       |  FROM (SELECT o.o_custkey, round(sum($netSql), 2) AS revenue
       |        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |        GROUP BY 1))
       |WHERE rnk <= 10""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Pivot (A4): order totals by nation × order status. */
  def q11(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select("o_custkey", "o_orderstatus", "o_totalprice")
      .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum("o_totalprice"))
      .select(
        col("n_name"),
        dround(coalesce(col("F"), lit(0.0)), 2).as("total_f"),
        dround(coalesce(col("O"), lit(0.0)), 2).as("total_o"),
        dround(coalesce(col("P"), lit(0.0)), 2).as("total_p"))

  private val q11Sql =
    """SELECT n_name,
      | round(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0.0), 2) AS total_f,
      | round(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0.0), 2) AS total_o,
      | round(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0.0), 2) AS total_p
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Alternating band groups (W3) over the customer dimension —
    * presentation-layer operator on small report output.
    */
  def q12(s: SparkSession, dir: String): DataFrame =
    Balances.bandGroups(
      Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
      orderCols = Seq(col("c_nationkey").asc))
      .select("c_custkey", "c_nationkey", "band")

  private val q12Sql =
    """SELECT c_custkey, c_nationkey,
      | CAST(dense_rank() OVER (ORDER BY c_nationkey) % 2 AS INT) AS band
      |FROM customer""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Dual sort (O2) as an explicit, hashable rank: positive balances desc
    * first, then the rest by name.
    */
  def q13(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select("c_custkey", "c_name", "c_acctbal")
    val keys = TotalRow.dualSortKey(col("c_acctbal"), col("c_name")) :+ col("c_custkey").asc
    // rankBy auto-dispatches: global window at report cardinality,
    // range-partitioned two-phase rank (exact same integers) at scale.
    Pareto.rankBy(c, keys, "srt_rank")
      .select(
        col("c_custkey"),
        when(col("c_acctbal") > 0, "positivos").otherwise("no_positivos").as("block"),
        col("srt_rank"))
  }

  private val q13Sql =
    """SELECT c_custkey,
      | CASE WHEN c_acctbal > 0 THEN 'positivos' ELSE 'no_positivos' END AS block,
      | CAST(row_number() OVER (ORDER BY
      |   (c_acctbal > 0) DESC,
      |   CASE WHEN c_acctbal > 0 THEN -c_acctbal END ASC NULLS LAST,
      |   c_name ASC, c_custkey ASC) AS INT) AS srt_rank
      |FROM customer""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Data-quality profile (A17): nulls + exact distinct per column, one
    * distributed pass, melted to one row per column.
    */
  def q14(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val cols = c.columns.toSeq
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(cn => Seq(
        sum(when(col(cn).isNull, 1).otherwise(0)).as(s"null_$cn"),
        countDistinct(col(cn)).as(s"dist_$cn")))
    val one = c.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map(cn =>
      struct(
        lit(cn).as("column_name"),
        col("n_rows"),
        col(s"null_$cn").as("n_null"),
        col(s"dist_$cn").as("n_distinct")))
    one.select(explode(array(structs: _*)).as("p")).select("p.*")
  }

  private val q14Sql = {
    val c = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    c.map(cn =>
      s"""SELECT '$cn' AS column_name, count(*) AS n_rows,
         | CAST(sum(CASE WHEN $cn IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         | count(DISTINCT $cn) AS n_distinct
         |FROM customer""".stripMargin).mkString("\nUNION ALL\n")
  }

  // ---------------------------------------------------------------- q15
  /** Collection-delay categorization (F2/F3 — CATEGORIA_RECAUDO): days
    * from charge to settlement, bucketized from config.
    */
  def q15(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount", "l_tax")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("delta", datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))))
    val bucket = Buckets.bucketize(col("delta"), GraftConf.collectionRanges, "fuera_de_rango")
    d.groupBy(bucket.as("categoria_recaudo"))
      .agg(
        count(lit(1)).as("n_pagos"),
        dround(avg("delta"), 4).as("delta_promedio"),
        dround(sum(net), 2).as("monto_total"))
      .withColumn("orden", Buckets.bucketOrdinal(col("categoria_recaudo"), GraftConf.collectionRanges))
  }

  private val q15Sql = {
    val deltaExpr = "CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS INT)"
    val caseExpr = Buckets.bucketizeSql("delta", GraftConf.collectionRanges, "fuera_de_rango")
    val ordExpr = Buckets.bucketOrdinalSql("categoria_recaudo", GraftConf.collectionRanges)
    s"""SELECT categoria_recaudo, count(*) AS n_pagos,
       | round(avg(delta), 4) AS delta_promedio,
       | round(sum($netSql), 2) AS monto_total,
       | $ordExpr AS orden
       |FROM (SELECT l.*, $deltaExpr AS delta,
       |             $caseExpr AS categoria_recaudo
       |      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
       |GROUP BY categoria_recaudo""".stripMargin
  }

  // ---------------------------------------------------------------- q16
  /** TOTAL-row idiom via rollup + grouping (A19) — the scalable form of
    * the reference's literal-row append.
    */
  def q16(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        dround(sum("l_quantity"), 2).as("sum_qty"),
        dround(sum(net), 2).as("sum_net"))
      .select(
        coalesce(col("l_returnflag"), lit("TOTAL")).as("l_returnflag"),
        col("n_rows"), col("sum_qty"), col("sum_net"))

  private val q16Sql =
    s"""SELECT coalesce(l_returnflag, 'TOTAL') AS l_returnflag,
       | count(*) AS n_rows,
       | round(sum(l_quantity), 2) AS sum_qty,
       | round(sum($netSql), 2) AS sum_net
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag)""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Conditional projection CARGOS/ABONOS (P1/F1) aggregated per status. */
  def q17(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_linestatus")
      .agg(
        dround(sum(when(col("l_returnflag").isin("A", "N"), net).otherwise(0.0)), 2).as("cargos"),
        dround(sum(when(col("l_returnflag") === "R", net).otherwise(0.0)), 2).as("abonos"),
        count(lit(1)).as("n_rows"))

  private val q17Sql =
    s"""SELECT l_linestatus,
       | round(sum(CASE WHEN l_returnflag IN ('A','N') THEN $netSql ELSE 0.0 END), 2) AS cargos,
       | round(sum(CASE WHEN l_returnflag = 'R' THEN $netSql ELSE 0.0 END), 2) AS abonos,
       | count(*) AS n_rows
       |FROM lineitem
       |GROUP BY l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Market-basket association rules: every unordered part pair that
    * co-occurs in >= 2 orders, with support, directional confidence and
    * lift. The per-order basket is `distinct(orderkey, partkey)`; pair
    * generation is a self-equi-join on the order key (fan-out bounded by
    * max basket size, ~7 here), NEVER part x part.
    *
    * Scale: baskets shuffle once on orderkey (both join sides share the
    * exchange); item supports are vocabulary-sized and broadcast into the
    * pair aggregate; n_orders is a broadcast scalar. At 100 TB the only
    * quadratic term is per-basket (cap giant baskets upstream, qd19-style);
    * integer counts keep support/confidence/lift exact up to 2^53.
    */
  def q38(s: SparkSession, dir: String): DataFrame =
    basketRulesFrom(Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")))

  /** Frame-parameterized twin (tests plant baskets): `items` carries
    * (ok, pk) membership rows; duplicates are collapsed here.
    */
  private[graft] def basketRulesFrom(items: DataFrame): DataFrame = {
    // r17 (guide §2.4): materialize the distinct basket membership ONCE.
    // `op` feeds THREE consumers (n_orders, item supports, both sides of
    // the pair self-join); without the cut the r16-close executed plan
    // re-ran the scan+distinct up to 5 times (5 distinct parquet-scan
    // nodes, plans/r17/q38_before.txt) because AQE re-plans each branch
    // and exchange reuse only survives for the two join sides. One
    // ~2-long-column materialization replaces four recomputes.
    val op = graft.operators.Checkpoints.cut(
      items.select("ok", "pk").distinct())
    val nOrders = op.agg(count_distinct(col("ok")).as("n_orders"))
    val item = op.groupBy("pk").agg(count(lit(1)).as("item_cnt"))
    val pairs = op.as("a")
      .join(op.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= 2)
    pairs
      .join(broadcast(item.select(col("pk").as("p1"), col("item_cnt").as("cnt1"))), Seq("p1"))
      .join(broadcast(item.select(col("pk").as("p2"), col("item_cnt").as("cnt2"))), Seq("p2"))
      .crossJoin(broadcast(nOrders))
      .select(
        col("p1"), col("p2"), col("pair_cnt"),
        dround(col("pair_cnt") / col("n_orders"), 6).as("support"),
        dround(col("pair_cnt") / col("cnt1"), 6).as("conf_p1_p2"),
        dround(col("pair_cnt") / col("cnt2"), 6).as("conf_p2_p1"),
        dround((col("pair_cnt") * col("n_orders")) / (col("cnt1") * col("cnt2")), 6).as("lift"))
  }

  private val q38Sql =
    """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM op),
      |item AS (SELECT pk, CAST(count(*) AS BIGINT) AS item_cnt FROM op GROUP BY pk),
      |pairs AS (
      |  SELECT a.pk AS p1, b.pk AS p2, CAST(count(*) AS BIGINT) AS pair_cnt
      |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT p1, p2, pair_cnt,
      |  round(pair_cnt / n_orders, 6) AS support,
      |  round(pair_cnt / i1.item_cnt, 6) AS conf_p1_p2,
      |  round(pair_cnt / i2.item_cnt, 6) AS conf_p2_p1,
      |  round((pair_cnt * n_orders) / (i1.item_cnt * i2.item_cnt), 6) AS lift
      |FROM pairs
      |JOIN item i1 ON pairs.p1 = i1.pk
      |JOIN item i2 ON pairs.p2 = i2.pk
      |CROSS JOIN n""".stripMargin

  // ---------------------------------------------------------------- q39
  /** CDC snapshot diff: classify every key across two table snapshots as
    * insert / delete / update (unchanged rows drop out). The snapshots are
    * derived deterministically from `orders` so the op is oracle-checkable:
    * the "old" snapshot misses keys with orderkey%10=3 (those become
    * inserts), the "new" one misses orderkey%13=5 (deletes) and reprices
    * orderkey%7=2 rows by +5% (updates).
    *
    * Scale: ONE full-outer sort-merge join, both sides hash-partitioned on
    * the primary key — the canonical snapshot-reconciliation shape. At
    * 100 TB both snapshots would be bucketed by key on disk so the diff
    * runs exchange-free; presence flags (not value nullability) drive the
    * classification so NULL-valued attributes can't masquerade as absence.
    */
  def q39(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val snapOld = o.filter(col("o_orderkey") % 10 =!= 3)
      .select(col("o_orderkey"), col("o_totalprice").as("old_price"),
        col("o_orderstatus").as("old_status"), lit(1).as("old_present"))
    val snapNew = o.filter(col("o_orderkey") % 13 =!= 5)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 2, dround(col("o_totalprice") * 1.05, 2))
          .otherwise(col("o_totalprice")).as("new_price"),
        col("o_orderstatus").as("new_status"), lit(1).as("new_present"))
    snapOld.join(snapNew, Seq("o_orderkey"), "full_outer")
      .withColumn("change_op",
        when(col("old_present").isNull, "insert")
          .when(col("new_present").isNull, "delete")
          .when(col("old_price") =!= col("new_price") ||
            col("old_status") =!= col("new_status"), "update")
          .otherwise("unchanged"))
      .filter(col("change_op") =!= "unchanged")
      .select("o_orderkey", "change_op", "old_price", "new_price")
  }

  private val q39Sql =
    """WITH snap_old AS (
      |  SELECT o_orderkey, o_totalprice AS old_price, o_orderstatus AS old_status,
      |         1 AS old_present
      |  FROM orders WHERE o_orderkey % 10 != 3),
      |snap_new AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 7 = 2 THEN round(o_totalprice * 1.05, 2)
      |              ELSE o_totalprice END AS new_price,
      |         o_orderstatus AS new_status, 1 AS new_present
      |  FROM orders WHERE o_orderkey % 13 != 5),
      |diff AS (
      |  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      |    CASE WHEN a.old_present IS NULL THEN 'insert'
      |         WHEN b.new_present IS NULL THEN 'delete'
      |         WHEN a.old_price != b.new_price OR a.old_status != b.new_status
      |           THEN 'update'
      |         ELSE 'unchanged' END AS change_op,
      |    a.old_price, b.new_price
      |  FROM snap_old a FULL OUTER JOIN snap_new b ON a.o_orderkey = b.o_orderkey)
      |SELECT o_orderkey, change_op, old_price, new_price
      |FROM diff WHERE change_op != 'unchanged'""".stripMargin

  // ---------------------------------------------------------------- q42
  /** Join-key skew report: for every hot join/aggregation keyspace in
    * the lake (order, part, customer, user, source), the group-size
    * distribution a planner reads before choosing salting/AQE-skew
    * handling — key count, the heaviest key's row share, exact p50/p99
    * group sizes, and the Gini coefficient of the size distribution.
    *
    * Exactness: quantiles are the sizes at integer ranks ((n+1) div 2,
    * ceil(99n/100)) of the (size, key)-ordered ranking — ties carry
    * equal sizes, so the picked VALUE is deterministic; Gini's
    * Σ rank·size accumulates in Decimal(38,0) (exact past 2^63) and the
    * final ratio divides two exact decimals.
    *
    * Scale: each keyspace is one partial-agged shuffle to sizes, then
    * Pareto.rankBy's two-phase global rank (no single-partition window
    * above the threshold); per-keyspace output is ONE row.
    */
  def q42(s: SparkSession, dir: String): DataFrame = {
    // only user_id is read; int64-nanos footer readability comes from
    // GraftConf.bootstrap at session setup, never from in-query conf
    def keyspace(name: String, rows: DataFrame, key: Column): DataFrame = {
      val sizes = rows.groupBy(key.as("k")).agg(count(lit(1)).as("c"))
      val ranked = graft.operators.Pareto.rankBy(
        sizes, Seq(col("c").asc, col("k").asc), "r")
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val stats = ranked.agg(
        count(lit(1)).as("n_keys"), sum("c").as("n_rows"), max("c").as("max_size"),
        sum(dec(col("r")) * col("c")).as("s1"))
      val quant = ranked.crossJoin(broadcast(stats)).agg(
        max(when(col("r") === expr("(n_keys + 1) div 2"), col("c"))).as("p50_size"),
        max(when(col("r") === expr("(99 * n_keys + 99) div 100"), col("c"))).as("p99_size"))
      stats.crossJoin(quant).select(
        lit(name).as("keyspace"), col("n_rows"), col("n_keys"),
        dround(col("max_size") / col("n_rows"), 6).as("max_share"),
        col("p50_size"), col("p99_size"),
        dround(
          (lit(2) * col("s1") - dec(col("n_keys") + 1) * col("n_rows")).cast("double") /
            (dec(col("n_keys")) * col("n_rows")).cast("double"), 6).as("gini"))
    }
    keyspace("lineitem.l_orderkey", Tables.lineitem(s, dir), col("l_orderkey"))
      .unionByName(keyspace("lineitem.l_partkey", Tables.lineitem(s, dir), col("l_partkey")))
      .unionByName(keyspace("orders.o_custkey", Tables.orders(s, dir), col("o_custkey")))
      .unionByName(keyspace("events.user_id", Tables.events(s, dir), col("user_id")))
      .unionByName(keyspace("documents.source", Tables.documents(s, dir), col("source")))
  }

  private val q42Sql = {
    def block(name: String, table: String, key: String) =
      s"""SELECT '$name' AS keyspace, n_rows, n_keys,
         |  round(max_size / n_rows, 6) AS max_share, p50_size, p99_size,
         |  round(CAST(2 * s1 - (n_keys + 1) * CAST(n_rows AS HUGEINT) AS DOUBLE)
         |        / CAST(CAST(n_keys AS HUGEINT) * n_rows AS DOUBLE), 6) AS gini
         |FROM (
         |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         |         CAST(sum(c) AS BIGINT) AS n_rows,
         |         CAST(max(c) AS BIGINT) AS max_size,
         |         sum(CAST(r AS HUGEINT) * c) AS s1,
         |         CAST(max(CASE WHEN r = (n_keys_pre + 1) // 2 THEN c END) AS BIGINT)
         |           AS p50_size,
         |         CAST(max(CASE WHEN r = (99 * n_keys_pre + 99) // 100 THEN c END) AS BIGINT)
         |           AS p99_size
         |  FROM (
         |    SELECT c, k, row_number() OVER (ORDER BY c, k) AS r,
         |           count(*) OVER () AS n_keys_pre
         |    FROM (SELECT $key AS k, CAST(count(*) AS BIGINT) AS c
         |          FROM $table GROUP BY 1)))""".stripMargin
    Seq(
      block("lineitem.l_orderkey", "lineitem", "l_orderkey"),
      block("lineitem.l_partkey", "lineitem", "l_partkey"),
      block("orders.o_custkey", "orders", "o_custkey"),
      block("events.user_id", "events", "user_id"),
      block("documents.source", "documents", "source")
    ).mkString("\nUNION ALL\n")
  }

  // ---------------------------------------------------------------- q43
  /** PageRank over the co-purchase graph: nodes are parts, edges the
    * q38 pairs (co-occurring in >= 2 orders, symmetrized), 10 power
    * iterations at damping 0.85, top-50 by rank. The whole computation
    * runs in INTEGER mass units (total mass 1e12): the per-edge
    * contribution is `(mass * 85) div (100 * outdeg)` and the
    * teleportation base `(15% of mass) div N` — floor losses are
    * deterministic and identical across engines, so the output is exact
    * BIGINT, no float anywhere. The oracle is a recursive CTE carrying
    * an iteration counter through the same integer arithmetic.
    *
    * Scale: each iteration is ONE equi-join of the edge list (keyed on
    * the source node) against the rank vector plus one destination-keyed
    * aggregation — the Pregel shape; co-partitioning edges and ranks on
    * the node key makes iterations exchange-light, and Checkpoints.cut
    * (localCheckpoint locally; reliable checkpoint() when
    * `graft.checkpoint.dir` is set — the cluster/dynamic-allocation
    * mode, VERDICT r10 item 5)
    * cuts the 10-step lineage. Graph size is vocabulary-scale (parts),
    * not corpus-scale.
    */
  /** Canonical (p1 < p2) co-purchase edges: part pairs sharing >= 2
    * orders — the graph under q43 (PageRank) and q44 (triangles).
    */
  private def copurchasePairs(s: SparkSession, dir: String): DataFrame = {
    // r17 (guide §2.4): same materialize-once as q38's `op` — both
    // sides of the basket self-join re-derived the scan+distinct when
    // AQE's per-branch re-planning dropped the exchange reuse, so
    // q43/q44/q45 each paid the lineitem scan twice.
    val op = graft.operators.Checkpoints.cut(
      Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct())
    op.as("a")
      .join(op.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select("p1", "p2")
  }

  def q43(s: SparkSession, dir: String): DataFrame = {
    val pairs = copurchasePairs(s, dir)
    graft.operators.Pareto.rankBy(
        pagerankMass(pairs), Seq(col("mass").desc, col("node").asc), "rnk")
      .filter(col("rnk") <= 50)
      .select(col("node").as("part"), col("mass").as("rank_mass"),
        col("rnk").cast("int").as("rnk"))
  }

  /** Integer-mass power iteration over an undirected pair list (p1, p2)
    * — symmetrized here; 10 rounds, damping 85/100, total mass 1e12.
    * Frame-parameterized so tests can plant graphs.
    */
  private[graft] def pagerankMass(pairs: DataFrame): DataFrame = {
    // r17: measured and deliberately NOT cutting `pairs` here — the
    // union's two branches do re-run the pair join+aggregate, but they
    // run inside ONE job and overlap, while an extra eager cut adds a
    // serial job barrier that costs more than the duplicate at bench
    // scale (A/B in OPTIMIZATION_r17.md §1); the corpus-scale
    // duplication (the lineitem scan+distinct) is already cut inside
    // copurchasePairs, which is the piece that matters at 100 TB.
    val edges = graft.operators.Checkpoints.cut(
      pairs.select(col("p1").as("u"), col("p2").as("v"))
        .unionByName(pairs.select(col("p2").as("u"), col("p1").as("v"))))
    val deg = edges.groupBy("u").agg(count(lit(1)).as("d"))
    val n = deg.count()
    // r18 (guide §2.4: operations keyed the same way share one
    // exchange): the static per-edge state is hash-partitioned by the
    // DESTINATION v once, the checkpoint preserves that partitioning,
    // and the rank table — node-cardinality, counted above — is
    // broadcast into each round while it fits the broadcast class. A
    // round is then scan → BroadcastHashJoin → partial+final agg with
    // NO exchange: the 10 iterations shuffle nothing. Beyond the
    // broadcast bound (catalog-scale rank at 100 TB) the join falls
    // back to the planner's choice and the v-partitioning still feeds
    // the aggregate. 10M nodes ≈ 160 MB built — the dimJoin class.
    val bcastRank = n <= 10000000L
    val edgeDeg = graft.operators.Checkpoints.cut(
      edges.join(deg, Seq("u")).repartition(col("v")))
    var rank = deg.select(col("u").as("node"), lit(1000000000000L / n).as("mass"))
    for (_ <- 1 to 10) {
      rank = graft.operators.Checkpoints.cut(
        edgeDeg.join(if (bcastRank) broadcast(rank) else rank,
            col("u") === col("node"))
          .select(col("v"), expr("(mass * 85) div (100 * d)").as("c"))
          .groupBy(col("v").as("node"))
          .agg((lit(150000000000L / n) + sum("c")).as("mass")))
    }
    rank
  }

  private val q43Sql =
    """WITH RECURSIVE
      |op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |pairs AS (
      |  SELECT a.pk AS p1, b.pk AS p2
      |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |edges AS (SELECT p1 AS u, p2 AS v FROM pairs
      |          UNION ALL SELECT p2, p1 FROM pairs),
      |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
      |pr(iter, node, mass) AS (
      |  SELECT 0, u, CAST(1000000000000 // n AS BIGINT) FROM deg, nn
      |  UNION ALL
      |  SELECT iter + 1, e.v,
      |         CAST(150000000000 // any_value(n)
      |              + sum((mass * 85) // (100 * d)) AS BIGINT)
      |  FROM pr
      |  JOIN edges e ON pr.node = e.u
      |  JOIN deg ON deg.u = pr.node
      |  CROSS JOIN nn
      |  WHERE iter < 10
      |  GROUP BY iter + 1, e.v)
      |SELECT node AS part, mass AS rank_mass, rnk FROM (
      |  SELECT node, mass,
      |         CAST(row_number() OVER (ORDER BY mass DESC, node) AS INT) AS rnk
      |  FROM pr WHERE iter = 10)
      |WHERE rnk <= 50""".stripMargin

  // ---------------------------------------------------------------- q44
  /** Triangle counting + local clustering coefficients on the
    * co-purchase graph. The engine enumerates via DEGREE ORIENTATION
    * (compact-forward): every edge directs from its lower-(degree, id)
    * endpoint to the higher one, wedges fan out only from a node's
    * out-neighbors, and a closing edge is probed in the canonical pair
    * set — each triangle found exactly once, wedge fan-out bounded by
    * out-degree ~ sqrt(m) instead of the raw hub degree. The oracle
    * counts the same triangles by plain a<b<c enumeration; both are
    * deterministic, so outputs hash-match while the ENGINE carries the
    * skew-safe shape.
    *
    * Scale: three equi-joins on vertex keys; orientation is THE
    * standard hub-skew mitigation for distributed triangle counting.
    */
  def q44(s: SparkSession, dir: String): DataFrame =
    trianglesFrom(copurchasePairs(s, dir).localCheckpoint())

  /** Frame-parameterized twin (tests plant graphs): canonical p1 < p2
    * edges in, per-node (degree, triangles, clustering coeff) out.
    */
  private[graft] def trianglesFrom(pairs: DataFrame): DataFrame = {
    val deg = pairs.select(col("p1").as("u"))
      .unionByName(pairs.select(col("p2").as("u")))
      .groupBy("u").agg(count(lit(1)).as("d"))
    val withDeg = pairs
      .join(deg.select(col("u").as("p1"), col("d").as("d1")), Seq("p1"))
      .join(deg.select(col("u").as("p2"), col("d").as("d2")), Seq("p2"))
    val directed = withDeg.select(
      when(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("p1") < col("p2")), col("p1"))
        .otherwise(col("p2")).as("src"),
      when(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("p1") < col("p2")), col("p2"))
        .otherwise(col("p1")).as("dst"))
    val wedges = directed.as("e1")
      .join(directed.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val tri = wedges.join(pairs,
      col("b") === col("p1") && col("c") === col("p2"))
    val tcnt = tri.select(explode(array(col("a"), col("b"), col("c"))).as("u"))
      .groupBy("u").agg(count(lit(1)).as("t"))
    deg.join(tcnt, Seq("u"), "left")
      .select(col("u").as("part"), col("d").as("degree"),
        coalesce(col("t"), lit(0L)).as("triangles"),
        when(col("d") >= 2,
          dround(lit(2.0) * coalesce(col("t"), lit(0L)) /
            (col("d") * (col("d") - 1)), 6))
          .otherwise(lit(0.0)).as("clustering_coeff"))
  }

  private val q44Sql =
    """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |pairs AS (
      |  SELECT a.pk AS p1, b.pk AS p2
      |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d
      |        FROM (SELECT p1 AS u FROM pairs UNION ALL SELECT p2 FROM pairs)
      |        GROUP BY u),
      |tri AS (
      |  SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
      |  FROM pairs e1
      |  JOIN pairs e2 ON e2.p1 = e1.p1 AND e1.p2 < e2.p2
      |  JOIN pairs e3 ON e3.p1 = e1.p2 AND e3.p2 = e2.p2),
      |tcnt AS (
      |  SELECT u, CAST(count(*) AS BIGINT) AS t
      |  FROM (SELECT a AS u FROM tri UNION ALL SELECT b FROM tri
      |        UNION ALL SELECT c FROM tri)
      |  GROUP BY u)
      |SELECT deg.u AS part, d AS degree, COALESCE(t, 0) AS triangles,
      |  CASE WHEN d >= 2
      |    THEN round(2.0 * COALESCE(t, 0) / (d * (d - 1)), 6)
      |    ELSE CAST(0.0 AS DOUBLE) END AS clustering_coeff
      |FROM deg LEFT JOIN tcnt ON deg.u = tcnt.u""".stripMargin

  // ---------------------------------------------------------------- q45
  /** Community detection via synchronous majority label propagation
    * (Raghavan et al. 2007) on the co-purchase graph: labels start as
    * node ids; each of 5 rounds every node adopts the most frequent
    * label among its neighbors, ties broken by the SMALLEST label —
    * fully deterministic, so unlike the usual randomized LPA this is
    * oracle-gradable (the DuckDB twin runs the identical rounds in a
    * recursive CTE with a window-function mode pick). Communities are
    * denser than connected components: a bridge edge joins components
    * but majority voting keeps the two sides' labels apart.
    *
    * Scale: each round is one source-keyed edge join + one
    * destination-keyed (node, label) count + a per-node top-1 window —
    * the Pregel shape again; lineage cut per round.
    */
  def q45(s: SparkSession, dir: String): DataFrame =
    lpaFrom(copurchasePairs(s, dir))

  /** Frame-parameterized twin (tests plant graphs): canonical p1 < p2
    * edges in, (part, community, community_size) out after 5 rounds.
    */
  private[graft] def lpaFrom(pairs: DataFrame): DataFrame = {
    // r17: `pairs` deliberately not cut — see the pagerankMass comment
    // r18: same per-round zero-exchange shape as pagerankMass — edges
    // pre-partitioned by v (HashPartitioning on v satisfies both the
    // (v, label) aggregate's clustering and the per-v window), labels
    // broadcast while node-cardinality fits the broadcast class
    val edges = graft.operators.Checkpoints.cut(
      pairs.select(col("p1").as("u"), col("p2").as("v"))
        .unionByName(pairs.select(col("p2").as("u"), col("p1").as("v")))
        .repartition(col("v")))
    var labels = edges.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    val bcastLabels = labels.count() <= 10000000L
    for (_ <- 1 to 5) {
      labels = graft.operators.Checkpoints.cut(
        edges.join(if (bcastLabels) broadcast(labels) else labels,
            col("u") === col("node"))
          .groupBy(col("v"), col("label")).agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("v").orderBy(col("c").desc, col("label").asc)))
          .filter(col("rn") === 1)
          .select(col("v").as("node"), col("label")))
    }
    labels
      .withColumn("community_size",
        count(lit(1)).over(Window.partitionBy("label")))
      .select(col("node").as("part"), col("label").as("community"),
        col("community_size"))
  }

  private val q45Sql =
    """WITH RECURSIVE
      |op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |pairs AS (
      |  SELECT a.pk AS p1, b.pk AS p2
      |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |edges AS (SELECT p1 AS u, p2 AS v FROM pairs
      |          UNION ALL SELECT p2, p1 FROM pairs),
      |lp(iter, node, label) AS (
      |  SELECT 0, u, u FROM (SELECT DISTINCT u FROM edges)
      |  UNION ALL
      |  SELECT iter + 1, node, label FROM (
      |    SELECT iter, node, nl AS label,
      |           row_number() OVER (PARTITION BY node ORDER BY c DESC, nl) AS rn
      |    FROM (SELECT lp.iter AS iter, e.v AS node, lp.label AS nl,
      |                 count(*) AS c
      |          FROM lp JOIN edges e ON lp.node = e.u
      |          WHERE lp.iter < 5 GROUP BY 1, 2, 3))
      |  WHERE rn = 1)
      |SELECT node AS part, label AS community,
      |       CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS community_size
      |FROM lp WHERE iter = 5""".stripMargin

  // ---------------------------------------------------------------- q46
  /** Referential-integrity audit: the cross-table consistency checks an
    * ingest gate runs before a snapshot is published — FK orphans in
    * both directions, childless parents, duplicate child keys, and
    * domain-range violations — one row per check with exact violation
    * counts and fractions. (The duplicate-(orderkey, linenumber) check
    * is EXPECTED to fire on this synthetic data — the audit reports,
    * it does not assume.)
    *
    * Scale: every check is an anti/semi join or aggregate keyed on the
    * FK — partial-agged, broadcastable on the dimension side; output is
    * checks-count rows.
    */
  def q46(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    // n_checked is a 1-row count aggregate broadcast into the single
    // check row — NOT a driver-side .count(), which would run two full
    // scans at DataFrame-CONSTRUCTION time (ADVICE r10: building the
    // query for a plan probe must stay lazy)
    def check(name: String, violations: DataFrame, checked: DataFrame): DataFrame = {
      violations.agg(count(lit(1)).as("n_violations"))
        .crossJoin(broadcast(checked))
        .select(lit(name).as("check_name"), col("n_violations"),
          col("n_checked"),
          dround(col("n_violations") / col("n_checked"), 6).as("violation_frac"))
    }
    val nLi = li.agg(count(lit(1)).as("n_checked"))
    val nO = o.agg(count(lit(1)).as("n_checked"))
    check("lineitem_orphan_order",
        li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti"), nLi)
      .unionByName(check("order_orphan_customer",
        o.join(c, o("o_custkey") === c("c_custkey"), "left_anti"), nO))
      .unionByName(check("order_without_lineitems",
        o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti"), nO))
      .unionByName(check("duplicate_lineitem_key",
        li.groupBy("l_orderkey", "l_linenumber").agg(count(lit(1)).as("n"))
          .filter(col("n") > 1), nLi))
      .unionByName(check("nonpositive_quantity",
        li.filter(col("l_quantity") <= 0), nLi))
      .unionByName(check("nonpositive_totalprice",
        o.filter(col("o_totalprice") <= 0), nO))
  }

  private val q46Sql =
    """SELECT 'lineitem_orphan_order' AS check_name,
      |  CAST(count(*) AS BIGINT) AS n_violations,
      |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_checked,
      |  round(count(*) / (SELECT count(*) FROM lineitem), 6) AS violation_frac
      |FROM lineitem l WHERE NOT EXISTS
      |  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |UNION ALL
      |SELECT 'order_orphan_customer', CAST(count(*) AS BIGINT),
      |  (SELECT CAST(count(*) AS BIGINT) FROM orders),
      |  round(count(*) / (SELECT count(*) FROM orders), 6)
      |FROM orders o WHERE NOT EXISTS
      |  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |UNION ALL
      |SELECT 'order_without_lineitems', CAST(count(*) AS BIGINT),
      |  (SELECT CAST(count(*) AS BIGINT) FROM orders),
      |  round(count(*) / (SELECT count(*) FROM orders), 6)
      |FROM orders o WHERE NOT EXISTS
      |  (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      |UNION ALL
      |SELECT 'duplicate_lineitem_key', CAST(count(*) AS BIGINT),
      |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
      |  round(count(*) / (SELECT count(*) FROM lineitem), 6)
      |FROM (SELECT l_orderkey, l_linenumber FROM lineitem
      |      GROUP BY 1, 2 HAVING count(*) > 1)
      |UNION ALL
      |SELECT 'nonpositive_quantity', CAST(count(*) AS BIGINT),
      |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
      |  round(count(*) / (SELECT count(*) FROM lineitem), 6)
      |FROM lineitem WHERE l_quantity <= 0
      |UNION ALL
      |SELECT 'nonpositive_totalprice', CAST(count(*) AS BIGINT),
      |  (SELECT CAST(count(*) AS BIGINT) FROM orders),
      |  round(count(*) / (SELECT count(*) FROM orders), 6)
      |FROM orders WHERE o_totalprice <= 0""".stripMargin

  // ---------------------------------------------------------------- q47
  /** CUBE aggregate over (returnflag, linestatus, ship year): all 8
    * grouping combinations in one pass — the multi-dimensional rollup
    * surface beyond q16's one-dimension ROLLUP. Subtotal rows label
    * collapsed dimensions 'ALL' (these columns are never NULL in the
    * data, so the coalesce is unambiguous). Revenue goes through
    * integer cents so even the grand-total row (a sum over the whole
    * table) is association-order-proof.
    *
    * Scale: Spark plans CUBE as one Expand (x8) + one partial-agged
    * shuffle — rows multiply by the grouping-set count BEFORE the
    * map-side combine, so the exchange still carries only group-sized
    * data. The shape is identical at any corpus size.
    */
  def q47(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        year(col("l_shipdate")).cast("string").as("ship_year"),
        col("l_quantity"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .cube(col("l_returnflag"), col("l_linestatus"), col("ship_year"))
      .agg(
        count(lit(1)).as("n_rows"),
        dround(sum("l_quantity"), 2).as("sum_qty"),
        (sum("cents") / 100.0).as("revenue"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        coalesce(col("ship_year"), lit("ALL")).as("ship_year"),
        col("n_rows"), col("sum_qty"), col("revenue"))

  private val q47Sql =
    """SELECT
      |  coalesce(l_returnflag, 'ALL') AS l_returnflag,
      |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
      |  coalesce(ship_year, 'ALL') AS ship_year,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  CAST(sum(cents) AS BIGINT) / 100.0 AS revenue
      |FROM (
      |  SELECT l_returnflag, l_linestatus,
      |         CAST(year(l_shipdate) AS VARCHAR) AS ship_year,
      |         l_quantity,
      |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem)
      |GROUP BY CUBE (l_returnflag, l_linestatus, ship_year)""".stripMargin

  // ---------------------------------------------------------------- q48
  /** SCD type-2 dimension build over q39's two snapshots: every key's
    * history as versioned rows with [valid_from, valid_to) epochs (0 =
    * the old snapshot's load, 1 = the new one's, NULL = open-ended) and
    * an `is_current` flag — the warehouse-canonical slowly-changing
    * dimension materialization, where q39 only CLASSIFIES the change:
    *   unchanged → one open row from 0        updated → closed old
    *   insert    → one open row from 1                  [0,1) + open new
    *   delete    → one closed row [0,1)                 from 1
    *
    * Scale: one full-outer key join (identical to q39) followed by a
    * map-only row expansion — history never reshuffles; bucketed
    * snapshots make the whole build exchange-free.
    */
  /** The deterministic synthetic snapshots under the SCD2 queries
    * (epoch 0 and 1 for q48; epoch 2 for q48b's incremental apply) —
    * exposed so Scd2Spec can chain the generic operator over the same
    * extracts the batch rebuild sees.
    */
  private[graft] def q48SnapOld(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_orderkey") % 10 =!= 3)
      .select(col("o_orderkey"), col("o_totalprice").as("price"))

  private[graft] def q48SnapNew(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_orderkey") % 13 =!= 5)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 2, dround(col("o_totalprice") * 1.05, 2))
          .otherwise(col("o_totalprice")).as("price"))

  private[graft] def q48Snap2(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_orderkey") % 11 =!= 4)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 5 === 1, dround(col("o_totalprice") * 1.08, 2))
          .otherwise(col("o_totalprice")).as("price"))

  def q48(s: SparkSession, dir: String): DataFrame = {
    val snapOld = q48SnapOld(s, dir)
      .select(col("o_orderkey"), col("price").as("old_price"),
        lit(1).as("old_present"))
    val snapNew = q48SnapNew(s, dir)
      .select(col("o_orderkey"), col("price").as("new_price"),
        lit(1).as("new_present"))
    val joined = snapOld.join(snapNew, Seq("o_orderkey"), "full_outer")
    val intNull = lit(null).cast("int")
    // old-era row: exists when the key was in the old snapshot; closes
    // at epoch 1 iff the key changed or vanished
    val oldRow = joined.filter(col("old_present").isNotNull)
      .select(col("o_orderkey"), col("old_price").as("price"),
        lit(0).as("valid_from"),
        when(col("new_present").isNull ||
          col("old_price") =!= col("new_price"), lit(1)).otherwise(intNull)
          .as("valid_to"))
    // new-era row: exists when the key changed or was inserted
    val newRow = joined.filter(col("new_present").isNotNull &&
        (col("old_present").isNull || col("old_price") =!= col("new_price")))
      .select(col("o_orderkey"), col("new_price").as("price"),
        lit(1).as("valid_from"), intNull.as("valid_to"))
    oldRow.unionByName(newRow)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** The q48 dimension build as a CTE chain ending at `rows_out` —
    * shared verbatim by the q48 oracle and q48b's incremental oracle
    * (which merges the epoch-2 snapshot on top of it).
    */
  private val q48Ctes =
    """WITH snap_old AS (
      |  SELECT o_orderkey, o_totalprice AS old_price, 1 AS old_present
      |  FROM orders WHERE o_orderkey % 10 != 3),
      |snap_new AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 7 = 2 THEN round(o_totalprice * 1.05, 2)
      |              ELSE o_totalprice END AS new_price, 1 AS new_present
      |  FROM orders WHERE o_orderkey % 13 != 5),
      |joined AS (
      |  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      |         a.old_price, a.old_present, b.new_price, b.new_present
      |  FROM snap_old a FULL OUTER JOIN snap_new b
      |    ON a.o_orderkey = b.o_orderkey),
      |rows_out AS (
      |  SELECT o_orderkey, old_price AS price, 0 AS valid_from,
      |         CASE WHEN new_present IS NULL OR old_price != new_price
      |              THEN 1 END AS valid_to
      |  FROM joined WHERE old_present IS NOT NULL
      |  UNION ALL
      |  SELECT o_orderkey, new_price, 1, NULL
      |  FROM joined
      |  WHERE new_present IS NOT NULL
      |    AND (old_present IS NULL OR old_price != new_price))""".stripMargin

  private val q48Sql =
    s"""$q48Ctes
       |SELECT o_orderkey, price, valid_from, valid_to,
       |       valid_to IS NULL AS is_current
       |FROM rows_out""".stripMargin

  // --------------------------------------------------------------- q48b
  /** Incremental SCD2 upsert (VERDICT r11 item 3): apply the NEXT
    * snapshot (epoch 2 — its own deterministic presence/price rules,
    * giving updates, reverts, deletes AND reappearing keys, since the
    * epoch-1 deletes mod 13 mostly return) against the EXISTING q48
    * dimension via the generic [[graft.operators.Scd2.merge]] — close
    * changed/deleted current rows at 2, open new versions `[2, NULL)`,
    * pass closed history through untouched. This is the daily CDC loop
    * the reference's rebuild-per-run master assembly
    * (/root/reference/src/data_transformer.py:160-197) cannot express
    * incrementally; Scd2Spec pins that chaining init+merge over the
    * same snapshots reproduces q48's batch rebuild row-for-row.
    *
    * Scale: closed history streams through untouched; only the current
    * slice (≤1 row/live key) joins the day's snapshot on the key — one
    * key-shuffle per run regardless of how deep history grows.
    */
  def q48b(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scd2.merge(
      q48(s, dir), q48Snap2(s, dir), "o_orderkey", Seq("price"), 2)

  private val q48bSql =
    s"""$q48Ctes,
       |dim AS (
       |  SELECT o_orderkey, price, valid_from, valid_to,
       |         valid_to IS NULL AS is_current
       |  FROM rows_out),
       |snap2 AS (
       |  SELECT o_orderkey,
       |         CASE WHEN o_orderkey % 5 = 1 THEN round(o_totalprice * 1.08, 2)
       |              ELSE o_totalprice END AS s_price, 1 AS s_present
       |  FROM orders WHERE o_orderkey % 11 != 4),
       |cur AS (
       |  SELECT o_orderkey, price, valid_from, 1 AS c_present
       |  FROM dim WHERE is_current),
       |j AS (
       |  SELECT COALESCE(c.o_orderkey, s.o_orderkey) AS o_orderkey,
       |         c.price, c.valid_from, c.c_present, s.s_price, s.s_present
       |  FROM cur c FULL OUTER JOIN snap2 s ON c.o_orderkey = s.o_orderkey),
       |merged AS (
       |  SELECT o_orderkey, price, valid_from,
       |         CASE WHEN s_present IS NULL OR price IS DISTINCT FROM s_price
       |              THEN 2 END AS valid_to
       |  FROM j WHERE c_present IS NOT NULL
       |  UNION ALL
       |  SELECT o_orderkey, s_price, 2, NULL FROM j
       |  WHERE s_present IS NOT NULL
       |    AND (c_present IS NULL OR price IS DISTINCT FROM s_price)
       |  UNION ALL
       |  SELECT o_orderkey, price, valid_from, valid_to
       |  FROM dim WHERE NOT is_current)
       |SELECT o_orderkey, price, valid_from, valid_to,
       |       valid_to IS NULL AS is_current
       |FROM merged""".stripMargin

  // ---------------------------------------------------------------- q49
  /** Year-over-year revenue growth per return flag: yearly integer-cents
    * revenue with the previous year's figure (lag over the per-flag
    * year series) and the growth percentage — the period-over-period
    * reporting pattern (lag over an AGGREGATE, not over raw rows). The
    * first year of each series and zero-base years yield NULL growth
    * rather than an infinity.
    *
    * Scale: one partial-agged shuffle to (flag, year); the lag window
    * runs on the years-sized aggregate. Integer cents make every
    * revenue and delta exact.
    */
  def q49(s: SparkSession, dir: String): DataFrame = {
    val yearly = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), year(col("l_shipdate")).as("ship_year"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .groupBy("l_returnflag", "ship_year")
      .agg(sum("cents").as("cents"))
    val w = Window.partitionBy("l_returnflag").orderBy(col("ship_year").asc)
    yearly
      .withColumn("prev_cents", lag("cents", 1).over(w))
      .select(
        col("l_returnflag"), col("ship_year").cast("int").as("ship_year"),
        (col("cents") / 100.0).as("revenue"),
        (col("prev_cents") / 100.0).as("prev_revenue"),
        when(col("prev_cents").isNotNull && col("prev_cents") =!= 0,
          dround((col("cents") - col("prev_cents")).cast("double")
            / col("prev_cents") * 100.0, 6)).as("yoy_pct"))
  }

  private val q49Sql =
    """WITH yearly AS (
      |  SELECT l_returnflag, CAST(year(l_shipdate) AS INT) AS ship_year,
      |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |           AS cents
      |  FROM lineitem GROUP BY 1, 2),
      |lagged AS (
      |  SELECT l_returnflag, ship_year, cents,
      |         lag(cents, 1) OVER (PARTITION BY l_returnflag
      |                             ORDER BY ship_year) AS prev_cents
      |  FROM yearly)
      |SELECT l_returnflag, ship_year,
      |  cents / 100.0 AS revenue,
      |  prev_cents / 100.0 AS prev_revenue,
      |  CASE WHEN prev_cents IS NOT NULL AND prev_cents != 0
      |    THEN round(CAST(cents - prev_cents AS DOUBLE) / prev_cents * 100.0, 6)
      |  END AS yoy_pct
      |FROM lagged""".stripMargin

  // ---------------------------------------------------------------- q50
  /** Point-in-time (as-of) lookup of facts against the q48 SCD2
    * dimension: every lineitem carries a deterministic fact epoch
    * (l_linenumber % 2) and picks the dimension version whose
    * [valid_from, valid_to) interval covers it — the standard
    * warehouse PIT join that q48 only BUILDS the input for. Facts on
    * keys with no version valid at their epoch (pre-insert reads,
    * post-delete reads) surface as NULL price/is_current rather than
    * being dropped, so late and early arrivals stay auditable.
    *
    * Scale: the interval predicate rides on an EQUI-join on the
    * dimension key — never an interval cross-product — and SCD2 keys
    * carry at most 2 versions, so the range filter scans O(1) rows per
    * fact. One shuffle on the key (or zero with bucketed fact/dim);
    * the dimension side broadcasts when it fits.
    */
  def q50(s: SparkSession, dir: String): DataFrame = {
    val dim = q48(s, dir)
    val facts = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_linenumber") % 2).cast("int").as("fact_epoch"))
    facts.join(dim,
        facts("l_orderkey") === dim("o_orderkey") &&
          dim("valid_from") <= col("fact_epoch") &&
          (dim("valid_to").isNull || col("fact_epoch") < dim("valid_to")),
        "left")
      .select(col("l_orderkey"), col("l_linenumber"), col("fact_epoch"),
        col("price"), col("is_current"))
  }

  private val q50Sql =
    """WITH snap_old AS (
      |  SELECT o_orderkey, o_totalprice AS old_price, 1 AS old_present
      |  FROM orders WHERE o_orderkey % 10 != 3),
      |snap_new AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 7 = 2 THEN round(o_totalprice * 1.05, 2)
      |              ELSE o_totalprice END AS new_price, 1 AS new_present
      |  FROM orders WHERE o_orderkey % 13 != 5),
      |joined AS (
      |  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      |         a.old_price, a.old_present, b.new_price, b.new_present
      |  FROM snap_old a FULL OUTER JOIN snap_new b
      |    ON a.o_orderkey = b.o_orderkey),
      |dim AS (
      |  SELECT o_orderkey, price, valid_from, valid_to,
      |         valid_to IS NULL AS is_current
      |  FROM (
      |    SELECT o_orderkey, old_price AS price, 0 AS valid_from,
      |           CASE WHEN new_present IS NULL OR old_price != new_price
      |                THEN 1 END AS valid_to
      |    FROM joined WHERE old_present IS NOT NULL
      |    UNION ALL
      |    SELECT o_orderkey, new_price, 1, NULL
      |    FROM joined
      |    WHERE new_present IS NOT NULL
      |      AND (old_present IS NULL OR old_price != new_price))),
      |facts AS (
      |  SELECT l_orderkey, l_linenumber,
      |         CAST(l_linenumber % 2 AS INT) AS fact_epoch
      |  FROM lineitem)
      |SELECT f.l_orderkey, f.l_linenumber, f.fact_epoch,
      |       d.price, d.is_current
      |FROM facts f
      |LEFT JOIN dim d
      |  ON f.l_orderkey = d.o_orderkey
      | AND d.valid_from <= f.fact_epoch
      | AND (d.valid_to IS NULL OR f.fact_epoch < d.valid_to)""".stripMargin

  // ---------------------------------------------------------------- q52
  /** k-anonymity privacy audit over the customer quasi-identifiers
    * (nation, market segment, account-balance band): for each candidate
    * k the number of equivalence classes, how many fall below k, how
    * many ROWS sit in those under-k classes, and the at-risk row
    * percentage — the release-gate report a training-data pipeline runs
    * before shipping user-derived records.
    *
    * Scale: one partial-agged shuffle to equivalence-class sizes; the
    * k sweep is a broadcast cross of the already-aggregated class table
    * with a 4-row threshold frame. Class counts are exact longs; the
    * only division is the final percentage.
    */
  def q52(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val classes = Tables.customer(s, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      .agg(count(lit(1)).as("class_size"))
    val thresholds = Seq(2, 5, 10, 20).toDF("k")
    classes.crossJoin(broadcast(thresholds))
      .groupBy("k")
      .agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("class_size") < col("k"), 1L).otherwise(0L))
          .as("classes_at_risk"),
        sum(when(col("class_size") < col("k"), col("class_size"))
          .otherwise(0L)).as("rows_at_risk"),
        min("class_size").as("min_class_size"),
        sum("class_size").as("n_rows"))
      .select(col("k"), col("n_classes"), col("classes_at_risk"),
        col("rows_at_risk"), col("min_class_size"),
        dround(col("rows_at_risk") * 100.0 / col("n_rows"), 6)
          .as("pct_rows_at_risk"))
  }

  private val q52Sql =
    """WITH classes AS (
      |  SELECT c_nationkey, c_mktsegment,
      |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
      |         CAST(count(*) AS BIGINT) AS class_size
      |  FROM customer GROUP BY 1, 2, 3),
      |ks AS (SELECT unnest([2, 5, 10, 20]) AS k)
      |SELECT k,
      |  CAST(count(*) AS BIGINT) AS n_classes,
      |  CAST(sum(CASE WHEN class_size < k THEN 1 ELSE 0 END) AS BIGINT)
      |    AS classes_at_risk,
      |  CAST(sum(CASE WHEN class_size < k THEN class_size ELSE 0 END) AS BIGINT)
      |    AS rows_at_risk,
      |  min(class_size) AS min_class_size,
      |  round(sum(CASE WHEN class_size < k THEN class_size ELSE 0 END) * 100.0
      |        / sum(class_size), 6) AS pct_rows_at_risk
      |FROM classes CROSS JOIN ks
      |GROUP BY k""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Incremental aggregate maintenance: the per-customer order aggregate
    * (count, revenue, average ticket) of the NEW snapshot, computed by
    * folding the classified CDC delta into the OLD snapshot's
    * materialized aggregate via [[graft.operators.DeltaAgg.maintain]] —
    * the base facts are never rescanned. Snapshots reuse q39's
    * deterministic presence/reprice rules (carrying o_custkey), so the
    * delta has real inserts, deletes and updates; the oracle recomputes
    * the new snapshot directly, proving the incremental path lands on
    * the identical aggregate.
    *
    * Exactness: revenue flows as Long cents end to end (delta
    * maintenance compounds run-over-run, so float drift is
    * disqualifying); the only doubles are the final display divisions,
    * in the same operation order as the oracle.
    *
    * Scale: see DeltaAgg — delta-sized shuffle + key-join against the
    * keyspace-sized aggregate; at 100 TB the aggregate is bucketed by
    * custkey on disk and the base side runs exchange-free.
    */
  private[graft] def q53Snaps(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val cents = dround(col("o_totalprice") * 100, 0).cast("long")
    val o = Tables.orders(s, dir)
    val old = o.filter(col("o_orderkey") % 10 =!= 3)
      .select(col("o_orderkey"), col("o_custkey"), cents.as("cents"))
    val neu = o.filter(col("o_orderkey") % 13 =!= 5)
      .select(col("o_orderkey"), col("o_custkey"),
        when(col("o_orderkey") % 7 === 2,
          dround(dround(col("o_totalprice") * 1.05, 2) * 100, 0).cast("long"))
          .otherwise(cents).as("cents"))
    (old, neu)
  }

  /** The classified change feed between the q53 snapshots — shared with
    * the streaming maintenance spec (AggMaintenanceSpec), which replays
    * it in micro-batches.
    */
  private[graft] def q53Delta(s: SparkSession, dir: String): DataFrame = {
    val (snapOld, snapNew) = q53Snaps(s, dir)
    snapOld.select(col("o_orderkey"), col("o_custkey"),
        col("cents").as("old_v"), lit(1).as("old_present"))
      .join(snapNew.select(col("o_orderkey"),
        col("o_custkey").as("new_custkey"), col("cents").as("new_v"),
        lit(1).as("new_present")), Seq("o_orderkey"), "full_outer")
      .withColumn("op",
        when(col("old_present").isNull, "insert")
          .when(col("new_present").isNull, "delete")
          .when(col("old_v") =!= col("new_v"), "update"))
      .filter(col("op").isNotNull)
      .select(coalesce(col("o_custkey"), col("new_custkey")).as("o_custkey"),
        col("op"), col("old_v"), col("new_v"))
  }

  def q53(s: SparkSession, dir: String): DataFrame = {
    val (snapOld, _) = q53Snaps(s, dir)
    val baseAgg = snapOld.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
    graft.operators.DeltaAgg.maintain(baseAgg, q53Delta(s, dir), "o_custkey")
      .select(col("o_custkey"), col("n").as("n_orders"),
        (col("s") / 100.0).as("revenue"),
        dround(col("s") / 100.0 / col("n"), 2).as("avg_order"))
  }

  private val q53Sql =
    """WITH snap_new AS (
      |  SELECT o_custkey,
      |         CAST(round(CASE WHEN o_orderkey % 7 = 2
      |                    THEN round(o_totalprice * 1.05, 2)
      |                    ELSE o_totalprice END * 100, 0) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 13 != 5)
      |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(cents) AS BIGINT) / 100.0 AS revenue,
      |       round(CAST(sum(cents) AS BIGINT) / 100.0 / count(*), 2)
      |         AS avg_order
      |FROM snap_new GROUP BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q54
  /** Small-file compaction planner (the OPTIMIZE step of 100 TB table
    * maintenance): per table partition (ship month), group lineitem's
    * write units into "files" (supplier bucket grain), size them, and
    * pack files into target-sized compaction bins by next-fit-
    * decreasing — sort descending by size, walk the cumulative sum,
    * open a new bin every `target` bytes. NFD is the member of the
    * packing family expressible as one window pass (first-fit needs
    * per-bin state); its 2·OPT bound is fine for compaction, where the
    * target is a soft ceiling. The target adapts to the partition
    * (4× the partition's mean file size, integer arithmetic so both
    * engines agree bit-for-bit).
    *
    * Scale: file statistics are metadata — millions of rows, not
    * billions — and the window partitions by table partition, so the
    * plan never funnels through one task; the expensive part (the
    * stats scan) is one partial-agged shuffle of the fact table, which
    * production replaces with the table format's file manifest.
    */
  def q54(s: SparkSession, dir: String): DataFrame = {
    val files = Tables.lineitem(s, dir)
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
        (col("l_suppkey") % 16).cast("int").as("file_id"))
      .agg((count(lit(1)) * 48L).as("file_bytes"))
    val byMonth = Window.partitionBy("ship_month")
    val packOrder = byMonth.orderBy(col("file_bytes").desc, col("file_id").asc)
    val planned = files
      .withColumn("target_bytes",
        lit(4L) * floor(sum("file_bytes").over(byMonth)
          / count(lit(1)).over(byMonth)).cast("long"))
      .withColumn("cum_before",
        coalesce(sum("file_bytes").over(packOrder.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / col("target_bytes")).cast("int"))
    val byBin = Window.partitionBy("ship_month", "bin")
    planned
      .withColumn("bin_files", count(lit(1)).over(byBin))
      .withColumn("bin_bytes", sum("file_bytes").over(byBin))
      .select("ship_month", "file_id", "file_bytes", "target_bytes",
        "bin", "bin_files", "bin_bytes")
  }

  private val q54Sql =
    """WITH files AS (
      |  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
      |         CAST(l_suppkey % 16 AS INT) AS file_id,
      |         CAST(count(*) * 48 AS BIGINT) AS file_bytes
      |  FROM lineitem GROUP BY 1, 2),
      |planned AS (
      |  SELECT *,
      |    4 * CAST(floor(sum(file_bytes) OVER (PARTITION BY ship_month)
      |          / count(*) OVER (PARTITION BY ship_month)) AS BIGINT)
      |      AS target_bytes,
      |    COALESCE(sum(file_bytes) OVER (PARTITION BY ship_month
      |        ORDER BY file_bytes DESC, file_id ASC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cum_before
      |  FROM files),
      |binned AS (
      |  SELECT ship_month, file_id, file_bytes, target_bytes,
      |         CAST(floor(cum_before / target_bytes) AS INT) AS bin
      |  FROM planned)
      |SELECT ship_month, file_id, file_bytes, target_bytes, bin,
      |       CAST(count(*) OVER (PARTITION BY ship_month, bin) AS BIGINT)
      |         AS bin_files,
      |       CAST(sum(file_bytes) OVER (PARTITION BY ship_month, bin) AS BIGINT)
      |         AS bin_bytes
      |FROM binned""".stripMargin

  // ---------------------------------------------------------------- q55
  /** Data-layout study: zone-map file-skipping effectiveness of three
    * physical orderings of the fact table — natural (insertion) order,
    * single-key sort, and Morton/z-order interleave of two query
    * dimensions — the OPTIMIZE ZORDER decision of 100 TB table
    * maintenance, quantified. Rows are packed into ~128 equal files per
    * layout; each file's per-dimension [min,max] is its zone map; the
    * expected fraction of files a uniform point predicate must scan is
    * exactly the mean normalized span (and, for a two-dimension
    * conjunctive predicate, the mean normalized span PRODUCT). The
    * output shows the trade the layout choice buys: single-key sort is
    * ~1/n_files on its key but ~1 on the other — a suppkey-only query
    * scans everything — while z-order bounds BOTH dims (~1/√n_files
    * each at sf0.1: 0.125/0.173 vs sorted's 0.012/1.0). Sort still
    * wins the conjunctive-point product (its one tiny dim prunes
    * alone); interleave is the choice when the workload predicates on
    * either dimension independently.
    *
    * Exactness: dimensions are 8-bit key buckets, the z-value is a pure
    * 16-term bit interleave, and ranks come from the two-phase rankBy.
    * Rank ties are interchangeable BY CONSTRUCTION: every ordering ends
    * with (pb, sb), so rows tied on the full key agree on both measured
    * columns and any tie resolution yields identical per-file min/max —
    * the property that makes a row_number layout oracle-comparable.
    * Span sums stay integer; the only divisions are the three final
    * display means.
    *
    * Scale: three global sort-ranks of the fact table (each the
    * exchange a real rewrite would pay anyway — this IS the shuffle
    * OPTIMIZE executes), then file-count-sized aggregates. No
    * all-pairs anything; the summary is 3 rows.
    */
  private def zInterleave8(pb: Column, sb: Column): Column =
    (0 until 8).foldLeft(lit(0)) { (acc, i) =>
      acc + shiftleft(shiftright(pb, i).bitwiseAND(lit(1)), 2 * i + 1) +
        shiftleft(shiftright(sb, i).bitwiseAND(lit(1)), 2 * i)
    }

  def q55(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_partkey") % 256).cast("int").as("pb"),
        (col("l_suppkey") % 256).cast("int").as("sb"))
      .withColumn("z", zInterleave8(col("pb"), col("sb")))
    val nRow = base.agg(count(lit(1)).as("n"))
    def spans(layout: String, keys: Seq[Column]): DataFrame =
      graft.operators.Pareto.rankBy(base, keys, "r")
        .crossJoin(broadcast(nRow))
        .withColumn("file_id", expr("(r - 1) div ((n + 127) div 128)"))
        .groupBy("file_id")
        .agg((max("pb") - min("pb") + 1).as("pspan"),
          (max("sb") - min("sb") + 1).as("sspan"))
        .agg(count(lit(1)).as("n_files"), sum("pspan").as("ps"),
          sum("sspan").as("ss"),
          sum(col("pspan").cast("long") * col("sspan")).as("xs"))
        .select(lit(layout).as("layout"), col("n_files"),
          dround(col("ps") / (col("n_files") * 256.0), 6).as("avg_part_span"),
          dround(col("ss") / (col("n_files") * 256.0), 6).as("avg_supp_span"),
          dround(col("xs") / (col("n_files") * 65536.0), 6).as("avg_point_scan"))
    spans("natural", Seq(col("l_orderkey").asc, col("l_linenumber").asc,
        col("pb").asc, col("sb").asc))
      .unionByName(spans("partkey_sorted", Seq(col("pb").asc, col("sb").asc)))
      .unionByName(spans("zorder", Seq(col("z").asc, col("pb").asc, col("sb").asc)))
  }

  private val q55Sql = {
    val zExpr = (0 until 8).map(i =>
      s"(((pb >> $i) & 1) << ${2 * i + 1}) + (((sb >> $i) & 1) << ${2 * i})")
      .mkString(" + ")
    s"""WITH base AS (
       |  SELECT l_orderkey, l_linenumber,
       |         CAST(l_partkey % 256 AS INT) AS pb,
       |         CAST(l_suppkey % 256 AS INT) AS sb
       |  FROM lineitem),
       |zb AS (SELECT *, $zExpr AS z FROM base),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
       |lay AS (
       |  SELECT 'natural' AS layout, pb, sb,
       |         row_number() OVER (ORDER BY l_orderkey, l_linenumber, pb, sb) AS r
       |  FROM zb
       |  UNION ALL
       |  SELECT 'partkey_sorted', pb, sb, row_number() OVER (ORDER BY pb, sb)
       |  FROM zb
       |  UNION ALL
       |  SELECT 'zorder', pb, sb, row_number() OVER (ORDER BY z, pb, sb)
       |  FROM zb),
       |files AS (
       |  SELECT layout, (r - 1) // ((n + 127) // 128) AS file_id, pb, sb
       |  FROM lay, nn),
       |spans AS (
       |  SELECT layout, file_id,
       |         max(pb) - min(pb) + 1 AS pspan,
       |         max(sb) - min(sb) + 1 AS sspan
       |  FROM files GROUP BY 1, 2)
       |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
       |       round(CAST(sum(pspan) AS BIGINT) / (count(*) * 256.0), 6)
       |         AS avg_part_span,
       |       round(CAST(sum(sspan) AS BIGINT) / (count(*) * 256.0), 6)
       |         AS avg_supp_span,
       |       round(CAST(sum(CAST(pspan AS BIGINT) * sspan) AS BIGINT)
       |             / (count(*) * 65536.0), 6) AS avg_point_scan
       |FROM spans GROUP BY layout""".stripMargin
  }

  // ---------------------------------------------------------------- q56
  /** ANALYZE-style column statistics for the fact table — the metadata
    * pass a cost-based optimizer (join reorder, broadcast decisions)
    * and the q54/q55 layout planners feed on: per column, row count,
    * null count, exact NDV, min and max. Two passes by design: a cheap
    * no-distinct aggregate (counts/nulls/min/max, per-column rows via
    * exploding a struct array over the one aggregate row), then NDVs
    * through an unpivot + two-phase distinct — NOT the one-agg
    * multi-count(distinct) Expand, whose ×K fan-out has no map-side
    * value collapse (measured 4× slower; PlanSpec pins Expand absent).
    *
    * Exactness: min/max are computed on the NATIVE type and cast to
    * string afterwards (lexicographic min of stringified numbers would
    * be wrong); bigint→string and date→string render identically in
    * both engines. At 100 TB the exact NDVs swap for HLL sketches
    * (qd20b's dispatch argument) — here exact is the oracle anchor.
    */
  private val q56Cols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_shipdate", "l_returnflag")

  def q56(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // pass 1 (cheap, no distinct): counts, nulls, native-typed min/max
    val aggs = count(lit(1)).as("n_rows") +: q56Cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
      min(col(c)).cast("string").as(s"mn_$c"),
      max(col(c)).cast("string").as(s"mx_$c")))
    val one = li.agg(aggs.head, aggs.tail: _*)
    val basic = one.select(col("n_rows"), explode(array(q56Cols.map(c => struct(
        lit(c).as("column_name"),
        col(s"nn_$c").as("n_nulls"),
        col(s"mn_$c").as("min_value"), col(s"mx_$c").as("max_value"))): _*))
        .as("st"))
      .select(col("st.column_name").as("column_name"), col("n_rows"),
        col("st.n_nulls").as("n_nulls"),
        col("st.min_value").as("min_value"), col("st.max_value").as("max_value"))
    // pass 2: exact NDVs via unpivot + two-phase distinct — the map-side
    // partial collapses repeated values per column before the shuffle,
    // which the one-agg multi-distinct Expand cannot (measured 7.5 s →
    // ~2 s at sf0.1); string casting is injective for these types
    val ndv = li.select(explode(array(q56Cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("cv"))
      .select(col("cv.c").as("column_name"), col("cv.v").as("v"))
      .filter(col("v").isNotNull)
      .distinct()
      .groupBy("column_name").agg(count(lit(1)).as("ndv"))
    basic.join(ndv, Seq("column_name"), "left")
      .withColumn("ndv", coalesce(col("ndv"), lit(0L)))
      .select("column_name", "n_rows", "n_nulls", "ndv",
        "min_value", "max_value")
  }

  private val q56Sql = {
    val aggs = q56Cols.map(c =>
      s"""CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_$c,
         |    CAST(count(DISTINCT $c) AS BIGINT) AS nd_$c,
         |    CAST(min($c) AS VARCHAR) AS mn_$c,
         |    CAST(max($c) AS VARCHAR) AS mx_$c""".stripMargin).mkString(",\n    ")
    val rows = q56Cols.map(c =>
      s"SELECT '$c' AS column_name, n_rows, nn_$c AS n_nulls, nd_$c AS ndv, " +
        s"mn_$c AS min_value, mx_$c AS max_value FROM a").mkString("\nUNION ALL\n")
    s"""WITH a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |    $aggs
       |  FROM lineitem)
       |$rows""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01 _),
    "q02_star_join" -> (q02 _),
    "q03_settlement_balance" -> (q03 _),
    "q04_semi_join" -> (q04 _),
    "q04b_anti_join" -> (q04b _),
    "q05_outer_agg_join" -> (q05 _),
    "q06_aging" -> (q06 _),
    "q07_running_balance" -> (q07 _),
    "q08_pareto_abc" -> (q08 _),
    "q09_zscore" -> (q09 _),
    "q10_topk" -> (q10 _),
    "q11_pivot" -> (q11 _),
    "q12_band_groups" -> (q12 _),
    "q13_dual_sort" -> (q13 _),
    "q14_quality_profile" -> (q14 _),
    "q15_collection_buckets" -> (q15 _),
    "q16_total_rollup" -> (q16 _),
    "q17_conditional_projection" -> (q17 _),
    "q38_basket_rules" -> (q38 _),
    "q39_snapshot_diff" -> (q39 _),
    "q42_skew_report" -> (q42 _),
    "q43_copurchase_pagerank" -> (q43 _),
    "q44_triangle_count" -> (q44 _),
    "q45_lpa_communities" -> (q45 _),
    "q46_integrity_audit" -> (q46 _),
    "q47_cube" -> (q47 _),
    "q48_scd2_build" -> (q48 _),
    "q48b_scd2_upsert" -> (q48b _),
    "q49_yoy_growth" -> (q49 _),
    "q50_scd2_lookup" -> (q50 _),
    "q52_k_anonymity" -> (q52 _),
    "q53_delta_agg" -> (q53 _),
    "q54_compaction_plan" -> (q54 _),
    "q55_zorder_layout" -> (q55 _),
    "q56_column_stats" -> (q56 _),
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_star_join" -> q02Sql,
    "q03_settlement_balance" -> q03Sql,
    "q04_semi_join" -> q04Sql,
    "q04b_anti_join" -> q04bSql,
    "q05_outer_agg_join" -> q05Sql,
    "q06_aging" -> q06Sql,
    "q07_running_balance" -> q07Sql,
    "q08_pareto_abc" -> q08Sql,
    "q09_zscore" -> q09Sql,
    "q10_topk" -> q10Sql,
    "q11_pivot" -> q11Sql,
    "q12_band_groups" -> q12Sql,
    "q13_dual_sort" -> q13Sql,
    "q14_quality_profile" -> q14Sql,
    "q15_collection_buckets" -> q15Sql,
    "q16_total_rollup" -> q16Sql,
    "q17_conditional_projection" -> q17Sql,
    "q38_basket_rules" -> q38Sql,
    "q39_snapshot_diff" -> q39Sql,
    "q42_skew_report" -> q42Sql,
    "q43_copurchase_pagerank" -> q43Sql,
    "q44_triangle_count" -> q44Sql,
    "q45_lpa_communities" -> q45Sql,
    "q46_integrity_audit" -> q46Sql,
    "q47_cube" -> q47Sql,
    "q48_scd2_build" -> q48Sql,
    "q48b_scd2_upsert" -> q48bSql,
    "q49_yoy_growth" -> q49Sql,
    "q50_scd2_lookup" -> q50Sql,
    "q52_k_anonymity" -> q52Sql,
    "q53_delta_agg" -> q53Sql,
    "q54_compaction_plan" -> q54Sql,
    "q55_zorder_layout" -> q55Sql,
    "q56_column_stats" -> q56Sql,
  )
}
