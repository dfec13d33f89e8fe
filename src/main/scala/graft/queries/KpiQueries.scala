package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftConf, Tables}
import graft.operators.Balances
import graft.operators.Rounding.dround

/** Macro-KPI and audit operators (SURVEY §2.4 A9-A15, A18; §2.2 P7/P10;
  * §2.3 J7), on the charge/payment role mapping: orders = charges,
  * lineitem = payments, "sales" = the P7-style contains-predicate
  * (o_orderpriority contains 'URGENT' ↔ CONCEPTO contains 'VENTA'),
  * credit limit = c_acctbal × 100 (J7's LIMITE_CREDITO lookup).
  *
  * All period math is anchored on GraftConf.asOfDate (the reference reads
  * wall-clock — SURVEY §7.6.4 makes it a parameter).
  */
object KpiQueries {

  private val asOf = GraftConf.asOfDate
  private val periodDays = 90

  private def net: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))
  private val netSql = "l_extendedprice*(1.0-l_discount)*(1.0+l_tax)"

  private def isSale: Column = upper(col("o_orderpriority")).contains("URGENT")
  private val isSaleSql = "upper(o_orderpriority) LIKE '%URGENT%'"

  /** Open balance per order with the sale flag and days-past-due. */
  private def openSaldo(s: SparkSession, dir: String): DataFrame =
    Balances.settlementBalance(
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice"),
      Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount", "l_tax"),
      chargeId = "o_orderkey", linkKey = "l_orderkey",
      chargeAmount = col("o_totalprice"), paymentAmount = net)
      .withColumn("es_venta", isSale)
      .withColumn("mora",
        datediff(lit(asOf).cast("date"), date_add(to_date(col("o_orderdate")), GraftConf.termDays)))

  private val openSaldoSqlCte =
    s"""os AS (
       |  SELECT o.o_orderkey, o.o_custkey,
       |         round(o.o_totalprice - coalesce(p.paid, 0.0), 2) AS saldo,
       |         $isSaleSql AS es_venta,
       |         CAST(date_diff('day', CAST(o.o_orderdate AS DATE) + ${GraftConf.termDays},
       |              DATE '$asOf') AS INT) AS mora,
       |         o.o_orderdate, o.o_totalprice
       |  FROM orders o
       |  LEFT JOIN (SELECT l_orderkey, sum($netSql) AS paid
       |             FROM lineitem GROUP BY 1) p
       |    ON o.o_orderkey = p.l_orderkey)""".stripMargin

  // ---------------------------------------------------------------- q22
  /** Macro KPIs assembled as labeled rows (A9 DSO, A10 CEI, A11
    * delinquency index, A12 resumen shape). Scalar conditional sums —
    * map-side partials, one tiny result, no window.
    */
  def q22(s: SparkSession, dir: String): DataFrame = {
    val periodStart = date_sub(lit(asOf).cast("date"), periodDays)

    // ONE aggregation of lineitem, consumed ONCE: the payment totals are
    // summed from the joined per-order columns instead of a second
    // aggregation branch. Earlier rounds kept two branches over the same
    // groupBy and leaned on exchange reuse to scan lineitem once — but
    // AQE re-plans each branch independently and the ReusedExchange
    // silently dies (observed r6: two lineitem scans in the executed
    // plan, q22 1.5× slower). A single consumer can't un-reuse.
    // Numerically identical under referential integrity (every lineitem
    // joins an order — guaranteed by the TPC-H-ish generator and by the
    // oracle agreeing).
    val liAgg = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("_link"))
      .agg(
        sum(net).as("_paid"),
        sum(when(to_date(col("l_shipdate")) >= periodStart &&
          to_date(col("l_shipdate")) < lit(asOf).cast("date"), net).otherwise(0.0))
          .as("_paid_period"))
    val os = Tables.orders(s, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice")
      .join(liAgg, col("o_orderkey") === col("_link"), "left")
      .withColumn("saldo", dround(col("o_totalprice") - coalesce(col("_paid"), lit(0.0)), 2))
      .withColumn("es_venta", isSale)
      .withColumn("mora",
        datediff(lit(asOf).cast("date"), date_add(to_date(col("o_orderdate")), GraftConf.termDays)))

    // Conditional-sum pass over the balance view covers the sales-only
    // aggregates and the all-orders period charges in one shot.
    val inPeriod = to_date(col("o_orderdate")) >= periodStart &&
      to_date(col("o_orderdate")) < lit(asOf).cast("date")
    val v = col("es_venta")
    val k = os.agg(
      sum(when(v && col("saldo") > 0, col("saldo")).otherwise(0.0)).as("saldo_abierto"),
      sum(when(v && col("saldo") > 0 && col("mora") > 0, col("saldo")).otherwise(0.0)).as("saldo_vencido"),
      sum(when(v && inPeriod, col("o_totalprice")).otherwise(0.0)).as("ventas_periodo"),
      sum(when(v, col("o_totalprice")).otherwise(0.0)).as("cargos_totales"),
      sum(when(inPeriod, col("o_totalprice")).otherwise(0.0)).as("cargos_periodo"),
      sum(coalesce(col("_paid"), lit(0.0))).as("pagos_totales"),
      sum(coalesce(col("_paid_period"), lit(0.0))).as("cobros_periodo"))
      .withColumn("dso",
        when(col("ventas_periodo") > 0,
          dround(col("saldo_abierto") / col("ventas_periodo") * periodDays, 1)))
      .withColumn("saldo_actual", col("cargos_totales") - col("pagos_totales"))
      .withColumn("saldo_inicio",
        col("saldo_actual") - col("cargos_periodo") + col("cobros_periodo"))
      .withColumn("cei",
        when(col("saldo_inicio") + col("cargos_periodo") > 0,
          dround(col("cobros_periodo") / (col("saldo_inicio") + col("cargos_periodo")), 6)))
      .withColumn("morosidad",
        when(col("saldo_abierto") > 0,
          dround(col("saldo_vencido") / col("saldo_abierto"), 6)))
    k.select(explode(array(
      struct(lit("dso_dias").as("kpi"), col("dso").as("valor"), lit("dias").as("unidad")),
      struct(lit("cei").as("kpi"), col("cei").as("valor"), lit("ratio").as("unidad")),
      struct(lit("indice_morosidad").as("kpi"), col("morosidad").as("valor"), lit("ratio").as("unidad")),
      struct(lit("saldo_abierto").as("kpi"), dround(col("saldo_abierto"), 2).as("valor"),
        lit("money").as("unidad")))).as("r"))
      .select("r.*")
  }

  private val q22Sql =
    s"""WITH $openSaldoSqlCte,
       |sv AS (
       |  SELECT
       |    sum(CASE WHEN saldo > 0 THEN saldo ELSE 0.0 END) AS saldo_abierto,
       |    sum(CASE WHEN saldo > 0 AND mora > 0 THEN saldo ELSE 0.0 END) AS saldo_vencido,
       |    sum(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '$asOf' - $periodDays
       |              AND CAST(o_orderdate AS DATE) < DATE '$asOf'
       |             THEN o_totalprice ELSE 0.0 END) AS ventas_periodo,
       |    sum(o_totalprice) AS cargos_totales
       |  FROM os WHERE es_venta),
       |pg AS (
       |  SELECT sum($netSql) AS pagos_totales,
       |         sum(CASE WHEN CAST(l_shipdate AS DATE) >= DATE '$asOf' - $periodDays
       |                   AND CAST(l_shipdate AS DATE) < DATE '$asOf'
       |                  THEN $netSql ELSE 0.0 END) AS cobros_periodo
       |  FROM lineitem),
       |cp AS (
       |  SELECT sum(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '$asOf' - $periodDays
       |                   AND CAST(o_orderdate AS DATE) < DATE '$asOf'
       |                  THEN o_totalprice ELSE 0.0 END) AS cargos_periodo
       |  FROM orders),
       |k AS (
       |  SELECT *,
       |    cargos_totales - pagos_totales AS saldo_actual,
       |    cargos_totales - pagos_totales - cargos_periodo + cobros_periodo AS saldo_inicio
       |  FROM sv, pg, cp)
       |SELECT 'dso_dias' AS kpi,
       |  CASE WHEN ventas_periodo > 0
       |       THEN round(saldo_abierto / ventas_periodo * $periodDays, 1) END AS valor,
       |  'dias' AS unidad FROM k
       |UNION ALL
       |SELECT 'cei',
       |  CASE WHEN saldo_inicio + cargos_periodo > 0
       |       THEN round(cobros_periodo / (saldo_inicio + cargos_periodo), 6) END,
       |  'ratio' FROM k
       |UNION ALL
       |SELECT 'indice_morosidad',
       |  CASE WHEN saldo_abierto > 0
       |       THEN round(saldo_vencido / saldo_abierto, 6) END,
       |  'ratio' FROM k
       |UNION ALL
       |SELECT 'saldo_abierto', round(saldo_abierto, 2), 'money' FROM k""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Credit-limit utilization (A14 + J7): per-account sales aggregates +
    * payment lookup + limit enrichment, alert when-chain
    * {SIN_LIMITE, SOBRE_LIMITE, CRITICO, ALTO, NORMAL}.
    */
  def q23(s: SparkSession, dir: String): DataFrame = {
    val os = openSaldo(s, dir).filter(col("es_venta"))
    val agg = os.groupBy("o_custkey").agg(
      count(lit(1)).as("n_facturas"),
      dround(sum("o_totalprice"), 2).as("total_cargos"),
      dround(sum(when(col("saldo") > 0, col("saldo")).otherwise(0.0)), 2).as("saldo_pendiente"))
    val limits = Tables.customer(s, dir)
      .select(col("c_custkey"), (col("c_acctbal") * 100).as("limite_credito"),
        col("c_mktsegment").as("segmento"))
    agg.join(limits, col("o_custkey") === col("c_custkey"), "left")
      .withColumn("utilizacion",
        when(col("limite_credito") > 0,
          dround(col("saldo_pendiente") / col("limite_credito"), 6)))
      .withColumn("disponible",
        when(col("limite_credito") > 0,
          dround(col("limite_credito") - col("saldo_pendiente"), 2)))
      .withColumn("alerta",
        when(col("limite_credito").isNull || col("limite_credito") <= 0, "SIN_LIMITE")
          .when(col("saldo_pendiente") / col("limite_credito") > 1.0, "SOBRE_LIMITE")
          .when(col("saldo_pendiente") / col("limite_credito") >= 0.9, "CRITICO")
          .when(col("saldo_pendiente") / col("limite_credito") >= 0.7, "ALTO")
          .otherwise("NORMAL"))
      .select("o_custkey", "n_facturas", "total_cargos", "saldo_pendiente",
        "limite_credito", "utilizacion", "disponible", "alerta", "segmento")
  }

  private val q23Sql =
    s"""WITH $openSaldoSqlCte,
       |agg AS (
       |  SELECT o_custkey, count(*) AS n_facturas,
       |         round(sum(o_totalprice), 2) AS total_cargos,
       |         round(sum(CASE WHEN saldo > 0 THEN saldo ELSE 0.0 END), 2) AS saldo_pendiente
       |  FROM os WHERE es_venta GROUP BY 1)
       |SELECT o_custkey, n_facturas, total_cargos, saldo_pendiente,
       |  c.c_acctbal * 100 AS limite_credito,
       |  CASE WHEN c.c_acctbal * 100 > 0
       |       THEN round(saldo_pendiente / (c.c_acctbal * 100), 6) END AS utilizacion,
       |  CASE WHEN c.c_acctbal * 100 > 0
       |       THEN round(c.c_acctbal * 100 - saldo_pendiente, 2) END AS disponible,
       |  CASE WHEN c.c_acctbal IS NULL OR c.c_acctbal * 100 <= 0 THEN 'SIN_LIMITE'
       |       WHEN saldo_pendiente / (c.c_acctbal * 100) > 1.0 THEN 'SOBRE_LIMITE'
       |       WHEN saldo_pendiente / (c.c_acctbal * 100) >= 0.9 THEN 'CRITICO'
       |       WHEN saldo_pendiente / (c.c_acctbal * 100) >= 0.7 THEN 'ALTO'
       |       ELSE 'NORMAL' END AS alerta,
       |  c.c_mktsegment AS segmento
       |FROM agg LEFT JOIN customer c ON agg.o_custkey = c.c_custkey""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Per-account delinquency profile (A15): conditional open/overdue
    * splits, max days overdue, overdue share.
    */
  def q24(s: SparkSession, dir: String): DataFrame = {
    val os = openSaldo(s, dir).filter(col("es_venta") && col("saldo") > 0)
    os.groupBy("o_custkey").agg(
      count(lit(1)).as("n_abiertas"),
      sum(when(col("mora") > 0, 1).otherwise(0)).as("n_vencidas"),
      dround(sum(when(col("mora") > 0, col("saldo")).otherwise(0.0)), 2).as("saldo_vencido"),
      dround(sum(when(col("mora") <= 0, col("saldo")).otherwise(0.0)), 2).as("saldo_vigente"),
      max(when(col("mora") > 0, col("mora"))).as("max_dias_vencido"),
      dround(sum(when(col("mora") > 0, col("saldo")).otherwise(0.0)) / sum("saldo"), 6)
        .as("pct_vencido"))
  }

  private val q24Sql =
    s"""WITH $openSaldoSqlCte
       |SELECT o_custkey, count(*) AS n_abiertas,
       |  CAST(sum(CASE WHEN mora > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_vencidas,
       |  round(sum(CASE WHEN mora > 0 THEN saldo ELSE 0.0 END), 2) AS saldo_vencido,
       |  round(sum(CASE WHEN mora <= 0 THEN saldo ELSE 0.0 END), 2) AS saldo_vigente,
       |  max(CASE WHEN mora > 0 THEN mora END) AS max_dias_vencido,
       |  round(sum(CASE WHEN mora > 0 THEN saldo ELSE 0.0 END) / sum(saldo), 6) AS pct_vencido
       |FROM os WHERE es_venta AND saldo > 0
       |GROUP BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q25
  /** Audit findings summary (A18 + P10 + referential checks): labeled
    * counts of data-quality findings — null/orphan dimensions, overpaid
    * charges (saldo < 0), statistical outliers (A16 reuse), stale open
    * charges. Each finding is a distributed count; the assembly is a
    * tiny union.
    */
  def q25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val os = openSaldo(s, dir)
    // One conditional-sum pass over the balance view (outliers, overpaid,
    // stale) instead of a job per finding; orphan checks are two
    // anti-join counts. 3 jobs total, each a single scan.
    val statsDf = os.agg(
      avg("o_totalprice").as("mu"), stddev_samp("o_totalprice").as("sigma"))
    val findings = os.crossJoin(broadcast(statsDf)).agg(
      sum(when(abs((col("o_totalprice") - col("mu")) / col("sigma")) > GraftConf.zThreshold, 1L)
        .otherwise(0L)).as("outliers"),
      sum(when(col("saldo") < 0, 1L).otherwise(0L)).as("overpaid"),
      sum(when(col("saldo") > 0 && col("mora") > 365, 1L).otherwise(0L)).as("stale"))
      .collect()(0)
    val orphanPayments = Tables.lineitem(s, dir).select("l_orderkey").join(
      Tables.orders(s, dir).select("o_orderkey"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    val orphanOrders = Tables.orders(s, dir).select("o_custkey")
      .join(Tables.customer(s, dir).select("c_custkey"),
        col("o_custkey") === col("c_custkey"), "left_anti").count()
    Seq(
      ("pagos_huerfanos", orphanPayments),
      ("clientes_huerfanos", orphanOrders),
      ("importes_atipicos", findings.getLong(0)),
      ("facturas_sobrepagadas", findings.getLong(1)),
      ("abiertas_mora_1y", findings.getLong(2)),
    ).toDF("hallazgo", "n")
  }

  private val q25Sql =
    s"""WITH $openSaldoSqlCte,
       |st AS (SELECT avg(o_totalprice) AS mu,
       |              stddev_samp(o_totalprice) AS sigma FROM os)
       |SELECT 'pagos_huerfanos' AS hallazgo,
       |  (SELECT count(*) FROM lineitem l
       |   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n
       |UNION ALL
       |SELECT 'clientes_huerfanos',
       |  (SELECT count(*) FROM orders o
       |   WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
       |UNION ALL
       |SELECT 'importes_atipicos',
       |  (SELECT count(*) FROM os, st
       |   WHERE abs((o_totalprice - st.mu) / st.sigma) > ${GraftConf.zThreshold})
       |UNION ALL
       |SELECT 'facturas_sobrepagadas', (SELECT count(*) FROM os WHERE saldo < 0)
       |UNION ALL
       |SELECT 'abiertas_mora_1y',
       |  (SELECT count(*) FROM os WHERE saldo > 0 AND mora > 365)""".stripMargin

  // ---------------------------------------------------------------- q26
  /** Aging pivot per account (A4): one column per aging bucket plus the
    * scalar totals — groupBy + pivot on the bucket label, the distributed
    * form of the reference's manual pivot loop
    * (/root/reference/src/analytics.py:180-259).
    */
  def q26(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Buckets
    val labels = GraftConf.agingRanges.map(_._3)
    val os = openSaldo(s, dir).filter(col("saldo") > 0)
      .withColumn("bucket",
        Buckets.bucketize(col("mora"), GraftConf.agingRanges, "fuera_de_rango"))
    val pivoted = os.groupBy("o_custkey")
      .pivot("bucket", labels)
      .agg(sum("saldo"))
    val scalars = os.groupBy("o_custkey").agg(
      count(lit(1)).as("n_abiertas"),
      dround(sum("saldo"), 2).as("saldo_pendiente"))
    val cols = labels.map(l => dround(coalesce(col(l), lit(0.0)), 2).as(s"b_$l"))
    pivoted.join(scalars, Seq("o_custkey"))
      .select(col("o_custkey") +: col("n_abiertas") +: col("saldo_pendiente") +: cols: _*)
  }

  private val q26Sql = {
    val cols = GraftConf.agingRanges.map { case (lo, hi, label) =>
      val cond = (lo, hi) match {
        case (Some(l), Some(h)) => s"mora BETWEEN $l AND $h"
        case (Some(l), None)    => s"mora >= $l"
        case (None, Some(h))    => s"mora <= $h"
        case _                  => "TRUE"
      }
      s"round(coalesce(sum(CASE WHEN $cond THEN saldo END), 0.0), 2) AS b_$label"
    }
    s"""WITH $openSaldoSqlCte
       |SELECT o_custkey, count(*) AS n_abiertas,
       |  round(sum(saldo), 2) AS saldo_pendiente,
       |  ${cols.mkString(",\n  ")}
       |FROM os WHERE saldo > 0
       |GROUP BY o_custkey""".stripMargin
  }

  // ---------------------------------------------------------------- q27
  /** Overdue-vs-current split (A5): the 2-way bucket with counts, sums
    * and shares + TOTAL row.
    */
  def q27(s: SparkSession, dir: String): DataFrame = {
    val os = openSaldo(s, dir).filter(col("saldo") > 0)
    // Single-pass rollup (see CoreQueries.q06 rationale).
    val agg = os
      .rollup(when(col("mora") <= 0, "VIGENTES").otherwise("VENCIDAS").as("estado"))
      .agg(count(lit(1)).as("n_facturas"), dround(sum("saldo"), 2).as("saldo_total"),
        grouping_id().as("gid"))
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    agg
      .withColumn("tot", max(when(col("gid") === 1, col("saldo_total"))).over(wAll))
      .select(
        coalesce(col("estado"), lit("TOTAL")).as("estado"),
        col("n_facturas"), col("saldo_total"),
        when(col("gid") === 1, 1.0)
          .otherwise(dround(col("saldo_total") / col("tot"), 6)).as("pct"))
  }

  private val q27Sql =
    s"""WITH $openSaldoSqlCte,
       |agg AS (
       |  SELECT estado, GROUPING(estado) AS gid,
       |         count(*) AS n_facturas, round(sum(saldo), 2) AS saldo_total
       |  FROM (SELECT CASE WHEN mora <= 0 THEN 'VIGENTES' ELSE 'VENCIDAS' END AS estado,
       |               saldo
       |        FROM os WHERE saldo > 0)
       |  GROUP BY ROLLUP(estado))
       |SELECT coalesce(estado, 'TOTAL') AS estado, n_facturas, saldo_total,
       |  CASE WHEN gid = 1 THEN CAST(1.0 AS DOUBLE)
       |       ELSE round(saldo_total /
       |            max(CASE WHEN gid = 1 THEN saldo_total END) OVER (), 6)
       |  END AS pct
       |FROM agg""".stripMargin

  // ---------------------------------------------------------------- q28
  /** Collection cycle for settled charges (J3 + F3 + F2 — the
    * DELTA_RECAUDO path): last payment date per paid-off charge, delay
    * vs due date, bucketized with the reference's "" default
    * (SURVEY §7.6.7: reporte's out-of-range default is empty-string,
    * unlike analytics' "Fuera de rango").
    */
  def q28(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Buckets
    val lastPay = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("ultima_fecha_pago"))
    val os = openSaldo(s, dir)
      .filter(col("saldo") <= 0) // settled (or over-settled) charges only
      .join(lastPay, col("o_orderkey") === col("l_orderkey"), "left")
      .withColumn("delta_recaudo",
        datediff(col("ultima_fecha_pago"),
          date_add(to_date(col("o_orderdate")), GraftConf.termDays)))
      .withColumn("categoria_recaudo",
        Buckets.bucketize(col("delta_recaudo"), GraftConf.collectionRanges, ""))
    os.select(
      col("o_orderkey"),
      date_format(col("ultima_fecha_pago"), "yyyy-MM-dd").as("ultima_fecha_pago"),
      col("delta_recaudo"), col("categoria_recaudo"))
  }

  private val q28Sql = {
    val caseExpr = graft.operators.Buckets
      .bucketizeSql("delta_recaudo", GraftConf.collectionRanges, "")
    s"""WITH $openSaldoSqlCte,
       |lp AS (SELECT l_orderkey,
       |              max(CAST(l_shipdate AS DATE)) AS ultima_fecha_pago
       |       FROM lineitem GROUP BY 1)
       |SELECT o_orderkey,
       |  strftime(ultima_fecha_pago, '%Y-%m-%d') AS ultima_fecha_pago,
       |  delta_recaudo, $caseExpr AS categoria_recaudo
       |FROM (
       |  SELECT os.o_orderkey, lp.ultima_fecha_pago,
       |    CAST(date_diff('day', CAST(os.o_orderdate AS DATE) + ${GraftConf.termDays},
       |         lp.ultima_fecha_pago) AS INT) AS delta_recaudo
       |  FROM os LEFT JOIN lp ON os.o_orderkey = lp.l_orderkey
       |  WHERE os.saldo <= 0)""".stripMargin
  }

  // ---------------------------------------------------------------- q29
  /** Vendor summary (SURVEY §5.3; CxcAnalytics.resumenPorVendedor twin):
    * per-vendor charge/payment counts, totals and saldo, where the
    * vendor is the supplier attached to the settling payments
    * (l_suppkey → s_name, the VENDEDOR dimension of this testdata).
    * Shape: payments pre-aggregate to (supplier, order) grain BEFORE the
    * per-vendor rollup so each order's charge is counted once per vendor
    * — two key-local shuffles plus one broadcast dim join, no
    * distinct-count over raw payment rows.
    */
  def q29(s: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), net.as("amt"))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_suppkey", "l_orderkey")
      .agg(count(lit(1)).as("np"), sum("amt").as("paid"),
        first("o_totalprice").as("tp"))
    perOrder.groupBy("l_suppkey")
      .agg(
        count(lit(1)).as("NUM_CARGOS"),
        sum("np").as("NUM_ABONOS"),
        dround(sum("tp"), 2).as("TOTAL_CARGOS"),
        dround(sum("paid"), 2).as("TOTAL_ABONOS"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name").as("VENDEDOR"), col("NUM_CARGOS"), col("NUM_ABONOS"),
        col("TOTAL_CARGOS"), col("TOTAL_ABONOS"),
        dround(col("TOTAL_CARGOS") - col("TOTAL_ABONOS"), 2).as("SALDO"))
      .orderBy(col("SALDO").desc, col("VENDEDOR").asc)
  }

  private val q29Sql =
    s"""WITH per_order AS (
       |  SELECT l.l_suppkey, l.l_orderkey,
       |         CAST(count(*) AS BIGINT) AS np,
       |         sum($netSql) AS paid,
       |         any_value(o.o_totalprice) AS tp
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  GROUP BY 1, 2),
       |g AS (
       |  SELECT l_suppkey,
       |         CAST(count(*) AS BIGINT) AS NUM_CARGOS,
       |         CAST(sum(np) AS BIGINT) AS NUM_ABONOS,
       |         round(sum(tp), 2) AS TOTAL_CARGOS,
       |         round(sum(paid), 2) AS TOTAL_ABONOS
       |  FROM per_order GROUP BY 1)
       |SELECT s.s_name AS VENDEDOR, g.NUM_CARGOS, g.NUM_ABONOS,
       |       g.TOTAL_CARGOS, g.TOTAL_ABONOS,
       |       round(g.TOTAL_CARGOS - g.TOTAL_ABONOS, 2) AS SALDO
       |FROM g JOIN supplier s ON g.l_suppkey = s.s_suppkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_macro_kpis" -> (q22 _),
    "q23_credit_limit" -> (q23 _),
    "q24_client_delinquency" -> (q24 _),
    "q25_audit_findings" -> (q25 _),
    "q26_aging_pivot" -> (q26 _),
    "q27_overdue_split" -> (q27 _),
    "q28_collection_cycle" -> (q28 _),
    "q29_vendor_summary" -> (q29 _),
  )

  val oracle: Map[String, String] = Map(
    "q22_macro_kpis" -> q22Sql,
    "q23_credit_limit" -> q23Sql,
    "q24_client_delinquency" -> q24Sql,
    "q25_audit_findings" -> q25Sql,
    "q26_aging_pivot" -> q26Sql,
    "q27_overdue_split" -> q27Sql,
    "q28_collection_cycle" -> q28Sql,
    "q29_vendor_summary" -> q29Sql,
  )
}
