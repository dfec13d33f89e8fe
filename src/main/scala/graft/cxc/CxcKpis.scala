package graft.cxc

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Rounding.dround

import CxcSchema._

/** Financial KPIs over `movimientos_totales` (SURVEY §3.1 PASO 5;
  * /root/reference/src/kpis.py) — 4 KPI sets × 2 currencies, keys per
  * /root/reference/src/kpis.py:55-58; the CLI lineage (report view in,
  * not raw data — SURVEY §7.6.10).
  */
object CxcKpis {

  val periodDays = 90 // KPI_PERIODO_DIAS (config/settings.py:94)

  private def byMoneda(df: DataFrame, m: String): DataFrame =
    df.filter(upper(trim(col("MONEDA"))) === m)

  /** A9-A12 — DSO, CEI, delinquency index as labeled rows. */
  def resumen(df: DataFrame, asOf: LocalDate): DataFrame = {
    val ventas = esVenta(df)
    val inPeriod = to_date(col("FECHA_EMISION")) >= date_sub(lit(asOf.toString).cast("date"), periodDays) &&
      to_date(col("FECHA_EMISION")) < lit(asOf.toString).cast("date")
    val k = df.agg(
      sum(when(ventas && col("SALDO_FACTURA") > 0, col("SALDO_FACTURA")).otherwise(0.0))
        .as("saldo_abierto"),
      sum(when(ventas && col("SALDO_FACTURA") > 0 && col("DELTA_MORA") > 0,
        col("SALDO_FACTURA")).otherwise(0.0)).as("saldo_vencido"),
      sum(when(ventas && inPeriod, col("_MONTO")).otherwise(0.0)).as("ventas_periodo"),
      sum(when(isCargo(df), col("_MONTO")).otherwise(0.0)).as("cargos_totales"),
      sum(when(isAbono(df), col("_MONTO")).otherwise(0.0)).as("pagos_totales"),
      sum(when(isCargo(df) && inPeriod, col("_MONTO")).otherwise(0.0)).as("cargos_periodo"),
      sum(when(isAbono(df) && inPeriod, col("_MONTO")).otherwise(0.0)).as("cobros_periodo"))
      .withColumn("dso", when(col("ventas_periodo") > 0,
        dround(col("saldo_abierto") / col("ventas_periodo") * periodDays, 1)))
      .withColumn("saldo_inicio",
        col("cargos_totales") - col("pagos_totales") - col("cargos_periodo") + col("cobros_periodo"))
      .withColumn("cei", when(col("saldo_inicio") + col("cargos_periodo") > 0,
        dround(col("cobros_periodo") / (col("saldo_inicio") + col("cargos_periodo")), 6)))
      .withColumn("morosidad", when(col("saldo_abierto") > 0,
        dround(col("saldo_vencido") / col("saldo_abierto"), 6)))
    // F12 — formatted INTERPRETACION strings like the reference's
    // "$ {:,.2f}" interpolations (/root/reference/src/kpis.py:100-112).
    k.select(explode(array(
      struct(lit("DSO").as("KPI"), col("dso").as("VALOR"), lit("dias").as("UNIDAD"),
        concat(lit("Cobro promedio a "), format_number(col("dso"), 1),
          lit(" dias sobre ventas de $"), format_number(col("ventas_periodo"), 2))
          .as("INTERPRETACION")),
      struct(lit("CEI").as("KPI"), col("cei").as("VALOR"), lit("ratio").as("UNIDAD"),
        concat(lit("Efectividad de cobranza "),
          format_number(col("cei") * 100, 1), lit("%")).as("INTERPRETACION")),
      struct(lit("INDICE_MOROSIDAD").as("KPI"), col("morosidad").as("VALOR"),
        lit("ratio").as("UNIDAD"),
        concat(lit("$"), format_number(col("saldo_vencido"), 2),
          lit(" vencido de $"), format_number(col("saldo_abierto"), 2))
          .as("INTERPRETACION")))).as("r"))
      .select("r.*")
  }

  /** A13/W2 — Pareto/ABC concentration per client
    * (_calcular_concentracion, /root/reference/src/kpis.py:117-161),
    * reference semantics exactly: sum SALDO_FACTURA over ALL sales rows
    * (netting overpaid invoices — no saldo>0 prefilter), null clients
    * dropped (pandas groupby dropna), dual sort with the <=0 tail
    * name-asc, first-row-A + forced final cum=1.0 quirks, empty when the
    * grand total <= 0, and a trailing TOTAL row. The reference's TOTAL
    * row carries "" in PCT_ACUMULADO/CLASIFICACION (mixed-type pandas
    * column); Spark columns are typed, so those are null here —
    * documented deviation (COVERAGE.md).
    */
  def concentracion(df: DataFrame): DataFrame = {
    val perClient = df
      .filter(esVenta(df) && col("NOMBRE_CLIENTE").isNotNull)
      .groupBy("NOMBRE_CLIENTE")
      .agg(dround(sum("SALDO_FACTURA"), 2).as("SALDO_PENDIENTE"))
    val sortKeys = Seq(
      (col("SALDO_PENDIENTE") > 0).desc,
      when(col("SALDO_PENDIENTE") > 0, -col("SALDO_PENDIENTE")).asc_nulls_last,
      col("NOMBRE_CLIENTE").asc)
    // r15 (VERDICT r14 item 4): the rank/cumsum/total/count quartet now
    // comes from the stats-dispatched helper — at client cardinality it
    // takes the same oracle-exact global-window shape as before (hashes
    // unchanged); a key-dimension blow-up flips to the two-phase
    // range-partition reconstruction instead of single-partitioning.
    val ranked = graft.operators.Pareto
      .rankCumBy(perClient, sortKeys, col("SALDO_PENDIENTE"),
        "_rn", "_cum", "_tot", "_n")
      .filter(col("_tot") > 0)
    val body = ranked
      .withColumn("PCT_DEL_TOTAL", col("SALDO_PENDIENTE") / col("_tot"))
      .withColumn("CLASIFICACION",
        when(col("_rn") === 1, "A")
          .when(col("_cum") / col("_tot") * 100.0 <= 80.0, "A")
          .when(col("_cum") / col("_tot") * 100.0 <= 95.0, "B")
          .otherwise("C"))
      .withColumn("PCT_ACUMULADO",
        when(col("_rn") === col("_n"), lit(1.0)).otherwise(col("_cum") / col("_tot")))
    val total = ranked.filter(col("_rn") === 1).select(
      lit("TOTAL").as("NOMBRE_CLIENTE"),
      col("_tot").as("SALDO_PENDIENTE"),
      lit(1.0).as("PCT_DEL_TOTAL"),
      lit(null).cast("double").as("PCT_ACUMULADO"),
      lit(null).cast("string").as("CLASIFICACION"))
    body.select("NOMBRE_CLIENTE", "SALDO_PENDIENTE", "PCT_DEL_TOTAL",
        "PCT_ACUMULADO", "CLASIFICACION")
      .unionByName(total)
  }

  /** A14/J7 — credit-limit utilization with alert levels
    * (/root/reference/src/kpis.py:164-238).
    */
  def limiteCredito(df: DataFrame): DataFrame = {
    val ventas = df.filter(esVenta(df))
    val agg = ventas.groupBy("NOMBRE_CLIENTE").agg(
      count(lit(1)).as("NUM_FACTURAS"),
      dround(sum("_MONTO"), 2).as("TOTAL_CARGOS"),
      dround(sum(when(col("SALDO_FACTURA") > 0, col("SALDO_FACTURA")).otherwise(0.0)), 2)
        .as("SALDO_PENDIENTE"))
    val limits = df.filter(col("LIMITE_CREDITO").isNotNull)
      .groupBy("NOMBRE_CLIENTE")
      .agg(max("LIMITE_CREDITO").as("LIMITE_CREDITO"),
        first("ESTATUS_CLIENTE", ignoreNulls = true).as("ESTATUS_CLIENTE"))
    agg.join(limits, Seq("NOMBRE_CLIENTE"), "left")
      .withColumn("UTILIZACION_PCT", when(col("LIMITE_CREDITO") > 0,
        dround(col("SALDO_PENDIENTE") / col("LIMITE_CREDITO"), 6)))
      .withColumn("DISPONIBLE", when(col("LIMITE_CREDITO") > 0,
        dround(col("LIMITE_CREDITO") - col("SALDO_PENDIENTE"), 2)))
      .withColumn("ALERTA",
        when(col("LIMITE_CREDITO").isNull || col("LIMITE_CREDITO") <= 0, "SIN_LIMITE")
          .when(col("SALDO_PENDIENTE") / col("LIMITE_CREDITO") > 1.0, "SOBRE_LIMITE")
          .when(col("SALDO_PENDIENTE") / col("LIMITE_CREDITO") >= 0.9, "CRITICO")
          .when(col("SALDO_PENDIENTE") / col("LIMITE_CREDITO") >= 0.7, "ALTO")
          .otherwise("NORMAL"))
  }

  /** A15 — per-client delinquency (/root/reference/src/kpis.py:241-303). */
  def morosidadPorCliente(df: DataFrame): DataFrame = {
    val open = df.filter(esVenta(df) && col("SALDO_FACTURA") > 0)
    open.groupBy(coalesce(col("NOMBRE_CLIENTE"), lit("Sin cliente")).as("NOMBRE_CLIENTE"))
      .agg(
        count(lit(1)).as("NUM_FACTURAS_ABIERTAS"),
        sum(when(col("DELTA_MORA") > 0, 1).otherwise(0)).as("NUM_VENCIDAS"),
        dround(sum(when(col("DELTA_MORA") > 0, col("SALDO_FACTURA")).otherwise(0.0)), 2)
          .as("SALDO_VENCIDO"),
        dround(sum(when(col("DELTA_MORA") <= 0, col("SALDO_FACTURA")).otherwise(0.0)), 2)
          .as("SALDO_VIGENTE"),
        max(when(col("DELTA_MORA") > 0, col("DELTA_MORA"))).as("MAX_DIAS_VENCIDO"),
        dround(sum(when(col("DELTA_MORA") > 0, col("SALDO_FACTURA")).otherwise(0.0)) /
          sum("SALDO_FACTURA"), 6).as("PCT_VENCIDO"))
  }

  /** PASO 5: 4 KPI sets × {MXN, USD} (/root/reference/src/kpis.py:47-59). */
  def run(movimientosTotales: DataFrame, asOf: LocalDate): Map[String, DataFrame] =
    Seq("MXN", "USD").flatMap { m =>
      val df = byMoneda(movimientosTotales, m)
      val suffix = m.toLowerCase
      Seq(
        s"kpis_resumen_$suffix" -> resumen(df, asOf),
        s"concentracion_$suffix" -> concentracion(df),
        s"limite_credito_$suffix" -> limiteCredito(df),
        s"morosidad_por_cliente_$suffix" -> morosidadPorCliente(df),
      )
    }.toMap
}
