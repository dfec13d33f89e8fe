package graft.cxc

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Pareto
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

  /** A13/W2 — Pareto/ABC concentration of open sales balances
    * (/root/reference/src/kpis.py:117-161).
    */
  def concentracion(df: DataFrame): DataFrame = {
    val perClient = df
      .filter(esVenta(df) && col("SALDO_FACTURA") > 0)
      .groupBy(coalesce(col("NOMBRE_CLIENTE"), lit("Sin cliente")).as("NOMBRE_CLIENTE"))
      .agg(dround(sum("SALDO_FACTURA"), 2).as("SALDO_PENDIENTE"))
    Pareto.abc(perClient, col("NOMBRE_CLIENTE"), col("SALDO_PENDIENTE"))
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
