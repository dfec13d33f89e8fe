package graft.cxc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftConf
import graft.operators.Buckets
import graft.operators.Rounding.dround

import CxcSchema._

/** Portfolio analytics over `movimientos_totales` (SURVEY §3.1 PASO 4;
  * /root/reference/src/analytics.py) — 6 analyses × 2 currencies, keys
  * matching /root/reference/src/analytics.py:49-62. Out-of-range bucket
  * default here is "Fuera de rango" (≠ reporte's "", SURVEY §7.6.7).
  */
object CxcAnalytics {

  private def byMoneda(df: DataFrame, m: String): DataFrame =
    df.filter(upper(trim(col("MONEDA"))) === m)

  /** A3 — aging with TOTAL row, single-pass rollup. */
  def antiguedadCartera(df: DataFrame): DataFrame = {
    val open = df.filter(esVenta(df) && col("SALDO_FACTURA") > 0)
    val catExpr = Buckets.bucketize(col("DELTA_MORA"), GraftConf.agingRanges, "Fuera de rango")
    val agg = open.rollup(catExpr.as("_cat")).agg(
      count(lit(1)).as("NUM_FACTURAS"),
      dround(sum("SALDO_FACTURA"), 2).as("SALDO_TOTAL"),
      grouping_id().as("_gid"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    agg
      .withColumn("_tot", max(when(col("_gid") === 1, col("SALDO_TOTAL"))).over(wAll))
      .select(
        coalesce(col("_cat"), lit("TOTAL")).as("CATEGORIA_MORA"),
        when(col("_gid") === 1, 99)
          .otherwise(Buckets.bucketOrdinal(col("_cat"), GraftConf.agingRanges))
          .cast("int").as("ORDEN"),
        col("NUM_FACTURAS"), col("SALDO_TOTAL"),
        when(col("_gid") === 1, 1.0)
          .otherwise(dround(col("SALDO_TOTAL") / col("_tot"), 6)).as("PCT_DEL_TOTAL"))
  }

  /** A4 — per-client aging pivot + scalar totals
    * (/root/reference/src/analytics.py:180-259).
    */
  def antiguedadPorCliente(df: DataFrame): DataFrame = {
    // Scalar totals AND the per-bucket pivot as ONE conditional
    // aggregation — a single shuffle, no pivot+scalars self-join.
    val open = esVenta(df) && col("SALDO_FACTURA") > 0
    val cat = Buckets.bucketize(col("DELTA_MORA"), GraftConf.agingRanges, "Fuera de rango")
    val bucketCols = GraftConf.agingRanges.map { case (_, _, label) =>
      dround(coalesce(
        sum(when(open && cat === label, col("SALDO_FACTURA"))), lit(0.0)), 2).as(label)
    }
    df.groupBy("NOMBRE_CLIENTE").agg(
      dround(sum(when(isCargo(df), col("_MONTO")).otherwise(0.0)), 2).as("TOTAL_CARGOS"),
      (dround(sum(when(isAbono(df), col("_MONTO")).otherwise(0.0)), 2).as("TOTAL_ABONOS") +:
        sum(when(isCargo(df), 1).otherwise(0)).as("NUM_FACTURAS_TOTALES") +:
        sum(when(isCargo(df) && col("SALDO_FACTURA") > 0, 1).otherwise(0))
          .as("NUM_FACTURAS_PENDIENTES") +:
        dround(sum(when(col("SALDO_FACTURA") > 0, col("SALDO_FACTURA")).otherwise(0.0)), 2)
          .as("SALDO_PENDIENTE") +:
        first(col("ESTATUS_CLIENTE"), ignoreNulls = true).as("ESTATUS_CLIENTE") +:
        bucketCols): _*)
  }

  /** A5 — overdue vs current split (/root/reference/src/analytics.py:265-304). */
  def carteraVencidaVsVigente(df: DataFrame): DataFrame = {
    val open = df.filter(esVenta(df) && col("SALDO_FACTURA") > 0)
    val agg = open.rollup(
      when(col("DELTA_MORA") <= 0, "VIGENTES").otherwise("VENCIDAS").as("ESTADO"))
      .agg(count(lit(1)).as("NUM_FACTURAS"),
        dround(sum("SALDO_FACTURA"), 2).as("SALDO_TOTAL"),
        grouping_id().as("_gid"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    agg.withColumn("_tot", max(when(col("_gid") === 1, col("SALDO_TOTAL"))).over(wAll))
      .select(
        coalesce(col("ESTADO"), lit("TOTAL")).as("ESTADO"),
        col("NUM_FACTURAS"), col("SALDO_TOTAL"),
        when(col("_gid") === 1, 1.0)
          .otherwise(dround(col("SALDO_TOTAL") / col("_tot"), 6)).as("PCT_DEL_TOTAL"))
  }

  /** A6 — per-concept charge/payment summary as ONE conditional groupBy
    * (the reference's outer-join-of-two-aggs J6 collapsed,
    * /root/reference/src/analytics.py:310-348).
    */
  def resumenPorConcepto(df: DataFrame): DataFrame =
    df.groupBy(coalesce(col("CONCEPTO"), lit("Sin concepto asignado")).as("CONCEPTO"))
      .agg(
        sum(when(isCargo(df), 1).otherwise(0)).as("NUM_CARGOS"),
        dround(sum(when(isCargo(df), col("_MONTO")).otherwise(0.0)), 2).as("TOTAL_CARGOS"),
        sum(when(isAbono(df), 1).otherwise(0)).as("NUM_ABONOS"),
        dround(sum(when(isAbono(df), col("_MONTO")).otherwise(0.0)), 2).as("TOTAL_ABONOS"))

  /** A8 — adjustments (por acreditar) per client
    * (/root/reference/src/analytics.py:354-385).
    */
  def ajustesPorCliente(porAcreditar: DataFrame): DataFrame =
    porAcreditar
      .groupBy(coalesce(col("NOMBRE_CLIENTE"), lit("Sin cliente")).as("NOMBRE_CLIENTE"))
      .agg(count(lit(1)).as("NUM_AJUSTES"),
        dround(sum("_MONTO"), 2).as("IMPORTE_AJUSTE"))

  /** A7 — cancelled summary (same shape as A6 over the cancelled view,
    * /root/reference/src/analytics.py:391-425).
    */
  def resumenCancelados(cancelados: DataFrame): DataFrame =
    cancelados.groupBy(coalesce(col("CONCEPTO"), lit("Sin concepto asignado")).as("CONCEPTO"))
      .agg(
        sum(when(isCargo(cancelados), 1).otherwise(0)).as("NUM_CARGOS_CANCELADOS"),
        dround(sum(when(isCargo(cancelados), col("_MONTO")).otherwise(0.0)), 2)
          .as("TOTAL_CARGOS_CANCELADOS"),
        sum(when(isAbono(cancelados), 1).otherwise(0)).as("NUM_ABONOS_CANCELADOS"),
        dround(sum(when(isAbono(cancelados), col("_MONTO")).otherwise(0.0)), 2)
          .as("TOTAL_ABONOS_CANCELADOS"))

  /** PASO 4: 6 analyses × {MXN, USD}, reference key scheme. */
  def run(vistas: Map[String, DataFrame]): Map[String, DataFrame] = {
    val movs = vistas("movimientos_totales")
    val adj = vistas("por_acreditar")
    val canc = vistas("registros_cancelados")
    Seq("MXN", "USD").flatMap { m =>
      val suffix = m.toLowerCase
      Seq(
        s"antiguedad_cartera_$suffix" -> antiguedadCartera(byMoneda(movs, m)),
        s"antiguedad_por_cliente_$suffix" -> antiguedadPorCliente(byMoneda(movs, m)),
        s"cartera_vencida_vs_vigente_$suffix" -> carteraVencidaVsVigente(byMoneda(movs, m)),
        s"resumen_por_concepto_$suffix" -> resumenPorConcepto(byMoneda(movs, m)),
        s"ajustes_por_cliente_$suffix" -> ajustesPorCliente(byMoneda(adj, m)),
        s"resumen_cancelados_$suffix" -> resumenCancelados(byMoneda(canc, m)),
      )
    }.toMap
  }
}
