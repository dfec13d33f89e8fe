package graft.cxc

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The analytics `_preparar` concept key: null → "Sin concepto
    * asignado", then trim+upper (/root/reference/src/analytics.py:97-101).
    */
  private def conceptoNorm: Column =
    upper(trim(coalesce(col("CONCEPTO"), lit("Sin concepto asignado"))))

  /** TOTAL row = sums of the per-group ROUNDED values (the reference
    * sums after round(2), analytics.py:335-346 — sum-of-rounded, not
    * round-of-sum; SURVEY §7.6 determinism note). Delegates to
    * operators.TotalRow (which also keeps empty inputs empty) and fixes
    * the output column order.
    */
  private def withTotal(g: DataFrame, labelCol: String,
      numCols: Seq[String], finalOrder: Seq[String]): DataFrame =
    graft.operators.TotalRow
      .withTotalRow(g, labelCol, numCols.map(c => c -> col(c)).toMap)
      .select(finalOrder.map(col): _*)

  /** A6 — per-concept charge/payment summary as ONE conditional groupBy
    * (the reference's outer-join-of-two-aggs J6 collapsed,
    * /root/reference/src/analytics.py:310-348), sorted by totals desc
    * with the TOTAL row appended.
    */
  def resumenPorConcepto(df: DataFrame): DataFrame = {
    val rows = df.filter(isCargo(df) || isAbono(df))
    val g = rows.groupBy(conceptoNorm.as("CONCEPTO"))
      .agg(
        sum(when(isCargo(rows), 1L).otherwise(0L)).as("NUM_CARGOS"),
        sum(when(isAbono(rows), 1L).otherwise(0L)).as("NUM_ABONOS"),
        dround(sum(when(isCargo(rows), col("_MONTO")).otherwise(0.0)), 2).as("TOTAL_CARGOS"),
        dround(sum(when(isAbono(rows), col("_MONTO")).otherwise(0.0)), 2).as("TOTAL_ABONOS"))
      .orderBy(col("TOTAL_CARGOS").desc, col("TOTAL_ABONOS").desc)
    withTotal(g, "CONCEPTO",
      Seq("NUM_CARGOS", "NUM_ABONOS", "TOTAL_CARGOS", "TOTAL_ABONOS"),
      Seq("CONCEPTO", "NUM_CARGOS", "NUM_ABONOS", "TOTAL_CARGOS", "TOTAL_ABONOS"))
  }

  /** A8 — adjustments (por acreditar) per client with the reference's
    * dual sort (nonzero desc, zero tail name-asc) and TOTAL row
    * (/root/reference/src/analytics.py:354-385).
    */
  def resumenAjustes(porAcreditar: DataFrame): DataFrame = {
    val g = porAcreditar
      .groupBy(coalesce(col("NOMBRE_CLIENTE"), lit("Sin cliente")).as("NOMBRE_CLIENTE"))
      .agg(count(lit(1)).as("NUM_REGISTROS"),
        dround(sum("_MONTO"), 2).as("IMPORTE_AJUSTE"))
      .orderBy((col("IMPORTE_AJUSTE") =!= 0).desc,
        when(col("IMPORTE_AJUSTE") =!= 0, -col("IMPORTE_AJUSTE")).asc_nulls_last,
        col("NOMBRE_CLIENTE").asc)
    withTotal(g, "NOMBRE_CLIENTE", Seq("NUM_REGISTROS", "IMPORTE_AJUSTE"),
      Seq("NOMBRE_CLIENTE", "NUM_REGISTROS", "IMPORTE_AJUSTE"))
  }

  /** A7 — cancelled summary (A6 shape over the cancelled view,
    * /root/reference/src/analytics.py:391-425): reference column names
    * (counts unsuffixed, totals suffixed), totals-desc sort, TOTAL row.
    */
  def resumenCancelados(cancelados: DataFrame): DataFrame = {
    val rows = cancelados.filter(isCargo(cancelados) || isAbono(cancelados))
    val g = rows.groupBy(conceptoNorm.as("CONCEPTO"))
      .agg(
        sum(when(isCargo(rows), 1L).otherwise(0L)).as("NUM_CARGOS"),
        sum(when(isAbono(rows), 1L).otherwise(0L)).as("NUM_ABONOS"),
        dround(sum(when(isCargo(rows), col("_MONTO")).otherwise(0.0)), 2)
          .as("TOTAL_CARGOS_CANCELADOS"),
        dround(sum(when(isAbono(rows), col("_MONTO")).otherwise(0.0)), 2)
          .as("TOTAL_ABONOS_CANCELADOS"))
      .orderBy(col("TOTAL_CARGOS_CANCELADOS").desc, col("TOTAL_ABONOS_CANCELADOS").desc)
    withTotal(g, "CONCEPTO",
      Seq("NUM_CARGOS", "NUM_ABONOS", "TOTAL_CARGOS_CANCELADOS", "TOTAL_ABONOS_CANCELADOS"),
      Seq("CONCEPTO", "NUM_CARGOS", "NUM_ABONOS",
        "TOTAL_CARGOS_CANCELADOS", "TOTAL_ABONOS_CANCELADOS"))
  }

  /** Vendor summary (SURVEY §5.3): per-vendor charge/payment counts,
    * totals and saldo, sorted saldo desc — the per-vendor aggregate the
    * production PDF embeds (/root/reference/generar_reporte_cxc.py:113-126;
    * expected by /root/reference/tests/test_pipeline.py:299-301).
    */
  def resumenPorVendedor(df: DataFrame): DataFrame = {
    val rows = df.filter(isCargo(df) || isAbono(df))
    rows.groupBy(coalesce(col("VENDEDOR"), lit("SIN VENDEDOR ASIGNADO")).as("VENDEDOR"))
      .agg(
        sum(when(isCargo(rows), 1L).otherwise(0L)).as("NUM_CARGOS"),
        sum(when(isAbono(rows), 1L).otherwise(0L)).as("NUM_ABONOS"),
        dround(sum(when(isCargo(rows), col("_MONTO")).otherwise(0.0)), 2).as("TOTAL_CARGOS"),
        dround(sum(when(isAbono(rows), col("_MONTO")).otherwise(0.0)), 2).as("TOTAL_ABONOS"))
      .withColumn("SALDO", dround(col("TOTAL_CARGOS") - col("TOTAL_ABONOS"), 2))
      .orderBy(col("SALDO").desc, col("VENDEDOR").asc)
  }

  /** PASO 4: 7 analyses × {MXN, USD}, reference key scheme
    * (/root/reference/src/analytics.py:49-62 — `resumen_*_cxc_*` keys;
    * ajustes/cancelados read the full-width `registros_*` twins exactly
    * as main.py:570-576 wires them).
    */
  def run(vistas: Map[String, DataFrame]): Map[String, DataFrame] = {
    val movs = vistas("movimientos_totales")
    val adj = vistas("registros_por_acreditar")
    val canc = vistas("registros_cancelados")
    Seq("MXN", "USD").flatMap { m =>
      val suffix = m.toLowerCase
      Seq(
        s"antiguedad_cartera_$suffix" -> antiguedadCartera(byMoneda(movs, m)),
        s"antiguedad_por_cliente_$suffix" -> antiguedadPorCliente(byMoneda(movs, m)),
        s"cartera_vencida_vs_vigente_$suffix" -> carteraVencidaVsVigente(byMoneda(movs, m)),
        s"resumen_concepto_cxc_$suffix" -> resumenPorConcepto(byMoneda(movs, m)),
        s"resumen_ajustes_cxc_$suffix" -> resumenAjustes(byMoneda(adj, m)),
        s"resumen_cancelados_cxc_$suffix" -> resumenCancelados(byMoneda(canc, m)),
        s"resumen_por_vendedor_$suffix" -> resumenPorVendedor(byMoneda(movs, m)),
      )
    }.toMap
  }
}
