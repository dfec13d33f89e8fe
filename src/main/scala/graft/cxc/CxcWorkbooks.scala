package graft.cxc

import org.apache.spark.sql.DataFrame

import graft.output.ExcelSink

/** The reference CLI's canonical output: THREE xlsx workbooks per run
  * (exportar_tres_exceles, /root/reference/main.py:423-508, names from
  * config/settings.py EXCEL_NOMBRES) — 00_auditoria_cxc,
  * 01_reporte_cxc, 02_analisis_cxc — with the reference's sheet names
  * and sheet order (analytics interleaved by currency, KPI sheets
  * merged into the analysis workbook). Missing/empty views are skipped
  * exactly like the reference's `continue`.
  */
object CxcWorkbooks {

  /** (workbook base name, ordered (sheet name → graft view key)). */
  val layout: Seq[(String, Seq[(String, String)])] = Seq(
    "00_auditoria_cxc" -> Seq(
      "calidad_datos" -> "auditoria_perfil_calidad",
      "importes_atipicos" -> "auditoria_importes_atipicos",
      "recaudos_atipicos" -> "auditoria_recaudos_atipicos",
      "moras_atipicas" -> "auditoria_moras_atipicas",
      "sin_tipo_cliente" -> "auditoria_sin_tipo_cliente",
      "sin_vendedor" -> "auditoria_sin_vendedor",
    ),
    "01_reporte_cxc" -> Seq(
      "movimientos_abiertos_cxc" -> "facturas_abiertas",
      "movimientos_cerrados_cxc" -> "facturas_cerradas",
      "movimientos_totales_cxc" -> "movimientos_totales",
      "registros_por_acreditar_cxc" -> "registros_por_acreditar",
      "registros_cancelados_cxc" -> "registros_cancelados",
      "registros_totales_cxc" -> "registros_totales",
    ),
    "02_analisis_cxc" -> (Seq(
      "cartera_vencida_vs_vigente", "antiguedad_cartera",
      "antiguedad_por_cliente", "resumen_concepto_cxc",
      "resumen_cancelados_cxc", "resumen_ajustes_cxc",
      "resumen_por_vendedor", // graft extension sheet (SURVEY §5.3)
    ).flatMap(base => Seq(s"${base}_mxn" -> s"${base}_mxn", s"${base}_usd" -> s"${base}_usd")) ++ Seq(
      "kpis_resumen_mxn" -> "kpis_resumen_mxn",
      "kpis_resumen_usd" -> "kpis_resumen_usd",
      "kpis_concentracion_mxn" -> "concentracion_mxn",
      "kpis_concentracion_usd" -> "concentracion_usd",
      "kpis_limite_credito_mxn" -> "limite_credito_mxn",
      "kpis_limite_credito_usd" -> "limite_credito_usd",
      "kpis_morosidad_cliente_mxn" -> "morosidad_por_cliente_mxn",
      "kpis_morosidad_cliente_usd" -> "morosidad_por_cliente_usd",
    )),
  )

  /** Write the three workbooks into `outDir`; returns the paths. */
  def export(views: Map[String, DataFrame], outDir: String): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    layout.map { case (base, sheets) =>
      // skip missing AND empty views — the reference's `continue` omits
      // the sheet entirely for empty frames (head(1): report-sized check)
      val present = sheets.collect {
        case (sheetName, viewKey)
            if views.contains(viewKey) && !views(viewKey).head(1).isEmpty =>
          sheetName -> views(viewKey)
      }
      val path = s"$outDir/$base.xlsx"
      ExcelSink.write(present, path)
      path
    }
  }
}
