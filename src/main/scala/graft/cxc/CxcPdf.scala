package graft.cxc

import org.apache.spark.sql.{DataFrame, Row}

import graft.output.PdfSink
import graft.output.PdfSink.{Page, Margin, PageW, PageH}

/** The reference CLI's executive PDF (SURVEY §2.1 S8,
  * /root/reference/src/reporte_pdf.py:400-485): landscape A4 — cover,
  * then per currency (MXN → USD with a transition page): strategic KPI
  * table, overdue-vs-current donut, aging horizontal bars, Pareto
  * concentration (bars + cumulative line + 80% rule marker),
  * credit-limit table, and three operational annex tables. Tables use
  * the reference financial style (blue header, zebra, gray TOTAL, full
  * grid) with the truncate-to-N-preserving-TOTAL rule; charts are
  * native vector paths via [[PdfSink]], replacing the reference's
  * rasterized matplotlib embeds. Missing/empty views are skipped like
  * the reference's early-return (`if df.empty: return`).
  *
  * S9 (the standalone generator over embedded literals,
  * generar_reporte_cxc.py) is the same renderer fed literal in-memory
  * frames instead of pipeline views — PdfSinkSpec exercises exactly
  * that path with a hand-built frame.
  */
object CxcPdf {

  private val Body =
    "Los Indicadores Clave de Desempeño (KPIs) ofrecen una radiografía " +
      "inmediata de la salud financiera y la efectividad del ciclo de cobranza."
  private val BodyVencido =
    "Esta vista clasifica el capital pendiente en lo que se encuentra dentro " +
      "de los términos de pago (Vigente) y lo que representa un incumplimiento (Vencido)."
  private val BodyAging =
    "El análisis de antigüedad segmenta la deuda según sus días de mora; " +
      "los saldos superiores a 90 días poseen un riesgo crítico de incobrabilidad."
  private val BodyPareto =
    "La Clasificación A representa a los deudores críticos que agrupan el 80% " +
      "del saldo total; un impago en este sector compromete la operación."
  private val BodyCredito =
    "Mide la exposición al riesgo comparando la deuda actual contra la línea " +
      "de crédito autorizada; las cuentas SOBRE_LIMITE operan fuera de política."

  private def header(p: Page, title: String, body: String): Double = {
    p.text(Margin, PageH - Margin - 10, 18, title, bold = true, color = PdfSink.Azul)
    // naive wrap at ~110 chars (8pt body on a 728pt line)
    val words = body.split(" ")
    var (line, y) = (new StringBuilder, PageH - Margin - 34)
    words.foreach { w =>
      if (line.length + 1 + w.length > 110) {
        p.text(Margin, y, 9, line.toString); y -= 13; line = new StringBuilder
      }
      if (line.nonEmpty) line.append(' ')
      line.append(w)
    }
    if (line.nonEmpty) { p.text(Margin, y, 9, line.toString); y -= 13 }
    y - 10
  }

  private def money0(v: Double): String =
    "$%,.0f".formatLocal(java.util.Locale.US, v)

  private def num(r: Row, i: Int): Double = r.get(i) match {
    case null => 0.0
    case d: Double => d
    case l: Long => l.toDouble
    case x: java.math.BigDecimal => x.doubleValue
    case x => x.toString.toDouble
  }

  /** Donut (reporte_pdf.py:217-258): VIGENTE slices green, the rest
    * red, start at 90° counterclockwise, % labels at mid-radius,
    * legend at the right.
    */
  private def donut(p: Page, rows: Seq[(String, Double)], yTop: Double): Double = {
    val total = rows.map(_._2).sum
    if (total <= 0) return yTop
    val (cx, cy, r1, r0) = (PageW / 2 - 60, yTop - 80, 72.0, 43.0)
    var a = math.Pi / 2
    rows.foreach { case (label, v) =>
      val sweep = 2 * math.Pi * v / total
      val c = if (label.toUpperCase.contains("VIGENTE")) PdfSink.Verde else PdfSink.Rojo
      p.wedge(cx, cy, r0, r1, a, a + sweep, c)
      val mid = a + sweep / 2
      val (lx, ly) = (cx + (r0 + r1) / 2 * math.cos(mid) - 10,
        cy + (r0 + r1) / 2 * math.sin(mid) - 3)
      p.text(lx, ly, 9, "%.1f%%".formatLocal(java.util.Locale.US, 100 * v / total),
        bold = true, color = PdfSink.White)
      a += sweep
    }
    rows.zipWithIndex.foreach { case ((label, _), i) =>
      val ly = cy + 20 - 16 * i
      val c = if (label.toUpperCase.contains("VIGENTE")) PdfSink.Verde else PdfSink.Rojo
      p.fillRect(cx + r1 + 30, ly, 9, 9, c)
      p.text(cx + r1 + 44, ly + 1, 9, label)
    }
    yTop - 170
  }

  /** Horizontal bars (reporte_pdf.py:260-313): one bar per aging
    * bucket, green for Vigente, value label right of the bar.
    */
  private def barh(p: Page, rows: Seq[(String, Double)], yTop: Double): Double = {
    val mx = rows.map(_._2).max
    if (mx <= 0) return yTop
    val (x0, barH, gap, plotW) = (Margin + 120, 14.0, 6.0, PageW - 2 * Margin - 260)
    var y = yTop - barH
    rows.foreach { case (label, v) =>
      val c = if (label.toUpperCase.contains("VIGENTE")) PdfSink.Verde else PdfSink.Rojo
      val w = plotW * v / mx
      p.text(Margin, y + 3, 8, label)
      p.fillRect(x0, y, math.max(w, 0.5), barH, c)
      p.text(x0 + w + 4, y + 3, 7, money0(v))
      y -= barH + gap
    }
    p.line(x0, y + gap, x0, yTop, PdfSink.Ink, 0.8)
    y - 6
  }

  /** Pareto (reporte_pdf.py:316-365): top-10 client bars (blue) +
    * cumulative-% polyline (red, dot markers) + dashed 80% rule line.
    */
  private def pareto(p: Page, rows: Seq[(String, Double, Double)], yTop: Double): Double = {
    val top = rows.take(10)
    if (top.isEmpty) return yTop
    val mx = top.map(_._2).max
    if (mx <= 0) return yTop
    val (x0, plotW, plotH) = (Margin + 30, PageW - 2 * Margin - 60, 130.0)
    val yBase = yTop - plotH - 24
    val slotW = plotW / top.size
    val pts = top.zipWithIndex.map { case ((label, v, cum), i) =>
      val bx = x0 + i * slotW + slotW * 0.15
      p.fillRect(bx, yBase, slotW * 0.55, plotH * v / mx, PdfSink.Azul)
      p.text(bx - 2, yBase - 10, 6,
        (if (label.length > 12) label.take(12) + ".." else label))
      (x0 + i * slotW + slotW * 0.42, yBase + plotH * math.min(cum, 1.0))
    }
    p.line(x0, yBase + plotH * 0.8, x0 + plotW, yBase + plotH * 0.8,
      PdfSink.Gris, 0.7, dashed = true)
    pts.sliding(2).foreach {
      case Seq((ax, ay), (bx, by)) => p.line(ax, ay, bx, by, PdfSink.Rojo, 1.5)
      case _ => ()
    }
    pts.foreach { case (x, y) => p.dot(x, y, 2.2, PdfSink.Rojo) }
    p.line(x0, yBase, x0 + plotW, yBase, PdfSink.Ink, 0.8)
    yBase - 24
  }

  private def tablePage(views: Map[String, DataFrame], key: String,
      title: String, body: String, maxRows: Int): Option[Page] =
    views.get(key).map(PdfSink.collectCapped(_)).filter(_.nonEmpty).map { rows =>
      val p = new Page
      val y = header(p, title, body)
      PdfSink.table(p, views(key).columns.toIndexedSeq,
        PdfSink.truncatePreservingTotal(rows, maxRows), y)
      p
    }

  private def label(r: Row): String = Option(r.get(0)).map(_.toString).getOrElse("")

  /** Render the dashboard PDF from the pipeline's named views
    * (generar_reporte_pdf analog). Returns the page count.
    */
  def export(views: Map[String, DataFrame], path: String, timestamp: String): Int = {
    val pages = scala.collection.mutable.ArrayBuffer[Page]()
    // cover (reporte_pdf.py:417-422)
    pages += new Page()
      .textCentered(PageH / 2 + 60, 30, "DASHBOARD ESTRATEGICO", bold = true,
        color = PdfSink.Azul)
      .textCentered(PageH / 2 + 20, 24, "Cuentas por Cobrar (CxC)", bold = true)
      .textCentered(PageH / 2 - 40, 10, s"Generado automáticamente: $timestamp")
    Seq("MXN", "USD").foreach { cur =>
      val sfx = cur.toLowerCase
      if (cur == "USD")
        pages += new Page().textCentered(PageH / 2, 28, "SECCIÓN EN DÓLARES (USD)",
          bold = true, color = PdfSink.Verde)
      tablePage(views, s"kpis_resumen_$sfx",
        s"Dashboard de Cuentas por Cobrar — $cur", Body, 16).foreach(pages += _)
      // donut page
      views.get(s"cartera_vencida_vs_vigente_$sfx")
        .map(PdfSink.collectCapped(_)).filter(_.nonEmpty).foreach { rows =>
          val df = views(s"cartera_vencida_vs_vigente_$sfx")
          val si = df.columns.indexOf("SALDO_TOTAL")
          val p = new Page
          var y = header(p, s"Cartera Vencida vs Vigente — $cur", BodyVencido)
          y = donut(p, rows.filter(label(_).toUpperCase != "TOTAL")
            .map(r => label(r) -> num(r, si)), y)
          PdfSink.table(p, df.columns.toIndexedSeq,
            PdfSink.truncatePreservingTotal(rows, 8), y)
          pages += p
        }
      // aging bars page
      views.get(s"antiguedad_cartera_$sfx")
        .map(PdfSink.collectCapped(_)).filter(_.nonEmpty).foreach { rows =>
          val df = views(s"antiguedad_cartera_$sfx")
          val (si, oi) = (df.columns.indexOf("SALDO_TOTAL"), df.columns.indexOf("ORDEN"))
          val p = new Page
          var y = header(p, s"Antigüedad de Cartera (Aging) — $cur", BodyAging)
          y = barh(p, rows.filter(label(_).toUpperCase != "TOTAL")
            .sortBy(r => num(r, oi)).map(r => label(r) -> num(r, si)), y)
          PdfSink.table(p, df.columns.toIndexedSeq,
            PdfSink.truncatePreservingTotal(rows, 8), y)
          pages += p
        }
      // pareto page
      views.get(s"concentracion_$sfx")
        .map(PdfSink.collectCapped(_)).filter(_.nonEmpty).foreach { rows =>
          val df = views(s"concentracion_$sfx")
          val (si, ci) = (df.columns.indexOf("SALDO_PENDIENTE"),
            df.columns.indexOf("PCT_ACUMULADO"))
          val p = new Page
          var y = header(p, s"Concentración de Cartera (Regla 80/20) — $cur", BodyPareto)
          y = pareto(p, rows.filter(label(_).toUpperCase != "TOTAL")
            .map(r => (label(r), num(r, si), num(r, ci))), y)
          PdfSink.table(p, df.columns.toIndexedSeq,
            PdfSink.truncatePreservingTotal(rows, 8), y)
          pages += p
        }
      tablePage(views, s"limite_credito_$sfx",
        s"Utilización de Límite de Crédito — $cur", BodyCredito, 16).foreach(pages += _)
      tablePage(views, s"resumen_concepto_cxc_$sfx",
        s"Anexo: Movimientos por Concepto Contable ($cur)",
        "Distribución transaccional del capital detrás de los montos financieros.",
        16).foreach(pages += _)
      tablePage(views, s"resumen_cancelados_cxc_$sfx",
        s"Anexo: Análisis de Documentos Cancelados ($cur)",
        "Las cancelaciones recurrentes pueden ser un síntoma de errores operativos.",
        16).foreach(pages += _)
      tablePage(views, s"resumen_ajustes_cxc_$sfx",
        s"Anexo: Registros por Acreditar / Anticipos ($cur)",
        "Pagos ingresados que no han sido conciliados a una factura específica.",
        16).foreach(pages += _)
    }
    PdfSink.write(pages.toSeq, path, "Dashboard Estratégico de CxC")
    pages.size
  }
}
