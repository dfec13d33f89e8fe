package graft.output

import java.nio.charset.StandardCharsets
import java.util.Locale

import org.apache.spark.sql.{DataFrame, Row}

/** Dependency-free PDF 1.4 writer — the PDF twin of [[ExcelSink]]
  * (house rule: no libraryDependencies, so the sink emits the format by
  * hand; PDF is a plain-text object graph with byte-offset xref, like
  * xlsx is zip+xml). Reference surface: the executive dashboard PDF at
  * /root/reference/src/reporte_pdf.py (SURVEY §2.1 S8) — landscape A4,
  * financial table style (header band, TOTAL row, zebra rows, grid),
  * truncate-to-N-rows-preserving-TOTAL, donut / horizontal-bar / Pareto
  * charts. Charts are native PDF vector paths (rect + bezier-arc
  * wedges), not raster embeds — smaller, resolution-independent, and
  * structurally testable (PdfSinkSpec greps the drawing operators).
  *
  * Encoding: content is assembled as ISO-8859-1 so char count == byte
  * count (the xref and /Length fields are byte-exact by construction);
  * text uses WinAnsiEncoding, which matches latin-1 on the accented
  * range — Spanish narratives render verbatim. Streams are left
  * uncompressed: report-sized output, and the spec can parse text back
  * out with a regex.
  *
  * Scale note: a sink renders REPORT-sized frames (the analytics
  * outputs, ≤ hundreds of rows by construction) — callers collect with
  * [[PdfSink.collectCapped]], which hard-caps the driver-side pull.
  */
object PdfSink {

  val PageW = 842.0 // landscape A4, points
  val PageH = 595.0
  val Margin = 57.0 // 2 cm

  // reference palette (reporte_pdf.py:54-59)
  val Azul: (Double, Double, Double) = rgb(0x44, 0x72, 0xC4)
  val Verde: (Double, Double, Double) = rgb(0x54, 0x82, 0x35)
  val Rojo: (Double, Double, Double) = rgb(0xC0, 0x00, 0x00)
  val Gris: (Double, Double, Double) = rgb(0xA6, 0xA6, 0xA6)
  val Fondo: (Double, Double, Double) = rgb(0xF2, 0xF2, 0xF2)
  val GridLine: (Double, Double, Double) = rgb(0xB4, 0xC6, 0xE7)
  val Ink: (Double, Double, Double) = rgb(0x33, 0x33, 0x33)
  val White: (Double, Double, Double) = (1.0, 1.0, 1.0)

  private def rgb(r: Int, g: Int, b: Int) = (r / 255.0, g / 255.0, b / 255.0)

  private def n(x: Double): String = "%.2f".formatLocal(Locale.US, x)

  /** PDF literal-string escape, sanitized to the WinAnsi byte range.
    * Latin-1 passes through (WinAnsi == latin-1 there); the common
    * CP1252-only publishing chars map to their WinAnsi bytes; anything
    * else becomes '?'.
    */
  def pdfStr(s: String): String = s.flatMap {
    case '(' => "\\("
    case ')' => "\\)"
    case '\\' => "\\\\"
    case '\u2014' => "\u0097" // em dash
    case '\u2013' => "\u0096" // en dash
    case '\u2026' => "\u0085" // ellipsis
    case c if c.toInt < 32 => " "
    case c if c.toInt > 255 => "?"
    case c => c.toString
  }

  /** One page's content stream under construction. Coordinates are PDF
    * native (origin bottom-left, points).
    */
  final class Page {
    private val sb = new StringBuilder

    def raw(ops: String): Page = { sb.append(ops).append('\n'); this }

    def text(x: Double, y: Double, size: Double, s: String,
        bold: Boolean = false,
        color: (Double, Double, Double) = Ink): Page = {
      val f = if (bold) "/F2" else "/F1"
      raw(s"BT ${n(color._1)} ${n(color._2)} ${n(color._3)} rg " +
        s"$f ${n(size)} Tf 1 0 0 1 ${n(x)} ${n(y)} Tm (${pdfStr(s)}) Tj ET")
    }

    /** Centered on the page width (Helvetica ~0.5 em average advance —
      * layout nicety, not a correctness property).
      */
    def textCentered(y: Double, size: Double, s: String,
        bold: Boolean = false,
        color: (Double, Double, Double) = Ink): Page =
      text((PageW - s.length * size * 0.5) / 2, y, size, s, bold, color)

    def fillRect(x: Double, y: Double, w: Double, h: Double,
        c: (Double, Double, Double)): Page =
      raw(s"${n(c._1)} ${n(c._2)} ${n(c._3)} rg ${n(x)} ${n(y)} ${n(w)} ${n(h)} re f")

    def strokeRect(x: Double, y: Double, w: Double, h: Double,
        c: (Double, Double, Double), lw: Double = 0.5): Page =
      raw(s"${n(lw)} w ${n(c._1)} ${n(c._2)} ${n(c._3)} RG " +
        s"${n(x)} ${n(y)} ${n(w)} ${n(h)} re S")

    def line(x1: Double, y1: Double, x2: Double, y2: Double,
        c: (Double, Double, Double), lw: Double = 0.5,
        dashed: Boolean = false): Page = {
      val d = if (dashed) "[3 3] 0 d " else "[] 0 d "
      raw(s"$d${n(lw)} w ${n(c._1)} ${n(c._2)} ${n(c._3)} RG " +
        s"${n(x1)} ${n(y1)} m ${n(x2)} ${n(y2)} l S [] 0 d")
    }

    /** Filled circle via four bezier quarter-arcs (Pareto markers). */
    def dot(cx: Double, cy: Double, r: Double,
        c: (Double, Double, Double)): Page = {
      val k = 0.5523 * r
      raw(s"${n(c._1)} ${n(c._2)} ${n(c._3)} rg " +
        s"${n(cx + r)} ${n(cy)} m " +
        s"${n(cx + r)} ${n(cy + k)} ${n(cx + k)} ${n(cy + r)} ${n(cx)} ${n(cy + r)} c " +
        s"${n(cx - k)} ${n(cy + r)} ${n(cx - r)} ${n(cy + k)} ${n(cx - r)} ${n(cy)} c " +
        s"${n(cx - r)} ${n(cy - k)} ${n(cx - k)} ${n(cy - r)} ${n(cx)} ${n(cy - r)} c " +
        s"${n(cx + k)} ${n(cy - r)} ${n(cx + r)} ${n(cy - k)} ${n(cx + r)} ${n(cy)} c f")
    }

    /** Filled annular sector (donut slice) from `a0` to `a1` radians
      * counterclockwise, outer radius r1, inner r0, approximated with
      * ≤90° bezier arc segments (k = 4/3·tan(θ/4)).
      */
    def wedge(cx: Double, cy: Double, r0: Double, r1: Double,
        a0: Double, a1: Double, c: (Double, Double, Double)): Page = {
      def pt(r: Double, a: Double) = (cx + r * math.cos(a), cy + r * math.sin(a))
      def arcs(r: Double, u0: Double, u1: Double): String = {
        val nSeg = math.max(1, math.ceil(math.abs(u1 - u0) / (math.Pi / 2)).toInt)
        (0 until nSeg).map { i =>
          val u = u0 + (u1 - u0) * i / nSeg
          val v = u0 + (u1 - u0) * (i + 1) / nSeg
          val k = 4.0 / 3.0 * math.tan((v - u) / 4)
          val (x0, y0) = pt(r, u); val (x3, y3) = pt(r, v)
          val (x1, y1) = (x0 - k * r * math.sin(u), y0 + k * r * math.cos(u))
          val (x2, y2) = (x3 + k * r * math.sin(v), y3 - k * r * math.cos(v))
          s"${n(x1)} ${n(y1)} ${n(x2)} ${n(y2)} ${n(x3)} ${n(y3)} c"
        }.mkString(" ")
      }
      val (sx, sy) = pt(r1, a0)
      val (ix, iy) = pt(r0, a1)
      raw(s"${n(c._1)} ${n(c._2)} ${n(c._3)} rg " +
        s"${n(sx)} ${n(sy)} m ${arcs(r1, a0, a1)} " +
        s"${n(ix)} ${n(iy)} l ${arcs(r0, a1, a0)} h f")
    }

    def build: String = sb.toString
  }

  // ------------------------------------------------------------ tables

  /** Reference truncation rule (reporte_pdf.py:97-110): keep the first
    * `maxRows` non-TOTAL rows, always preserving TOTAL rows at the end.
    */
  def truncatePreservingTotal(rows: Seq[Row], maxRows: Int): Seq[Row] = {
    def isTotal(r: Row) = r.get(0) != null &&
      r.get(0).toString.trim.toUpperCase == "TOTAL"
    val (totals, data) = rows.partition(isTotal)
    if (data.size > maxRows) data.take(maxRows) ++ totals else rows
  }

  /** Reference cell formatting (reporte_pdf.py:117-136): PCT columns
    * (or a VALOR ≤ 1) render as percentages, NUM_/DIAS_ as grouped
    * ints, other numerics as money, nulls empty.
    */
  def fmtCell(colName: String, v: Any): String = {
    val cu = colName.toUpperCase
    def num: Option[Double] = v match {
      case x: Double => Some(x); case x: Float => Some(x.toDouble)
      case x: Long => Some(x.toDouble); case x: Int => Some(x.toDouble)
      case x: java.math.BigDecimal => Some(x.doubleValue)
      case _ => None
    }
    if (v == null) ""
    else if (cu.contains("PCT") || (cu == "VALOR" && num.exists(_ <= 1.0)))
      num.map(d => "%.2f%%".formatLocal(Locale.US, d * 100)).getOrElse(v.toString)
    else if (cu.contains("NUM_") || cu.contains("DIAS_"))
      num.map(d => "%,d".formatLocal(Locale.US, d.toLong)).getOrElse(v.toString)
    else num.map(d => "$%,.2f".formatLocal(Locale.US, d)).getOrElse(v.toString)
  }

  /** Financial-style table (reporte_pdf.py:113-176): blue header band
    * with white bold text, zebra data rows, gray TOTAL rows, full grid.
    * Draws downward from `yTop`; returns the y below the table.
    */
  def table(p: Page, cols: Seq[String], rows: Seq[Row], yTop: Double,
      x: Double = Margin, width: Double = PageW - 2 * Margin): Double = {
    if (cols.isEmpty) return yTop
    val colW = width / cols.size
    val (headH, rowH, fs) = (20.0, 16.0, 8.0)
    val maxChars = math.max(3, (colW / 4.6).toInt)
    def clip(s: String) =
      if (s.length <= maxChars) s else s.take(maxChars - 2) + ".."
    // header
    p.fillRect(x, yTop - headH, width, headH, Azul)
    cols.zipWithIndex.foreach { case (c, i) =>
      p.text(x + i * colW + 3, yTop - headH + 6, fs, clip(c),
        bold = true, color = White)
    }
    var y = yTop - headH
    rows.zipWithIndex.foreach { case (r, ri) =>
      val isTotal = r.get(0) != null &&
        r.get(0).toString.trim.toUpperCase == "TOTAL"
      y -= rowH
      if (isTotal) p.fillRect(x, y, width, rowH, Gris)
      else if (ri % 2 == 1) p.fillRect(x, y, width, rowH, Fondo)
      cols.zipWithIndex.foreach { case (c, i) =>
        p.text(x + i * colW + 3, y + 4, fs, clip(fmtCell(c, r.get(i))),
          bold = isTotal, color = if (isTotal) White else Ink)
      }
    }
    // grid
    val nRows = rows.size
    p.strokeRect(x, y, width, yTop - y, GridLine)
    (1 until cols.size).foreach(i =>
      p.line(x + i * colW, y, x + i * colW, yTop, GridLine))
    (0 to nRows).foreach(ri =>
      p.line(x, yTop - headH - ri * rowH, x + width, yTop - headH - ri * rowH, GridLine))
    y - 10
  }

  /** Driver-side pull with a hard cap — sinks render report-sized
    * frames; a fact-sized frame reaching a sink is a caller bug we fail
    * fast on rather than OOM the driver.
    */
  def collectCapped(df: DataFrame, cap: Int = 2000): Seq[Row] = {
    val rows = df.take(cap + 1).toIndexedSeq
    require(rows.size <= cap,
      s"PdfSink: frame exceeds the $cap-row report cap — aggregate before sinking")
    rows
  }

  // ---------------------------------------------------------- assembly

  /** Assemble pages into a PDF 1.4 byte stream (byte-exact xref). */
  def assemble(pages: Seq[Page], title: String): Array[Byte] = {
    val objs = scala.collection.mutable.ArrayBuffer[String]()
    val nPages = pages.size
    val pageIds = (0 until nPages).map(5 + 2 * _)
    objs += s"<< /Type /Catalog /Pages 2 0 R >>"
    objs += s"<< /Type /Pages /Kids [ ${pageIds.map(_ + " 0 R").mkString(" ")} ] /Count $nPages >>"
    objs += "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"
    objs += "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold /Encoding /WinAnsiEncoding >>"
    pages.foreach { pg =>
      val s = pg.build
      val contentId = objs.size + 2
      objs += s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 ${n(PageW)} ${n(PageH)}] " +
        s"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> >> /Contents $contentId 0 R >>"
      objs += s"<< /Length ${s.length} >>\nstream\n$s\nendstream"
    }
    val sb = new StringBuilder
    sb.append("%PDF-1.4\n%âãÏÓ\n")
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    objs.zipWithIndex.foreach { case (body, i) =>
      offsets += sb.length
      sb.append(s"${i + 1} 0 obj\n$body\nendobj\n")
    }
    val xref = sb.length
    sb.append(s"xref\n0 ${objs.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append("%010d 00000 n \n".formatLocal(Locale.US, o)))
    sb.append(s"trailer\n<< /Size ${objs.size + 1} /Root 1 0 R " +
      s"/Info << /Title (${pdfStr(title)}) >> >>\nstartxref\n$xref\n%%EOF\n")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  def write(pages: Seq[Page], path: String, title: String): Unit = {
    val out = new java.io.FileOutputStream(path)
    try out.write(assemble(pages, title)) finally out.close()
  }
}
