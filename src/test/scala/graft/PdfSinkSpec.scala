package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.cxc.{CxcFixture, CxcPdf, CxcPipeline}
import graft.output.PdfSink

/** [[graft.output.PdfSink]] / [[graft.cxc.CxcPdf]] — SURVEY §2.1 S8.
  * Structural round-trip on the emitted bytes: a PDF with uncompressed
  * streams is plain text, so the spec re-parses what a viewer would —
  * the xref table must point byte-exactly at every object, the page
  * tree must count what the catalog claims, and the content streams
  * give back the rendered text (Tj operators) and vector chart ops for
  * direct assertion. The S9 path (same renderer over literal frames,
  * generar_reporte_cxc.py) is the synthetic-frame test.
  */
class PdfSinkSpec extends AnyFunSuite {

  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private lazy val pdfPath = {
    val dir = Files.createTempDirectory("graft_pdf").toString
    val views = CxcPipeline.run(spark, CxcFixture.generate(spark, 60))
    val path = s"$dir/dashboard_cxc.pdf"
    val nPages = CxcPdf.export(views, path, "2024-03-31 12:00")
    assert(nPages >= 10, s"expected a full dashboard, got $nPages pages")
    path
  }
  private lazy val bytes = Files.readAllBytes(Paths.get(pdfPath))
  private lazy val text = new String(bytes, StandardCharsets.ISO_8859_1)

  private def unescape(s: String): String =
    s.replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\")

  private lazy val rendered: Seq[String] =
    """\((.*?[^\\])\) Tj""".r.findAllMatchIn(text).map(m => unescape(m.group(1))).toSeq

  test("header, EOF and byte-exact xref offsets") {
    assert(text.startsWith("%PDF-1.4"), "missing PDF header")
    assert(text.trim.endsWith("%%EOF"), "missing EOF marker")
    val xrefOff = text.substring(text.lastIndexOf("startxref")).split("\n")(1).trim.toInt
    assert(text.startsWith("xref", xrefOff), "startxref does not point at the xref table")
    val entries = """(\d{10}) 00000 n""".r.findAllMatchIn(text).map(_.group(1).toInt).toSeq
    assert(entries.nonEmpty)
    entries.zipWithIndex.foreach { case (off, i) =>
      assert(text.startsWith(s"${i + 1} 0 obj", off),
        s"xref entry ${i + 1} points at ${text.slice(off, off + 12)}")
    }
  }

  test("page tree count matches the catalog and the export return value") {
    val count = """/Count (\d+)""".r.findFirstMatchIn(text).get.group(1).toInt
    val pageObjs = """/Type /Page[^s]""".r.findAllIn(text).size
    assert(count == pageObjs, s"/Count $count but $pageObjs page objects")
    assert("""/Kids \[([^\]]*)\]""".r.findFirstMatchIn(text).get.group(1)
      .split("R").count(_.trim.nonEmpty) == count)
  }

  test("cover, currency sections and financial formatting render as text") {
    assert(rendered.contains("DASHBOARD ESTRATEGICO"))
    assert(rendered.exists(_.contains("Cuentas por Cobrar")))
    assert(rendered.exists(_.contains("Dashboard de Cuentas por Cobrar")))
    assert(rendered.exists(_.startsWith("SECCI")), "USD transition page missing")
    assert(rendered.contains("TOTAL"), "TOTAL rows must render")
    assert(rendered.exists(s => s.startsWith("$") && s.contains(".")),
      "money-formatted cells missing")
    assert(rendered.exists(_.endsWith("%")), "percent-formatted cells missing")
    // WinAnsi accents survive (Antigüedad title)
    assert(rendered.exists(_.contains("Antigüedad")), "latin-1 text mangled")
  }

  test("vector charts are drawn: donut wedges, bars, pareto markers, dashed 80% rule") {
    assert(""" c\b""".r.findAllIn(text).size > 8, "bezier arcs (donut/dots) missing")
    assert(""" re f""".r.findAllIn(text).size > 20, "filled rects (bars/bands) missing")
    assert(text.contains("[3 3] 0 d"), "dashed 80% rule line missing")
  }

  test("truncation preserves TOTAL: 12 data rows render as 8 + TOTAL (the S9 literal path)") {
    val df = ((1 to 12).map(i => (s"C$i", i * 100.0, 0.05)) :+ ("TOTAL", 7800.0, 1.0))
      .toDF("NOMBRE_CLIENTE", "SALDO_PENDIENTE", "PCT_DEL_TOTAL")
    val p = new PdfSink.Page
    PdfSink.table(p, df.columns.toIndexedSeq,
      PdfSink.truncatePreservingTotal(df.collect().toIndexedSeq, 8), 500)
    val dir = Files.createTempDirectory("graft_pdf2").toString
    PdfSink.write(Seq(p), s"$dir/t.pdf", "t")
    val t = new String(Files.readAllBytes(Paths.get(s"$dir/t.pdf")),
      StandardCharsets.ISO_8859_1)
    val cells = """\((.*?[^\\])\) Tj""".r.findAllMatchIn(t).map(_.group(1)).toSeq
    assert((1 to 8).forall(i => cells.contains(s"C$i")), "first 8 data rows kept")
    assert(!cells.contains("C9") && !cells.contains("C12"), "rows beyond 8 dropped")
    assert(cells.contains("TOTAL"), "TOTAL row must survive truncation")
    assert(cells.contains("$7,800.00") && cells.contains("5.00%") &&
      cells.contains("100.00%"), "reference formatting rules")
  }

  test("pdfStr escape round-trips through the Tj extraction for hostile strings") {
    // the structural tests read text back with the same regex a parser
    // uses; this pins that WRITE(escape) → READ(unescape) is identity
    // for the characters that could break a PDF string literal
    val hostile = Seq(
      "a(b(c))d", ")" * 5, "\\", "\\\\(", "mix )( \\ end\\",
      "tabs\tand\nnewlines", "unicode ☃ snowman", "acentos áéíóúñü",
      "em—dash en–dash … ellipsis", "")
    hostile.foreach { in =>
      val p = new PdfSink.Page
      p.text(100, 100, 10, in)
      val dir = Files.createTempDirectory("graft_pdf3").toString
      PdfSink.write(Seq(p), s"$dir/e.pdf", "e")
      val t = new String(Files.readAllBytes(Paths.get(s"$dir/e.pdf")),
        StandardCharsets.ISO_8859_1)
      // the rendered regex can't read a literal ending in an escaped
      // backslash — walk the string like a real parser instead
      val start = t.indexOf(" Tm (") + 5
      val sb = new StringBuilder
      var i = start
      while (t(i) != ')' || (i > start && {
        // count the run of preceding backslashes: odd ⇒ this ')' is escaped
        var b = i - 1; var nb = 0
        while (b >= start && t(b) == '\\') { nb += 1; b -= 1 }
        nb % 2 == 1
      })) { sb.append(t(i)); i += 1 }
      val got = unescape(sb.toString)
      // expected = the documented sanitization of the input
      val expect = in.flatMap {
        case c if c == '(' || c == ')' || c == '\\' => c.toString
        case '\u2014' => "\u0097"; case '\u2013' => "\u0096"; case '\u2026' => "\u0085"
        case c if c.toInt < 32 => " "
        case c if c.toInt > 255 => "?"
        case c => c.toString
      }
      assert(got == expect || (in.isEmpty && got == ""),
        s"round-trip broke for ${in.take(20)}: got '$got' expect '$expect'")
    }
  }

  test("cell formatting mirrors reporte_pdf.py rules") {
    assert(PdfSink.fmtCell("PCT_DEL_TOTAL", 0.1234) == "12.34%")
    assert(PdfSink.fmtCell("VALOR", 0.5) == "50.00%")
    assert(PdfSink.fmtCell("VALOR", 42.5) == "$42.50")
    assert(PdfSink.fmtCell("NUM_FACTURAS", 12345L) == "12,345")
    assert(PdfSink.fmtCell("DIAS_MORA", 90) == "90")
    assert(PdfSink.fmtCell("SALDO_TOTAL", 1234.5) == "$1,234.50")
    assert(PdfSink.fmtCell("SALDO_TOTAL", null) == "")
    assert(PdfSink.fmtCell("NOMBRE_CLIENTE", "ACME (MX) S.A.") == "ACME (MX) S.A.")
    assert(PdfSink.pdfStr("a(b)c\\d") == "a\\(b\\)c\\\\d")
  }
}
