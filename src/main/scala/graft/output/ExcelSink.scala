package graft.output

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.NumericType

/** Minimal xlsx workbook sink (SURVEY §2.1 S7; VERDICT r1 item 9):
  * sheet-per-view, bold header row, #,##0.00 number format on numeric
  * cells — the engine-scoped slice of the reference's styled workbook
  * output (/root/reference/main.py:367-416; full styling stays
  * presentation, out of engine scope per SURVEY §2.1).
  *
  * Hand-rolled OOXML (zip + XML via the JDK): the build is offline with
  * a pinned dependency set, so no POI/spark-excel. Strings are written
  * inline (no sharedStrings table) — simpler, and fine at report size.
  *
  * DRIVER-SIDE by design: each view is collected. This is a
  * presentation sink for report-sized views (the reference writes ~32k
  * rows per workbook); `maxRows` guards against accidentally collecting
  * a fact table. Large-scale data belongs in the parquet/csv sinks.
  */
object ExcelSink {

  def write(views: Seq[(String, DataFrame)], path: String,
      maxRows: Int = 200000): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    var ok = false
    try { writeEntries(zos, views, maxRows); ok = true }
    finally {
      zos.close()
      // never leave a truncated, unreadable workbook behind
      if (!ok) new java.io.File(path).delete()
    }
  }

  private def writeEntries(zos: ZipOutputStream,
      views: Seq[(String, DataFrame)], maxRows: Int): Unit = {
    def entry(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes("UTF-8"))
      zos.closeEntry()
    }
    val n = views.size
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
      (1 to n).map(i =>
        s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
        .mkString + "</Types>")
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      "</Relationships>")
    val names = dedupeNames(views.map { case (name, _) => sheetName(name) })
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
      names.zipWithIndex.map { case (name, i) =>
        s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString + "</sheets></workbook>")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      (1 to n).map(i =>
        s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
        .mkString +
      s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
      "</Relationships>")
    // s=1: bold header; s=2: #,##0.00 numbers (fills>=2 is an Excel quirk)
    entry("xl/styles.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      """<numFmts count="1"><numFmt numFmtId="164" formatCode="#,##0.00"/></numFmts>""" +
      """<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font>""" +
      """<font><b/><sz val="11"/><name val="Calibri"/></font></fonts>""" +
      """<fills count="2"><fill><patternFill patternType="none"/></fill>""" +
      """<fill><patternFill patternType="gray125"/></fill></fills>""" +
      """<borders count="1"><border/></borders>""" +
      """<cellStyleXfs count="1"><xf/></cellStyleXfs>""" +
      """<cellXfs count="3"><xf numFmtId="0" fontId="0"/>""" +
      """<xf numFmtId="0" fontId="1" applyFont="1"/>""" +
      """<xf numFmtId="164" fontId="0" applyNumberFormat="1"/></cellXfs>""" +
      "</styleSheet>")
    views.zipWithIndex.foreach { case ((_, df), i) =>
      entry(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(df, maxRows))
    }
  }

  def write(views: Map[String, DataFrame], path: String): Unit =
    write(views.toSeq.sortBy(_._1), path)

  private def sheetXml(df: DataFrame, maxRows: Int): String = {
    val numeric = df.schema.fields.map(_.dataType.isInstanceOf[NumericType])
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"ExcelSink is a report-sized presentation sink (> $maxRows rows); use the parquet/csv sinks")
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    sb ++= "<row r=\"1\">"
    df.columns.zipWithIndex.foreach { case (c, j) =>
      sb ++= s"""<c r="${ref(j, 1)}" s="1" t="inlineStr"><is><t>${esc(c)}</t></is></c>"""
    }
    sb ++= "</row>"
    rows.zipWithIndex.foreach { case (row, ri) =>
      val r = ri + 2
      sb ++= s"""<row r="$r">"""
      var j = 0
      while (j < numeric.length) {
        if (!row.isNullAt(j)) {
          // NaN/Infinity are not valid <v> numbers — fall through to inline string
          val finite = numeric(j) && (row.get(j) match {
            case d: java.lang.Double => !d.isNaN && !d.isInfinite
            case f: java.lang.Float  => !f.isNaN && !f.isInfinite
            case _                   => true
          })
          if (finite)
            sb ++= s"""<c r="${ref(j, r)}" s="2"><v>${row.get(j)}</v></c>"""
          else
            sb ++= s"""<c r="${ref(j, r)}" t="inlineStr"><is><t>${esc(String.valueOf(row.get(j)))}</t></is></c>"""
        }
        j += 1
      }
      sb ++= "</row>"
    }
    sb ++= "</sheetData></worksheet>"
    sb.toString
  }

  /** Excel sheet-name rules: ≤31 chars, no []:*?/\ characters. */
  private def sheetName(name: String): String =
    name.replaceAll("[\\[\\]:*?/\\\\]", "_").take(31)

  /** Sanitization/truncation can collide two distinct view names; Excel
    * refuses workbooks with duplicate sheet names, so disambiguate with a
    * _2, _3… suffix (re-truncating so the result stays ≤31 chars).
    */
  private def dedupeNames(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Set[String]()
    names.map { base =>
      var candidate = base
      var k = 2
      while (!seen.add(candidate.toLowerCase)) { // Excel names are case-insensitive
        val suffix = s"_$k"
        candidate = base.take(31 - suffix.length) + suffix
        k += 1
      }
      candidate
    }
  }

  private def ref(colIdx: Int, row: Int): String = {
    var c = colIdx
    val sb = new StringBuilder
    while (c >= 0) { sb.insert(0, ('A' + c % 26).toChar); c = c / 26 - 1 }
    sb.append(row).toString
  }

  private def esc(s: String): String = {
    val basic = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")
    // ECMA-376: a LITERAL _xHHHH_ sequence in the data must itself be
    // escaped (underscore → _x005F_) or readers will decode it
    val guarded =
      if (basic.contains("_x"))
        basic.replaceAll("_(?=[xX][0-9A-Fa-f]{4}_)", "_x005F_")
      else basic
    // Control chars (except tab/LF/CR) are invalid even entity-escaped in
    // XML 1.0; encode them with the OOXML _xHHHH_ convention.
    if (guarded.forall(c => c >= 0x20 || c == '\t' || c == '\n' || c == '\r')) guarded
    else guarded.flatMap { c =>
      if (c >= 0x20 || c == '\t' || c == '\n' || c == '\r') c.toString
      else f"_x${c.toInt}%04X_"
    }
  }
}
