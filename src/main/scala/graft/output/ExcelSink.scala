package graft.output

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.NumericType

/** Xlsx workbook sink (SURVEY §2.1 S7): sheet-per-view with the
  * reference's semantic styling re-expressed over hand-rolled OOXML
  * (/root/reference/main.py:99-127,205-359 — header fills, per-column
  * semantic fills for charge/payment/balance/overdue money columns,
  * alternating row bands, ABC-classification and zero-balance row
  * overrides, TOTAL-row emphasis, and the money/integer/percent number
  * formats keyed by the same column-name sets).
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

  // ------------------------------------------------------------ semantics
  // Column-name sets mirrored from the reference's style constants
  // (main.py:68-101); names are matched uppercase.
  private val MoneyCols = Set(
    "CARGOS", "ABONOS", "IMPORTE", "IMPUESTO",
    "SALDO_FACTURA", "SALDO_CLIENTE",
    "IMPORTE_TOTAL", "IMPORTE_PROMEDIO", "IMPORTE_MAX",
    "TOTAL_CARGOS", "TOTAL_ABONOS", "SALDO",
    "MONTO_CARGO", "MONTO_ABONOS", "DISPONIBLE",
    "SALDO_TOTAL", "SALDO_VIGENTE", "SALDO_VENCIDO",
    "LIMITE_CREDITO", "SALDO_PENDIENTE", "FACTURAS_PAGADAS",
    "FACTURAS_VIGENTES", "IMPUESTO_TOTAL", "MONTO_TOTAL",
    "IMPORTE_AJUSTE", "VENDIDO", "PAGADO",
    "TOTAL_CARGOS_CANCELADOS", "TOTAL_ABONOS_CANCELADOS")
  private val MoneyPrefixes = Seq("FACTURAS_VENCIDAS", "VIGENTE:", "VENCIDO:")
  private val IntCols = Set(
    "NUM_DOCUMENTOS", "NUM_REGISTROS", "NUM_CARGOS", "NUM_ABONOS",
    "NUM_FACTURAS", "NUM_VENCIDAS", "DIAS_VENCIDO_MAX",
    "NUM_FACTURAS_PENDIENTES", "NUM_FACTURAS_TOTALES",
    "NUM_FACTURAS_VIGENTES", "NUM_FACTURAS_VENCIDAS")
  private val PctCols = Set(
    "PCT_DEL_TOTAL", "UTILIZACION_PCT", "PCT_ACUMULADO", "PCT_VENCIDO", "VALOR")
  private val FillAzulCols = Set("TOTAL_CARGOS", "TOTAL_CARGOS_CANCELADOS", "LIMITE_CREDITO")
  private val FillVerdeCols = Set(
    "TOTAL_ABONOS", "TOTAL_ABONOS_CANCELADOS", "SALDO_VIGENTE", "DISPONIBLE",
    "FACTURAS_PAGADAS")
  private val FillAmarilloCols = Set("SALDO_PENDIENTE", "SALDO_TOTAL", "SALDO", "IMPORTE_AJUSTE")
  private val FillRojoCols = Set("SALDO_VENCIDO", "DIAS_VENCIDO_MAX", "PCT_VENCIDO")
  private val ZeroBalanceCols = Seq("SALDO_PENDIENTE", "SALDO_TOTAL", "SALDO", "IMPORTE_AJUSTE")

  // font ids (styles.xml order)
  private val FontNormal = 0
  private val FontHeader = 1 // bold white
  private val FontMuted = 2  // gray, zero-balance rows
  private val FontTotal = 3  // bold, TOTAL row
  // fill ids
  private val FillNone = 0
  // fill 1 is the gray125 pattern Excel requires at index 1
  private val FillHeader = 2     // 4472C4
  private val FillCalcHeader = 3 // 548235
  private val FillBand = 4       // F2F2F2
  private val FillAzul = 5       // D9E1F2
  private val FillVerde = 6      // E2EFDA
  private val FillAmarillo = 7   // FFF2CC
  private val FillRojo = 8       // FCE4D6
  private val FillZero = 9       // D9D9D9
  private val FillTotal = 10     // A6A6A6
  // number format ids
  private val FmtGeneral = 0
  private val FmtMoney = 164 // #,##0.00
  private val FmtInt = 165   // #,##0
  private val FmtPct = 166   // 0.00%

  private val fonts = 4
  private val fills = 11
  private val fmts = Seq(FmtGeneral, FmtMoney, FmtInt, FmtPct)

  /** Deterministic xf index for (font, fill, fmt): the full cross
    * product is emitted in styles.xml, so every combination the row
    * styler can produce exists. Index 0 is (normal, none, general) —
    * the OOXML default — by construction.
    */
  private def xf(fontId: Int, fillId: Int, fmtId: Int): Int = {
    val fi = fmts.indexOf(fmtId)
    (fontId * fills + fillId) * fmts.length + fi
  }

  def write(views: Seq[(String, DataFrame)], path: String,
      maxRows: Int = 200000, calcCols: Set[String] = Set.empty): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    var ok = false
    try { writeEntries(zos, views, maxRows, calcCols); ok = true }
    finally {
      zos.close()
      // never leave a truncated, unreadable workbook behind
      if (!ok) new java.io.File(path).delete()
    }
  }

  private def writeEntries(zos: ZipOutputStream,
      views: Seq[(String, DataFrame)], maxRows: Int,
      calcCols: Set[String]): Unit = {
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
    entry("xl/styles.xml", stylesXml)
    views.zipWithIndex.foreach { case ((_, df), i) =>
      entry(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(df, maxRows, calcCols))
    }
  }

  def write(views: Map[String, DataFrame], path: String): Unit =
    write(views.toSeq.sortBy(_._1), path)

  private def stylesXml: String = {
    def solid(rgb: String) =
      s"""<fill><patternFill patternType="solid"><fgColor rgb="FF$rgb"/><bgColor indexed="64"/></patternFill></fill>"""
    val fillXml = Seq(
      """<fill><patternFill patternType="none"/></fill>""",
      """<fill><patternFill patternType="gray125"/></fill>""",
      solid("4472C4"), solid("548235"), solid("F2F2F2"), solid("D9E1F2"),
      solid("E2EFDA"), solid("FFF2CC"), solid("FCE4D6"), solid("D9D9D9"),
      solid("A6A6A6"))
    val fontXml = Seq(
      """<font><sz val="11"/><name val="Calibri"/></font>""",
      """<font><b/><sz val="11"/><color rgb="FFFFFFFF"/><name val="Calibri"/></font>""",
      """<font><sz val="11"/><color rgb="FF808080"/><name val="Calibri"/></font>""",
      """<font><b/><sz val="11"/><name val="Calibri"/></font>""")
    val xfs = for {
      fontId <- 0 until fonts
      fillId <- 0 until fills
      fmtId <- fmts
    } yield {
      val attrs = new StringBuilder(s"""numFmtId="$fmtId" fontId="$fontId" fillId="$fillId"""")
      if (fmtId != 0) attrs ++= """ applyNumberFormat="1""""
      if (fontId != 0) attrs ++= """ applyFont="1""""
      if (fillId != 0) attrs ++= """ applyFill="1""""
      s"<xf $attrs/>"
    }
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      s"""<numFmts count="3"><numFmt numFmtId="$FmtMoney" formatCode="#,##0.00"/>""" +
      s"""<numFmt numFmtId="$FmtInt" formatCode="#,##0"/>""" +
      s"""<numFmt numFmtId="$FmtPct" formatCode="0.00%"/></numFmts>""" +
      s"""<fonts count="$fonts">${fontXml.mkString}</fonts>""" +
      s"""<fills count="$fills">${fillXml.mkString}</fills>""" +
      """<borders count="1"><border/></borders>""" +
      """<cellStyleXfs count="1"><xf/></cellStyleXfs>""" +
      s"""<cellXfs count="${xfs.length}">${xfs.mkString}</cellXfs>""" +
      "</styleSheet>"
  }

  private def sheetXml(df: DataFrame, maxRows: Int,
      calcCols: Set[String]): String = {
    val cols = df.columns
    val upper = cols.map(_.toUpperCase)
    val numeric = df.schema.fields.map(_.dataType.isInstanceOf[NumericType])
    // per-column number format (reference main.py:222-247); money wins
    // over the generic numeric default, explicit sets over everything
    val colFmt = upper.zipWithIndex.map { case (u, j) =>
      if (MoneyCols.contains(u) || MoneyPrefixes.exists(u.startsWith)) FmtMoney
      else if (IntCols.contains(u)) FmtInt
      else if (PctCols.contains(u)) FmtPct
      else if (numeric(j)) FmtMoney // pre-styling default, kept
      else FmtGeneral
    }
    // per-column semantic fill (main.py:284-296); None = banded
    val colFill: Array[Option[Int]] = upper.map { u =>
      if (FillAzulCols.contains(u)) Some(FillAzul)
      else if (FillVerdeCols.contains(u)) Some(FillVerde)
      else if (FillAmarilloCols.contains(u)) Some(FillAmarillo)
      else if (FillRojoCols.contains(u)) Some(FillRojo)
      else None
    }
    val clasifIdx = upper.indexOf("CLASIFICACION")
    val unidadIdx = upper.indexOf("UNIDAD")
    val valorIdx = upper.indexOf("VALOR")
    val zeroIdxs = ZeroBalanceCols.map(c => upper.indexOf(c)).filter(_ >= 0)
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"ExcelSink is a report-sized presentation sink (> $maxRows rows); use the parquet/csv sinks")
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    sb ++= "<row r=\"1\">"
    cols.zipWithIndex.foreach { case (c, j) =>
      val fill = if (calcCols.exists(_.equalsIgnoreCase(c))) FillCalcHeader else FillHeader
      sb ++= s"""<c r="${ref(j, 1)}" s="${xf(FontHeader, fill, FmtGeneral)}" t="inlineStr"><is><t>${esc(c)}</t></is></c>"""
    }
    sb ++= "</row>"
    rows.zipWithIndex.foreach { case (row, ri) =>
      val r = ri + 2
      // row-level state (main.py:266-280): TOTAL row, zero balance, ABC
      val isTotal = !row.isNullAt(0) &&
        String.valueOf(row.get(0)).trim.equalsIgnoreCase("TOTAL")
      val isZero = zeroIdxs.exists { j =>
        !row.isNullAt(j) && (row.get(j) match {
          case x: java.lang.Number => x.doubleValue() == 0.0
          case _ => false
        })
      }
      val clasif =
        if (clasifIdx >= 0 && !row.isNullAt(clasifIdx))
          String.valueOf(row.get(clasifIdx))
        else ""
      sb ++= s"""<row r="$r">"""
      var j = 0
      while (j < numeric.length) {
        if (!row.isNullAt(j)) {
          // style resolution, in the reference's override order:
          // column fill (or band) < ABC class < zero-muted < TOTAL
          var fill = colFill(j).getOrElse(if (r % 2 == 0) FillBand else FillNone)
          var font = FontNormal
          if (clasif == "A") fill = FillVerde
          else if (clasif == "B") fill = FillAmarillo
          else if (clasif == "C") fill = FillRojo
          if (isZero) { fill = FillZero; font = FontMuted }
          if (isTotal) { fill = FillTotal; font = FontTotal }
          // VALOR is percent only when the row's UNIDAD is "%"; other
          // units stay unformatted (the KPI sheet mixes units in one
          // column — main.py:239-246)
          val fmt =
            if (j == valorIdx && unidadIdx >= 0 &&
                (row.isNullAt(unidadIdx) ||
                  String.valueOf(row.get(unidadIdx)).trim != "%")) FmtGeneral
            else colFmt(j)
          // NaN/Infinity are not valid <v> numbers — fall through to inline string
          val finite = numeric(j) && (row.get(j) match {
            case d: java.lang.Double => !d.isNaN && !d.isInfinite
            case f: java.lang.Float  => !f.isNaN && !f.isInfinite
            case _                   => true
          })
          if (finite && numeric(j))
            sb ++= s"""<c r="${ref(j, r)}" s="${xf(font, fill, fmt)}"><v>${row.get(j)}</v></c>"""
          else
            sb ++= s"""<c r="${ref(j, r)}" s="${xf(font, fill, FmtGeneral)}" t="inlineStr"><is><t>${esc(String.valueOf(row.get(j)))}</t></is></c>"""
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
