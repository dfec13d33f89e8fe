package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.cxc._

/** The Spark SQL surface (SURVEY §2.1 S2/S3 + §1.4 dict-of-views
  * mapping): every pipeline view is addressable from spark.sql, and the
  * file-based SQL entry point works end-to-end. Plus sink round-trips
  * (S7) with partition pruning.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  import SparkSpecBase.{spark, sf}

  test("pipeline views are queryable from spark.sql") {
    val views = CxcPipeline.run(spark, CxcFixture.generate(spark, 40))
    CxcPipeline.registerViews(views)
    val r = spark.sql(
      """SELECT NOMBRE_CLIENTE, count(*) AS n, round(sum(_MONTO), 2) AS total
        |FROM movimientos_totales
        |WHERE TIPO_IMPTE = 'C'
        |GROUP BY NOMBRE_CLIENTE
        |ORDER BY total DESC""".stripMargin)
    assert(r.count() > 0)
    val aging = spark.sql("SELECT * FROM antiguedad_cartera_mxn WHERE CATEGORIA_MORA = 'TOTAL'")
    assert(aging.count() == 1)
  }

  test("SQL-file entry point (S3): run a .sql file against registered views") {
    val views = CxcPipeline.run(spark, CxcFixture.generate(spark, 40))
    CxcPipeline.registerViews(views)
    val f = java.nio.file.Files.createTempFile("graft", ".sql")
    java.nio.file.Files.writeString(f,
      "SELECT KPI, VALOR FROM kpis_resumen_mxn WHERE KPI = 'DSO'")
    val sql = java.nio.file.Files.readString(f)
    assert(spark.sql(sql).columns.toSeq == Seq("KPI", "VALOR"))
  }

  test("parquet sink round-trip with partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val src = Tables.orders(spark, sf)
    output.Sinks.parquet(src, s"$dir/orders", partitionBy = Seq("o_orderstatus"))
    val back = spark.read.parquet(s"$dir/orders")
    assert(back.count() == src.count())
    // partition pruning: the filtered scan must read only the F partition
    val plan = back.filter(col("o_orderstatus") === "F")
      .queryExecution.executedPlan.toString
    assert(plan.contains("o_orderstatus=F") || plan.contains("PartitionFilters"))
    val fCount = back.filter(col("o_orderstatus") === "F").count()
    assert(fCount == src.filter(col("o_orderstatus") === "F").count())
  }

  test("csv sink round-trip preserves report shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val report = queries.CoreQueries.q06(spark, sf)
    output.Sinks.csv(report, s"$dir/aging")
    val back = spark.read.option("header", "true").csv(s"$dir/aging")
    assert(back.count() == report.count())
    assert(back.columns.toSeq == report.columns.toSeq)
  }

  test("csv/jsonl source variants: same rows and query results as the parquet table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val parquetOrders = Tables.orders(spark, sf)
    parquetOrders.write.option("header", "true").csv(s"$dir/orders_csv")
    parquetOrders.write.json(s"$dir/orders_json")
    val schema = parquetOrders.schema
    val fromCsv = Tables.csv(spark, s"$dir/orders_csv", schema)
    val fromJson = Tables.jsonl(spark, s"$dir/orders_json", schema)
    assert(fromCsv.count() == parquetOrders.count())
    assert(fromJson.count() == parquetOrders.count())
    // the same aggregation over all three sources agrees
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_orderstatus").agg(count(lit(1)).as("n"),
        sum("o_totalprice").as("s")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), math.round(r.getDouble(2) * 100)))
        .toMap
    val base = agg(parquetOrders)
    assert(agg(fromCsv) == base, "csv-sourced aggregation diverges")
    assert(agg(fromJson) == base, "jsonl-sourced aggregation diverges")
  }

  test("training shards: deterministic key-hash assignment, multiset-preserving") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    output.Sinks.trainingShards(docs, s"$dir/a", numShards = 8, key = "doc_id")
    val back = spark.read.parquet(s"$dir/a")
    assert(back.count() == docs.count())
    assert(back.select("_shard").distinct().count() == 8)
    // no row lost or duplicated
    assert(back.drop("_shard").exceptAll(docs).count() == 0)
    assert(docs.exceptAll(back.drop("_shard")).count() == 0)
    // shard assignment is a pure function of the key: a second write from
    // a differently-partitioned upstream yields identical shard contents
    output.Sinks.trainingShards(docs.repartition(13), s"$dir/b",
      numShards = 8, key = "doc_id")
    val b = spark.read.parquet(s"$dir/b")
    assert(back.exceptAll(b).count() == 0 && b.exceptAll(back).count() == 0,
      "shard membership changed across upstream partitionings")
  }

  test("hash sampling: deterministic, partitioning-independent, near the target fraction") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, sf)
    val s1 = Sampling.hashSample(docs, col("doc_id"), 0.2)
    val s2 = Sampling.hashSample(docs.repartition(17), col("doc_id"), 0.2)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0,
      "hash sample must not depend on partitioning")
    val frac = s1.count().toDouble / docs.count()
    assert(frac > 0.1 && frac < 0.3, s"sampled fraction $frac far from 0.2")
    // stratified: listed stratum denser than the default
    val strat = Sampling.stratifiedHashSample(docs, col("lang"), col("doc_id"),
      Map("en" -> 0.5), defaultFraction = 0.05)
    val en = strat.filter(col("lang") === "en").count().toDouble /
      docs.filter(col("lang") === "en").count()
    val rest = strat.filter(col("lang") =!= "en").count().toDouble /
      docs.filter(col("lang") =!= "en").count()
    assert(en > rest, s"stratified fractions not ordered: en=$en rest=$rest")
  }

  test("dataset mixture: weighted epochs, deterministic, auditable by _source/_epoch") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    val en = docs.filter(col("lang") === "en")
    val rest = docs.filter(col("lang") =!= "en")
    val mixed = Sampling.mixture(
      Seq(("en", en, 2.5), ("rest", rest, 0.4)), key = "doc_id").cache()
    val nEn = en.count(); val nRest = rest.count()
    // en appears in epochs 0,1 fully + a ~50% epoch 2; rest one ~40% epoch
    assert(mixed.filter(col("_source") === "en" && col("_epoch") < 2).count() == 2 * nEn)
    val part = mixed.filter(col("_source") === "en" && col("_epoch") === 2).count().toDouble / nEn
    assert(part > 0.3 && part < 0.7, s"fractional epoch kept $part, wanted ~0.5")
    val restFrac = mixed.filter(col("_source") === "rest").count().toDouble / nRest
    assert(restFrac > 0.2 && restFrac < 0.6, s"rest fraction $restFrac, wanted ~0.4")
    // pure function of (key, epoch): identical under different upstream partitioning
    val again = Sampling.mixture(
      Seq(("en", en.repartition(7), 2.5), ("rest", rest.repartition(3), 0.4)),
      key = "doc_id")
    assert(mixed.exceptAll(again).count() == 0 && again.exceptAll(mixed).count() == 0)
    mixed.unpersist()
  }

  test("xlsx sink styling: semantic fills, bands, ABC/zero/TOTAL row overrides") {
    import SparkSpecBase.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_style").toString
    val path = s"$dir/styled.xlsx"
    // fixture exercising every override class: semantic money columns,
    // an ABC classification column, a zero-balance muted row, a TOTAL
    // row, and a plain banded text column
    val df = Seq(
      ("cliente_a", 100.0, 40.0, 60.0, "A", 3L),
      ("cliente_b", 200.0, 200.0, 0.0, "B", 1L),   // zero balance → muted
      ("cliente_c", 50.0, 10.0, 40.0, "C", 2L),
      ("TOTAL", 350.0, 250.0, 100.0, "", 6L))
      .toDF("CLIENTE", "TOTAL_CARGOS", "TOTAL_ABONOS", "SALDO_PENDIENTE",
        "CLASIFICACION", "NUM_FACTURAS")
    output.ExcelSink.write(Seq("resumen" -> df), path, calcCols = Set("SALDO_PENDIENTE"))
    val zf = new java.util.zip.ZipFile(path)
    def parse(entry: String) =
      javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
        .parse(zf.getInputStream(zf.getEntry(entry)))
    // styles.xml declares the reference palette and the format set
    val stylesRaw = new String(
      zf.getInputStream(zf.getEntry("xl/styles.xml")).readAllBytes, "UTF-8")
    for (rgb <- Seq("4472C4", "548235", "F2F2F2", "D9E1F2", "E2EFDA",
        "FFF2CC", "FCE4D6", "D9D9D9", "A6A6A6"))
      assert(stylesRaw.contains(s"FF$rgb"), s"palette fill $rgb missing")
    assert(stylesRaw.contains("#,##0.00") && stylesRaw.contains("""formatCode="#,##0""""))
    val styles = parse("xl/styles.xml")
    val xfNodes = styles.getElementsByTagName("cellXfs").item(0)
      .asInstanceOf[org.w3c.dom.Element].getElementsByTagName("xf")
    def xfAttr(id: Int, a: String): String = {
      val at = xfNodes.item(id).getAttributes.getNamedItem(a)
      if (at == null) "0" else at.getNodeValue
    }
    // sheet cells: collect (ref -> styleId)
    val sheet = parse("xl/worksheets/sheet1.xml")
    val cells = sheet.getElementsByTagName("c")
    val styleOf = (0 until cells.getLength).map { i =>
      val at = cells.item(i).getAttributes
      val s = at.getNamedItem("s")
      at.getNamedItem("r").getNodeValue -> (if (s == null) 0 else s.getNodeValue.toInt)
    }.toMap
    val fillNodes = styles.getElementsByTagName("fills").item(0)
      .asInstanceOf[org.w3c.dom.Element].getElementsByTagName("fill")
    def fillRgb(fillId: Int): String = {
      val fg = fillNodes.item(fillId).asInstanceOf[org.w3c.dom.Element]
        .getElementsByTagName("fgColor")
      if (fg.getLength == 0) "" else
        fg.item(0).getAttributes.getNamedItem("rgb").getNodeValue
    }
    def cellFill(r: String) = fillRgb(xfAttr(styleOf(r), "fillId").toInt)
    def cellFont(r: String) = xfAttr(styleOf(r), "fontId").toInt
    // headers: header fill, calc column gets the calc fill, bold font
    assert(cellFill("A1") == "FF4472C4" && cellFill("D1") == "FF548235")
    // row 2 (clasif A): whole row green — override beats the column fills
    assert(cellFill("B2") == "FFE2EFDA" && cellFill("A2") == "FFE2EFDA")
    // row 3: zero balance mutes the row (gray fill + muted font)
    assert(cellFill("D3") == "FFD9D9D9" && cellFont("D3") == 2)
    // row 4 (clasif C): red
    assert(cellFill("C4") == "FFFCE4D6")
    // row 5: TOTAL overrides everything (gray + bold)
    assert(cellFill("A5") == "FFA6A6A6" && cellFont("A5") == 3)
    // number formats: money on TOTAL_CARGOS, #,##0 on NUM_FACTURAS
    val fmtOfB2 = xfAttr(styleOf("B2"), "numFmtId")
    val fmtOfF2 = xfAttr(styleOf("F2"), "numFmtId")
    assert(fmtOfB2 == "164" && fmtOfF2 == "165",
      s"expected money/int formats, got $fmtOfB2/$fmtOfF2")
    zf.close()
  }

  test("xlsx sink styling: plain columns band on alternating rows") {
    import SparkSpecBase.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_band").toString
    val path = s"$dir/banded.xlsx"
    val df = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("name", "v")
    output.ExcelSink.write(Seq("t" -> df), path)
    val zf = new java.util.zip.ZipFile(path)
    val styles = new String(
      zf.getInputStream(zf.getEntry("xl/styles.xml")).readAllBytes, "UTF-8")
    val sheet = new String(
      zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes, "UTF-8")
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")))
    val cells = doc.getElementsByTagName("c")
    val styleOf = (0 until cells.getLength).map { i =>
      val at = cells.item(i).getAttributes
      at.getNamedItem("r").getNodeValue -> at.getNamedItem("s").getNodeValue.toInt
    }.toMap
    val stylesDoc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().parse(zf.getInputStream(zf.getEntry("xl/styles.xml")))
    val xfNodes = stylesDoc.getElementsByTagName("cellXfs").item(0)
      .asInstanceOf[org.w3c.dom.Element].getElementsByTagName("xf")
    def fillIdOf(r: String): String = {
      val at = xfNodes.item(styleOf(r)).getAttributes.getNamedItem("fillId")
      if (at == null) "0" else at.getNodeValue
    }
    // even sheet rows banded (fill 4 = F2F2F2), odd rows unfilled
    assert(fillIdOf("A2") == "4" && fillIdOf("A4") == "4")
    assert(fillIdOf("A3") == "0")
    assert(styles.contains("FFF2F2F2"))
    zf.close()
  }

  test("xlsx sink escapes XML metacharacters and illegal sheet names") {
    import SparkSpecBase.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_esc").toString
    val path = s"$dir/esc.xlsx"
    val df = Seq(("a<b>&\"c'", 1.5), ("plain", 2.0)).toDF("label & <tag>", "v")
    output.ExcelSink.write(Seq("bad:name/with*chars[x]" -> df), path)
    val zf = new java.util.zip.ZipFile(path)
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")))
    val ts = doc.getElementsByTagName("t")
    val texts = (0 until ts.getLength).map(i => ts.item(i).getTextContent)
    // DOM parse succeeding proves well-formedness; values round-trip
    assert(texts.contains("label & <tag>") && texts.contains("a<b>&\"c'"))
    val wb = javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(zf.getInputStream(zf.getEntry("xl/workbook.xml")))
    val name = wb.getElementsByTagName("sheet").item(0)
      .getAttributes.getNamedItem("name").getNodeValue
    assert(!name.exists("[]:*?/\\".contains(_)), s"illegal sheet name: $name")
    zf.close()
  }

  test("xlsx sink: control chars encoded, NaN/Inf as strings, colliding sheet names deduped") {
    import SparkSpecBase.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_edge").toString
    val path = s"$dir/edge.xlsx"
    val df = Seq(
      ("ctl\u0001chr\u001Fx", Double.NaN),
      ("tab\tok", Double.PositiveInfinity),
      ("plain", 2.5)).toDF("s", "v")
    // two view names that collide after sanitization+truncation
    val longA = "view:" + "x" * 30
    val longB = "view*" + "x" * 30
    output.ExcelSink.write(Seq(longA -> df, longB -> df), path)
    val zf = new java.util.zip.ZipFile(path)
    def parse(entry: String) =
      javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
        .parse(zf.getInputStream(zf.getEntry(entry)))
    // DOM parse succeeding proves XML 1.0 well-formedness despite U+0001
    val s1 = parse("xl/worksheets/sheet1.xml")
    val texts = {
      val ts = s1.getElementsByTagName("t")
      (0 until ts.getLength).map(i => ts.item(i).getTextContent)
    }
    assert(texts.contains("ctl_x0001_chr_x001F_x"), s"control chars not encoded: $texts")
    assert(texts.contains("tab\tok"), "tab must survive unencoded")
    // NaN/Infinity became inline strings, not <v> numbers
    val vs = {
      val nl = s1.getElementsByTagName("v")
      (0 until nl.getLength).map(i => nl.item(i).getTextContent)
    }
    assert(!vs.exists(v => v == "NaN" || v.contains("Infinity")),
      s"invalid numeric cells: $vs")
    assert(texts.contains("NaN") && texts.contains("Infinity"))
    // sheet names distinct and <= 31 chars
    val wb = parse("xl/workbook.xml")
    val sheetNames = {
      val nl = wb.getElementsByTagName("sheet")
      (0 until nl.getLength).map(i =>
        nl.item(i).getAttributes.getNamedItem("name").getNodeValue)
    }
    assert(sheetNames.distinct.size == 2, s"duplicate sheets: $sheetNames")
    assert(sheetNames.forall(_.length <= 31))
    zf.close()
  }

  test("xlsx sink (S7): workbook round-trips sheets, headers and numeric cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx").toString
    val path = s"$dir/reporte.xlsx"
    val aging = queries.CoreQueries.q06(spark, sf)
    val topk = queries.CoreQueries.q10(spark, sf)
    output.ExcelSink.write(Seq("aging_report" -> aging, "top_clients" -> topk), path)

    // read back with the JDK: unzip + DOM-parse (no test-only deps)
    val zf = new java.util.zip.ZipFile(path)
    import scala.jdk.CollectionConverters._
    val names = zf.entries().asScala.map(_.getName).toSet
    assert(names.contains("xl/workbook.xml") && names.contains("xl/styles.xml")
      && names.contains("xl/worksheets/sheet1.xml")
      && names.contains("xl/worksheets/sheet2.xml"))
    def parse(entry: String) =
      javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
        .parse(zf.getInputStream(zf.getEntry(entry)))
    val wb = parse("xl/workbook.xml")
    val sheetNames = {
      val nl = wb.getElementsByTagName("sheet")
      (0 until nl.getLength).map(i =>
        nl.item(i).getAttributes.getNamedItem("name").getNodeValue)
    }
    assert(sheetNames == Seq("aging_report", "top_clients"))
    val s1 = parse("xl/worksheets/sheet1.xml")
    val rows = s1.getElementsByTagName("row")
    assert(rows.getLength == aging.count() + 1, "header + one row per record")
    // header texts match the view's columns
    val headerTexts = {
      val cells = rows.item(0).asInstanceOf[org.w3c.dom.Element].getElementsByTagName("t")
      (0 until cells.getLength).map(i => cells.item(i).getTextContent)
    }
    assert(headerTexts == aging.columns.toSeq)
    // at least one numeric cell carries the money style (s="2") + a value
    val vCells = s1.getElementsByTagName("v")
    assert(vCells.getLength > 0, "numeric cells present")
    zf.close()
  }
}
