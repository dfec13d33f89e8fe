package graft.cxc

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

import graft.output.Sinks

/** CLI mirroring the reference's `python main.py` entry point
  * (/root/reference/main.py:614-620; SURVEY §7.2 item 6): run the full
  * CxC pipeline and write every view as parquet.
  *
  * Usage:
  *   runMain graft.cxc.RunCxcPipeline --out /tmp/cxc_out
  *     [--input <raw-master.parquet>] [--as-of 2024-06-01]
  *     [--skip-audit] [--skip-analytics] [--skip-kpis] [--no-cache]
  *
  * Without --input, the deterministic synthetic fixture stands in for a
  * Firebird extraction (JdbcSource documents the online path).
  */
object RunCxcPipeline {

  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--skip")).toSet ++
      args.filter(a => a == "--no-cache" || a == "--no-xlsx" || a == "--no-pdf")
    def opt(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) if !v.startsWith("--") => v }

    val out = opt("--out").getOrElse("/tmp/graft_cxc_out")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cxc-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.GraftConf.contextDefaults)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftConf.bootstrap(spark)

    val raw = opt("--input")
      .map(spark.read.parquet(_))
      .getOrElse(CxcFixture.generate(spark))
    val opts = CxcPipeline.Options(
      skipAudit = flags.contains("--skip-audit"),
      skipAnalytics = flags.contains("--skip-analytics"),
      skipKpis = flags.contains("--skip-kpis"),
      asOf = opt("--as-of").map(LocalDate.parse).getOrElse(CxcFixture.asOfDate),
      cacheViews = !flags.contains("--no-cache"))
    val views = CxcPipeline.run(spark, raw, opts)
    Sinks.writeViews(views, out)
    // the reference CLI's canonical output: three styled workbooks per
    // run (main.py exportar_tres_exceles) — skip with --no-xlsx
    if (!flags.contains("--no-xlsx"))
      CxcWorkbooks.export(views, out).foreach(p => println(s"[cxc] workbook -> $p"))
    // PASO 4b — the executive PDF (main.py:587-597 generar_reporte_pdf)
    if (!flags.contains("--no-pdf")) {
      val ts = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm")
        .format(java.time.LocalDateTime.now())
      val n = CxcPdf.export(views, s"$out/dashboard_cxc.pdf", ts)
      println(s"[cxc] pdf ($n pages) -> $out/dashboard_cxc.pdf")
    }
    views.toSeq.sortBy(_._1).foreach { case (name, df) =>
      println(s"[cxc] $name: ${df.count()} rows -> $out/$name")
    }
    spark.stop()
  }
}
