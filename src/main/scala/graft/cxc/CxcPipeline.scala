package graft.cxc

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end pipeline mirroring the reference CLI `main.run_pipeline`
  * (/root/reference/main.py:514-612; SURVEY §3.1): report → audit →
  * analytics → KPIs, with the same skip flags, returning every named
  * view. Sinks are the caller's concern (write parquet/csv from the
  * returned map — SURVEY §2.1 S7/S8 are presentation, not engine).
  */
object CxcPipeline {

  case class Options(
      skipAudit: Boolean = false,
      skipAnalytics: Boolean = false,
      skipKpis: Boolean = false,
      asOf: LocalDate = CxcFixture.asOfDate,
      cacheViews: Boolean = true)

  /** Run the full pipeline over a raw master movement table. */
  def run(spark: SparkSession, raw: DataFrame,
      opts: Options = Options()): Map[String, DataFrame] = {
    // PASO 2 — operational report (the dependency root, SURVEY §3.1)
    val vistas0 = CxcReport.run(raw, opts.asOf)
    // movimientos_totales feeds ~20 downstream views — cache it so each
    // doesn't re-execute the whole report chain (the Spark mapping of the
    // reference's TTL-cached loaders, SURVEY §2.1 S10).
    val vistas =
      if (opts.cacheViews)
        vistas0 + ("movimientos_totales" -> vistas0("movimientos_totales").cache())
      else vistas0
    // PASO 3 — audit reads the RAW master plus the operational report
    // (for the DELTA_RECAUDO/DELTA_MORA outlier rules), main.py:553-556
    val audit =
      if (opts.skipAudit) Map.empty[String, DataFrame]
      else CxcAuditor.run(spark, raw, Some(vistas("reporte_cxc")))
    // PASO 4/5 — analytics + KPIs consume movimientos_totales
    val analytics =
      if (opts.skipAnalytics) Map.empty[String, DataFrame]
      else CxcAnalytics.run(vistas)
    val kpis =
      if (opts.skipKpis) Map.empty[String, DataFrame]
      else CxcKpis.run(vistas("movimientos_totales"), opts.asOf)
    vistas ++ audit ++ analytics ++ kpis
  }

  /** Register every view as a temp view so the whole surface is
    * addressable from Spark SQL (SURVEY §1.4 dict-of-views mapping).
    */
  def registerViews(views: Map[String, DataFrame]): Unit =
    views.foreach { case (name, df) => df.createOrReplaceTempView(name) }
}
