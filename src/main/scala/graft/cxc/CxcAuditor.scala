package graft.cxc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ZScore

import CxcSchema._

/** Data-quality audit (SURVEY §3.1 PASO 3; /root/reference/src/auditor.py):
  * consumes the RAW master plus the processed report (§3.1 lineage note).
  */
object CxcAuditor {

  /** P5 — cancelled docs with cancellation metadata
    * (/root/reference/src/auditor.py:315-347).
    */
  def cancelados(df: DataFrame): DataFrame = df.filter(col("_CANCELADO"))

  /** P10 — null dimension audits (/root/reference/src/auditor.py:267-313). */
  def sinTipoCliente(df: DataFrame): DataFrame = df.filter(col("TIPO_CLIENTE").isNull)
  def sinVendedor(df: DataFrame): DataFrame = df.filter(col("VENDEDOR").isNull)
  def sinCliente(df: DataFrame): DataFrame = df.filter(col("NOMBRE_CLIENTE").isNull)

  /** A16 — IMPORTE outliers on CHARGES ONLY (the reference restricts to
    * TIPO_IMPTE == 'C' so payment amounts don't distort the reference
    * mean), |z| >= umbral, with the reference's MOTIVO label
    * (/root/reference/src/auditor.py:173-209).
    */
  def importesAtipicos(df: DataFrame, umbral: Double = 3.0): DataFrame = {
    val ventas = df.filter(isCargo(df))
    ZScore.withZScore(ventas, col("IMPORTE"), "ZSCORE_IMPORTE", "ATIPICO_IMPORTE", umbral)
      .filter(col("ZSCORE_IMPORTE") >= umbral)
      .drop("ATIPICO_IMPORTE")
      .withColumn("MOTIVO", lit(s"Importe de venta atipico (Z-score >= $umbral)"))
  }

  /** DELTA_RECAUDO / DELTA_MORA outliers over the operational REPORT
    * (cargo rows, non-null delta), |z| >= umbral
    * (_detectar_atipicos_delta, /root/reference/src/auditor.py:211-265).
    */
  def atipicosDelta(reporte: DataFrame, columna: String,
      umbral: Double = 3.0): DataFrame = {
    val base = reporte.filter(
      upper(trim(col("TIPO_IMPTE"))) === "C" && col(columna).isNotNull)
    ZScore.withZScore(base, col(columna), s"ZSCORE_$columna", "_flag", umbral)
      .filter(col(s"ZSCORE_$columna") >= umbral)
      .drop("_flag")
      .withColumn("MOTIVO", lit(s"$columna atipico (Z-score >= $umbral)"))
  }

  /** Duplicate full-content rows (the fixture's planted dup; content =
    * all business columns except the id). The \u0001 separator keeps
    * column boundaries; the \u0000 null sentinel keeps null positions —
    * concat_ws silently SKIPS nulls, so without it (null,"X") and
    * ("X",null) would hash equal and be falsely flagged as duplicates.
    */
  def duplicados(df: DataFrame): DataFrame = {
    val contentCols = df.columns.filterNot(c =>
      c == "DOCTO_CC_ID" || c == "FOLIO" || c.startsWith("_")).map(col).toSeq
    val keyed = df.withColumn("_content_hash", md5(concat_ws("\u0001",
      contentCols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*)))
    val dupHashes = keyed.groupBy("_content_hash").count().filter(col("count") > 1)
      .select(col("_content_hash").as("_dup_hash"))
    keyed.join(dupHashes, keyed("_content_hash") === col("_dup_hash"), "left_semi")
      .drop("_content_hash")
  }

  /** A17 — per-column data-quality profile in one distributed pass
    * (/root/reference/src/auditor.py:349-376).
    */
  def perfilCalidad(df: DataFrame): DataFrame = {
    val cols = df.columns.filterNot(_.startsWith("_")).toSeq
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1).otherwise(0)).as(s"null_$c"),
      countDistinct(col(c)).as(s"dist_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map(c => struct(
      lit(c).as("COLUMNA"), col("n_rows").as("TOTAL"),
      col(s"null_$c").as("NULOS"),
      dround6(col(s"null_$c").cast("double") / col("n_rows")).as("PCT_NULOS"),
      col(s"dist_$c").as("DISTINTOS")))
    one.select(explode(array(structs: _*)).as("p")).select("p.*")
  }

  private def dround6(c: org.apache.spark.sql.Column) =
    graft.operators.Rounding.dround(c, 6)

  /** PASO 3: the 7 finding sets + summary counts
    * (/root/reference/src/auditor.py:34-60, 382-415). The summary is a
    * single lazy union of scalar aggregates — one Spark job when
    * materialized, not one `.count()` action per finding.
    */
  def run(spark: SparkSession, raw: DataFrame,
      reporte: Option[DataFrame] = None): Map[String, DataFrame] = {
    val df = normalize(raw)
    // recaudo/mora outliers need the operational report's delta columns
    // (run_audit's df_reporte, auditor.py:114-124); empty when absent,
    // exactly like the reference
    val deltaFindings = reporte.toSeq.flatMap { rep =>
      Seq(
        "auditoria_recaudos_atipicos" -> atipicosDelta(rep, "DELTA_RECAUDO"),
        "auditoria_moras_atipicas" -> atipicosDelta(rep, "DELTA_MORA"),
      )
    }
    val findings = Seq(
      "auditoria_cancelados" -> cancelados(df),
      "auditoria_sin_tipo_cliente" -> sinTipoCliente(df),
      "auditoria_sin_vendedor" -> sinVendedor(df),
      "auditoria_sin_cliente" -> sinCliente(df),
      "auditoria_importes_atipicos" -> importesAtipicos(df),
      "auditoria_duplicados" -> duplicados(df),
    ) ++ deltaFindings
    val countRows = findings.map { case (k, v) =>
      v.agg(count(lit(1)).as("N")).select(lit(k).as("HALLAZGO"), col("N"))
    }.reduce(_ unionByName _)
    val resumen = countRows.unionByName(
      countRows.agg(sum("N").as("N")).select(lit("total_hallazgos").as("HALLAZGO"), col("N")))
    (findings :+
      ("auditoria_perfil_calidad" -> perfilCalidad(df)) :+
      ("auditoria_resumen" -> resumen)).toMap
  }
}
