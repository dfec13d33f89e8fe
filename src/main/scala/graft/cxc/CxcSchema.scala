package graft.cxc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The master CxC movement schema and its one-time normalization gate —
  * replacing the reference's per-module re-coercion
  * (/root/reference/src/reporte_cxc.py:288-303,
  * /root/reference/src/analytics.py:85-99, /root/reference/src/kpis.py:36-45,
  * /root/reference/src/auditor.py:150-165; SURVEY §1.3).
  */
object CxcSchema {

  /** CANCELADO truthiness across the reference's heterogeneous encodings
    * {"S","SI","s","si",1,true,"1"} (/root/reference/src/reporte_cxc.py:309).
    */
  def cancelado(c: Column): Column =
    coalesce(upper(trim(c.cast("string"))).isin("S", "SI", "1", "TRUE"), lit(false))

  /** Movement amount: IMPORTE + IMPUESTO
    * (/root/reference/src/reporte_cxc.py:347-349).
    */
  def monto(df: DataFrame): Column =
    coalesce(df("IMPORTE").cast("double"), lit(0.0)) +
      coalesce(df("IMPUESTO").cast("double"), lit(0.0))

  def isCargo(df: DataFrame): Column = upper(trim(df("TIPO_IMPTE"))) === "C"
  def isAbono(df: DataFrame): Column = upper(trim(df("TIPO_IMPTE"))) === "R"
  def isAnticipo(df: DataFrame): Column = upper(trim(df("TIPO_IMPTE"))) === "A"

  /** Sales predicate `_es_venta` (/root/reference/src/analytics.py:105-106,
    * /root/reference/src/kpis.py:63-65).
    */
  def esVenta(df: DataFrame): Column =
    isCargo(df) && upper(coalesce(df("CONCEPTO"), lit(""))).contains("VENTA")

  /** One normalization pass: upper-case trimmed column names, coerced
    * dates and money, a materialized `_CANCELADO` boolean and `_MONTO`.
    * Every downstream stage assumes this has run (SURVEY §1.4 mapping).
    */
  def normalize(df: DataFrame): DataFrame = {
    val renamed = df.toDF(df.columns.map(_.trim.toUpperCase): _*)
    val withDates = Seq("FECHA_EMISION", "FECHA_VENCIMIENTO")
      .filter(renamed.columns.contains)
      .foldLeft(renamed)((d, c) => d.withColumn(c, to_timestamp(col(c))))
    val withMoney = Seq("IMPORTE", "IMPUESTO", "CARGOS", "ABONOS", "LIMITE_CREDITO")
      .filter(withDates.columns.contains)
      .foldLeft(withDates)((d, c) =>
        d.withColumn(c, coalesce(col(c).cast("double"), lit(0.0))))
    // F12 — HORA → "HH:mm:ss" string, "" when null (the reference's
    // _formatear_hora, /root/reference/main.py:151-158)
    val withHora =
      if (withMoney.columns.contains("HORA"))
        withMoney.withColumn("HORA",
          coalesce(date_format(to_timestamp(col("HORA")), "HH:mm:ss"), lit("")))
      else withMoney
    // P1 — the reference master always carries CARGOS/ABONOS from the
    // SQL assembly (sql/maestro_cxc.sql:38-45); synthesize them when the
    // input predates assembly, so the P3 view projections are total
    val withCa =
      if (!withHora.columns.contains("CARGOS") &&
          withHora.columns.contains("NATURALEZA_CONCEPTO"))
        CxcAssembler.withCargosAbonos(withHora)
      else withHora
    withCa
      .withColumn("_CANCELADO", cancelado(col("CANCELADO")))
      .withColumn("_MONTO", monto(withCa))
  }
}
