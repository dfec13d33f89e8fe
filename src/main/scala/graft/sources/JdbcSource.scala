package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** JDBC source configuration (SURVEY §2.1 S1/S2/S4/S5): the online
  * equivalent of the reference's Firebird connector
  * (/root/reference/src/db_connector.py:27-171), expressed as
  * `spark.read.format("jdbc")` options. The Firebird driver jar is not
  * in this offline image, so the Firebird URL assembly is exercised as
  * configuration; the reader/table/query/probe EXECUTION paths are
  * exercised live in JdbcSpec against embedded Derby (in the Spark
  * distribution) — same Spark JDBC code path, different dialect.
  */
object JdbcSource {

  /** `url`/`probeSql` default to the Firebird shapes the reference uses
    * (DSN host/port:database, `RDB$DATABASE` probe); both are overrides
    * because they are dialect-specific, not connector logic.
    */
  case class JdbcConf(
      host: String, port: Int = 3050, database: String,
      user: String, password: String,
      driver: String = "org.firebirdsql.jdbc.FBDriver",
      charset: String = "WIN1252",
      url: Option[String] = None,
      probeSql: String = "SELECT 1 AS ok FROM RDB$DATABASE") {
    def jdbcUrl: String =
      url.getOrElse(s"jdbc:firebirdsql://$host:$port/$database")
  }

  /** Connection-level options (S1: DSN `host/port:database`, charset). */
  def reader(spark: SparkSession, conf: JdbcConf): DataFrameReader =
    spark.read.format("jdbc")
      .option("url", conf.jdbcUrl)
      .option("driver", conf.driver)
      .option("user", conf.user)
      .option("password", conf.password)
      .option("charSet", conf.charset)

  /** S4 — column-pruned table scan. Unlike the reference (which prunes
    * by hand-building SELECT lists), `.select` after `dbtable` lets
    * Catalyst push the projection into the generated JDBC query.
    */
  def table(spark: SparkSession, conf: JdbcConf, name: String,
      columns: Seq[String] = Nil): DataFrame = {
    val df = reader(spark, conf).option("dbtable", name).load()
    if (columns.isEmpty) df else df.select(columns.head, columns.tail: _*)
  }

  /** S2 — arbitrary SQL pushed to the source as a subquery. */
  def query(spark: SparkSession, conf: JdbcConf, sql: String): DataFrame =
    reader(spark, conf).option("query", sql).load()

  /** S5 — connectivity probe (Firebird default: `SELECT 1 FROM
    * RDB$DATABASE`; other dialects override `probeSql`).
    */
  def probe(spark: SparkSession, conf: JdbcConf): Boolean =
    try { query(spark, conf, conf.probeSql).count() == 1 }
    catch { case _: Throwable => false }

  /** S6 — the reference's 10-table extraction plan as data
    * (/root/reference/src/data_transformer.py:41-82).
    */
  val extractionPlan: Map[String, Seq[String]] = Map(
    "DOCTOS_CC" -> Seq("DOCTO_CC_ID", "DOCTO_CC_ACR_ID", "FOLIO", "NATURALEZA_CONCEPTO",
      "CLIENTE_ID", "VENDEDOR_ID", "MONEDA_ID", "COND_PAGO_ID", "CONCEPTO_CC_ID",
      "FECHA", "DESCRIPCION", "CANCELADO", "APLICADO"),
    "IMPORTES_DOCTOS_CC" -> Seq("IMPTE_DOCTO_CC_ID", "DOCTO_CC_ID", "TIPO_IMPTE",
      "IMPORTE", "IMPUESTO"),
    "USOS_ANTICIPOS_CC" -> Seq("ANTICIPO_CC_ID", "DOCTO_CC_ID", "TIPO_USO_ANTICIPO"),
    "CLIENTES" -> Seq("CLIENTE_ID", "NOMBRE", "TIPO_CLIENTE_ID", "LIMITE_CREDITO", "ESTATUS"),
    "TIPOS_CLIENTES" -> Seq("TIPO_CLIENTE_ID", "NOMBRE"),
    "VENDEDORES" -> Seq("VENDEDOR_ID", "NOMBRE"),
    "MONEDAS" -> Seq("MONEDA_ID", "NOMBRE"),
    "CONCEPTOS_CC" -> Seq("CONCEPTO_CC_ID", "NOMBRE"),
    "VENCIMIENTOS_CARGOS_CC" -> Seq("DOCTO_CC_ID", "FECHA_VENCIMIENTO"),
    "CONDICIONES_PAGO" -> Seq("COND_PAGO_ID", "NOMBRE"),
  )
}
