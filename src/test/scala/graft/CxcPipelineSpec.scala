package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.cxc._

/** Mirrors the reference's Level-1 synthetic harness
  * (/root/reference/tests/test_pipeline.py:201-415) with stronger
  * numeric assertions (SURVEY §5.4).
  */
class CxcPipelineSpec extends AnyFunSuite {
  import SparkSpecBase.spark

  private lazy val raw = CxcFixture.generate(spark, 60)
  private lazy val views = CxcPipeline.run(spark, raw)
  private lazy val movs = views("movimientos_totales").cache()

  test("pipeline emits the canonical view set") {
    val expected = Seq(
      "movimientos_totales", "facturas_abiertas", "facturas_cerradas",
      "por_acreditar", "registros_cancelados",
      "auditoria_resumen", "auditoria_perfil_calidad",
      "antiguedad_cartera_mxn", "antiguedad_cartera_usd",
      "kpis_resumen_mxn", "kpis_resumen_usd",
      "concentracion_mxn", "limite_credito_mxn", "morosidad_por_cliente_mxn")
    expected.foreach(k => assert(views.contains(k), s"missing view $k"))
  }

  test("cancelled rows are excluded from movimientos and captured in the view") {
    assert(movs.filter(col("_CANCELADO")).count() == 0)
    assert(views("registros_cancelados").count() >= 1)
  }

  test("advances ('A') are excluded from movimientos and captured por acreditar") {
    assert(movs.filter(upper(trim(col("TIPO_IMPTE"))) === "A").count() == 0)
    assert(views("por_acreditar").count() == 3)
  }

  test("SALDO_FACTURA: unlinked charge keeps full amount; settled charge is 0; payments null") {
    val unlinked = movs.filter(col("TIPO_IMPTE") === "C" &&
      abs(col("SALDO_FACTURA") - col("_MONTO")) < 0.01)
    assert(unlinked.count() > 0)
    // charges 1-3 were fully settled by the fixture
    val settled = movs.filter(col("DOCTO_CC_ID").isin(1L, 2L, 3L))
    assert(settled.filter(abs(col("SALDO_FACTURA")) > 0.011).count() == 0)
    assert(movs.filter(col("TIPO_IMPTE") === "R" && col("SALDO_FACTURA").isNotNull).count() == 0)
  }

  test("SALDO_FACTURA equals charge minus linked payments (invariant over all charges)") {
    val pays = movs.filter(col("TIPO_IMPTE") === "R")
      .groupBy(col("DOCTO_CC_ACR_ID").as("k")).agg(sum("_MONTO").as("paid"))
    val bad = movs.filter(col("TIPO_IMPTE") === "C")
      .join(pays, col("DOCTO_CC_ID") === col("k"), "left")
      .filter(abs(col("SALDO_FACTURA") - (col("_MONTO") - coalesce(col("paid"), lit(0.0)))) > 0.011)
    assert(bad.count() == 0)
  }

  test("SALDO_CLIENTE final value per client equals net client position") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("NOMBRE_CLIENTE")
      .orderBy(col("DOCTO_CC_ACR_ID").desc_nulls_last, col("DOCTO_CC_ID").desc_nulls_last,
        col("FECHA_EMISION").desc_nulls_last)
    val last = movs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("NOMBRE_CLIENTE"), col("SALDO_CLIENTE"))
    val net = movs.groupBy("NOMBRE_CLIENTE").agg(
      sum(when(col("TIPO_IMPTE") === "C", col("_MONTO"))
        .when(col("TIPO_IMPTE") === "R", -col("_MONTO")).otherwise(0.0)).as("net"),
      count(lit(1)).as("n"))
    val bad = last.join(net, Seq("NOMBRE_CLIENTE"))
      .filter(abs(col("SALDO_CLIENTE") - col("net")) > col("n") * 0.005 + 0.01)
    assert(bad.count() == 0)
  }

  test("band groups alternate in {0,1}") {
    val bands = movs.select("_BAND_GROUP").distinct().collect().map(_.getInt(0)).toSet
    assert(bands.subsetOf(Set(0, 1)))
  }

  test("auditor finds the planted edge cases") {
    val resumen = views("auditoria_resumen").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(resumen("auditoria_cancelados") >= 1)
    assert(resumen("auditoria_importes_atipicos") >= 1, "planted 4.5-sigma outlier missed")
    assert(resumen("auditoria_sin_cliente") >= 1)
    assert(resumen("auditoria_duplicados") >= 2) // the pair (original + copy)
  }

  test("aging: TOTAL row equals sum of buckets and pct is 1.0") {
    val rows = views("antiguedad_cartera_mxn").collect()
    val total = rows.find(_.getString(0) == "TOTAL").get
    val buckets = rows.filter(_.getString(0) != "TOTAL")
    assert(total.getLong(2) == buckets.map(_.getLong(2)).sum)
    assert(total.getDouble(4) == 1.0)
  }

  test("kpis resumen has DSO/CEI/morosidad rows for both currencies") {
    Seq("kpis_resumen_mxn", "kpis_resumen_usd").foreach { k =>
      val kpis = views(k).collect().map(_.getString(0)).toSet
      assert(kpis == Set("DSO", "CEI", "INDICE_MOROSIDAD"), s"$k -> $kpis")
    }
  }

  test("concentracion: first rank is A, last cumulative is 1.0, monotone") {
    val rows = views("concentracion_mxn").collect().sortBy(_.getAs[Int]("rnk"))
    assert(rows.head.getAs[String]("clase_abc") == "A")
    assert(rows.last.getAs[Double]("pct_acumulado") == 1.0)
  }

  test("credit limit: alert levels are coherent with utilization") {
    val bad = views("limite_credito_mxn")
      .filter(col("ALERTA") === "NORMAL" && col("UTILIZACION_PCT") >= 0.7)
    assert(bad.count() == 0)
  }

  test("skip flags drop the corresponding view families") {
    val lite = CxcPipeline.run(spark, raw,
      CxcPipeline.Options(skipAudit = true, skipAnalytics = true, skipKpis = true))
    assert(lite.contains("movimientos_totales"))
    assert(!lite.keys.exists(_.startsWith("auditoria")))
    assert(!lite.keys.exists(_.startsWith("kpis")))
    assert(!lite.keys.exists(_.startsWith("antiguedad")))
  }
}
