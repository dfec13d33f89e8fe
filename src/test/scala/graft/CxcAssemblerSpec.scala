package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.cxc.CxcAssembler

class CxcAssemblerSpec extends AnyFunSuite {
  import SparkSpecBase.spark
  import spark.implicits._

  private def factFixture = Seq(
    // (DOCTO_CC_ID, ACR, CLIENTE_ID, VENDEDOR_ID, MONEDA_ID, CONCEPTO_CC_ID,
    //  NATURALEZA_CONCEPTO, IMPORTE, IMPUESTO, FECHA_EMISION)
    (1L, None: Option[Long], 1L, 1L, 1L, 1L, "C", 1000.0, 160.0, "2024-01-10"),
    (2L, None: Option[Long], 2L, 2L, 1L, 1L, "C", 2000.0, 320.0, "2024-01-12"),
    (3L, Some(1L), 1L, 1L, 1L, 2L, "R", 500.0, 80.0, "2024-02-01"),
    (4L, None: Option[Long], 9L, 1L, 2L, 1L, "C", 300.0, 48.0, "2024-01-05"), // orphan client
  ).toDF("DOCTO_CC_ID", "DOCTO_CC_ACR_ID", "CLIENTE_ID", "VENDEDOR_ID",
    "MONEDA_ID", "CONCEPTO_CC_ID", "NATURALEZA_CONCEPTO", "IMPORTE", "IMPUESTO",
    "FECHA_EMISION")

  test("assembleMaster: left joins preserve facts, renames applied, dims broadcast") {
    val dims = CxcAssembler.dimFixture(spark)
    val master = CxcAssembler.assembleMaster(factFixture,
      dims("clientes"), dims("vendedores"), dims("monedas"), dims("conceptos"))
    assert(master.count() == 4) // left join: orphan fact retained
    assert(Seq("NOMBRE_CLIENTE", "VENDEDOR", "MONEDA", "CONCEPTO", "CARGOS", "ABONOS")
      .forall(master.columns.contains))
    // orphan client row has null name but survives
    assert(master.filter(col("CLIENTE_ID") === 9L && col("NOMBRE_CLIENTE").isNull).count() == 1)
    // dims are broadcast in the physical plan
    val plan = master.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("assemble flips an over-budget dim to a merge join, left semantics intact (VERDICT r13 item 5)") {
    // same fixture, 1-byte budget: every measured dim overflows, so the
    // stats-driven guard must take the explicit merge arm — and the
    // left-join semantics (orphan fact survives with null name) must be
    // identical to the broadcast arm
    val dims = CxcAssembler.dimFixture(spark)
    val master = CxcAssembler.assemble(factFixture, Seq(
      CxcAssembler.Dim(dims("clientes"), "CLIENTE_ID", Map("NOMBRE" -> "NOMBRE_CLIENTE"))),
      budgetBytes = 1L)
    master.collect()
    val plan = master.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"over-budget dim must not broadcast:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected the merge arm:\n$plan")
    assert(master.count() == 4)
    assert(master.filter(col("CLIENTE_ID") === 9L && col("NOMBRE_CLIENTE").isNull).count() == 1)
  }

  test("CARGOS/ABONOS conditional projection matches naturaleza") {
    val dims = CxcAssembler.dimFixture(spark)
    val master = CxcAssembler.assembleMaster(factFixture,
      dims("clientes"), dims("vendedores"), dims("monedas"), dims("conceptos"))
    val bad = master.filter(
      (upper(col("NATURALEZA_CONCEPTO")) === "C" &&
        (col("CARGOS") =!= col("IMPORTE") + col("IMPUESTO") || col("ABONOS") =!= 0.0)) ||
      (upper(col("NATURALEZA_CONCEPTO")) === "R" &&
        (col("ABONOS") =!= col("IMPORTE") + col("IMPUESTO") || col("CARGOS") =!= 0.0)))
    assert(bad.count() == 0)
  }

  test("jdbc source shim: reader options + extraction plan shape") {
    val conf = sources.JdbcSource.JdbcConf(
      host = "localhost", database = "/data/db.fdb", user = "u", password = "p")
    // options-only check: building the reader must not touch the network
    val reader = sources.JdbcSource.reader(spark, conf)
    assert(reader != null)
    assert(sources.JdbcSource.extractionPlan.size == 10)
    assert(sources.JdbcSource.extractionPlan("DOCTOS_CC").contains("DOCTO_CC_ID"))
    // probe fails cleanly offline (no driver, no network)
    assert(!sources.JdbcSource.probe(spark, conf))
  }
}
