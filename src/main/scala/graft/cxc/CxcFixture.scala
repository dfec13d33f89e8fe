package graft.cxc

import java.sql.Timestamp
import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic master-table fixture mirroring the reference's
  * Level-1 harness `_df_sintetico`
  * (/root/reference/tests/test_pipeline.py:93-194; FIXTURES.md §1):
  * ~n charges, ~40% with one linked partial/full payment, plus the
  * injected edge cases (one cancelled doc, one IMPORTE outlier, one null
  * client, one duplicated row) and the reference-fixture gaps FIXTURES.md
  * §1.3 calls out (VENTA conceptos, 'A' advances, USD rows, >90d overdue,
  * paid-late, fixed asOfDate).
  */
object CxcFixture {

  val asOfDate: LocalDate = LocalDate.parse("2024-06-01")

  case class Row(
      DOCTO_CC_ID: Long, DOCTO_CC_ACR_ID: Option[Long], FOLIO: String,
      TIPO_IMPTE: String, NATURALEZA_CONCEPTO: String, CONCEPTO: String,
      NOMBRE_CLIENTE: Option[String], CLIENTE_ID: Long, TIPO_CLIENTE: Option[String],
      VENDEDOR: Option[String], FECHA_EMISION: Timestamp, FECHA_VENCIMIENTO: Timestamp,
      HORA: Option[Timestamp], IMPORTE: Double, IMPUESTO: Double, MONEDA: String,
      CONDICIONES: String, ESTATUS_CLIENTE: String, CANCELADO: String,
      APLICADO: String, LIMITE_CREDITO: Double)

  private val clientes = Seq("ACME SA", "COMERCIAL NORTE", "DISTRIBUIDORA SUR",
    "SERVICIOS DELTA", "GRUPO OMEGA")
  private val vendedores = Seq("JUAN PEREZ", "MARIA LOPEZ", "PEDRO RUIZ")
  private val conceptos = Seq("FACTURA VENTA", "VENTA MOSTRADOR", "NOTA CARGO", "INTERESES")

  private def ts(d: LocalDate): Timestamp = Timestamp.valueOf(d.atStartOfDay)

  def generate(spark: SparkSession, n: Int = 60): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    var nextId = n + 1000L

    val charges = (1 to n).map { i =>
      val emision = asOfDate.minusDays(1 + rnd.nextInt(200).toLong)
      val plazo = Seq(30, 60, 90)(rnd.nextInt(3))
      val importe = math.rint((500 + rnd.nextDouble() * 49500) * 100) / 100
      val moneda = if (i % 10 == 0) "USD" else "MXN"
      Row(
        DOCTO_CC_ID = i.toLong, DOCTO_CC_ACR_ID = None, FOLIO = f"FAC-$i%04d",
        TIPO_IMPTE = "C", NATURALEZA_CONCEPTO = "C",
        CONCEPTO = conceptos(rnd.nextInt(conceptos.size)),
        NOMBRE_CLIENTE = Some(clientes(rnd.nextInt(clientes.size))),
        CLIENTE_ID = 1L + (i % clientes.size),
        TIPO_CLIENTE = Some(if (rnd.nextBoolean()) "CREDITO" else "CONTADO"),
        VENDEDOR = Some(vendedores(rnd.nextInt(vendedores.size))),
        FECHA_EMISION = ts(emision), FECHA_VENCIMIENTO = ts(emision.plusDays(plazo.toLong)),
        HORA = if (i % 7 == 0) None
          else Some(Timestamp.valueOf(emision.atTime(8 + i % 10, i % 60, i % 60))),
        IMPORTE = importe, IMPUESTO = math.rint(importe * 16) / 100,
        MONEDA = moneda, CONDICIONES = s"Credito $plazo dias",
        ESTATUS_CLIENTE = "ACTIVO", CANCELADO = "N", APLICADO = "S",
        LIMITE_CREDITO = math.rint((50000 + rnd.nextDouble() * 250000) * 100) / 100)
    }

    // ~40% of charges settled by one partial/full payment (ref :161-177)
    val payments = charges.filter(_ => rnd.nextDouble() < 0.4).map { ch =>
      nextId += 1
      val frac = 0.3 + rnd.nextDouble() * 0.7
      val full = frac > 0.85
      val imp = if (full) ch.IMPORTE else math.rint(ch.IMPORTE * frac * 100) / 100
      val tax = if (full) ch.IMPUESTO else math.rint(imp * 16) / 100
      ch.copy(
        DOCTO_CC_ID = nextId, DOCTO_CC_ACR_ID = Some(ch.DOCTO_CC_ID),
        FOLIO = f"REC-$nextId%04d", TIPO_IMPTE = "R", NATURALEZA_CONCEPTO = "R",
        CONCEPTO = "COBRO VENTA", IMPORTE = imp, IMPUESTO = tax,
        FECHA_EMISION = ts(asOfDate.minusDays(rnd.nextInt(60).toLong)))
    }

    // full settlements so DELTA_RECAUDO has coverage: pay off charges 1-3
    val settlements = charges.take(3).map { ch =>
      nextId += 1
      ch.copy(DOCTO_CC_ID = nextId, DOCTO_CC_ACR_ID = Some(ch.DOCTO_CC_ID),
        FOLIO = f"REC-$nextId%04d", TIPO_IMPTE = "R", NATURALEZA_CONCEPTO = "R",
        CONCEPTO = "COBRO VENTA",
        IMPORTE = ch.IMPORTE - payments.filter(_.DOCTO_CC_ACR_ID.contains(ch.DOCTO_CC_ID))
          .map(_.IMPORTE).sum,
        IMPUESTO = ch.IMPUESTO - payments.filter(_.DOCTO_CC_ACR_ID.contains(ch.DOCTO_CC_ID))
          .map(_.IMPUESTO).sum,
        FECHA_EMISION = ts(asOfDate.minusDays(5)))
    }

    // advances ('A'), ref gap FIXTURES.md §1.3
    val advances = (1 to 3).map { i =>
      nextId += 1
      charges.head.copy(DOCTO_CC_ID = nextId, DOCTO_CC_ACR_ID = None,
        FOLIO = f"ANT-$i%04d", TIPO_IMPTE = "A", NATURALEZA_CONCEPTO = "R",
        CONCEPTO = "ANTICIPO", IMPORTE = 1000.0 * i, IMPUESTO = 160.0 * i)
    }

    val base = charges ++ payments ++ settlements ++ advances
    // edge cases (ref :181-192)
    val cancelled = charges(4).copy(DOCTO_CC_ID = { nextId += 1; nextId },
      FOLIO = "FAC-CANC", CANCELADO = "S")
    val outlier = charges(5).copy(DOCTO_CC_ID = { nextId += 1; nextId },
      FOLIO = "FAC-OUTL", CONCEPTO = "FACTURA VENTA",
      IMPORTE = 500000.0, IMPUESTO = 80000.0)
    val nullClient = charges(6).copy(DOCTO_CC_ID = { nextId += 1; nextId },
      FOLIO = "FAC-NULL", NOMBRE_CLIENTE = None, TIPO_CLIENTE = None, VENDEDOR = None)
    val dup = charges(7).copy(DOCTO_CC_ID = { nextId += 1; nextId })

    (base ++ Seq(cancelled, outlier, nullClient, dup)).toDF()
  }
}
