package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the r14 envelope finding (BENCH_NOTES r14): at
  * n=20k / K=142 the gate's candidate volume ran 4.8× the balanced
  * P·n/K model. This prints the home-cell mass distribution of the
  * production gate fit per data dir — empty cells and a heavy tail
  * mean the quantizer, not the probe rule, is what skews the scan.
  *
  * Usage: `sbt "runMain graft.tools.CellBalance [sfDir ...]"`.
  */
object CellBalance {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", s"${sys.props("java.io.tmpdir")}/graft_sf1_skew")
    val spark = ToolSession.local()
    val iterGrid = sys.env.get("SPARK_GRAFT_ITERS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(3))
    for (dir <- dirs; it <- iterGrid) {
      val masses = graft.queries.VectorQueries.gateHomeMasses(spark, dir, it)
        .orderBy(col("mass").desc).collect().map(_.getLong(1))
      val n = masses.sum
      val k = graft.queries.VectorQueries.gateK(n)
      val nonEmpty = masses.length
      // expected scanned mass per probed cell if balanced: n/K
      val top16 = masses.take(16).sum
      println(s"== $dir iters=$it: n=$n K=$k non-empty=$nonEmpty " +
        f"max=${masses.head} p50=${masses(nonEmpty / 2)} " +
        f"top16Mass=$top16 (${100.0 * top16 / n}%.1f%% of corpus; balanced would be ${100.0 * 16.0 * (n.toDouble / k) / n}%.1f%%)")
      // r15: the production dispatch decision this distribution drives
      // (gateRuleFor at the resolved probe budget — the same rule
      // qe15d_autogated_density applies at build time)
      val p = graft.queries.VectorQueries.resolvedGateProbes(dir)
      val useMass = graft.queries.VectorQueries.gateRuleFor(
        masses.toSeq, n, p, k)
      println(s"   dispatch @ P=$p: " +
        (if (useMass) "MASS-BUDGET gate (fixed-P cost contract broken)"
        else "FIXED-P gate (fit near-balanced)"))
    }
    spark.stop()
  }
}
