package graft.tools

import org.apache.spark.sql.SparkSession

/** One-stop gate onboarding readout for a corpus (r16): what the
  * production gate would ACTUALLY build here, from the committed curve
  * registry / tmpdir cache state as it stands — the resolved probe
  * budget and mass fraction ([[graft.queries.VectorQueries
  * .resolvedGateProbes]]/[[graft.queries.VectorQueries
  * .resolvedGateMassFrac]], curve-sized when a current curve exists),
  * the fixed-P vs mass-budget dispatch decision with its measured skew
  * signal, and the K-rule contradiction check over the persisted K
  * curve. This is the receipt VERDICT r15 items 2/4/7 converge on: a
  * clean checkout runs it and reads the same numbers the round's
  * receipts were built with.
  *
  * Usage: `sbt "runMain graft.tools.GateResolve <sfDir> [...]"`.
  * `SPARK_GRAFT_RESOLVE_ONLY=1` skips the Spark-session steps (the
  * dispatch signal needs a fit) and prints just the curve-driven
  * sizing — enough to audit registry resolution without a cluster.
  */
object GateResolve {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GateResolve <sfDir> [<sfDir> ...]")
    val sizingOnly = sys.env.contains("SPARK_GRAFT_RESOLVE_ONLY")
    val spark =
      if (sizingOnly) None
      else Some {
        val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
        val s = SparkSession.builder()
          .config("spark.sql.extensions", "graft.GraftExtensions")
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .config(graft.GraftConf.contextDefaults)
          .getOrCreate()
        s.sparkContext.setLogLevel("WARN")
        graft.GraftConf.bootstrap(s)
        s
      }
    import graft.queries.VectorQueries
    println(s"[resolve] curve registry: ${VectorQueries.curveRegistryDir}")
    for (dir <- args) {
      val p = VectorQueries.resolvedGateProbes(dir)
      val f = VectorQueries.resolvedGateMassFrac(dir)
      val pSrc = if (p == VectorQueries.GateProbes) "constant-or-curve" else "curve-sized"
      val fSrc = if (f == VectorQueries.GateMassFrac) "constant-or-curve" else "curve-sized"
      println(s"[resolve] $dir probes=$p ($pSrc) massFrac=$f ($fSrc)")
      spark.foreach { s =>
        val n = graft.Tables.embeddings(s, dir).count()
        val rule = if (VectorQueries.gateUseMass(s, dir)) "MASS-BUDGET" else "FIXED-P"
        println(s"[resolve] $dir n=$n K=${VectorQueries.gateK(n)} dispatch=$rule")
        VectorQueries.gateKRuleWarning(dir, n) match {
          case Some(w) => println(s"[resolve] $dir K RULE WARNING: $w")
          case None if VectorQueries.readGateKSweep(dir).isDefined =>
            println(s"[resolve] $dir K rule: sqrt-n undominated on the persisted curve — KEEP")
          case None =>
            println(s"[resolve] $dir K rule: no persisted K curve (run the GateSweep K mode to measure)")
        }
      }
    }
    spark.foreach(_.stop())
  }
}
