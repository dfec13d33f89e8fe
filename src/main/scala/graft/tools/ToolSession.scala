package graft.tools

import org.apache.spark.sql.SparkSession

/** The one local-session builder behind every measurement tool in this
  * package (review r16: the block was copy-pasted into seven mains, so
  * a conf change had seven places to miss and the receipts could
  * silently diverge in session shape). Width comes from
  * `SPARK_GRAFT_CPUS` (per-tool default), shuffle partitions equal the
  * width unless the tool opts into the `SPARK_GRAFT_SHUFFLE` override
  * (the sweep tools' 80 g narrow-session knob — BENCH_NOTES r14).
  */
private[tools] object ToolSession {

  /** `honorCpusEnv = false` pins the session width to `defaultCpus`
    * regardless of SPARK_GRAFT_CPUS — for the plan-dump tools whose
    * OUTPUT depends on session width (review r16: an exported sweep
    * knob must not silently change the plan shape PlanProbe reports).
    */
  def local(defaultCpus: String = "32", honorShuffleEnv: Boolean = false,
      honorCpusEnv: Boolean = true, logLevel: String = "WARN"): SparkSession = {
    val cpus =
      if (honorCpusEnv) sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
      else defaultCpus
    val shuffle =
      if (honorShuffleEnv) sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus) else cpus
    val s = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.GraftConf.contextDefaults)
      .getOrCreate()
    s.sparkContext.setLogLevel(logLevel)
    graft.GraftConf.bootstrap(s)
    s
  }
}
