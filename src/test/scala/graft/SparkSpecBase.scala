package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (spark_guide: one session per
  * suite via lazy val; sharing across suites avoids repeated JVM-wide
  * context churn under `sbt test`).
  */
object SparkSpecBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // build the suite session THROUGH the extension entry point, so
      // every native-function use in the suite exercises the injected
      // registrations (ExtensionsSpec additionally pins newSession()
      // survival, which temp-function registration cannot provide)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config(GraftConf.contextDefaults)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftConf.bootstrap(s)
    graft.functions.VectorFunctions.registerNative(s)
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
