package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper: prints the post-AQE executed plan of one or
  * more registered queries at a given sf dir. Used while authoring
  * PlanSpec pins so the asserted shape is the plan Spark actually
  * picks, not the one the author imagines.
  *
  * Usage: runMain graft.tools.PlanProbe <sfDir> <queryName> [...]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.GraftConf.contextDefaults)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftConf.bootstrap(spark)
    for (name <- args.tail) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
