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
    // width pinned: the dumped plan must be the one the pinned-width
    // PlanSpec session produces, not whatever SPARK_GRAFT_CPUS says
    val spark = ToolSession.local(defaultCpus = "8", honorCpusEnv = false,
      logLevel = "ERROR")
    for (name <- args.tail) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
