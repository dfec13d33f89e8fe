package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper: prints the post-AQE executed plan of one or
  * more registered queries at a given sf dir. Used while authoring
  * PlanSpec pins so the asserted shape is the plan Spark actually
  * picks, not the one the author imagines.
  *
  * Usage: runMain graft.tools.PlanProbe <sfDir> <queryName> [...]
  *
  * GRAFT_PLAN_MODE=formatted additionally prints the
  * `explain("formatted")` rendering (numbered operator list with
  * PushedFilters/ReadSchema/join details) AFTER execution, so AQE's
  * final plan — the one the session actually ran — is what the
  * committed plans/rNN receipts show, not the isFinalPlan=false
  * initial sketch.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    // width pinned: the dumped plan must be the one the pinned-width
    // PlanSpec session produces, not whatever SPARK_GRAFT_CPUS says
    val spark = ToolSession.local(defaultCpus = "8", honorCpusEnv = false,
      logLevel = "ERROR")
    val formatted = sys.env.get("GRAFT_PLAN_MODE").contains("formatted")
    for (name <- args.tail) {
      // "kernel:dist" / "kernel:cos" dump the r18 blocked all-pairs
      // kernel frame BEFORE its lineage cut — the packed exchange and
      // tile flatMap are otherwise invisible in every consumer's
      // executed plan (they run inside the checkpoint job)
      val df =
        if (name.startsWith("kernel:"))
          graft.queries.VectorQueries.blockedTopKCandsUncut(
            spark, sfDir, 5, distKey = name.endsWith("dist"))
        else graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      println(s"==== $name ====")
      if (formatted)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      else
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
