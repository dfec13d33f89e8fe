package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Rounding.dround

/** One-off measurement harness for VERDICT r8 item 5: qd18's per-fp
  * document count as a window (`count().over(Window.partitionBy(fp))`)
  * vs as `groupBy(fp).count + join` — the join form lets AQE coalesce
  * and skew-split where a hot boilerplate fingerprint funnels one
  * window partition. Prints min-of-3 for each at SPARK_GRAFT_SF_DIR.
  * Results recorded in BENCH_NOTES.md; the winner is what qd18 ships.
  */
object Qd18Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // width pinned at the measurement's documented 32 (its committed
    // numbers are only comparable at that width)
    val spark = ToolSession.local(honorCpusEnv = false)

    def rollup(fps: DataFrame, flagged: DataFrame): DataFrame =
      flagged
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_fps"),
          sum(when(col("n_docs_fp") > 1, 1L).otherwise(0L)).as("n_shared_fps"))
        .withColumn("dup_span_ratio",
          dround(col("n_shared_fps").cast("double") / col("n_fps"), 6))
        .withColumn("dup_span_flag", col("dup_span_ratio") > 0.5)

    def windowForm(fps: DataFrame): DataFrame =
      rollup(fps, fps.withColumn("n_docs_fp",
        count(lit(1)).over(Window.partitionBy("fp"))))

    def groupByForm(fps: DataFrame): DataFrame =
      rollup(fps, fps.join(
        fps.groupBy("fp").agg(count(lit(1)).as("n_docs_fp")), Seq("fp")))

    def fps() = graft.queries.TextQueries.qd18Fingerprints(spark, sfDir)

    def time(name: String, mk: () => DataFrame): Double = {
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[qd18probe] $name%-10s min-of-3 = $best%.2f s")
      best
    }

    // parity first: both forms must produce identical rows
    val a = windowForm(fps()).orderBy("doc_id")
    val b = groupByForm(fps()).orderBy("doc_id")
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "window and groupBy forms disagree")
    println("[qd18probe] parity OK")
    time("window", () => windowForm(fps()))
    time("groupBy", () => groupByForm(fps()))
    spark.stop()
  }
}
