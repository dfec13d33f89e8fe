package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only 10× headroom smoke (VERDICT r11 item 8): weak-scale the
  * sf0.1 tables to ~sf1 by unioning R key-shifted copies (disjoint key
  * ranges — the graph queries see R independent copies of the sf0.1
  * co-purchase graph, the skew audit sees R× rows per keyspace), then
  * time the five most expensive suite queries. The question answered
  * is the SLOPE: a ~linear operator lands near R× its sf0.1 time, a
  * quadratic one near R²×. Results recorded in BENCH_NOTES.md.
  *
  * Usage: SPARK_GRAFT_SCALE_REPS=2 runMain graft.tools.ScaleSmoke
  */
object ScaleSmoke {

  private val Copies = 10
  private val SrcDir = "/root/testdata/sf0.1"
  private val OutDir = s"${sys.props("java.io.tmpdir")}/graft_scale_x$Copies"

  /** Union `n` copies of `df`, adding i·shift to each column in `keys`. */
  private def replicate(df: DataFrame, keys: Seq[String], shift: Long): DataFrame =
    (0 until Copies).map { i =>
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * shift)))
    }.reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val spark = ToolSession.local()

    val plans: Seq[(String, Seq[String])] = Seq(
      "lineitem" -> Seq("l_orderkey", "l_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    if (!new java.io.File(s"$OutDir/embeddings.parquet").exists()) {
      for ((t, keys) <- plans) {
        replicate(spark.read.parquet(s"$SrcDir/$t.parquet"), keys, 1L << 33)
          .write.mode("overwrite").parquet(s"$OutDir/$t.parquet")
        println(s"[scale] built $OutDir/$t.parquet")
      }
    }

    val qs: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q42_skew_report" -> (graft.queries.CoreQueries.q42 _),
      "q43_copurchase_pagerank" -> (graft.queries.CoreQueries.q43 _),
      "q44_triangle_count" -> (graft.queries.CoreQueries.q44 _),
      "q45_lpa_communities" -> (graft.queries.CoreQueries.q45 _),
      "qe15b_gated_density" -> (graft.queries.VectorQueries.qe15b _),
      // r12 additions: the CDC/layout/novelty operators
      "q53_delta_agg" -> (graft.queries.CoreQueries.q53 _),
      "q54_compaction_plan" -> (graft.queries.CoreQueries.q54 _),
      "q55_zorder_layout" -> (graft.queries.CoreQueries.q55 _),
      "qd48_train_novelty" -> (graft.queries.TextQueries.qd48 _),
      "qd30b_overlap_kmv" -> (graft.queries.TextQueries.qd30b _),
      "qd50_bpe_train" -> (graft.queries.TextQueries.qd50 _),
      "q56_column_stats" -> (graft.queries.CoreQueries.q56 _))
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    for ((name, fn) <- qs) {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        fn(spark, OutDir).write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[scale] $name%-24s min-of-$reps ${best}%.2f s")
    }
    spark.stop()
  }
}
