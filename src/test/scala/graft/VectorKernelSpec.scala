package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosine, norm, toDouble}
import graft.operators.Rounding.dround

/** The r18 blocked all-pairs kernel replaced the theta self-joins inside
  * the exact anchors qe15/qe22/qe25 (VERDICT r17 item 3). Its contract:
  * the per-tile top-k union it emits yields EXACTLY the rows the retired
  * `a join b on ida < idb` + mirror + window formulation selected — same
  * rounded values, same (key, idb) tiebreak under Spark's double total
  * order. This spec pins that equality against a verbatim reference
  * reimplementation of the retired shape, at a single-block sf (sf0.01,
  * n=500 ≤ PairBlock) AND a multi-block sf (sf0.1, n=2000 → 4 blocks —
  * the tile-union and cross-block paths).
  */
class VectorKernelSpec extends AnyFunSuite {
  import SparkSpecBase.spark

  private val K = 5

  /** Directed all-pairs frame — the retired formulation, verbatim. */
  private def refSym(dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .withColumn("vec", toDouble(col("embedding")))
      .withColumn("nrm", norm(col("vec")))
      .select("vec_id", "label", "vec", "nrm")
    val a = e.select(col("vec_id").as("ida"), col("label").as("la"),
      col("vec").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("idb"), col("label").as("lb"),
      col("vec").as("vb"), col("nrm").as("nb"))
    a.join(b, col("ida") =!= col("idb"))
  }

  for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
    val tag = dir.split('/').last

    test(s"kernel top-K pairs == theta-join top-K by (cos desc, idb asc) [$tag]") {
      val ref = refSym(dir)
        .withColumn("cos", dround(cosine(col("va"), col("vb"), col("na"), col("nb")), 6))
        .withColumn("rn", row_number().over(
          Window.partitionBy("ida").orderBy(col("cos").desc, col("idb").asc)))
        .filter(col("rn") <= K)
        .select("ida", "idb")
      val ker = queries.VectorQueries.knnPairsExact(spark, dir)
      assert(ker.exceptAll(ref).isEmpty && ref.exceptAll(ker).isEmpty,
        s"kernel-selected top-$K pairs diverge from the theta-join reference")
    }

    test(s"qe15 K-th-NN distances == theta-join reference by (dist asc, idb asc) [$tag]") {
      val ref = refSym(dir)
        .withColumn("dist", dround(lit(1.0) -
          cosine(col("va"), col("vb"), col("na"), col("nb")), 6))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("ida").orderBy(col("dist").asc, col("idb").asc)))
        .filter(col("rnk") === K)
        .select(col("ida").as("vec_id"), col("dist").as("knn_dist"))
      val ker = queries.VectorQueries.qe15(spark, dir).select("vec_id", "knn_dist")
      assert(ker.exceptAll(ref).isEmpty && ref.exceptAll(ker).isEmpty,
        "qe15 kernel-path K-th-NN distances diverge from the theta-join reference")
    }
  }
}
