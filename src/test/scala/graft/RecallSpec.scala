package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Measured recall of every approximate operator against its exact twin
  * on sf0.01, with hard floors (VERDICT r1 item 8): the tests FAIL if a
  * parameter change drops recall, and the measured values are written to
  * RECALL.json next to the CORRECTNESS artifacts.
  *
  * sf0.01 fixture mass: 59 embedding pairs with cosine ≥ 0.4 (the
  * random-tail regime — see VectorQueries.qe4b), 25 planted document
  * near-dup pairs with Jaccard ≥ 0.5.
  */
class RecallSpec extends AnyFunSuite {
  import SparkSpecBase.spark

  private val sf = "/root/testdata/sf0.01"
  private val results = scala.collection.mutable.LinkedHashMap[String, (Double, Double, String)]()

  private def record(name: String, recall: Double, floor: Double, vs: String): Unit = {
    results(name) = (recall, floor, vs)
    assert(recall >= floor, f"$name recall $recall%.3f below floor $floor%.2f")
  }

  test("qe2 sign-LSH ANN recall@5 vs exact cosine top-k") {
    val exact = queries.VectorQueries.qe1(spark, sf).select("query_id", "neighbor_id")
    val ann = queries.VectorQueries.qe2(spark, sf).select("query_id", "neighbor_id")
    val n = exact.count()
    val hit = exact.join(ann, Seq("query_id", "neighbor_id"), "left_semi").count()
    record("qe2_ann_lsh", hit.toDouble / n, 0.7, "qe1 exact top-5, 10 queries")
  }

  test("qe5 IVF ANN recall@5 vs exact cosine top-k") {
    val exact = queries.VectorQueries.qe1(spark, sf).select("query_id", "neighbor_id")
    val ivf = queries.VectorQueries.qe5(spark, sf).select("query_id", "neighbor_id")
    val n = exact.count()
    val hit = exact.join(ivf, Seq("query_id", "neighbor_id"), "left_semi").count()
    record("qe5_ann_ivf", hit.toDouble / n, 0.4, "qe1 exact top-5, 4/16 probes")
  }

  test("qe4b banded-LSH dedup candidate recall vs exact pairs at cos >= 0.4") {
    val e = Tables.embeddings(spark, sf)
      .withColumn("vec", functions.VectorFunctions.toDouble(col("embedding")))
      .withColumn("nrm", functions.VectorFunctions.norm(col("vec")))
    val a = e.select(col("vec_id").as("ida"), col("vec").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("idb"), col("vec").as("vb"), col("nrm").as("nb"))
    val exact = a.join(b, col("ida") < col("idb"))
      .withColumn("cos", functions.VectorFunctions.cosine(
        col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") >= 0.4)
      .select("ida", "idb")
    val n = exact.count()
    val hit = exact.join(queries.VectorQueries.qe4bCandidates(spark, sf),
      Seq("ida", "idb"), "left_semi").count()
    record("qe4b_embedding_dedup_lsh", hit.toDouble / n, 0.9, "exact all-pairs cos >= 0.4")
  }

  test("qd6 MinHash-LSH candidate recall vs exact Jaccard >= 0.5 pairs") {
    val g = Tables.documents(spark, sf)
      .withColumn("grams", array_distinct(functions.TextFunctions.wordGrams(
        functions.TextFunctions.tokens(col("text")), 3)))
      .filter(size(col("grams")) > 0)
      .select("doc_id", "grams")
    val exact = g.as("x").join(g.as("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("jac", functions.TextFunctions.jaccard(col("x.grams"), col("y.grams")))
      .filter(col("jac") >= 0.5)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val n = exact.count()
    val hit = exact.join(queries.TextQueries.qd6CandidatePairs(spark, sf),
      Seq("doc_a", "doc_b"), "left_semi").count()
    record("qd6_minhash_lsh", hit.toDouble / n, 0.9, "exact all-pairs Jaccard >= 0.5")
  }

  test("qd7 SimHash band-blocking candidate recall vs exact Hamming <= 6 pairs") {
    val fps = queries.TextQueries.qd7Fingerprints(spark, sf)
    val exact = fps.as("x").join(fps.as("y"), col("x.doc_id") < col("y.doc_id"))
      .filter(bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))) <= 6)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val n = exact.count()
    val hit = exact.join(queries.TextQueries.qd7CandidatePairs(spark, sf),
      Seq("doc_a", "doc_b"), "left_semi").count()
    record("qd7_simhash", hit.toDouble / n, 0.99, "exact all-pairs Hamming <= 6")
  }

  test("qe6 int8-quantized top-k recall@5 vs exact float top-k") {
    val exact = queries.VectorQueries.qe1(spark, sf).select("query_id", "neighbor_id")
    val quant = queries.VectorQueries.qe6(spark, sf).select("query_id", "neighbor_id")
    val n = exact.count()
    val hit = exact.join(quant, Seq("query_id", "neighbor_id"), "left_semi").count()
    record("qe6_quantized_topk", hit.toDouble / n, 0.8, "qe1 exact top-5, int8 SQ")
  }

  test("qe7 truncated-prefix rerank recall@5 vs full-dim top-k") {
    // Random vectors are the WORST case for prefix truncation (no
    // energy concentration — a trained Matryoshka embedding would score
    // far higher); measured 0.60 here, floored at 0.5.
    val exact = queries.VectorQueries.qe1(spark, sf).select("query_id", "neighbor_id")
    val trunc = queries.VectorQueries.qe7(spark, sf).select("query_id", "neighbor_id")
    val n = exact.count()
    val hit = exact.join(trunc, Seq("query_id", "neighbor_id"), "left_semi").count()
    record("qe7_truncated_rerank", hit.toDouble / n, 0.5,
      "qe1 exact top-5, 16/64-dim coarse + rerank-50")
  }

  test("write RECALL.json artifact") {
    val body = results.map { case (k, (r, f, vs)) =>
      f""""$k": {"recall": $r%.4f, "floor": $f%.2f, "exact_twin": "$vs"}"""
    }.mkString(",\n  ")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/RECALL.json"),
      s"""{\n  "sf": "$sf",\n  $body\n}\n""")
    assert(results.size == 7, "all seven recall measurements recorded")
  }
}
