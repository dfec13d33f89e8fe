package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Invariant coverage for the round-9/10 corpus operators (qd26
  * chunking, qd27 LM perplexity, qe13 hard negatives, q30 funnel, q31
  * retention, qe18 prototypes, qe19 binary ANN, qd32 entropy). Each
  * also carries a full DuckDB oracle — these tests pin the structural
  * contracts a hash-compare can't name when it fails.
  */
class CorpusOpsSpec extends AnyFunSuite {
  import SparkSpecBase.spark

  private val dir = "/root/testdata/sf0.01"

  test("qd26 chunking: full coverage, stride layout, and faithful chunk text") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), size(tokens(col("text"))).as("n_tokens"))
    val chunks = queries.TextQueries.qd26(spark, dir)
    val joined = chunks.join(docs, Seq("doc_id"))
      .withColumn("max_idx", max("chunk_idx").over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))

    // chunk_idx is dense from 0 and starts follow the stride
    assert(joined.filter(col("start_token") =!= col("chunk_idx") * 24).count() == 0)
    assert(joined.filter(col("chunk_idx") === 0 && col("start_token") =!= 0).count() == 0)
    // the LAST chunk ends exactly at the document's last token (full
    // coverage with no phantom tail chunk), and every other chunk is full
    assert(joined.filter(col("chunk_idx") === col("max_idx"))
      .filter(col("start_token") + col("chunk_tokens") =!= col("n_tokens"))
      .count() == 0, "last chunk must end at n_tokens")
    assert(joined.filter(col("chunk_idx") < col("max_idx"))
      .filter(col("chunk_tokens") =!= 32).count() == 0,
      "non-final chunks must be exactly ChunkSize tokens")
    // a short doc yields exactly one chunk
    assert(joined.filter(col("n_tokens") <= 32 && col("max_idx") =!= 0).count() == 0)
    // chunk_text really is the chunk: token count round-trips
    assert(chunks.filter(size(tokens(col("chunk_text"))) =!= col("chunk_tokens"))
      .count() == 0)
    // every document appears
    assert(chunks.select("doc_id").distinct().count() == docs.count())
  }

  test("qd27 LM perplexity: every doc scored once, terciles balanced and ordered") {
    val out = queries.TextQueries.qd27(spark, dir).cache()
    val nDocs = Tables.documents(spark, dir).count()
    assert(out.count() == nDocs)
    assert(out.select("doc_id").distinct().count() == nDocs)

    val sizes = out.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set("head", "middle", "tail"))
    assert(sizes.values.max - sizes.values.min <= 1,
      s"tercile sizes must differ by <= 1: $sizes")

    // the buckets order by cross-entropy: head's worst <= middle's best,
    // middle's worst <= tail's best (ce ties can straddle only by the
    // doc_id tiebreak, which the <= keeps honest)
    val b = out.groupBy("bucket")
      .agg(min("ce_nats").as("lo"), max("ce_nats").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(b("head")._2 <= b("middle")._1 + 1e-9)
    assert(b("middle")._2 <= b("tail")._1 + 1e-9)

    // perplexity = exp(ce) and both positive
    assert(out.filter(col("perplexity") <= 0 || col("ce_nats") <= 0).count() == 0)
    out.unpersist()
  }

  test("qd28 temperature mixture: fractions valid and inverse to source size") {
    val out = queries.TextQueries.qd28(spark, dir).cache()
    val fr = out.select("source", "sample_frac").distinct().cache()
    // one fraction per source, all in (0, 1]
    assert(fr.count() == fr.select("source").distinct().count())
    assert(fr.filter(col("sample_frac") <= 0 || col("sample_frac") > 1).count() == 0)
    // α = 0.7 < 1 up-weights SMALL sources: keep-fraction must be
    // non-increasing in source token mass (f ∝ n^(α−1))
    val sizes = Tables.documents(spark, dir)
      .select(col("source"), size(tokens(col("text"))).as("nt"))
      .groupBy("source").agg(sum("nt").as("n"))
    val rows = fr.join(sizes, Seq("source"))
      .orderBy(col("n").asc).collect()
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("sample_frac") >= b.getAs[Double]("sample_frac") - 1e-9,
          s"smaller source ${a.getString(0)} got a lower fraction than ${b.getString(0)}")
      case _ =>
    }
    out.unpersist(); fr.unpersist()
  }

  test("qe15 kNN density: one score per vector, top-2% flagged, flag is a distance cut") {
    val out = queries.VectorQueries.qe15(spark, dir).cache()
    val n = Tables.embeddings(spark, dir).count()
    assert(out.count() == n)
    // cosine distance lives in [0, 2]
    assert(out.filter(col("knn_dist") < 0 || col("knn_dist") > 2).count() == 0)
    // exactly ceil(n/50) vectors flagged (the 2% cut, div-formula exact)
    assert(out.filter(col("ood")).count() == (n + 49) / 50)
    // the flag is a clean threshold on the score
    val loOod = out.filter(col("ood")).agg(min("knn_dist")).head.getDouble(0)
    val hiIn = out.filter(!col("ood")).agg(max("knn_dist")).head.getDouble(0)
    assert(loOod >= hiIn - 1e-9, s"ood min $loOod below inlier max $hiIn")
    out.unpersist()
  }

  test("qd29 gopher filter: keep iff no reason, and every reason names a rule that actually fails") {
    val out = queries.TextQueries.qd29(spark, dir).cache()
    assert(out.count() == Tables.documents(spark, dir).count())
    assert(out.filter(col("keep") =!= col("reason").isNull).count() == 0)
    // each named reason must be backed by its own metric on that row
    assert(out.filter(col("reason") === "n_tokens")
      .filter(col("n_tokens").between(20, 100000)).count() == 0)
    assert(out.filter(col("reason") === "word_length")
      .filter(col("avg_len").between(3, 10)).count() == 0)
    assert(out.filter(col("reason") === "stopwords")
      .filter(col("n_stop") >= 2).count() == 0)
    // kept rows pass EVERY rule
    assert(out.filter(col("keep"))
      .filter(!col("n_tokens").between(20, 100000)
        || !col("avg_len").between(3, 10) || col("n_stop") < 2
        || col("alpha_frac") < 0.8).count() == 0)
    out.unpersist()
  }

  test("qe16 cluster sample: per-cluster cap respected, ranks dense, membership deterministic") {
    val out = queries.VectorQueries.qe16(spark, dir).cache()
    val byC = out.groupBy("cluster_id")
      .agg(count(lit(1)).as("n"), max("pick_rank").as("mx"), min("pick_rank").as("mn"))
    assert(byC.filter(col("n") > 25 || col("mx") > 25 || col("mn") =!= 1).count() == 0)
    assert(byC.filter(col("n") =!= col("mx")).count() == 0, "pick_rank must be dense 1..n")
    // determinism: a second evaluation picks the identical sample
    val again = queries.VectorQueries.qe16(spark, dir)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    out.unpersist()
  }

  test("qe13 hard negatives: labels differ, ranks dense, cosines ordered") {
    val out = queries.VectorQueries.qe13(spark, dir).cache()
    assert(out.filter(col("negative_label") === col("anchor_label")).count() == 0,
      "a hard negative must carry a different label than its anchor")
    // 5 negatives per anchor, ranks 1..5
    val anchors = Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 100 === 0).count()
    assert(out.count() == anchors * 5)
    assert(out.groupBy("anchor_id").agg(
        count(lit(1)).as("n"), min("rnk").as("lo"), max("rnk").as("hi"))
      .filter(col("n") =!= 5 || col("lo") =!= 1 || col("hi") =!= 5)
      .count() == 0)
    // cosine non-increasing in rank within each anchor
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("anchor_id").orderBy("rnk")
    assert(out.withColumn("prev", lag("cosine", 1).over(w))
      .filter(col("prev").isNotNull && col("cosine") > col("prev"))
      .count() == 0)
    out.unpersist()
  }

  test("q30 funnel: stages are sequential — out-of-order purchases do not convert") {
    import SparkSpecBase.spark.implicits._
    val planted = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // full convert
      (2L, "purchase", 5L), (2L, "view", 10L), (2L, "click", 20L), // bought BEFORE clicking
      (3L, "click", 10L), // never viewed
      (4L, "view", 10L), (4L, "purchase", 20L), // never clicked
      (5L, "view", 30L), (5L, "click", 30L), (5L, "purchase", 30L) // ties: >= is inclusive
    ).toDF("user_id", "event_type", "us")
    val m = queries.EventQueries.funnelFrom(planted).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(m == Map(1L -> 3, 2L -> 2, 3L -> 0, 4L -> 1, 5L -> 3))

    val real = queries.EventQueries.q30(spark, dir).cache()
    assert(real.count() ==
      Tables.events(spark, dir).select("user_id").distinct().count())
    // stage-k timestamp exists iff stage >= k, and stages are time-ordered
    assert(real.filter((col("stage") >= 1) =!= col("v_us").isNotNull).count() == 0)
    assert(real.filter((col("stage") >= 2) =!= col("c_us").isNotNull).count() == 0)
    assert(real.filter((col("stage") === 3) =!= col("p_us").isNotNull).count() == 0)
    assert(real.filter(col("stage") >= 2 && col("c_us") < col("v_us")).count() == 0)
    assert(real.filter(col("stage") === 3 && col("p_us") < col("c_us")).count() == 0)
    real.unpersist()
  }

  test("q31 retention: day-0 cell counts the whole cohort, no cell exceeds it") {
    val out = queries.EventQueries.q31(spark, dir).cache()
    assert(out.filter(col("day_offset") < 0).count() == 0)
    val ev = graft.operators.EventTime.withUs(Tables.events(spark, dir))
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(expr("min(us) div 86400000000").as("c_day"))
      .groupBy("c_day").agg(countDistinct("user_id").as("n"))
      .select(date_format(date_add(to_date(lit("1970-01-01")),
        col("c_day").cast("int")), "yyyy-MM-dd").as("cohort_day"), col("n"))
      .cache()
    // the signup event itself is day-0 activity: the offset-0 cell is
    // exactly the cohort census
    val z = out.filter(col("day_offset") === 0).join(cohorts, Seq("cohort_day"))
    assert(z.count() == cohorts.count())
    assert(z.filter(col("n_users") =!= col("n")).count() == 0)
    assert(out.join(cohorts, Seq("cohort_day"))
      .filter(col("n_users") > col("n")).count() == 0)
    out.unpersist(); cohorts.unpersist()
  }

  test("qe18 prototypes: exactly floor(n/5) most-prototypical dropped per cluster") {
    val out = queries.VectorQueries.qe18(spark, dir).cache()
    assert(out.count() == Tables.embeddings(spark, dir).count())
    assert(out.filter(col("proto_cos") < -1.000001 || col("proto_cos") > 1.000001)
      .count() == 0)
    val byC = out.groupBy("cluster_id").agg(
      count(lit(1)).as("n"),
      sum(when(!col("keep"), 1).otherwise(0)).as("dropped"),
      max(when(!col("keep"), col("proto_rank"))).as("maxDropRank"),
      min(when(col("keep"), col("proto_rank"))).as("minKeepRank"))
    assert(byC.filter(col("dropped") =!= expr("n div 5")).count() == 0,
      "per-cluster drop count must be floor(n/5)")
    // the verdict is a clean prefix of the prototypicality ranking
    assert(byC.filter(col("maxDropRank").isNotNull
      && col("maxDropRank") >= col("minKeepRank")).count() == 0)
    out.unpersist()
  }

  test("qe19 binary ANN: valid hamming, dense ranks, shortlist recall above floor") {
    val out = queries.VectorQueries.qe19(spark, dir).cache()
    assert(out.filter(col("ham") < 0 || col("ham") > 64).count() == 0)
    assert(out.groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rnk").as("lo"), max("rnk").as("hi"))
      .filter(col("n") =!= 5 || col("lo") =!= 1 || col("hi") =!= 5).count() == 0)
    // the 50-deep hamming shortlist + exact rerank recovers most of the
    // exact top-5 (the artifact row lives in RECALL.json via RecallSpec)
    val exact = queries.VectorQueries.qe1(spark, dir)
      .select("query_id", "neighbor_id")
    val hits = out.select("query_id", "neighbor_id").intersect(exact).count()
    val recall = hits.toDouble / exact.count()
    assert(recall >= 0.4, s"qe19 recall@5 $recall below floor 0.4")
    out.unpersist()
  }

  test("q33 anomaly: planted spike flagged, uniform traffic is not") {
    import SparkSpecBase.spark.implicits._
    // 11 quiet hours of 10 + one 500-spike for 'click'; 'view' is flat
    val planted = ((0 to 10).map(h => (f"2024-01-01 $h%02d:00:00", "click", 10L))
      :+ ("2024-01-01 11:00:00", "click", 500L))
      .++((0 to 11).map(h => (f"2024-01-01 $h%02d:00:00", "view", 10L)))
      .toDF("hour", "event_type", "n_events")
    val out = queries.EventQueries.anomaliesFrom(planted).cache()
    assert(out.filter(col("event_type") === "click" && col("is_anomaly"))
      .collect().map(_.getString(0)).toSeq == Seq("2024-01-01 11:00:00"))
    // a constant series has zero variance: z pinned to 0, never NaN
    assert(out.filter(col("event_type") === "view")
      .filter(col("zscore") =!= 0.0 || col("is_anomaly")).count() == 0)
    out.unpersist()
    // the real corpus wiring: one row per (hour, type), flags consistent
    val real = queries.EventQueries.q33(spark, dir).cache()
    assert(real.filter(col("is_anomaly") =!= (abs(col("zscore")) > 3.0)).count() == 0)
    assert(real.groupBy("hour", "event_type").count().filter(col("count") > 1).count() == 0)
    real.unpersist()
  }

  test("qd33 PMI: count floor respected, ranks dense, scores non-increasing") {
    val out = queries.TextQueries.qd33(spark, dir).cache()
    assert(out.count() <= 50)
    assert(out.filter(col("cuv") < 5).count() == 0, "count floor violated")
    val rows = out.orderBy("rnk").collect()
    assert(rows.map(_.getAs[Int]("rnk")).toSeq == (1 to rows.length))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("pmi") >= b.getAs[Double]("pmi") - 1e-9)
      case _ =>
    }
    out.unpersist()
  }

  test("qd34 containment: a planted excerpt is caught in its direction only") {
    import SparkSpecBase.spark.implicits._
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val excerpt = (10 to 25).map(i => s"w$i").mkString(" ") // 16 of long's tokens
    val other = (100 to 140).map(i => s"x$i").mkString(" ")
    val planted = Seq((1L, long), (2L, excerpt), (3L, other)).toDF("doc_id", "text")
    val out = queries.TextQueries.containmentFrom(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("containment")).toMap
    // the excerpt is fully contained in the long doc...
    assert(out((2L, 1L)) == 1.0)
    // ...but the long doc is NOT contained in the excerpt (14/58 grams),
    // and the unrelated doc shares nothing in either direction
    assert(!out.contains((1L, 2L)))
    assert(!out.keySet.exists(p => p._1 == 3L || p._2 == 3L))

    // real corpus: directed scores are valid fractions
    val real = queries.TextQueries.qd34(spark, dir).cache()
    assert(real.filter(col("containment") < 0.5 || col("containment") > 1.0).count() == 0)
    assert(real.filter(col("shared") > col("na")).count() == 0)
    real.unpersist()
  }

  test("qd34 df-cap: boilerplate grams neither explode pairs nor carry containment") {
    import SparkSpecBase.spark.implicits._
    // 70 docs share one boilerplate sentence (every gram df=70 > cap 64)
    // but are otherwise disjoint; one genuine excerpt pair rides along.
    // Uncapped, the boilerplate alone yields 70*69 pair rows ALL scored
    // >= 0.5 in the short docs' direction; capped, only the planted
    // excerpt survives — and its denominator counts informative grams.
    val boiler = "terms of service apply to all content here"
    val docs = (1 to 70).map(i =>
      (i.toLong, s"$boiler unique$i alpha$i beta$i gamma$i delta$i")) ++ Seq(
      (100L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (101L, (5 to 20).map(i => s"w$i").mkString(" ")))
    val out = queries.TextQueries.containmentFrom(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(out.contains((101L, 100L)), "the genuine excerpt must survive the cap")
    assert(!out.keySet.exists(p => p._1 <= 70L || p._2 <= 70L),
      s"boilerplate-only overlap must not report containment: ${out.keySet.filter(_._1 <= 70L).take(5)}")
  }

  test("qd17 posting cap: hot-term lists truncate to top-tf, cold terms and idf untouched") {
    import SparkSpecBase.spark.implicits._
    // doc 0 is the one query (doc_id % 100 == 0); "hot" appears in 5
    // docs with distinct tfs, "a" in 2. At cap=2 the hot posting list
    // keeps only docs 1 (tf=3) and 2 (tf=2): docs 3 and 4 — whose ONLY
    // query-term posting was truncated — must leave the result, while
    // every cold-term contribution (a/b/c) survives untouched.
    val planted = Seq(
      (0L, "hot a b c"),
      (1L, "hot hot hot"),
      (2L, "hot hot"),
      (3L, "hot"),
      (4L, "hot z"),
      (5L, "a a")).toDF("doc_id", "text")
    val capped = queries.TextQueries.bm25From(planted, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(capped.keySet.map(_._2) == Set(0L, 1L, 2L, 5L),
      s"cap=2 must keep exactly the surviving-posting docs: ${capped.keySet}")
    // a cap at/above the max df is the identity: same rows, same scores
    val loose = queries.TextQueries.bm25From(planted, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val tight = queries.TextQueries.bm25From(planted, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(loose == tight, "cap >= max df must be the identity")
    assert(loose.keySet.map(_._2) == Set(0L, 1L, 2L, 3L, 4L, 5L))
    // surviving scores are IDENTICAL capped vs uncapped (true df feeds
    // idf, so truncation removes rows without re-weighting the rest) —
    // except the query's own multi-term sum where a truncated term
    // drops one addend; doc 2's single hot term checks score equality
    assert(math.abs(capped((0L, 2L)) - loose((0L, 2L))) < 1e-12,
      "a surviving single-term doc's score must not move under the cap")

    // the production cap never bites at tested sfs: qd17 == uncapped
    val prod = queries.TextQueries.qd17(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    val uncapped = queries.TextQueries.bm25From(
        Tables.documents(spark, dir), Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    assert(prod.sameElements(uncapped),
      "Bm25PostingDfCap must sit above every tested-sf df (bit-identical outputs)")
  }

  test("qd17b persisted-postings probe equals the fused qd17 row-for-row") {
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    val probe = snap(queries.TextQueries.qd17b(spark, dir))
    assert(probe.sameElements(snap(queries.TextQueries.qd17(spark, dir))),
      "the offline artifact IS qd17's capped posting stage — scores must match")
    // the artifact has the two-part layout with the postings committed
    // last (its _SUCCESS is the staleness witness)
    val path = queries.TextQueries.bm25IndexPath(dir)
    assert(new java.io.File(s"$path/postings/_SUCCESS").exists())
    assert(new java.io.File(s"$path/stats/_SUCCESS").exists())
  }

  test("q34 RFM: quintile scores balanced, segment echoes the three digits") {
    val out = queries.EventQueries.q34(spark, dir).cache()
    val n = out.count()
    assert(out.select("user_id").distinct().count() == n)
    // each score is 1..5 and each quintile holds floor/ceil(n/5) users
    for (c <- Seq("r_score", "f_score", "m_score")) {
      val sizes = out.groupBy(c).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(sizes.keySet.subsetOf((1 to 5).toSet), s"$c out of range: $sizes")
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$c quintiles must differ by <= 1: $sizes")
    }
    assert(out.filter(col("segment") =!= concat(
      col("r_score").cast("string"), col("f_score").cast("string"),
      col("m_score").cast("string"))).count() == 0)
    // a 5-recency user purchased at least as recently as any 1-recency user
    val r5 = out.filter(col("r_score") === 5).agg(max("recency_days")).head.getLong(0)
    val r1 = out.filter(col("r_score") === 1).agg(min("recency_days")).head.getLong(0)
    assert(r5 <= r1)
    out.unpersist()
  }

  test("q36 transitions: rows normalize to 1 per from-state, counts conserve") {
    val out = queries.EventQueries.q36(spark, dir).cache()
    // each from_type's probabilities sum to 1 (up to 6dp rounding x arity)
    val sums = out.groupBy("from_type").agg(sum("p").as("sp"), sum("n").as("sn"))
      .collect()
    sums.foreach { r =>
      assert(math.abs(r.getAs[Double]("sp") - 1.0) < 1e-4,
        s"${r.getString(0)}: row probability sum ${r.getAs[Double]("sp")}")
    }
    // total transitions = total events - one per user with >= 2 events
    val ev = graft.operators.EventTime.withUs(Tables.events(spark, dir))
    val perUser = ev.groupBy("user_id").count()
    val expected = perUser.agg(sum(col("count") - 1)).head.getLong(0)
    assert(out.agg(sum("n")).head.getLong(0) == expected)
    out.unpersist()
  }

  test("qe21 feedback: dense ranks, and the expansion actually moves some ranking") {
    val out = queries.VectorQueries.qe21(spark, dir).cache()
    assert(out.groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rnk").as("lo"), max("rnk").as("hi"))
      .filter(col("n") =!= 5 || col("lo") =!= 1 || col("hi") =!= 5).count() == 0)
    assert(out.filter(col("cosine") < -1.000001 || col("cosine") > 1.000001).count() == 0)
    // the expanded query is not a no-op: at least one query's top-5 set
    // differs from the raw qe1 top-5 (with random 64-dim vectors the
    // centroid pull always reshuffles some tail neighbor)
    val raw = queries.VectorQueries.qe1(spark, dir).select("query_id", "neighbor_id")
    val diff = out.select("query_id", "neighbor_id").exceptAll(raw).count()
    assert(diff > 0, "expansion changed no ranking at all")
    out.unpersist()
  }

  test("qd32 entropy: uniform docs score norm 1, skew-dominated docs flagged") {
    import SparkSpecBase.spark.implicits._
    val planted = Seq(
      (1L, "a b c d e f"), // all distinct: norm exactly 1
      (2L, "x x x x x x x x x y"), // 9:1 skew: dominated -> flagged
      (3L, "z z z z"), // single token: entropy 0, norm undefined -> flagged
      (4L, "a b a b a b") // even 2-token mix: norm exactly 1, NOT flagged
    ).toDF("doc_id", "text")
    val rows = queries.TextQueries.entropyFrom(planted).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Double]("norm_entropy") == 1.0
      && !rows(1L).getAs[Boolean]("is_low_entropy"))
    assert(rows(2L).getAs[Boolean]("is_low_entropy"))
    assert(rows(3L).getAs[Double]("entropy") == 0.0
      && rows(3L).isNullAt(rows(3L).fieldIndex("norm_entropy"))
      && rows(3L).getAs[Boolean]("is_low_entropy"))
    assert(rows(4L).getAs[Double]("norm_entropy") == 1.0
      && !rows(4L).getAs[Boolean]("is_low_entropy"))
    assert(queries.TextQueries.qd32(spark, dir).count() ==
      Tables.documents(spark, dir).count())
  }

  test("qe22 mutual-NN pairs: a perfect matching consistent with the exact top-1") {
    val pairs = queries.VectorQueries.qe22(spark, dir).cache()
    // mutual top-1 pairs form a matching: no vector appears twice
    val members = pairs.select(col("vec_a").as("v"))
      .unionByName(pairs.select(col("vec_b").as("v")))
    assert(members.groupBy("v").count().filter(col("count") > 1).count() == 0)
    assert(pairs.filter(col("vec_a") >= col("vec_b")).count() == 0)
    // cross-operator consistency: when a query vector (qe1 surface) sits
    // in a mutual pair, its partner IS its qe1 rank-1 neighbor
    val nn1 = queries.VectorQueries.qe1(spark, dir)
      .filter(col("rnk") === 1)
      .select(col("query_id"), col("neighbor_id"))
    val fromA = pairs.join(nn1, col("vec_a") === col("query_id"))
      .filter(col("vec_b") =!= col("neighbor_id"))
    val fromB = pairs.join(nn1, col("vec_b") === col("query_id"))
      .filter(col("vec_a") =!= col("neighbor_id"))
    assert(fromA.count() == 0 && fromB.count() == 0)
    pairs.unpersist()
  }

  test("qe23 centroid matrix: planted centroids exact, full matrix on the corpus") {
    import SparkSpecBase.spark.implicits._
    val planted = Seq(
      (0, Seq(1.0, 0.0)), (0, Seq(1.0, 0.0)), // centroid (1,0)
      (1, Seq(0.0, 1.0)), // orthogonal
      (2, Seq(1.0, 1.0)), (2, Seq(1.0, 1.0)) // 45 degrees from both
    ).toDF("label", "vec")
    val out = queries.VectorQueries.centroidMatrixFrom(planted).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
    assert(out((0, 1)).getAs[Double]("centroid_cosine") == 0.0)
    val d = graft.operators.Rounding.droundD(_: Double, 6)
    assert(out((0, 2)).getAs[Double]("centroid_cosine") == d(1.0 / math.sqrt(2.0)))
    assert(out((1, 2)).getAs[Double]("centroid_cosine") == d(1.0 / math.sqrt(2.0)))
    assert(out((0, 2)).getAs[Long]("n_a") == 2L && out((0, 2)).getAs[Long]("n_b") == 2L)

    // real corpus: complete upper triangle, cosines in range
    val real = queries.VectorQueries.qe23(spark, dir).cache()
    val l = Tables.embeddings(spark, dir).select("label").distinct().count()
    assert(real.count() == l * (l - 1) / 2)
    assert(real.filter(col("centroid_cosine") < -1.0 ||
      col("centroid_cosine") > 1.0).count() == 0)
    real.unpersist()
  }

  test("qd41 lang confusion: rows normalize, totals and diagonal agree with qd3") {
    val m = queries.TextQueries.qd41(spark, dir).cache()
    val d = Tables.documents(spark, dir)
    assert(m.agg(sum("n")).collect()(0).getLong(0) == d.count())
    // each declared language's fractions sum to 1 (within rounding dust)
    val rowSums = m.groupBy("lang").agg(sum("frac").as("s")).collect()
    assert(rowSums.forall(r => math.abs(r.getAs[Double]("s") - 1.0) < 1e-4))
    // diagonal mass equals qd3's matches_label count
    val diag = m.filter(col("lang") === col("pred_lang"))
      .agg(coalesce(sum("n"), lit(0L))).collect()(0).getLong(0)
    val qd3Matches = queries.TextQueries.qd3(spark, dir)
      .filter(col("matches_label")).count()
    assert(diag == qd3Matches)
    m.unpersist()
  }

  test("qe25 kNN confusion: every vector classified once, rows normalize") {
    val m = queries.VectorQueries.qe25(spark, dir).cache()
    val e = Tables.embeddings(spark, dir)
    assert(m.agg(sum("n")).collect()(0).getLong(0) == e.count())
    val rowSums = m.groupBy("true_label").agg(sum("frac").as("s")).collect()
    assert(rowSums.forall(r => math.abs(r.getAs[Double]("s") - 1.0) < 1e-4))
    // per-true-label mass equals the label's corpus frequency
    val byLabel = e.groupBy(col("label").as("true_label"))
      .agg(count(lit(1)).as("n_corpus"))
    val agg = m.groupBy("true_label").agg(sum("n").as("n_mat"))
      .join(byLabel, Seq("true_label"))
    assert(agg.filter(col("n_mat") =!= col("n_corpus")).count() == 0)
    m.unpersist()
  }

  test("q41 path trigrams: dense ranks, non-increasing counts, conserved mass") {
    val out = queries.EventQueries.q41(spark, dir).cache()
    val rows = out.orderBy("rnk").collect()
    assert(rows.length <= 20)
    assert(rows.map(_.getAs[Int]("rnk")).toSeq == (1 to rows.length))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("n") >= b.getAs[Long]("n"))
      case _ =>
    }
    out.unpersist()
  }

  test("qe24 segment merge: exactly equals the single-pass exact top-k") {
    val merged = queries.VectorQueries.qe24(spark, dir)
      .select("query_id", "neighbor_id", "cosine", "rnk").cache()
    val exact = queries.VectorQueries.qe1(spark, dir)
    // the lambda merge (base top-K ∪ delta top-K, re-ranked) must lose
    // NOTHING versus a single global pass — the whole point of the shape
    assert(merged.exceptAll(exact).count() == 0 &&
      exact.exceptAll(merged).count() == 0,
      "segment-merged top-k diverged from the global exact top-k")
    // both segments actually contribute somewhere
    val segs = queries.VectorQueries.qe24(spark, dir)
      .select("segment").distinct().collect().map(_.getString(0)).toSet
    assert(segs == Set("base", "delta"))
    merged.unpersist()
  }

  test("qd40 report card: one exact row consistent with its component operators") {
    val card = queries.TextQueries.qd40(spark, dir).collect()
    assert(card.length == 1)
    val r = card(0)
    val d = Tables.documents(spark, dir)
    assert(r.getAs[Long]("n_docs") == d.count())
    assert(r.getAs[Long]("n_sources") == d.select("source").distinct().count())
    assert(r.getAs[Long]("n_langs") == d.select("lang").distinct().count())
    // exact-dup fraction agrees with qd1's exact-dedup keep list
    val kept = queries.TextQueries.qd1(spark, dir).filter(col("keep")).count()
    val expectedFrac = graft.operators.Rounding.droundD(
      (d.count() - kept).toDouble / d.count(), 6)
    assert(r.getAs[Double]("exact_dup_frac") == expectedFrac)
    // vocabulary size agrees with the exact NDV operator's total
    assert(r.getAs[Long]("total_tokens") > 0 && r.getAs[Long]("vocab_size") > 0)
    assert(r.getAs[Double]("mean_doc_tokens") > 0.0)
  }

  test("qd36 fuzzy dedup: blocking passes catch edits the other key survives") {
    import SparkSpecBase.spark.implicits._
    val base = ("alpha gamma " * 12).trim // 143 chars, stable prefix+suffix
    val prefixEdit = "Xlpha gamma " + base.drop(12) // edit in char 1: pre differs, suf same
    val midEdit = base.patch(30, "ZZZ", 3) // pre+suf same, 3 edits in sig
    val farText = "omega " * 24 + base.takeRight(8) // suf same, sig hopeless
    val planted = Seq(
      (1L, base), (2L, prefixEdit), (3L, midEdit), (4L, farText.trim)
    ).toDF("doc_id", "text")
    val pairs = queries.TextQueries.fuzzyDedupFrom(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("dist")).toMap
    // the suffix pass rescues the prefix-edited twin; the midEdit twin is
    // caught by the prefix pass; each appears ONCE despite double-blocking
    assert(pairs.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs((1L, 2L)) == 1 && pairs((1L, 3L)) == 3)
    // the far doc shares a block but fails the edit-distance verify
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))

    // real corpus: pairs canonical, distances within threshold
    val real = queries.TextQueries.qd36(spark, dir).cache()
    assert(real.filter(col("doc_a") >= col("doc_b")).count() == 0)
    assert(real.filter(col("dist") > 10 || col("dist") < 0).count() == 0)
    assert(real.groupBy("doc_a", "doc_b").count()
      .filter(col("count") > 1).count() == 0, "union-distinct must dedupe passes")
    real.unpersist()
  }

  test("qd37 TF-IDF keywords: planted scores exact, ranks dense and ordered") {
    import SparkSpecBase.spark.implicits._
    val planted = Seq(
      (1L, "apple apple banana"), (2L, "banana cherry"), (3L, "cherry cherry date")
    ).toDF("doc_id", "text")
    val out = queries.TextQueries.tfidfFrom(planted).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r).toMap
    val d = graft.operators.Rounding.droundD(_: Double, 6)
    assert(out((1L, "apple")).getAs[Double]("score") == d(2.0 * math.log(3.0)))
    assert(out((1L, "apple")).getAs[Int]("rnk") == 1)
    assert(out((1L, "banana")).getAs[Double]("score") == d(math.log(1.5)))
    assert(out((2L, "banana")).getAs[Long]("df") == 2L)
    assert(out((3L, "date")).getAs[Long]("tf") == 1L)

    // real corpus: per-doc top-5 contract
    val real = queries.TextQueries.qd37(spark, dir).cache()
    val perDoc = real.groupBy("doc_id").agg(
      count(lit(1)).as("k"), max("rnk").as("maxr"), min("rnk").as("minr"))
    assert(perDoc.filter(col("k") > 5 || col("maxr") =!= col("k") ||
      col("minr") =!= 1).count() == 0, "rnk must be dense 1..k, k <= 5")
    // scores never increase with rank within a doc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("rnk")
    assert(real.withColumn("prev", lag("score", 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev"))
      .count() == 0)
    real.unpersist()
  }

  test("qd38 source diversity: planted sources yield exact TTR and dup fraction") {
    import SparkSpecBase.spark.implicits._
    graft.functions.VectorFunctions.registerNative(SparkSpecBase.spark)
    val planted = Seq(
      ("s1", "a b c d"), // grams: "a b c","b c d" -> all distinct
      ("s2", "x x x x x") // grams: "x x x" x3 -> dup_frac 2/3
    ).toDF("source", "text")
    val rows = queries.TextQueries.diversityFrom(planted).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("s1").getAs[Double]("ttr") == 1.0)
    assert(rows("s1").getAs[Double]("gram_dup_frac") == 0.0)
    assert(rows("s2").getAs[Double]("ttr") == 0.2)
    assert(rows("s2").getAs[Double]("gram_dup_frac") ==
      graft.operators.Rounding.droundD(1.0 - 1.0 / 3.0, 6))

    // real corpus: one row per source, fractions in range
    val real = queries.TextQueries.qd38(spark, dir).cache()
    assert(real.count() ==
      Tables.documents(spark, dir).select("source").distinct().count())
    assert(real.filter(col("ttr") <= 0.0 || col("ttr") > 1.0).count() == 0)
    assert(real.filter(col("gram_dup_frac") < 0.0 ||
      col("gram_dup_frac") >= 1.0).count() == 0)
    assert(real.filter(col("distinct_grams") > col("n_grams") ||
      col("distinct_tokens") > col("n_tokens")).count() == 0)
    real.unpersist()
  }

  test("qd39 fuzzy clusters: pairs co-cluster, canonical is the min member") {
    val pairs = queries.TextQueries.qd36(spark, dir)
    val out = queries.TextQueries.qd39(spark, dir).cache()
    // every qd36 pair ends up in the same cluster
    val cl = out.select(col("doc_id"), col("canonical_id"))
    val joined = pairs
      .join(cl.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("canonical_id", "ca"), Seq("doc_a"))
      .join(cl.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("canonical_id", "cb"), Seq("doc_b"))
    assert(joined.filter(col("ca") =!= col("cb")).count() == 0)
    // canonical is the minimum member id and flagged exactly once per cluster
    val perCluster = out.groupBy("canonical_id").agg(
      min("doc_id").as("mn"), count(lit(1)).as("n"),
      sum(when(col("is_canonical"), 1).otherwise(0)).as("ncan"),
      first("cluster_size").as("sz"))
    assert(perCluster.filter(col("mn") =!= col("canonical_id")).count() == 0)
    assert(perCluster.filter(col("ncan") =!= 1).count() == 0)
    assert(perCluster.filter(col("sz") =!= col("n")).count() == 0)
    // only multi-doc clusters surface, and members come from the pair set
    assert(out.filter(col("cluster_size") < 2).count() == 0)
    val members = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
    assert(out.join(members, Seq("doc_id"), "left_anti").count() == 0)
    out.unpersist()
  }

  test("q42 skew report: one row per keyspace, ordered quantiles, sane Gini") {
    val out = queries.CoreQueries.q42(spark, dir).cache()
    assert(out.count() == 5)
    assert(out.select("keyspace").distinct().count() == 5)
    // p50 <= p99 <= max-implied size; shares and Gini in range
    assert(out.filter(col("p50_size") > col("p99_size")).count() == 0)
    assert(out.filter(col("max_share") <= 0.0 || col("max_share") > 1.0).count() == 0)
    assert(out.filter(col("gini") < 0.0 || col("gini") >= 1.0).count() == 0)
    assert(out.filter(col("n_keys") > col("n_rows")).count() == 0)
    // ground truth for one keyspace: documents.source at sf0.01 is 20
    // uniform sources of 25 docs -> zero skew
    val src = out.filter(col("keyspace") === "documents.source").collect()(0)
    assert(src.getAs[Long]("n_keys") ==
      Tables.documents(spark, dir).select("source").distinct().count())
    assert(src.getAs[Long]("p50_size") == 25L && src.getAs[Long]("p99_size") == 25L)
    assert(src.getAs[Double]("gini") == 0.0)
    out.unpersist()
  }

  test("qd42 BPE pairs: planted corpus yields the exact merge statistic") {
    import SparkSpecBase.spark.implicits._
    // "abab" twice and "ab" once: ab=5 (2+2+1), ba=2; "x" contributes none
    val planted = Seq((1L, "abab abab ab x")).toDF("doc_id", "text")
    val pairs = planted
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pairs == Map("ab" -> 5L, "ba" -> 2L))

    // real corpus: dense ranks, non-increasing counts, 2-char pairs only
    val out = queries.TextQueries.qd42(spark, dir).orderBy("rnk").collect()
    assert(out.length == 20)
    assert(out.map(_.getAs[Int]("rnk")).toSeq == (1 to 20))
    assert(out.forall(_.getAs[String]("pair").length == 2))
    out.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("n") >= b.getAs[Long]("n"))
      case _ =>
    }
  }

  test("qd43 quality ensemble: votes recompose from the four component operators") {
    val out = queries.TextQueries.qd43(spark, dir).cache()
    val nDocs = Tables.documents(spark, dir).count()
    assert(out.count() == nDocs)
    // votes always equal the sum of the four flags, keep <=> votes >= 3
    val vSum = when(col("heuristic_pass"), 1).otherwise(0) +
      when(col("gopher_pass"), 1).otherwise(0) +
      when(col("repetition_pass"), 1).otherwise(0) +
      when(col("entropy_pass"), 1).otherwise(0)
    assert(out.filter(col("votes") =!= vSum).count() == 0)
    assert(out.filter(col("keep") =!= (col("votes") >= 3)).count() == 0)
    // each flag column agrees with its source operator
    val gg = queries.TextQueries.qd29(spark, dir).select(col("doc_id"), col("keep").as("src"))
    assert(out.join(gg, Seq("doc_id"))
      .filter(col("gopher_pass") =!= col("src")).count() == 0)
    val rep = queries.TextQueries.qd16(spark, dir)
      .select(col("doc_id"), (!col("flagged")).as("src"))
    assert(out.join(rep, Seq("doc_id"))
      .filter(col("repetition_pass") =!= col("src")).count() == 0)
    out.unpersist()
  }

  test("qe27 embedding health: exact stats on a planted frame via the real operator") {
    val out = queries.VectorQueries.qe27(spark, dir).cache()
    val e = Tables.embeddings(spark, dir)
    // one row per label, counts conserve, no degenerate vectors in this data
    assert(out.count() == e.select("label").distinct().count())
    assert(out.agg(sum("n")).collect()(0).getLong(0) == e.count())
    assert(out.filter(col("n_zero") =!= 0 || col("n_nonfinite") =!= 0).count() == 0)
    // ordering and positivity invariants
    assert(out.filter(col("min_norm") > col("mean_norm") ||
      col("mean_norm") > col("max_norm")).count() == 0)
    assert(out.filter(col("std_norm") < 0.0 || col("min_norm") <= 0.0).count() == 0)
    out.unpersist()
  }

  test("qm8 corruption scan: exactly the planted truncations quarantine") {
    val out = graft.multimodal.Multimodal.mediaCorruption(spark, dir).cache()
    assert(out.count() == Tables.documents(spark, dir).count())
    // the corrupt set is exactly doc_id % 97 == 0 — decode genuinely
    // failed there and genuinely succeeded everywhere else
    assert(out.filter(col("is_corrupt") =!= (col("media_id") % 97 === 0)).count() == 0)
    assert(out.filter(col("is_corrupt")).count() > 0)
    assert(out.filter((col("media_id") % 2 === 0) =!= (col("kind") === "image"))
      .count() == 0)
    out.unpersist()
  }

  test("q43 PageRank: planted star ranks the hub first; mass bounded and exact") {
    import SparkSpecBase.spark.implicits._
    // star: hub 1 connected to 2,3,4,5; plus a detached edge 6-7.
    val planted = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (6L, 7L))
      .toDF("p1", "p2")
    val mass = queries.CoreQueries.pagerankMass(planted).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mass.size == 7)
    // the hub out-ranks every leaf; leaves are symmetric -> equal mass
    assert((2L to 5L).forall(l => mass(1L) > mass(l)))
    assert((3L to 5L).forall(l => mass(l) == mass(2L)))
    // the detached pair is symmetric too, and below the hub
    assert(mass(6L) == mass(7L) && mass(6L) < mass(1L))
    // total mass stays within the 1e12 budget (floor losses only shrink it)
    val total = mass.values.sum
    assert(total <= 1000000000000L && total > 900000000000L)

    // real corpus: 50 ranked rows, positive masses, dense ranks
    val out = queries.CoreQueries.q43(spark, dir).orderBy("rnk").collect()
    assert(out.length == 50)
    assert(out.map(_.getAs[Int]("rnk")).toSeq == (1 to 50))
    assert(out.forall(_.getAs[Long]("rank_mass") > 0L))
  }

  test("q44 triangles: a planted K4 plus pendant path counts exactly") {
    import SparkSpecBase.spark.implicits._
    // K4 on 1..4 (every node: 3 triangles, coeff 1.0) + path 4-5-6
    val planted = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)
    ).toDF("p1", "p2")
    val rows = queries.CoreQueries.trianglesFrom(planted).collect()
      .map(r => r.getLong(0) -> r).toMap
    (1L to 3L).foreach { n =>
      assert(rows(n).getAs[Long]("triangles") == 3L)
      assert(rows(n).getAs[Double]("clustering_coeff") == 1.0)
    }
    // node 4 gains a pendant edge: 3 triangles over C(4,2)=6 wedges
    assert(rows(4L).getAs[Long]("degree") == 4L)
    assert(rows(4L).getAs[Long]("triangles") == 3L)
    assert(rows(4L).getAs[Double]("clustering_coeff") == 0.5)
    // path nodes close nothing; degree-1 node 6 pins coeff to 0
    assert(rows(5L).getAs[Long]("triangles") == 0L &&
      rows(5L).getAs[Double]("clustering_coeff") == 0.0)
    assert(rows(6L).getAs[Long]("degree") == 1L &&
      rows(6L).getAs[Double]("clustering_coeff") == 0.0)

    // real corpus: coefficient bounds and the degree/triangle inequality
    val real = queries.CoreQueries.q44(spark, dir).cache()
    assert(real.filter(col("clustering_coeff") < 0.0 ||
      col("clustering_coeff") > 1.0).count() == 0)
    assert(real.filter(col("triangles") * 2 >
      col("degree") * (col("degree") - 1)).count() == 0,
      "triangles cannot exceed the wedge count")
    real.unpersist()
  }

  test("q45 LPA: two disjoint triangles converge to their min-id communities") {
    import SparkSpecBase.spark.implicits._
    val planted = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L))
      .toDF("p1", "p2")
    val rows = queries.CoreQueries.lpaFrom(planted).collect()
      .map(r => r.getLong(0) -> r).toMap
    (1L to 3L).foreach { n =>
      assert(rows(n).getAs[Long]("community") == 1L)
      assert(rows(n).getAs[Long]("community_size") == 3L)
    }
    Seq(10L, 11L, 12L).foreach { n =>
      assert(rows(n).getAs[Long]("community") == 10L)
      assert(rows(n).getAs[Long]("community_size") == 3L)
    }

    // real corpus: every graph node labeled once, sizes consistent
    val real = queries.CoreQueries.q45(spark, dir).cache()
    assert(real.groupBy("part").count().filter(col("count") > 1).count() == 0)
    val sizes = real.groupBy("community").agg(
      count(lit(1)).as("n"), first("community_size").as("sz"))
    assert(sizes.filter(col("n") =!= col("sz")).count() == 0)
    real.unpersist()
  }

  test("q46 integrity audit: six checks, fractions consistent, duplicates detected") {
    val out = queries.CoreQueries.q46(spark, dir).cache()
    assert(out.count() == 6)
    assert(out.filter(col("n_violations") > col("n_checked")).count() == 0)
    // fraction recomputes from the counts
    val recompute = graft.operators.Rounding.dround(
      col("n_violations") / col("n_checked"), 6)
    assert(out.filter(col("violation_frac") =!= recompute).count() == 0)
    val byName = out.collect().map(r => r.getString(0) -> r).toMap
    // the synthetic lineitem is KNOWN to carry duplicate
    // (l_orderkey, l_linenumber) keys (verify-skill gotcha) — the audit
    // must report them rather than assume uniqueness
    assert(byName("duplicate_lineitem_key").getAs[Long]("n_violations") > 0)
    // TPC-H-shaped generators keep FKs intact: orphan checks come back 0
    assert(byName("lineitem_orphan_order").getAs[Long]("n_violations") == 0)
    assert(byName("order_orphan_customer").getAs[Long]("n_violations") == 0)
    out.unpersist()
  }

  test("qd44 weighted sample: deterministic, dense ranks, priority formula exact") {
    val out = queries.TextQueries.qd44(spark, dir).cache()
    val rows = out.orderBy("rnk").collect()
    assert(rows.length == 200)
    assert(rows.map(_.getAs[Int]("rnk")).toSeq == (1 to 200))
    // priorities are ln(u)/w < 0 and non-increasing with rank
    assert(rows.forall(_.getAs[Double]("priority") < 0.0))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("priority") >= b.getAs[Double]("priority"))
      case _ =>
    }
    // deterministic across invocations (hash-keyed, no rand())
    val again = queries.TextQueries.qd44(spark, dir)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    // the priority IS ln(u)/w: recompute from raw text + qd4's score
    // (this corpus's quality scores are too tightly clustered for a
    // mean-shift assertion — pin the mechanism, not the statistics)
    val docsDf = Tables.documents(spark, dir).select("doc_id", "text")
    val q4 = queries.TextQueries.qd4(spark, dir)
      .select(col("doc_id"), col("quality_score").as("qs4"))
    val joined = out.join(docsDf, Seq("doc_id")).join(q4, Seq("doc_id"))
      .orderBy("rnk").limit(25).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    joined.foreach { r =>
      val hex = md.digest(r.getAs[String]("text").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
      val w = r.getAs[Double]("qs4") + 0.01
      assert(r.getAs[Double]("priority") ==
        graft.operators.Rounding.droundD(math.log(u) / w, 6),
        s"priority formula mismatch for doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Double]("quality_score") == r.getAs[Double]("qs4"))
    }
    out.unpersist()
  }

  test("q47 cube: subtotal lattice is additive and the grand total matches") {
    val out = queries.CoreQueries.q47(spark, dir).cache()
    val li = Tables.lineitem(spark, dir)
    // grand total row equals the table
    val gt = out.filter(col("l_returnflag") === "ALL" &&
      col("l_linestatus") === "ALL" && col("ship_year") === "ALL").collect()
    assert(gt.length == 1 && gt(0).getAs[Long]("n_rows") == li.count())
    // each lattice level's row counts sum to the grand total
    Seq(
      col("l_returnflag") =!= "ALL" && col("l_linestatus") === "ALL" &&
        col("ship_year") === "ALL",
      col("l_returnflag") === "ALL" && col("l_linestatus") =!= "ALL" &&
        col("ship_year") === "ALL",
      col("l_returnflag") =!= "ALL" && col("l_linestatus") =!= "ALL" &&
        col("ship_year") =!= "ALL"
    ).foreach { level =>
      val s = out.filter(level).agg(sum("n_rows")).collect()(0).getLong(0)
      assert(s == li.count(), s"lattice level does not re-sum to the total")
    }
    // revenue is additive too (integer cents make this exact)
    val fine = out.filter(col("l_returnflag") =!= "ALL" &&
      col("l_linestatus") =!= "ALL" && col("ship_year") =!= "ALL")
      .agg(sum("revenue")).collect()(0).getDouble(0)
    assert(math.abs(fine - gt(0).getAs[Double]("revenue")) < 1e-6)
    out.unpersist()
  }

  test("q48 SCD2: history agrees with the q39 change classes, one current row max") {
    val hist = queries.CoreQueries.q48(spark, dir).cache()
    val cdc = queries.CoreQueries.q39(spark, dir)
      .select(col("o_orderkey"), col("change_op"))
    // per key: at most one current row; version count by change class
    val perKey = hist.groupBy("o_orderkey").agg(
      count(lit(1)).as("versions"),
      sum(when(col("is_current"), 1).otherwise(0)).as("n_current"))
    assert(perKey.filter(col("n_current") > 1).count() == 0)
    val byClass = perKey.join(cdc, Seq("o_orderkey"), "left")
      .withColumn("cls", coalesce(col("change_op"), lit("unchanged")))
    // unchanged/insert -> 1 version (current); update -> 2 (one current);
    // delete -> 1 closed version (no current row)
    assert(byClass.filter(col("cls").isin("unchanged", "insert") &&
      (col("versions") =!= 1 || col("n_current") =!= 1)).count() == 0)
    assert(byClass.filter(col("cls") === "update" &&
      (col("versions") =!= 2 || col("n_current") =!= 1)).count() == 0)
    assert(byClass.filter(col("cls") === "delete" &&
      (col("versions") =!= 1 || col("n_current") =!= 0)).count() == 0)
    // interval sanity: valid_from < valid_to when closed
    assert(hist.filter(col("valid_to").isNotNull &&
      col("valid_from") >= col("valid_to")).count() == 0)
    hist.unpersist()
  }

  test("q49 YoY growth: first years null, growth recomputes from the revenue pair") {
    val out = queries.CoreQueries.q49(spark, dir).cache()
    // exactly one first-year (null prev) row per flag
    val firsts = out.filter(col("prev_revenue").isNull)
    assert(firsts.count() ==
      out.select("l_returnflag").distinct().count())
    assert(firsts.filter(col("yoy_pct").isNotNull).count() == 0)
    // growth percentage recomputes from the two revenue columns
    val recompute = graft.operators.Rounding.dround(
      (col("revenue") - col("prev_revenue")) / col("prev_revenue") * 100.0, 6)
    assert(out.filter(col("prev_revenue").isNotNull && col("prev_revenue") =!= 0.0)
      .filter(col("yoy_pct") =!= recompute).count() == 0)
    // yearly revenue re-sums to the table total
    val total = out.agg(sum("revenue")).collect()(0).getDouble(0)
    val cents = Tables.lineitem(spark, dir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
      .agg(sum("c")).collect()(0).getLong(0)
    assert(math.abs(total - cents / 100.0) < 1e-6)
    out.unpersist()
  }

  test("q50 PIT lookup: no fan-out, nulls exactly at pre-insert/post-delete reads") {
    val out = queries.CoreQueries.q50(spark, dir).cache()
    val nLi = Tables.lineitem(spark, dir).count()
    // exactly one dimension version (or none) matches per fact
    assert(out.count() == nLi, "PIT join must not fan out or drop facts")
    // a fact misses iff its epoch predates the key's insert (epoch 0,
    // key only in the new snapshot) or postdates its delete (epoch 1,
    // key only in the old snapshot) — the snapshots are keyed on
    // o_orderkey % 10 / % 13, so the null set is computable directly
    val expectNull = (col("fact_epoch") === 0 && col("l_orderkey") % 10 === 3) ||
      (col("fact_epoch") === 1 && col("l_orderkey") % 13 === 5)
    assert(out.filter(col("price").isNull =!= expectNull).count() == 0,
      "null prices must be exactly the pre-insert/post-delete reads")
    // every epoch-1 match reads the OPEN (current) version
    assert(out.filter(col("fact_epoch") === 1 && col("price").isNotNull &&
      !col("is_current")).count() == 0)
    out.unpersist()
  }

  test("q51 gap fill: complete dense spine, zeroed gaps, mass conservation") {
    val out = queries.EventQueries.q51(spark, dir).cache()
    val nTypes = out.select("event_type").distinct().count()
    val nHours = out.select("hour").distinct().count()
    // the spine is the full cross product — every (hour, type) cell exists
    assert(out.count() == nTypes * nHours, "spine must be dense")
    // gap rows are zeroed, non-gap rows are positive
    assert(out.filter(col("is_gap") &&
      (col("n_events") =!= 0L || col("sum_value") =!= 0.0)).count() == 0)
    assert(out.filter(!col("is_gap") && col("n_events") <= 0L).count() == 0)
    // densification conserves event mass
    val total = out.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, dir).count())
    out.unpersist()
  }

  test("q52 k-anonymity: risk monotone in k, singleton count recomputes") {
    val out = queries.CoreQueries.q52(spark, dir).collect()
      .sortBy(_.getAs[Int]("k"))
    // class/table totals identical on every row of the sweep
    assert(out.map(_.getAs[Long]("n_classes")).distinct.length == 1)
    assert(out.map(_.getAs[Long]("min_class_size")).distinct.length == 1)
    // rows/classes at risk grow with k
    val risk = out.map(r => (r.getAs[Long]("classes_at_risk"), r.getAs[Long]("rows_at_risk")))
    assert(risk.zip(risk.tail).forall { case ((c1, r1), (c2, r2)) => c1 <= c2 && r1 <= r2 })
    // k=2's at-risk classes are exactly the singletons, recomputed directly
    val singletons = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("b"))
      .count().filter(col("count") === 1).count()
    assert(out.head.getAs[Long]("classes_at_risk") == singletons)
    assert(out.head.getAs[Long]("rows_at_risk") == singletons)
  }

  test("qd46 survivorship: one keeper per cluster, and it is the argmax-quality member") {
    val out = queries.TextQueries.qd46(spark, dir).cache()
    val perCluster = out.groupBy("canonical_id").agg(
      sum(when(col("keep"), 1).otherwise(0)).as("n_keep"),
      count(lit(1)).as("n"),
      max("quality_score").as("maxq"))
    assert(perCluster.filter(col("n_keep") =!= 1).count() == 0,
      "every cluster ships exactly one survivor")
    assert(perCluster.filter(col("n") < 2).count() == 0,
      "survivorship only applies to real clusters")
    // the keeper carries the cluster's max quality
    val kept = out.filter(col("keep")).select(col("canonical_id"), col("quality_score"))
    assert(kept.join(perCluster, "canonical_id")
      .filter(col("quality_score") =!= col("maxq")).count() == 0)
    out.unpersist()
  }

  test("qd47 vocab growth: dense buckets, monotone cumulatives, NDV closure") {
    val out = queries.TextQueries.qd47(spark, dir).collect().sortBy(_.getAs[Int]("bucket"))
    assert(out.map(_.getAs[Int]("bucket")).toSeq == (1 to 10))
    assert(out.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, dir).count())
    // cumulatives re-sum their deltas and end at the corpus totals
    assert(out.last.getAs[Long]("cum_vocab") ==
      Tables.documents(spark, dir)
        .select(explode(tokens(col("text"))).as("t"))
        .agg(countDistinct("t")).collect()(0).getLong(0),
      "final cumulative vocabulary must equal the corpus NDV")
    val newTerms = out.map(_.getAs[Long]("new_terms"))
    assert(out.map(_.getAs[Long]("cum_vocab")).toSeq ==
      newTerms.scanLeft(0L)(_ + _).tail.toSeq)
    // first bucket introduces its whole vocabulary as new
    assert(newTerms.head > 0)
  }

  test("qe31 k-center: distinct picks, non-increasing coverage radius") {
    val out = queries.VectorQueries.qe31(spark, dir).collect().sortBy(_.getAs[Int]("sel_rank"))
    assert(out.length == 5)
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == 5, "picks must be distinct")
    assert(out.head.getAs[Long]("vec_id") ==
      Tables.embeddings(spark, dir).agg(min("vec_id")).collect()(0).getLong(0),
      "traversal starts at the smallest vec_id")
    val d = out.tail.map(_.getAs[Double]("dist_at_pick"))
    assert(d.forall(_ > 0.0))
    assert(d.zip(d.tail).forall { case (a, b) => a >= b },
      "greedy farthest-first radius must be non-increasing")
  }

  test("qd45 water-fill: exact budget, max-min fairness, small sources whole") {
    import SparkSpecBase.spark.implicits._
    // sizes 100/50/10/4: B = 82 -> t* lands between 10 and 50:
    // 10+4 saturate, the two big sources split the remaining 68 as 34/34
    val planted = Seq(("big", 100L), ("mid", 50L), ("tiny", 10L), ("nano", 4L))
      .toDF("source", "n")
    val rows = queries.TextQueries.waterfillFrom(planted).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("allocation")).toMap
    assert(rows("tiny") == 10L && rows("nano") == 4L, "small sources survive whole")
    assert(rows("big") == 34L && rows("mid") == 34L,
      s"unsaturated sources share the level: $rows")
    assert(rows.values.sum == 82L, "allocation must sum exactly to the budget")

    // real corpus: exact budget conservation and per-source caps
    val real = queries.TextQueries.qd45(spark, dir).cache()
    val totalDocs = Tables.documents(spark, dir).count()
    assert(real.agg(sum("allocation")).collect()(0).getLong(0) == totalDocs / 2)
    assert(real.filter(col("allocation") > col("n_docs")).count() == 0)
    assert(real.filter(col("allocation") < 0).count() == 0)
    // max-min property: any two unsaturated sources differ by at most 1
    val unsat = real.filter(col("allocation") < col("n_docs"))
      .select("allocation").collect().map(_.getLong(0))
    if (unsat.length > 1) assert(unsat.max - unsat.min <= 1)
    real.unpersist()
  }

  test("q38 basket rules: planted baskets yield exact support/confidence/lift") {
    import SparkSpecBase.spark.implicits._
    // baskets: 1={A,B,C} 2={A,B} 3={A,C} 4={B,C} 5={A,B} (A=1,B=2,C=3);
    // a duplicate membership row must not inflate any count
    val items = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 2L), (4L, 3L), (5L, 1L), (5L, 2L)
    ).toDF("ok", "pk")
    val out = queries.CoreQueries.basketRulesFrom(items).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val ab = out((1L, 2L)) // cnt(A)=4, cnt(B)=4, pair 3 of 5 orders
    assert(ab.getAs[Long]("pair_cnt") == 3L)
    assert(ab.getAs[Double]("support") == 0.6)
    assert(ab.getAs[Double]("conf_p1_p2") == 0.75)
    assert(ab.getAs[Double]("conf_p2_p1") == 0.75)
    assert(ab.getAs[Double]("lift") == 0.9375)
    assert(out((1L, 3L)).getAs[Double]("lift") == // 2*5/(4*3)
      graft.operators.Rounding.droundD(10.0 / 12.0, 6))

    // real corpus: pairs canonical and floors respected
    val real = queries.CoreQueries.q38(spark, dir).cache()
    assert(real.filter(col("p1") >= col("p2")).count() == 0)
    assert(real.filter(col("pair_cnt") < 2).count() == 0)
    assert(real.filter(col("support") > col("conf_p1_p2") ||
      col("support") > col("conf_p2_p1")).count() == 0,
      "support can never exceed a directional confidence")
    assert(real.filter(col("lift") <= 0.0).count() == 0)
    real.unpersist()
  }

  test("q39 snapshot diff: classes partition the keyspace by the derivation rules") {
    val out = queries.CoreQueries.q39(spark, dir).cache()
    // no key appears twice
    assert(out.groupBy("o_orderkey").count().filter(col("count") > 1).count() == 0)
    val mod10 = col("o_orderkey") % 10
    val mod13 = col("o_orderkey") % 13
    val mod7 = col("o_orderkey") % 7
    // inserts are exactly the old-absent keys that exist in the new snapshot
    assert(out.filter(col("change_op") === "insert")
      .filter(mod10 =!= 3 || mod13 === 5).count() == 0)
    // deletes are exactly the new-absent keys that exist in the old snapshot
    assert(out.filter(col("change_op") === "delete")
      .filter(mod13 =!= 5 || mod10 === 3).count() == 0)
    // updates only where the repricing rule fired, and the price moved
    assert(out.filter(col("change_op") === "update")
      .filter(mod7 =!= 2).count() == 0)
    assert(out.filter(col("change_op") === "update")
      .filter(col("old_price") === col("new_price")).count() == 0)
    // presence columns mirror the class
    assert(out.filter(col("change_op") === "insert")
      .filter(col("old_price").isNotNull).count() == 0)
    assert(out.filter(col("change_op") === "delete")
      .filter(col("new_price").isNotNull).count() == 0)
    assert(out.filter(col("change_op") === "update")
      .filter(col("old_price").isNull || col("new_price").isNull).count() == 0)
    // a key in neither modulus class never surfaces
    assert(out.filter(mod10 =!= 3 && mod13 =!= 5 && mod7 =!= 2).count() == 0)
    out.unpersist()
  }

  test("q40 EWMA: planted spike flagged only after history accrues, flat series exact") {
    import SparkSpecBase.spark.implicits._
    val planted = ((0L to 9L).map(h => ("click", h, 10L)) :+ ("click", 10L, 100L))
      .toDF("event_type", "hr", "n_events")
    val rows = queries.EventQueries.ewmaFrom(SparkSpecBase.spark, planted)
      .collect().map(r => r.getLong(1) -> r).toMap
    // hour 0 has no history: null ewma, hist 0, not a spike
    assert(rows(0L).isNullAt(rows(0L).fieldIndex("ewma")))
    assert(rows(0L).getAs[Long]("hist") == 0L && !rows(0L).getAs[Boolean]("is_spike"))
    // flat history gives EXACTLY the flat value (integer-exact weights)
    (1L to 10L).foreach(h => assert(rows(h).getAs[Double]("ewma") == 10.0))
    // the spike fires only at hour 10; early hours lack history or sit at baseline
    assert((0L to 9L).forall(h => !rows(h).getAs[Boolean]("is_spike")))
    assert(rows(10L).getAs[Boolean]("is_spike"))
    // hist counts only present preceding hours within the horizon
    assert(rows(5L).getAs[Long]("hist") == 5L && rows(10L).getAs[Long]("hist") == 10L)

    // real corpus: spike rule consistent with the reported fields
    val real = queries.EventQueries.q40(spark, dir).cache()
    assert(real.filter(col("is_spike") && col("hist") < 6).count() == 0)
    assert(real.filter(col("hist") === 0 && col("ewma").isNotNull).count() == 0)
    real.unpersist()
  }
}
