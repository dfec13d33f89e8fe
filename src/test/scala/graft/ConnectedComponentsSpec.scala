package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

/** Correctness of both connected-components shapes (driver union-find
  * and distributed alternating-star) against an in-memory union-find
  * reference, the auto-dispatch flip, and the O(log n) convergence pin
  * on the chain graph — the shape that makes naive min-label
  * propagation O(diameter) and is exactly why the alternating algorithm
  * was chosen for the 100 TB dup graph.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  import SparkSpecBase.spark
  import spark.implicits._

  /** Union-by-min with path compression: root of each set is its min
    * element, so find(i) IS the expected cluster_id.
    */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def run(n: Int, edges: Seq[(Long, Long)],
      distributed: Option[Boolean]): (Map[Long, Long], Int) = {
    val e = edges.toDF("src", "dst")
    val v = (0L until n.toLong).toDF("id")
    val (df, rounds) = ConnectedComponents.clustersWithRounds(e, v, distributed)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (got, rounds)
  }

  test("both shapes match union-find on seeded random graphs across densities") {
    for {
      (n, p) <- Seq((30, 0.02), (30, 0.08), (40, 0.15))
      seed <- Seq(7, 42)
    } {
      val rnd = new scala.util.Random(seed)
      val edges = for {
        i <- 0L until n.toLong
        j <- (i + 1) until n.toLong
        if rnd.nextDouble() < p
      } yield (i, j)
      val expect = unionFind(n, edges)
      val (driver, dRounds) = run(n, edges, Some(false))
      assert(driver === expect,
        s"driver path mismatch vs union-find at n=$n p=$p seed=$seed (${edges.size} edges)")
      assert(dRounds === 0)
      val (stars, _) = run(n, edges, Some(true))
      assert(stars === expect,
        s"star path mismatch vs union-find at n=$n p=$p seed=$seed (${edges.size} edges)")
    }
  }

  test("star path handles a 150-node near-critical graph with giant components") {
    // denser and larger than the property cases: mean degree ~1.5 puts
    // the graph past the percolation threshold, so the star rounds must
    // merge multi-hundred-edge giant components, not just pairs/triples
    val n = 150
    val rnd = new scala.util.Random(11)
    val edges = for {
      i <- 0L until n.toLong
      j <- (i + 1) until n.toLong
      if rnd.nextDouble() < 0.01
    } yield (i, j)
    val expect = unionFind(n, edges)
    assert(expect.values.toSet.size < n / 2, "graph should have large components")
    val (got, rounds) = run(n, edges, Some(true))
    assert(got === expect, s"star path mismatch on the giant-component graph (${edges.size} edges)")
    assert(rounds <= 15, s"giant components took $rounds rounds")
  }

  test("a leaf shared by two centers is not mistaken for a star fixpoint") {
    // {(14,25),(16,25)}: a-side and b-side are disjoint, but 25 is a
    // leaf of BOTH 14 and 16 — the whole set is ONE component. A
    // star-ness probe that only checks a∩b=∅ exits before any round
    // and even emits two labels for 25 (the r7 development bug).
    for (dist <- Seq(Some(true), Some(false))) {
      val e = Seq((14L, 25L), (16L, 25L)).toDF("src", "dst")
      val v = Seq(14L, 16L, 25L).toDF("id")
      val rows = ConnectedComponents.clusters(e, v, dist).collect()
      assert(rows.length === 3, s"one label per vertex (distributed=$dist)")
      val got = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(14L -> 14L, 16L -> 14L, 25L -> 14L),
        s"shared leaf must merge both centers (distributed=$dist)")
    }
  }

  test("chain of 64 converges in O(log n) star rounds, not O(diameter)") {
    val edges = (0L until 63L).map(i => (i, i + 1))
    val (got, rounds) = run(64, edges, Some(true))
    assert(got.values.toSet === Set(0L), "chain must collapse to cluster 0")
    // label propagation would need ~32 rounds on this graph; the
    // alternating algorithm lands in single digits — 15 is the loud
    // regression tripwire, far under the diameter bound
    assert(rounds > 0 && rounds <= 15, s"chain took $rounds rounds — O(log n) bound lost")
  }

  test("auto-dispatch flips to the star rounds when the conf threshold drops") {
    val key = GraftConf.ccDistributedEdgesKey
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 4L))
    try {
      spark.conf.set(key, "0")
      val (got, rounds) = run(5, edges, None)
      assert(rounds > 0, "threshold 0 must route even a tiny graph to the star rounds")
      assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L))
    } finally spark.conf.unset(key)
    // default threshold: same graph stays on the driver path
    val (got, rounds) = run(5, edges, None)
    assert(rounds === 0, "default threshold must keep a 3-edge graph on the driver path")
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L))
  }

  test("empty edge set yields all-singleton clusters on both shapes") {
    for (dist <- Seq(Some(false), Some(true), None)) {
      val (got, rounds) = run(5, Seq.empty, dist)
      assert(got === (0L until 5L).map(i => i -> i).toMap)
      assert(rounds === 0, s"empty graph ran $rounds rounds (distributed=$dist)")
    }
  }

  test("duplicate, reversed and self-loop edges are tolerated on both shapes") {
    for (dist <- Seq(Some(false), Some(true))) {
      val (got, _) = run(4, Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L), (3L, 3L)), dist)
      assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 3L))
    }
  }

  test("null endpoints are dropped, not propagated") {
    val e = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(3L), None))
      .toDF("src", "dst")
    val v = (0L until 4L).toDF("id")
    val got = ConnectedComponents.clusters(e, v)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("string vertex ids cluster by natural ordering") {
    val e = Seq(("beta", "alpha"), ("beta", "gamma")).toDF("src", "dst")
    val v = Seq("alpha", "beta", "gamma", "delta").toDF("id")
    for (dist <- Seq(Some(false), Some(true))) {
      val got = ConnectedComponents.clusters(e, v, dist)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got === Map("alpha" -> "alpha", "beta" -> "alpha",
        "gamma" -> "alpha", "delta" -> "delta"))
    }
  }

  test("array ids auto-dispatch to the star rounds (collected Seq is not Comparable)") {
    // arrays are Catalyst-orderable (least/greatest, sort all work) but
    // collect to Seq, which has no Comparable — the driver union-find
    // would ClassCastException. Auto-dispatch must route them to the
    // distributed shape even though the edge count is far below the
    // threshold, and an explicit driver request must fail loudly up
    // front, not at the first compareTo.
    val e = Seq((Seq(2, 0), Seq(1, 0)), (Seq(2, 0), Seq(3, 0)))
      .toDF("src", "dst")
    val v = Seq(Seq(1, 0), Seq(2, 0), Seq(3, 0), Seq(9, 9)).toDF("id")
    val (df, rounds) = ConnectedComponents.clustersWithRounds(e, v, None)
    assert(rounds > 0, "array ids must take the star rounds under auto-dispatch")
    val got = df.collect()
      .map(r => r.getSeq[Int](0).toList -> r.getSeq[Int](1).toList).toMap
    assert(got === Map(
      List(1, 0) -> List(1, 0), List(2, 0) -> List(1, 0),
      List(3, 0) -> List(1, 0), List(9, 9) -> List(9, 9)))
    val ex = intercept[IllegalArgumentException] {
      ConnectedComponents.clusters(e, v, Some(false)).collect()
    }
    assert(ex.getMessage.contains("Comparable"))
  }

  test("binary ids (atomic but not Comparable when collected) avoid the driver path") {
    // a 3-node path centered on (2) is NOT a star fixpoint, so the
    // distributed shape must actually run a round — a single edge would
    // converge in 0 and prove nothing about the dispatch
    val e = Seq((Array[Byte](2), Array[Byte](1)), (Array[Byte](2), Array[Byte](3)))
      .toDF("src", "dst")
    val v = Seq(Array[Byte](1), Array[Byte](2), Array[Byte](3), Array[Byte](7))
      .toDF("id")
    val (df, rounds) = ConnectedComponents.clustersWithRounds(e, v, None)
    assert(rounds > 0, "binary ids must take the star rounds under auto-dispatch")
    val got = df.collect()
      .map(r => r.getAs[Array[Byte]](0).toList -> r.getAs[Array[Byte]](1).toList)
      .toMap
    assert(got === Map(
      List[Byte](1) -> List[Byte](1), List[Byte](2) -> List[Byte](1),
      List[Byte](3) -> List[Byte](1), List[Byte](7) -> List[Byte](7)))
  }
}
