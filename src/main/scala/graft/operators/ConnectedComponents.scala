package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

import graft.GraftConf

/** Distributed connected components over an edge list — the transitive
  * closure step a dedup pipeline runs between near-duplicate pair
  * generation and keep-one-per-cluster (pairwise keep flags like qe4's
  * are not transitive: A~B, B~C, A≁C keeps both A and C; cluster dedup
  * keeps only the component canonical).
  *
  * Two execution shapes behind one API, auto-dispatched on the canonical
  * edge count (same philosophy as [[Pareto]]'s two-phase dispatch):
  *
  *  - driver union-find (small regime): collect the deduplicated edge
  *    list, label with path-compressed union-by-min, broadcast the
  *    labels back. collect() returns boxed Rows (~100-200 B/edge
  *    with the two boxed ids), so the quarter-million-edge default
  *    threshold is ~25-50 MB of transient driver allocation and
  *    milliseconds of union-find CPU — cheaper than one distributed
  *    round, and exact.
  *  - alternating large-star / small-star (big regime; Kiveris,
  *    Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components
  *    in MapReduce and Beyond", SoCC 2014). Each round rewires the edge
  *    set toward the component-minimum node and provably preserves
  *    components; the alternation converges to a union of stars (every
  *    node pointing at its component min) in O(log n) rounds — NOT
  *    O(diameter) like naive min-label propagation, which is the
  *    difference between ~8 rounds and ~10,000 on a chain-shaped 100 TB
  *    dup graph. Per round: a constant number of hash shuffles on the
  *    current edge set (groupBy min + join back + distinct), no
  *    all-pairs blow-up, nothing driver-sized.
  *
  * Each distributed round's edge set is lineage-cut via
  * [[Checkpoints.cut]] (localCheckpoint locally, reliable checkpoint()
  * when `graft.checkpoint.dir` is set — executor-loss-safe under
  * dynamic allocation): the
  * convergence probe and the next round's lineage must see the SAME
  * materialized set (same rationale as Pareto's two-phase pinning), and
  * without it the PLAN doubles every round (each star op references its
  * input twice). A spent round's checkpoint blocks are unpersisted
  * EXPLICITLY as soon as the next round materializes — waiting for the
  * ContextCleaner to GC the dropped RDD reference would pin up to
  * rounds× the edge set in storage between GC cycles, the block-pinning
  * class the qd6 localCheckpoint removal (r6) was about. Only the final
  * star set (≤ one edge per non-canonical node) stays live, referenced
  * by the returned plan.
  *
  * Convergence is detected by star-ness itself — the paper's fixpoints
  * are exactly the unions of stars, i.e. canonical edge sets whose min
  * side never reappears as a leaf — probed with a limit-1 semi join per
  * round. Probing the property directly saves the extra no-op round a
  * did-anything-change signature needs to observe stability.
  */
object ConnectedComponents {

  /** Alternation count guard: components converge in O(log² n) star
    * rounds (empirically ~log₂ n); 50 rounds covers any physically
    * possible graph, so exceeding it means a logic regression, not a
    * big input — fail loudly rather than loop forever.
    */
  private val MaxRounds = 50

  /** Cluster assignment: `(id, cluster_id)` for every vertex, where
    * `cluster_id` is the minimum vertex id of its connected component.
    *
    * @param edges       first two columns are the endpoints (undirected;
    *                    duplicates, reversed duplicates and self-loops
    *                    are tolerated; null endpoints are dropped)
    * @param vertices    single id column — the universe to label
    *                    (isolated vertices become singleton clusters);
    *                    ids must be unique, non-null and of an orderable
    *                    type
    * @param distributed `Some(false)` forces the driver union-find,
    *                    `Some(true)` the alternating-star rounds; `None`
    *                    (default) dispatches on the canonical edge count
    *                    vs the `graft.cc.distributed.edges` session conf
    *                    ([[GraftConf.ccDistributedEdgesDefault]])
    */
  def clusters(edges: DataFrame, vertices: DataFrame,
      distributed: Option[Boolean] = None): DataFrame =
    clustersWithRounds(edges, vertices, distributed)._1

  /** [[clusters]] plus the number of star rounds executed (0 on the
    * driver path) — exposed so the spec can pin the O(log n) convergence
    * bound on a worst-case chain (the shape that defeats label
    * propagation).
    */
  private[graft] def clustersWithRounds(
      edges: DataFrame, vertices: DataFrame,
      distributed: Option[Boolean] = None): (DataFrame, Int) = {
    val Array(sc, dc) = edges.columns.take(2)
    val cur = Checkpoints.cut(canonical(
      edges.select(col(sc).as("a"), col(dc).as("b"))
        .filter(col("a").isNotNull && col("b").isNotNull)))
    val useStars = distributed match {
      case Some(true)  => true
      case Some(false) =>
        require(driverOrderable(cur.schema("a").dataType),
          s"driver union-find orders collected ids via Comparable, which " +
            s"${cur.schema("a").dataType.simpleString} ids don't collect " +
            "to — use distributed = Some(true) or the auto-dispatch")
        false
      case None =>
        !driverOrderable(cur.schema("a").dataType) || cur.count() > threshold(cur)
    }
    val (starEdges, rounds) =
      if (useStars) alternatingStars(cur)
      else {
        // union-find collects the edges; the initial checkpoint is spent
        val uf = driverUnionFind(cur)
        freeCheckpoint(cur)
        (uf, 0)
      }
    val labels = vertices.select(col(vertices.columns.head).as("id"))
      .join(starEdges.select(col("b").as("id"), col("a").as("_cc")), Seq("id"), "left")
      .select(col("id"), coalesce(col("_cc"), col("id")).as("cluster_id"))
    (labels, rounds)
  }

  /** The driver path's ordering contract: ids whose COLLECTED (external)
    * JVM representation is Comparable. Catalyst-orderable types outside
    * this set — arrays (collect to Seq), structs (Row), binary
    * (Array[Byte]) — pass canonical()'s least/greatest fine but would
    * ClassCastException in driverUnionFind's compareTo, so auto-dispatch
    * routes them to the star rounds regardless of edge count and an
    * explicit Some(false) fails loudly up front instead.
    */
  private def driverOrderable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
          FloatType | DoubleType | StringType | DateType | TimestampType |
          TimestampNTZType => true
      case _: DecimalType => true
      case _ => false
    }
  }

  private def threshold(df: DataFrame): Long = {
    val key = GraftConf.ccDistributedEdgesKey
    df.sparkSession.conf.getOption(key)
      .map(v => scala.util.Try(v.trim.toLong).getOrElse(throw new IllegalArgumentException(
        s"$key must be an edge count in plain digits (got '$v')")))
      .getOrElse(GraftConf.ccDistributedEdgesDefault)
  }

  /** Big regime: alternate large/small star until the set is a union of
    * stars. Returns the star edges (component-min, leaf) + round count.
    */
  private def alternatingStars(edges: DataFrame): (DataFrame, Int) = {
    var cur = edges
    var rounds = 0
    while (!isStarSet(cur)) {
      rounds += 1
      require(rounds <= MaxRounds,
        s"connected components did not converge in $MaxRounds rounds — " +
          "algorithm regression (expected O(log n) alternating-star rounds)")
      val next = Checkpoints.cut(star(star(cur, large = true), large = false))
      // next is eagerly materialized with truncated lineage, so the
      // previous round's blocks are dead — release them now
      freeCheckpoint(cur)
      cur = next
    }
    (cur, rounds)
  }

  /** Unpersist a spent localCheckpoint's RDD blocks (no-op for a
    * reliable checkpoint, whose files the ContextCleaner deletes on
    * RDD GC only when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` — a
    * context-startup conf, shipped in [[graft.GraftConf.contextDefaults]];
    * without it they accumulate for the app lifetime).
    * `Dataset.unpersist`
    * only clears CacheManager entries; a checkpoint's blocks belong to
    * the `LogicalRDD`-wrapped RDD and otherwise live until the
    * ContextCleaner happens to GC it.
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Small regime: path-compressed union-by-min over the collected edge
    * list, returned as a broadcast-sized (component-min, member) frame
    * in the same shape the star rounds converge to. Union-by-min keeps
    * every root the minimum of its set, so find() IS the cluster id;
    * ids compare via their natural Comparable ordering (numeric,
    * string, date — the atomic types [[driverOrderable]] admits;
    * dispatch never routes array/struct/binary ids here because their
    * collected forms don't implement Comparable).
    */
  private def driverUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    @inline def lt(x: Any, y: Any): Boolean =
      x.asInstanceOf[Comparable[Any]].compareTo(y) < 0
    edges.collect().foreach { r =>
      val (ra, rb) = (find(r.get(0)), find(r.get(1)))
      if (ra != rb) {
        if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    val idType = edges.schema("a").dataType
    // keys = exactly the non-minimum members (a union never parents the
    // winning root), i.e. the star leaves; snapshot them before find()
    // path-compresses values mid-iteration
    val rows = parent.keys.toArray.map(k => Row(find(k), k)).toSeq
    val starDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("a", idType), StructField("b", idType))))
    broadcast(starDf)
  }

  /** Canonical undirected form: (min, max) per edge, self-loops dropped,
    * deduplicated — the representation the star-ness probe inspects.
    */
  private def canonical(e: DataFrame): DataFrame =
    e.select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** One star operation over the canonical edge set. With Γ⁺(u) =
    * neighbors of u plus u itself and m(u) = min Γ⁺(u):
    *  - large-star: for every neighbor v > u, emit (v, m(u)) — strictly
    *    larger neighbors re-hook to u's minimum;
    *  - small-star: for every neighbor v ≤ u plus u itself, emit
    *    (v, m(u)) — the small neighborhood collapses onto the minimum.
    * Both preserve connectivity; alternation strictly shrinks tree
    * heights until only stars remain (see the SoCC 2014 proof).
    */
  private def star(e: DataFrame, large: Boolean): DataFrame = {
    // directed both ways so every node sees its full neighborhood
    val sym = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    val mins = sym.groupBy("u").agg(min(col("v")).as("_mn"))
      .select(col("u"), least(col("u"), col("_mn")).as("m"))
    val hooked = sym.join(mins, "u")
    val out =
      if (large) hooked.filter(col("v") > col("u")).select(col("v").as("a"), col("m").as("b"))
      else hooked.filter(col("v") <= col("u")).select(col("v").as("a"), col("m").as("b"))
        .union(mins.select(col("u").as("a"), col("m").as("b")))
    canonical(out)
  }

  /** Fixpoint probe: a canonical edge set is a union of stars iff every
    * leaf (b side) appears in EXACTLY one edge and never as a center
    * (a side) — an empty set qualifies (all-singleton graph). Both
    * conditions matter: a-b disjointness alone misses a leaf shared by
    * two centers (e.g. {(14,25),(16,25)}), which connects the centers
    * and must trigger another round, not exit. One aggregation +
    * limit-1 isEmpty, so the probe costs far less than the wasted no-op
    * round a did-anything-change signature would need.
    */
  private def isStarSet(e: DataFrame): Boolean =
    e.select(col("b").as("x"), lit(1L).as("leaf"))
      .union(e.select(col("a").as("x"), lit(0L).as("leaf")))
      .groupBy("x")
      .agg(sum(col("leaf")).as("leaves"), count(lit(1)).as("degree"))
      .filter(col("leaves") > 1 || (col("leaves") === 1 && col("degree") > 1))
      .isEmpty
}
