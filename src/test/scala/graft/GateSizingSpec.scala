package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path => JPath}

import queries.VectorQueries

/** Recall-targeted gate sizing (r15, VERDICT r14 item 1): the persisted
  * sweep curves now DRIVE the production builds. Both arms pinned:
  *
  *  - planted current curve → the build resolves the cheapest budget
  *    the curve certifies at the target, the index fingerprint moves,
  *    and the dumped oracle SQL interpolates the SAME budget;
  *  - no curve / stale curve / curve that never reaches the target →
  *    the documented static constants, byte-identical oracle SQL to
  *    the static map.
  *
  * Resolution is memoized per JVM (one Verify process must build and
  * dump against the same numbers), so every test clears the cache at
  * its boundaries.
  */
class GateSizingSpec extends AnyFunSuite {

  private def tmpDir(): JPath = Files.createTempDirectory("graft_sizing")

  /** ADVICE r16: `graft.curve.registry` is a JVM-global system
    * property — any test that points it at a temp dir must hold this
    * lock for the whole set→use→clear span, so a parallel suite can
    * never observe (or race another mutation of) the redirected
    * registry mid-test. Shared here because this spec is the only
    * mutator today; a future spec that redirects the registry must
    * synchronize on [[GateSizingSpec.registryPropLock]] too.
    */
  private def withRegistryProp[A](dir: String)(body: => A): A =
    GateSizingSpec.registryPropLock.synchronized {
      System.setProperty("graft.curve.registry", dir)
      try body
      finally System.clearProperty("graft.curve.registry")
    }

  private def touch(p: JPath, mtimeMs: Long): Unit = {
    if (!Files.exists(p)) Files.createFile(p)
    Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
  }

  // sf0.1-shaped curves: P=8 misses 0.70, P=16/24 clear it; mass 0.2
  // misses, 0.35/0.5 clear — so at the default target the resolutions
  // reproduce the production constants (the tuned-corpus identity).
  private val sf01Probe: Seq[VectorQueries.SweepRow] = Seq(
    (8, 713160L, 0.5658, 0.4109, 0.4475),
    (16, 1425810L, 0.7782, 0.7146, 0.65),
    (24, 2138598L, 0.8924, 0.8543, 0.81))
  // sf0.01-shaped curve: P=8 already clears 0.70 → sized build is
  // CHEAPER than the constant.
  private val sf001Probe: Seq[VectorQueries.SweepRow] = Seq(
    (8, 90527L, 0.7376, 0.6304, 0.596),
    (16, 177485L, 0.9452, 0.9348, 0.902))
  private val sf01Mass: Seq[VectorQueries.MassSweepRow] = Seq(
    (0.2, 839988L, 0.6118, 0.4656, 0.4855),
    (0.35, 1440819L, 0.7811, 0.7166, 0.6505),
    (0.5, 2043242L, 0.8812, 0.8381, 0.7945))
  // (r16: the 0.2 row's secondaries sit above GateSecondaryMin — a row
  // that cleared recall15 but collapsed a secondary would no longer
  // certify; that arm has its own test below)
  private val sf001Mass: Seq[VectorQueries.MassSweepRow] = Seq(
    (0.2, 55365L, 0.7052, 0.5672, 0.522),
    (0.35, 92619L, 0.7448, 0.6377, 0.606))

  test("no curve → static constants; oracle matches the static map byte-for-byte") {
    VectorQueries.clearGateSizing()
    val dir = tmpDir().toString
    assert(VectorQueries.resolvedGateProbes(dir) == VectorQueries.GateProbes)
    assert(VectorQueries.resolvedGateMassFrac(dir) == VectorQueries.GateMassFrac)
    val sized = VectorQueries.gateOracle(Some(dir))
    val static = VectorQueries.gateOracle(None)
    assert(sized == static,
      "with no persisted curve the dir-aware oracle must equal the constant arm")
    VectorQueries.clearGateSizing()
  }

  test("planted curve sizes the build: cheaper certified budget, moved fingerprint, matching oracle") {
    VectorQueries.clearGateSizing()
    val dir = tmpDir().toString
    val constantIndex = VectorQueries.gateIndexPath(dir)
    val constantMassIndex = VectorQueries.gateMassIndexPath(dir)
    VectorQueries.clearGateSizing()
    VectorQueries.writeGateSweep(dir, sf001Probe)
    VectorQueries.writeGateMassSweep(dir, sf001Mass)
    // cheapest certified at the 0.70 default: P=8 (0.7376), frac=0.35
    // (0.7448; 0.2's 0.7052 also clears — so 0.2 wins)
    assert(VectorQueries.resolvedGateProbes(dir) == 8)
    assert(VectorQueries.resolvedGateMassFrac(dir) == 0.2)
    // the sized index lives in its own fingerprinted dir — the constant
    // build is orphaned, never served
    assert(VectorQueries.gateIndexPath(dir) != constantIndex)
    assert(VectorQueries.gateMassIndexPath(dir) != constantMassIndex)
    // the dump-time oracle interpolates the SAME resolved budgets
    val sql = VectorQueries.gateOracle(Some(dir))
    assert(sql("qe15b_gated_density").contains("af.rk <= 8"))
    assert(!sql("qe15b_gated_density").contains("af.rk <= 16"))
    assert(sql("qe15c_massgated_density").contains("CAST(0.2 AS DOUBLE)"))
    // the static arm still carries the constants
    val static = VectorQueries.gateOracle(None)
    assert(static("qe15b_gated_density").contains(s"af.rk <= ${VectorQueries.GateProbes}"))
    assert(static("qe15c_massgated_density")
      .contains(s"CAST(${VectorQueries.GateMassFrac} AS DOUBLE)"))
    VectorQueries.clearGateSizing()
  }

  test("tuned-corpus identity: the sf0.1-shaped curve certifies exactly the production constants") {
    VectorQueries.clearGateSizing()
    val dir = tmpDir().toString
    VectorQueries.writeGateSweep(dir, sf01Probe)
    VectorQueries.writeGateMassSweep(dir, sf01Mass)
    assert(VectorQueries.resolvedGateProbes(dir) == VectorQueries.GateProbes,
      "at the default target the committed sf0.1 curve picks P=16 — the constant IS curve-certified there")
    assert(VectorQueries.resolvedGateMassFrac(dir) == VectorQueries.GateMassFrac)
    VectorQueries.clearGateSizing()
  }

  test("a curve that never reaches the target falls back to the constants, not the largest swept budget") {
    VectorQueries.clearGateSizing()
    val dir = tmpDir().toString
    VectorQueries.writeGateSweep(dir,
      Seq((8, 1000L, 0.30, 0.2, 0.2), (16, 2000L, 0.45, 0.3, 0.3)))
    assert(VectorQueries.resolvedGateProbes(dir) == VectorQueries.GateProbes,
      "handing back an uncertified budget would silently miss the target")
    VectorQueries.clearGateSizing()
  }

  test("a budget whose curve row collapses a secondary measure is not certifiable (ADVICE r15)") {
    // the r15 sizing certified recall15 alone, and the sized budget's
    // sweep row then REPLACED the static floors of qe22b/qe25b — the
    // same sweep that picked the budget set the pass criterion for the
    // measures it never certified. Now the certified row must also
    // clear GateSecondaryMin on recall22/agree25; a cheap budget with a
    // collapsed secondary is skipped for the next fully-certified one.
    VectorQueries.clearGateSizing()
    val dir = tmpDir().toString
    VectorQueries.writeGateSweep(dir, Seq(
      (8, 90527L, 0.7376, 0.42, 0.596), // primary certifies, recall22 collapsed
      (16, 177485L, 0.9452, 0.9348, 0.902)))
    VectorQueries.writeGateMassSweep(dir, Seq(
      (0.2, 55365L, 0.7052, 0.5672, 0.43), // agree25 collapsed
      (0.35, 92619L, 0.7448, 0.6377, 0.606)))
    assert(VectorQueries.resolvedGateProbes(dir) == 16,
      "P=8's collapsed recall22 must push sizing to the next certified budget")
    assert(VectorQueries.resolvedGateMassFrac(dir) == 0.35,
      "frac=0.2's collapsed agree25 must push sizing to the next certified fraction")
    VectorQueries.clearGateSizing()
    // and when NO swept budget clears the secondary minimums, the
    // fallback is the constants — same contract as a missed target
    // swept budgets deliberately != GateProbes so the assertion can
    // tell the constants FALLBACK from wrongly certifying a swept row
    val dir2 = tmpDir().toString
    VectorQueries.writeGateSweep(dir2,
      Seq((8, 1000L, 0.95, 0.45, 0.45), (24, 2000L, 0.99, 0.49, 0.48)))
    assert(VectorQueries.resolvedGateProbes(dir2) == VectorQueries.GateProbes)
    VectorQueries.clearGateSizing()
  }

  test("stale curve (corpus regenerated after the sweep) → constants") {
    VectorQueries.clearGateSizing()
    val dirP = tmpDir()
    val dir = dirP.toString
    VectorQueries.writeGateSweep(dir, sf001Probe)
    val sweepF = new java.io.File(VectorQueries.gateSweepPath(dir))
    touch(dirP.resolve("embeddings.parquet"), sweepF.lastModified + 60_000)
    assert(VectorQueries.resolvedGateProbes(dir) == VectorQueries.GateProbes,
      "a curve measured on a replaced corpus may not size the gate")
    VectorQueries.clearGateSizing()
  }

  test("same-tick sweep write is NOT orphaned (ADVICE r14: the write stamps past the corpus)") {
    VectorQueries.clearGateSizing()
    val dirP = tmpDir()
    val dir = dirP.toString
    // corpus written 'now'; the sweep lands in the same mtime tick —
    // without the stamp the strict > guard would discard it
    touch(dirP.resolve("embeddings.parquet"), System.currentTimeMillis())
    VectorQueries.writeGateSweep(dir, sf001Probe)
    assert(VectorQueries.readGateSweep(dir).contains(sf001Probe),
      "a sweep written after measuring this corpus must read as current")
    assert(VectorQueries.resolvedGateProbes(dir) == 8)
    VectorQueries.clearGateSizing()
  }

  test("curve registry: clean-machine resolution (no tmpdir state) equals the committed-curve resolution") {
    // VERDICT r15 item 2: before the registry, `rm -rf /tmp/graft_gate*`
    // silently flipped a sized P=8 build back to the P=16 constant.
    // Both arms of the new contract: (a) with ONLY a committed registry
    // entry the sizing resolves the same budget a tmpdir curve would;
    // (b) the registry entry is content-keyed — a corpus whose bytes
    // changed does not match it.
    VectorQueries.clearGateSizing()
    val dirP = tmpDir()
    val dir = dirP.toString
    Files.write(dirP.resolve("embeddings.parquet"), Array.fill[Byte](1234)(7))
    val reg = tmpDir()
    try withRegistryProp(reg.toString) {
      // publish a curve into the registry ONLY (no tmpdir write)
      val entry = VectorQueries.registryCurveFile("gatesweep", dir)
        .getOrElse(fail("a non-empty corpus must have a registry identity"))
      Files.write(entry.toPath, sf001Probe.map { case (p, n, r15, r22, r25) =>
        s"""{"probes":$p,"cand_rows":$n,"recall15":$r15,"recall22":$r22,"agree25":$r25}"""
      }.mkString("[", ",", "]").getBytes("UTF-8"))
      assert(!new java.io.File(VectorQueries.gateSweepPath(dir)).exists(),
        "precondition: no tmpdir cache for this corpus")
      assert(VectorQueries.readGateSweep(dir).contains(sf001Probe),
        "the committed entry must resolve with zero tmpdir state")
      assert(VectorQueries.resolvedGateProbes(dir) == 8,
        "clean-machine sizing must equal the committed-curve sizing")
      VectorQueries.clearGateSizing()
      // a tmpdir cache of the same (deterministic) measurement resolves
      // identically — cache presence cannot change the answer
      VectorQueries.writeGateSweep(dir, sf001Probe)
      assert(VectorQueries.resolvedGateProbes(dir) == 8)
      VectorQueries.clearGateSizing()
      // content key: grow the corpus → the old entry no longer applies
      Files.write(dirP.resolve("embeddings.parquet"), Array.fill[Byte](5678)(7))
      new java.io.File(VectorQueries.gateSweepPath(dir)).delete()
      assert(VectorQueries.readGateSweep(dir).isEmpty,
        "a registry entry keyed to other bytes must not serve this corpus")
      // ADVICE r16 content key: same TOTAL bytes, different file shape
      // (a second file) — the old bytes-only witness aliased this
      Files.delete(dirP.resolve("embeddings.parquet"))
      Files.createDirectory(dirP.resolve("embeddings.parquet"))
      Files.write(dirP.resolve("embeddings.parquet").resolve("part-0"),
        Array.fill[Byte](1000)(7))
      Files.write(dirP.resolve("embeddings.parquet").resolve("part-1"),
        Array.fill[Byte](234)(7))
      assert(VectorQueries.readGateSweep(dir).isEmpty,
        "equal total bytes with a different file shape must not alias the entry")
    } finally VectorQueries.clearGateSizing()
  }

  test("dispatch rule: megacell fit → mass-budget, balanced fit → fixed-P, K ≤ P → fixed-P") {
    // VERDICT r14 item 2, both arms as pure functions of the home-mass
    // distribution. Balanced K=142 fit: top-16 fraction = 16/142 ≈
    // 0.113 = exactly the balanced model → fixed-P.
    val k = 142
    val p = 16
    assert(!VectorQueries.gateRuleFor(Seq.fill(k)(141L), 141L * k, p, k))
    // the n=20k megacell receipts (gates/r14): top-16 cells hold ~54%
    // of the corpus vs the 11.3% balanced model — ratio ≈ 4.8 → mass
    val mega = Seq.fill(16)(675L) ++ Seq.fill(k - 16)(71L)
    assert(VectorQueries.gateRuleFor(mega, mega.sum, p, k))
    // K ≤ P probes every cell: fixed-P is exact AND cost-capped there
    assert(!VectorQueries.gateRuleFor(Seq.fill(8)(1000L), 8000L, 16, 8))
  }

  test("qe15d auto-dispatch: picks fixed-P on the near-balanced fixture and equals qe15b row-for-row") {
    val spark = SparkSpecBase.spark
    VectorQueries.clearGateSizing()
    val dir = "/root/testdata/sf0.001"
    val auto = VectorQueries.qe15d(spark, dir)
    assert(VectorQueries.gateRuleDecided(dir).contains(false),
      "the tiny near-balanced fixture must dispatch to the fixed-P gate")
    val b = VectorQueries.qe15b(spark, dir)
    assert(auto.collect().toSet == b.collect().toSet)
    // r16 (VERDICT r15 item 4): the corpus-level decision routes ALL
    // three gated families, each with its own oracle-checked receipt
    assert(VectorQueries.qe22d(spark, dir).collect().toSet
      == VectorQueries.qe22b(spark, dir).collect().toSet)
    assert(VectorQueries.qe25d(spark, dir).collect().toSet
      == VectorQueries.qe25b(spark, dir).collect().toSet)
    // and the dump-time oracle mirrors the memoized decision
    val sql = VectorQueries.gateOracle(Some(dir))
    assert(sql("qe15d_autogated_density") == sql("qe15b_gated_density"))
    assert(sql("qe22d_autogated_mutual_nn") == sql("qe22b_gated_mutual_nn"))
    assert(sql("qe25d_autogated_confusion") == sql("qe25b_gated_confusion"))
    VectorQueries.clearGateSizing()
  }

  test("resolution is memoized per JVM: a curve planted after first use is invisible until cleared") {
    VectorQueries.clearGateSizing()
    val dir = tmpDir().toString
    assert(VectorQueries.resolvedGateProbes(dir) == VectorQueries.GateProbes)
    VectorQueries.writeGateSweep(dir, sf001Probe)
    // one Verify process must build and dump against the same numbers
    assert(VectorQueries.resolvedGateProbes(dir) == VectorQueries.GateProbes)
    VectorQueries.clearGateSizing()
    assert(VectorQueries.resolvedGateProbes(dir) == 8)
    VectorQueries.clearGateSizing()
  }

  test("committed registry covers the tested corpora under the CURRENT key scheme (VERDICT r16 item 6)") {
    // Resolves through the REAL gates/curves registry (cwd = repo root
    // under sbt's forked test JVM): the committed entries must exist
    // under whatever key scheme the reader currently computes and must
    // parse with the current reader — a silent key or format drift
    // would quietly revert clean-machine sizing to constants while the
    // registry still LOOKS populated. Fails on zero registry hit for a
    // corpus with a committed curve; fix by re-running CurvePublish.
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val f = VectorQueries.registryCurveFile("gatesweep", dir)
        .getOrElse(fail(s"$dir corpus must have a registry identity"))
      assert(f.exists,
        s"no committed curve at ${f.getPath} — key scheme drifted vs the " +
          "committed entries? re-publish with graft.tools.CurvePublish")
      val rows = VectorQueries.parseSweepRows(
        Files.readString(f.toPath))
      assert(rows.nonEmpty, s"committed curve ${f.getName} must parse with its reader")
    }
  }

  test("a sweep whose corpus changed mid-sweep is refused the freshness stamp (ADVICE r16)") {
    VectorQueries.clearGateSizing()
    val dirP = tmpDir()
    val dir = dirP.toString
    touch(dirP.resolve("embeddings.parquet"), System.currentTimeMillis() - 60_000)
    val srcAtStart = VectorQueries.corpusMtime(dir)
    // the corpus is regenerated while the (long) sweep measures it — a
    // deliberately future mtime so the natural write mtime alone could
    // never accidentally clear the strict-> check: only a (wrongly
    // granted) stamp would read fresh, which is what the test pins
    touch(dirP.resolve("embeddings.parquet"), System.currentTimeMillis() + 5_000)
    VectorQueries.writeGateSweep(dir, sf001Probe, srcAtStart)
    assert(VectorQueries.readGateSweep(dir).isEmpty,
      "a curve measured across a corpus regeneration must read stale")
    assert(VectorQueries.resolvedGateProbes(dir) == VectorQueries.GateProbes)
    VectorQueries.clearGateSizing()
  }
}

object GateSizingSpec {
  /** Guards every set/clear of the JVM-global `graft.curve.registry`
    * system property across suites (ADVICE r16).
    */
  val registryPropLock = new Object
}
