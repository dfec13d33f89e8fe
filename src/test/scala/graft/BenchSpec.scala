package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's failure/timing contract (VERDICT r6 item 2: a
  * planted failing query must trip the gate, not read as a fast one).
  * The downstream half — tools/benchdiff.py failing on a non-empty
  * "errors" list and parsing the driver's truncated wrappers — is
  * covered by its own `--selftest`.
  */
class BenchSpec extends AnyFunSuite {

  test("a planted failing query lands in errors, others still time") {
    val (results, errors) = Bench.timeQueries(Seq(
      "q_ok" -> (() => ()),
      "q_bad" -> (() => throw new RuntimeException("boom")),
      "q_ok2" -> (() => ())), reps = 2)
    assert(errors == Seq("q_bad"))
    assert(results.map(_._1) == Seq("q_ok", "q_bad", "q_ok2"))
    assert(results.forall(_._2 >= 0.0), "failed query must still report elapsed time")
  }

  test("a failing query stops retrying after the first failure") {
    var calls = 0
    val (_, errors) = Bench.timeQueries(Seq(
      "q_bad" -> (() => { calls += 1; throw new RuntimeException("boom") })), reps = 3)
    assert(errors == Seq("q_bad"))
    assert(calls == 1, "no point re-running a broken query")
  }

  test("min-of-reps reports the fastest rep") {
    var n = 0
    val (results, errors) = Bench.timeQueries(Seq(
      // first rep sleeps, second returns immediately: min must be well
      // under the slow rep
      "q" -> (() => { n += 1; if (n == 1) Thread.sleep(200) })), reps = 2)
    assert(errors.isEmpty)
    assert(n == 2)
    assert(results.head._2 < 0.15, s"min-of-reps should drop the 200ms first rep: ${results.head._2}")
  }

  test("renderLine emits the driver-contract JSON with errors visible") {
    val line = Bench.renderLine(
      Seq("q1" -> 1.5, "q2" -> 0.25), Seq("q2"), "/root/testdata/sf0.1")
    assert(line.startsWith("""{"metric":"total","value":1.750,"""))
    assert(line.contains(""""queries":{"q1":1.5,"q2":0.25}"""))
    assert(line.contains(""""errors":["q2"]"""))
    // standard sfN dir → bare scale factor (the ~20 chars matter, see
    // the renderLine length budget)
    assert(line.endsWith(""""sf":0.1}"""))
    // the gate's wrapper parser must read this exact shape
    assert(line.contains(""""errors":[]""") == false)
    val empty = Bench.renderLine(Seq("q1" -> 1.0), Seq.empty, "/x")
    assert(empty.contains(""""errors":[]"""))
    // non-sfN dirs keep the quoted path
    assert(empty.endsWith(""""sf":"/x"}"""))
  }

  test("renderLine carries the [start, end] load averages when sampled") {
    // r14: the contention datum that adjudicates driver-artifact
    // regression clusters rides inside the artifact itself; absent
    // loads render the r13-and-earlier line byte-for-byte
    val line = Bench.renderLine(
      Seq("q1" -> 1.0), Seq.empty, "/root/testdata/sf0.1", Seq(0.1, 27.42))
    assert(line.contains(""""errors":[],"load":[0.1,27.4],"sf":0.1}"""))
    val without = Bench.renderLine(Seq("q1" -> 1.0), Seq.empty, "/x")
    assert(!without.contains("load"))
  }

  test("a hot-start take self-flags with load_warn; the END sample alone does not (it includes the bench's own load)") {
    // VERDICT r16 item 4: three rounds of driver artifacts started hot
    // and each cost an adjudication cycle — the verdict now rides in
    // the artifact. Threshold pinned so a silent change re-opens this.
    val hot = Bench.renderLine(
      Seq("q1" -> 1.0), Seq.empty, "/root/testdata/sf0.1", Seq(6.8, 3.8))
    assert(hot.contains(""""load":[6.8,3.8],"load_warn":"start 6.8 > 3"""),
      s"hot start must self-flag: $hot")
    // the line must stay machine-parseable JSON with the flag present
    assert(hot.matches("""\{.*"load_warn":"[^"]*".*\}"""))
    val endOnly = Bench.renderLine(
      Seq("q1" -> 1.0), Seq.empty, "/x", Seq(0.1, 27.4))
    assert(!endOnly.contains("load_warn"))
    assert(Bench.LoadWarnThreshold == 3.0)
    // r17: the machine canary rides next to the loads — two artifacts'
    // canary ratio is the residue-class signal 1-min load cannot see
    val withCanary = Bench.renderLine(
      Seq("q1" -> 1.0), Seq.empty, "/x", Seq(0.1, 0.2), Some(0.517))
    assert(withCanary.contains(""""load":[0.1,0.2],"canary":0.52,"""),
      s"canary must render at centiseconds: $withCanary")
  }

  test("full-precision doubles are rendered at fixed precision, zeros stripped") {
    val line = Bench.renderLine(
      Seq("q1" -> 0.552002599, "q2" -> 12.0000001, "q3" -> 0.6), Seq.empty, "/x")
    assert(line.contains(""""q1":0.55"""))
    // trailing zeros stripped: "12.00" -> "12", "0.60" -> "0.6" — still
    // valid JSON numbers, and the chars fund suite growth
    assert(line.contains(""""q2":12,"""))
    assert(line.contains(""""q3":0.6}"""))
    assert(line.contains(""""value":13.152"""))
  }

  test("an oversized suite degrades to decisecond values instead of truncating") {
    // 85 queries with typical 15-char names, every one at the 9.99 s
    // worst case: 2dp exceeds the tail budget, 1dp ("10") fits — the
    // renderer must degrade, not truncate. (Names dominate the line;
    // rendering buys roughly a dozen queries of headroom, so a suite
    // far past this needs shorter names — the real-suite test below
    // fails first.)
    val names = (1 to 85).map(i => f"qx${i}%02d_abcdefghij")
    val line = Bench.renderLine(names.map(_ -> 9.99), Seq.empty, "/x")
    assert(line.length <= Bench.LineBudget,
      s"degraded line still ${line.length} chars")
    assert(line.contains(""":10,"""), "1dp fallback not applied")
    // and the JSON stays parseable with every query present
    assert(names.forall(n => line.contains("\"" + n + "\":")))
  }

  test("the real suite's rendered line fits the driver's 2000-char tail capture") {
    // the driver wrapper keeps the LAST 2000 chars of stdout and sbt
    // appends ~75 chars of "[success] Total time…" after our line;
    // BENCH_r01–r07 all exceeded that and landed as "parsed": null.
    // Render the actual suite at the realistic worst case — EVERY query
    // at 9.99 s ("9.99", 4 chars; today's slowest single query is ~4 s
    // and the whole-suite mean is ~0.7 s, so all-queries-at-10s is
    // already a catastrophically failed round). Even if some query does
    // blow past 10 s, only the line's HEAD (metric/value) is cut, which
    // benchdiff's salvage extractors parse.
    // Envelope derivation lives at Bench.LineBudget; renderLine
    // auto-degrades precision, so this asserts the DEGRADED bound too
    val names = SparkEntry.queries.keys.toSeq.sorted
    val line = Bench.renderLine(
      names.map(_ -> 9.99), Seq.empty, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget,
      s"bench line is ${line.length} chars — the driver tail capture will " +
        "truncate it again; shorten new query names or the rendering")
    // every query must be present under SOME rendering of its name
    // (full or id prefix — r9 crossed into the id regime at 86 queries)
    assert(names.forall(n => line.contains("\"" + n + "\":")
      || line.contains("\"" + Bench.idOf(n) + "\":")))
  }

  test("query-name id prefixes are unique — the id render regime and benchdiff normalization depend on it") {
    val names = SparkEntry.queries.keys.toSeq
    val ids = names.map(Bench.idOf)
    val dup = ids.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dup.isEmpty, s"duplicate query id prefixes: ${dup.mkString(",")} — " +
      "id-rendered bench lines and benchdiff's name normalization would collide")
  }
}
