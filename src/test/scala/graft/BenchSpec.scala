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
    assert(line.startsWith("""{"metric":"total","value":1.75,"""))
    assert(line.contains(""""queries":{"q1":1.5,"q2":0.25}"""))
    assert(line.contains(""""errors":["q2"]"""))
    // the gate's wrapper parser must read this exact shape
    assert(line.contains(""""errors":[]""") == false)
    val empty = Bench.renderLine(Seq("q1" -> 1.0), Seq.empty, "/x")
    assert(empty.contains(""""errors":[]"""))
  }
}
