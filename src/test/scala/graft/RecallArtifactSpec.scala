package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The RECALL.json clobber regression (VERDICT r16 item 1): a partial
  * run merged against a planted full artifact must refresh only what it
  * measured — every other committed entry survives byte-identical.
  */
class RecallArtifactSpec extends AnyFunSuite {

  private val sfOrder = Seq("sf0.01", "sf0.1")

  private def planted: Map[(String, String), String] = (for {
    sf <- sfOrder
    op <- Seq("qe2_ann_lsh", "qd6_minhash_lsh", "qe14_pq_ann")
  } yield (sf, op) ->
    s"""{"recall": 0.9100, "floor": 0.70, "exact_twin": "planted $sf $op"}""").toMap

  test("a single-entry partial run preserves every other planted entry") {
    val f = Files.createTempFile("recall_artifact", ".json")
    Files.writeString(f, RecallArtifact.render(planted, sfOrder))
    // the partial run measured ONE entry (fresh value) and died
    val partial = Map(("sf0.1", "qe14_pq_ann") ->
      """{"recall": 0.6200, "floor": 0.40, "exact_twin": "fresh measurement"}""")
    val merged = RecallArtifact.parse(
      RecallArtifact.mergedText(f, partial, _ => true, sfOrder))
    assert(merged.size == planted.size, "no entry may be lost to a partial run")
    assert(merged(("sf0.1", "qe14_pq_ann")).contains("fresh measurement"),
      "the measured entry must be refreshed")
    (planted - (("sf0.1", "qe14_pq_ann"))).foreach { case (k, body) =>
      assert(merged(k) == body, s"unmeasured entry $k must survive verbatim")
    }
    Files.delete(f)
  }

  test("keys no floor defines are dropped; render is deterministic and round-trips") {
    val withStale = planted + (("sf0.01", "qe99_renamed_away") ->
      """{"recall": 1.0000, "floor": 1.00, "exact_twin": "stale"}""")
    val f = Files.createTempFile("recall_artifact", ".json")
    Files.writeString(f, RecallArtifact.render(withStale, sfOrder))
    val text = RecallArtifact.mergedText(f, Map.empty, planted.contains, sfOrder)
    assert(RecallArtifact.parse(text) == planted)
    assert(text == RecallArtifact.render(planted, sfOrder), "render must be canonical")
    // a missing or corrupt on-disk file degrades to "merge with nothing"
    Files.writeString(f, "{ not json")
    assert(RecallArtifact.parse(
      RecallArtifact.mergedText(f, planted, _ => true, sfOrder)) == planted)
    Files.delete(f)
    assert(RecallArtifact.parse(
      RecallArtifact.mergedText(f, planted, _ => true, sfOrder)) == planted)
  }

  test("the committed RECALL.json parses with the merge reader") {
    // guards the reader against format drift in the file the spec
    // actually maintains — if this fails, the merge would silently
    // treat the committed artifact as empty and a partial run WOULD
    // clobber it again
    val p = java.nio.file.Paths.get("/root/repo/RECALL.json")
    val entries = RecallArtifact.parse(Files.readString(p))
    assert(entries.nonEmpty, "committed RECALL.json must parse")
    assert(sfOrder.forall(s => entries.keys.exists(_._1 == s)),
      "both measured sfs must be present")
  }
}
