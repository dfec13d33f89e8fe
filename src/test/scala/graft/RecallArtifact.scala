package graft

import java.nio.file.{Files, Path}

/** RECALL.json read/merge/render (VERDICT r16 item 1): the artifact
  * writer used to rebuild the whole file from the CURRENT run's
  * in-memory results and only assert completeness AFTER writing — so a
  * partial or interrupted RecallSpec run (a driver-side subset run did
  * exactly this in round 16) replaced the committed 20+20-entry
  * artifact with whatever it had measured before dying. The fix is
  * merge-by-key: entries measured THIS run overwrite their on-disk
  * twins, every other committed entry survives verbatim, and keys no
  * floor defines any more are dropped (a renamed operator must not
  * linger forever). Writing is therefore lossless regardless of how
  * the run was interrupted, and the completeness asserts can stay
  * after the write where they flag partial runs without destroying
  * anything.
  *
  * Keys are (sf label, operator name). Entry bodies are kept as the
  * rendered JSON fragments ({"recall": …, "floor": …, "exact_twin":
  * "…"}) — the merge never needs the numbers, only the identity.
  * Output is deterministic: sfs in the given order, entries sorted by
  * name within each sf.
  */
object RecallArtifact {

  private val SfHdr = """^\s*"(sf[0-9.]+)":\s*\{\s*$""".r
  private val Entry = """^\s*"([A-Za-z0-9_]+)":\s*(\{"recall":[^}]*\}),?\s*$""".r

  /** (sf, name) → rendered entry body. Lenient: anything that doesn't
    * match the line grammar is skipped (a corrupt on-disk artifact
    * degrades to "merge with nothing", never to a crash that blocks
    * writing the current measurements).
    */
  def parse(text: String): Map[(String, String), String] = {
    var sf = ""
    val out = scala.collection.mutable.LinkedHashMap[(String, String), String]()
    text.linesIterator.foreach {
      case SfHdr(s)                         => sf = s
      case Entry(name, body) if sf.nonEmpty => out((sf, name)) = body
      case _                                => ()
    }
    out.toMap
  }

  def render(entries: Map[(String, String), String], sfOrder: Seq[String]): String = {
    val bySf = sfOrder.filter(s => entries.keys.exists(_._1 == s)).map { s =>
      val body = entries.toSeq.collect { case ((`s`, n), b) => s""""$n": $b""" }
        .sorted.mkString(",\n    ")
      s""""$s": {\n    $body\n  }"""
    }
    "{\n  " + bySf.mkString(",\n  ") + "\n}\n"
  }

  /** The merged artifact text: on-disk entries (when the file exists
    * and parses), overlaid with `current`, filtered to `keep`.
    */
  def mergedText(path: Path, current: Map[(String, String), String],
      keep: ((String, String)) => Boolean, sfOrder: Seq[String]): String = {
    val onDisk =
      if (Files.exists(path))
        try parse(Files.readString(path))
        catch { case _: Exception => Map.empty[(String, String), String] }
      else Map.empty[(String, String), String]
    render((onDisk ++ current).filter(e => keep(e._1)), sfOrder)
  }
}
