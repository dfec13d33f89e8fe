package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path => JPath}

/** Probe semantics for sources.HadoopFs — the one place index staleness
  * (qd6b/qe5b) and streaming history listing answer "is it there, is it
  * fresh". Local-FS backed (the FileSystem API is the same object
  * stores resolve through).
  */
class HadoopFsSpec extends AnyFunSuite {
  import SparkSpecBase.spark
  private def conf = spark.sparkContext.hadoopConfiguration

  private def tmpDir(): JPath = Files.createTempDirectory("graft_fs")

  private def touch(p: JPath, mtimeMs: Long): Unit = {
    if (!Files.exists(p)) Files.createFile(p)
    Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
  }

  test("newestMtime sees files nested under partition subdirs") {
    val d = tmpDir()
    val base = 1_700_000_000_000L
    touch(d.resolve("a.parquet"), base)
    val part = Files.createDirectories(d.resolve("ds=2024-01-02"))
    touch(part.resolve("part-0.parquet"), base + 60_000)
    // the newest file is NOT a direct child — a Hive-partitioned rewrite
    // on an object store bumps only the leaf, never the parent "dir"
    Files.setLastModifiedTime(part,
      java.nio.file.attribute.FileTime.fromMillis(base))
    Files.setLastModifiedTime(d,
      java.nio.file.attribute.FileTime.fromMillis(base))
    assert(sources.HadoopFs.newestMtime(conf, d.toString) == base + 60_000)
  }

  test("indexStale: missing, older and SAME-TICK indexes rebuild; newer serves") {
    val src = tmpDir()
    val idx = tmpDir()
    val base = 1_700_000_000_000L
    touch(src.resolve("data.parquet"), base)
    Files.setLastModifiedTime(src,
      java.nio.file.attribute.FileTime.fromMillis(base))
    // missing _SUCCESS → stale
    assert(sources.HadoopFs.indexStale(conf, idx.toString, src.toString))
    // index older than source → stale
    touch(idx.resolve("_SUCCESS"), base - 1)
    assert(sources.HadoopFs.indexStale(conf, idx.toString, src.toString))
    // SAME mtime tick → stale (coarse-granularity filesystems cannot
    // order same-tick writes; a spurious rebuild beats a stale serve)
    touch(idx.resolve("_SUCCESS"), base)
    assert(sources.HadoopFs.indexStale(conf, idx.toString, src.toString))
    // strictly newer → fresh
    touch(idx.resolve("_SUCCESS"), base + 1)
    assert(!sources.HadoopFs.indexStale(conf, idx.toString, src.toString))
  }

  test("gate sweep curve round-trips through _sweep.json in the fingerprinted index dir") {
    // VERDICT r13 item 8: the measured probes→recall table persists
    // alongside the index it sizes; the path is a pure function of the
    // data dir + gate parameters, so a parameter change orphans the
    // old curve instead of serving it
    val dir = tmpDir().toString
    val rows: Seq[graft.queries.VectorQueries.SweepRow] = Seq(
      (8, 713000L, 0.57, 0.41, 0.45), (16, 1430000L, 0.7782, 0.7146, 0.65))
    assert(graft.queries.VectorQueries.readGateSweep(dir).isEmpty)
    graft.queries.VectorQueries.writeGateSweep(dir, rows)
    assert(graft.queries.VectorQueries.gateSweepPath(dir)
      .startsWith(graft.queries.VectorQueries.gateIndexPath(dir)))
    assert(graft.queries.VectorQueries.readGateSweep(dir).contains(rows))
  }
}
