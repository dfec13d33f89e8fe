package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Filesystem probes resolved through the Hadoop `FileSystem` API — the
  * ONE place batch (qd6b / qe5b index staleness) and streaming
  * (TextStreaming / VectorStreaming history listing) answer "is this
  * artifact there, and how fresh is it".
  *
  * Why not `java.io.File`: persisted indexes and streaming state take
  * arbitrary path strings, which on a cluster name HDFS/S3 locations.
  * `File.exists` is always false and `File.lastModified` is 0 for
  * those, so a local-only probe silently rebuilds a persisted index on
  * every query (forfeiting the entire point of the offline artifact) or
  * disables cross-batch dedup. Resolving each path through
  * `Path.getFileSystem(conf)` gives the same one-RPC probe on every
  * filesystem Spark can read.
  */
object HadoopFs {

  private def fsOf(conf: Configuration, p: Path): FileSystem = p.getFileSystem(conf)

  /** Modification time of `path` itself, 0 if absent. The exists /
    * getFileStatus pair can race a concurrent delete — a path that
    * vanishes between the two calls IS absent, so FNF maps to 0L
    * rather than failing the probe (ADVICE r6).
    */
  def mtimeOf(conf: Configuration, path: String): Long = {
    val p = new Path(path)
    val fs = fsOf(conf, p)
    try if (fs.exists(p)) fs.getFileStatus(p).getModificationTime else 0L
    catch { case _: java.io.FileNotFoundException => 0L }
  }

  /** Newest modification time under `path`: the path itself or any
    * DESCENDANT file, recursively (a parquet dataset's freshness lives
    * in its part files — which a Hive-partitioned layout nests under
    * partition subdirs, and object stores don't bump "directory" mtimes
    * on overwrite, so every leaf file must be consulted). 0 if absent.
    */
  def newestMtime(conf: Configuration, path: String): Long = {
    val p = new Path(path)
    val fs = fsOf(conf, p)
    if (!fs.exists(p)) 0L
    else
      // the FNF guard covers the WHOLE post-exists probe (getFileStatus
      // + recursive listing, ADVICE r6): a path or part file deleted
      // after exists() returned true means "the source is changing
      // right now", which must read as maximally fresh (forcing an
      // index rebuild), not as a query failure
      try {
        val st = fs.getFileStatus(p)
        if (!st.isDirectory) st.getModificationTime
        else {
          var m = st.getModificationTime
          val it = fs.listFiles(p, true) // recursive: leaf files only
          while (it.hasNext) m = math.max(m, it.next().getModificationTime)
          m
        }
      } catch {
        case _: java.io.FileNotFoundException => Long.MaxValue
      }
  }

  /** Direct children of `path` as fully-qualified path strings; empty
    * if the path is absent or not a directory.
    */
  def listChildren(conf: Configuration, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = fsOf(conf, p)
    // same exists/getFileStatus/list race as mtimeOf: a directory
    // deleted mid-probe is an absent directory, not a failure
    try if (fs.exists(p) && fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).map(_.getPath.toString).toIndexedSeq
    else Seq.empty
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  /** Parameter-fingerprinted tmpdir location for a persisted index
    * family (ADVICE r12): the directory name embeds a hash of every
    * BUILD parameter, so a code/parameter change can never silently
    * serve an artifact built by an older configuration —
    * [[indexStale]]'s mtime check only protects against SOURCE changes,
    * not against the builder itself changing. Distinct
    * parameterizations get distinct directories (they coexist; the
    * orphaned one ages out with the tmpdir). Concurrent writers of the
    * SAME parameterization still share a path — acceptable because the
    * build is deterministic (both produce identical bytes) and the
    * `_SUCCESS`-last commit means a reader never sees a torn write as
    * fresh.
    */
  /** The parameter fingerprint [[indexPath]] embeds — exposed so the
    * curve REGISTRY (r16) can key committed artifacts by the same
    * build-parameter identity the tmpdir cache uses.
    */
  def paramFingerprint(params: Any*): String =
    (scala.util.hashing.MurmurHash3.stringHash(
      params.mkString("|")) & 0x7fffffff).toHexString

  /** The slug a data dir contributes to cache/registry names — shared
    * by [[indexPath]] and the curve registry so the two key the same
    * corpus identically (review r16). Normalized first: a trailing
    * slash or redundant `.` segment must not silently derail a lookup
    * onto a different name (for already-clean absolute paths the
    * normalization is the identity, so existing artifact names are
    * unchanged).
    */
  def dirSlug(dir: String): String = {
    // ADVICE r16: Paths.get collapses the "//" in URI-style dirs
    // (hdfs://, s3a://), which would shift their slug vs the pre-r16
    // raw form and orphan existing registry/cache entries for remote
    // roots — only scheme-less local paths get path-normalized (where
    // normalization of an already-clean path is the identity)
    val norm =
      if (dir.contains("://")) dir
      else java.nio.file.Paths.get(dir).normalize.toString
    norm.replaceAll("[^A-Za-z0-9]", "_")
  }

  def indexPath(family: String, dir: String, params: Any*): String = {
    val fp = paramFingerprint(params: _*)
    s"${sys.props("java.io.tmpdir")}/graft_${family}_${fp}_${dirSlug(dir)}"
  }

  /** Content fingerprint the curve registry keys corpora by
    * (`<totalBytes>b<fileCount>f<maxFileBytes>`): a checkout's mtimes
    * are meaningless (git stamps them at checkout time), so committed
    * curves can't use the tmpdir cache's mtime staleness rule — file
    * sizes are the cheap content witness. ADVICE r16: total bytes
    * ALONE let a corpus regenerated in place with coincidentally equal
    * totals silently serve the old committed curve (same-shape parquet
    * totals differ by only a few bytes of compression noise); the file
    * count and the largest file's exact size now have to collide too.
    * None for an absent/empty corpus — no content, no identity.
    */
  def contentKey(conf: Configuration, path: String): Option[String] = {
    val p = new Path(path)
    val fs = fsOf(conf, p)
    try {
      if (!fs.exists(p)) None
      else {
        val it = fs.listFiles(p, true)
        var sum = 0L
        var n = 0L
        var mx = 0L
        while (it.hasNext) {
          val len = it.next().getLen
          sum += len
          n += 1
          mx = math.max(mx, len)
        }
        if (sum == 0L) None else Some(s"${sum}b${n}f$mx")
      }
    } catch { case _: java.io.FileNotFoundException => None }
  }

  /** True when a persisted index at `indexDir` is missing or NOT NEWER
    * than its source data — the rebuild trigger for qd6b / qe5b
    * artifacts (a stale index keyed only by path must not silently
    * serve signatures of a replaced source table). The index's
    * freshness witness is its `_SUCCESS` marker (written last by the
    * committer); the source's is the newest file under it. A TIE
    * rebuilds: filesystem mtime granularity can be a full second
    * (object stores, some NFS), so "same tick" cannot distinguish
    * index-after-source from source-after-index — and a spurious
    * rebuild is cheap where serving a stale index is not.
    */
  def indexStale(conf: Configuration, indexDir: String, sourcePath: String): Boolean = {
    val successM = mtimeOf(conf, s"$indexDir/_SUCCESS")
    successM == 0L || successM <= newestMtime(conf, sourcePath)
  }
}
