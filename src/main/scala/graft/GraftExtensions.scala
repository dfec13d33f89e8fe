package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: make every graft native expression a
  * first-class SQL function at session BUILD time —
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * — so a pure-SQL consumer (spark-sql shell, Thrift/Connect server, a
  * notebook that never touches the Scala API) can call `graft_dot`,
  * `graft_minhash`, … without any driver-side registration call. The
  * library's own query builders keep calling
  * [[graft.functions.VectorFunctions.registerNative]] (idempotent, and
  * correct on vanilla sessions); this class is the same registration
  * routed through Spark's sanctioned extension-injection hook, which
  * survives session cloning (`newSession()`) where a temp-function
  * registration must be re-applied.
  *
  * Only `injectFunction` is used deliberately: the engine's operators
  * are declarative DataFrame plans that Catalyst already optimizes —
  * there is no custom Rule/Strategy to inject, and that is a feature,
  * not a gap (the plans stay inside whole-stage codegen and AQE).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}

object GraftExtensions {

  /** One shared registration table — [[GraftExtensions]] (extension
    * injection) and `VectorFunctions.registerNative` (per-session temp
    * registration) both read it, so the two paths can never drift.
    */
  private[graft] val registrations: Seq[(String, String, Seq[Expression] => Expression)] =
    Seq(
      ("graft_dot",
        "_FUNC_(a, b) - sequential-sum dot product of two double arrays",
        exprs => graft.functions.expr.DotProduct(exprs(0), exprs(1))),
      ("graft_centroid_dists",
        "_FUNC_(v, cents, ids, norms, dim) - (rounded squared-L2, cid) structs vs constant centroids",
        exprs => graft.functions.expr.CentroidDistances(exprs(0),
          litArg("graft_centroid_dists", 1, exprs)
            .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray(),
          litArg("graft_centroid_dists", 2, exprs)
            .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray(),
          litArg("graft_centroid_dists", 3, exprs)
            .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray(),
          litInt("graft_centroid_dists", 4, exprs))),
      ("graft_word_ngrams",
        "_FUNC_(tokens, n) - space-joined word n-grams",
        exprs => graft.functions.expr.WordNGrams(exprs(0), exprs(1))),
      ("graft_minhash",
        "_FUNC_(gram_hashes, k, seed) - k-component affine MinHash signature over PRE-HASHED int64 grams (ARRAY<BIGINT>; base hash = first 60 bits of md5(gram) mod 2305843009213693951 - see TextFunctions.shingleHash31)",
        exprs => graft.functions.expr.MinHashAffine(exprs(0),
          litInt("graft_minhash", 1, exprs),
          litLong("graft_minhash", 2, exprs))),
      ("graft_simhash",
        "_FUNC_(token_hashes) - 64-bit SimHash fingerprint over PRE-HASHED int64 tokens (ARRAY<BIGINT>; base hash = first 60 bits of md5(token) - see TextFunctions.tokenHash)",
        exprs => graft.functions.expr.SimHashBits(exprs(0))),
      ("graft_lsh_buckets",
        "_FUNC_(vec, bands, r, dim, seed) - banded sign-LSH bucket ids",
        exprs => graft.functions.expr.LshBandBuckets(exprs(0),
          litInt("graft_lsh_buckets", 1, exprs),
          litInt("graft_lsh_buckets", 2, exprs),
          litInt("graft_lsh_buckets", 3, exprs),
          litLong("graft_lsh_buckets", 4, exprs))),
      ("graft_bloom_any",
        "_FUNC_(grams, filter_bytes) - true when any gram is (probably) in the Bloom filter",
        exprs => graft.functions.expr.BloomAnyContain(exprs(0),
          litArg("graft_bloom_any", 1, exprs).asInstanceOf[Array[Byte]])),
      ("graft_pq_encode",
        "_FUNC_(vec, codebook, m, ks) - per-subspace nearest-centroid PQ codes",
        exprs => graft.functions.expr.PqEncode(exprs(0),
          litArg("graft_pq_encode", 1, exprs)
            .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray(),
          litInt("graft_pq_encode", 2, exprs),
          litInt("graft_pq_encode", 3, exprs))),
      ("graft_cms_estimate",
        "_FUNC_(key, sketch_bytes) - Count-Min upper-bound frequency estimate",
        exprs => graft.functions.expr.CmsEstimate(exprs(0),
          litArg("graft_cms_estimate", 1, exprs).asInstanceOf[Array[Byte]])),
    )

  /** Resolution-time literal extraction (shared with registerNative's
    * contract): constant index-state args must be foldable, non-null.
    */
  private def litArg(fn: String, pos: Int, exprs: Seq[Expression]): Any = {
    val e = exprs(pos)
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument $pos must be a literal/foldable expression " +
          s"(constant index state), got non-foldable ${e.sql}")
    val v = e.eval()
    if (v == null)
      throw new IllegalArgumentException(s"$fn: argument $pos must not be null")
    v
  }

  /** Integral-literal coercion (ADVICE r13): a pure-SQL caller writes
    * the natural `graft_minhash(h, 64, 42)` — an INT literal where the
    * expression takes a Long (or BIGINT where it takes an Int). A raw
    * asInstanceOf would throw ClassCastException instead of either
    * working or the friendly litArg contract error, so coerce any
    * integral Number; anything else (string, decimal, interval) still
    * fails with the argument position named.
    */
  /** Integral Number types only: a bare `case n: Number => n.longValue()`
    * would silently TRUNCATE a fractional DOUBLE literal (`42.5` → seed
    * 42) and map a NaN to 0 — wrong signatures with no error, the
    * opposite of this helper's contract (review r14).
    */
  private def integral(v: Any): Option[Long] = v match {
    case n: java.lang.Byte => Some(n.longValue())
    case n: java.lang.Short => Some(n.longValue())
    case n: java.lang.Integer => Some(n.longValue())
    case n: java.lang.Long => Some(n.longValue())
    case _ => None
  }

  private def litLong(fn: String, pos: Int, exprs: Seq[Expression]): Long =
    integral(litArg(fn, pos, exprs)).getOrElse(throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integral literal, got ${exprs(pos).sql}"))

  private def litInt(fn: String, pos: Int, exprs: Seq[Expression]): Int =
    integral(litArg(fn, pos, exprs)).filter(_.isValidInt).map(_.toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"$fn: argument $pos must be an INT-range integral literal, got ${exprs(pos).sql}"))
}
