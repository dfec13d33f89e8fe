package graft

import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.GraftExtensions` entry point: a
  * pure-SQL consumer (spark-sql shell, Thrift/Connect server) gets
  * every graft native function with zero driver-side registration.
  */
class ExtensionsSpec extends AnyFunSuite {
  import SparkSpecBase.spark

  test("injected functions resolve from pure SQL in a cloned session (no registerNative)") {
    // newSession() clears temp functions but keeps injected extensions:
    // this resolving proves the functions arrived via the extension
    // hook, not via a registerNative() call somewhere in the suite
    val s2 = spark.newSession()
    val dot = s2.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D))")
      .head().getDouble(0)
    assert(dot == 32.0, s"graft_dot via injected registration returned $dot")
    val ng = s2.sql(
      "SELECT graft_word_ngrams(array('a','b','c'), 2)")
      .head().getSeq[String](0)
    assert(ng == Seq("a b", "b c"), s"graft_word_ngrams returned $ng")
  }

  test("integral literals coerce across INT/BIGINT (ADVICE r13: the natural SQL spelling works)") {
    val s2 = spark.newSession()
    // k as INT literal where the expression takes Int, seed as INT
    // literal where it takes Long — the natural spelling a SQL user
    // writes; pre-r14 this threw ClassCastException from asInstanceOf
    val mh = s2.sql(
      "SELECT graft_minhash(array(7L, 11L), 4, 42) AS sig").head().getSeq[Long](0)
    assert(mh.length == 4, s"graft_minhash with bare INT k/seed returned $mh")
    // and the reverse: BIGINT literals where Int params are expected
    val mh2 = s2.sql(
      "SELECT graft_minhash(array(7L, 11L), 4L, 42L) AS sig").head().getSeq[Long](0)
    assert(mh2 == mh, "BIGINT-literal spelling must produce the identical signature")
    // non-integral literal still fails with the argument position named
    val err = intercept[Exception] {
      s2.sql("SELECT graft_minhash(array(7L), 'four', 42)").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).map(_.getMessage).filter(_ != null)
      .exists(m => m.contains("argument 1") && m.contains("integral")),
      s"expected the integral-literal error, got: $err")
    // review r14: a FRACTIONAL double literal must fail the same way,
    // never silently truncate to its integer part (seed 42.5 -> 42
    // would run the wrong signature with no error)
    val frac = intercept[Exception] {
      s2.sql("SELECT graft_minhash(array(7L), 4, CAST(42.5 AS DOUBLE))").collect()
    }
    assert(chain(frac).map(_.getMessage).filter(_ != null)
      .exists(m => m.contains("argument 2") && m.contains("integral")),
      s"expected the integral-literal error for a fractional double, got: $frac")
  }

  test("injected builders keep the literal-argument guard") {
    val s2 = spark.newSession()
    val err = intercept[Exception] {
      // non-foldable second arg (a column ref) must fail resolution
      // with the clear literal-contract message, not a deep CCE/NPE
      s2.sql("SELECT graft_minhash(array('x'), id, 42L) FROM range(1)")
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(_.getMessage != null) &&
      chain(err).map(_.getMessage).filter(_ != null)
        .exists(_.contains("must be a literal")),
      s"expected the literal-contract error, got: $err")
  }
}
