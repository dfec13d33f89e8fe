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
