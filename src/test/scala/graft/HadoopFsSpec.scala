package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Cache/registry identity helpers (sources.HadoopFs): the slug and
  * content key TOGETHER name committed curve-registry entries, so a
  * silent change to either orphans every committed measurement — pin
  * the exact renderings.
  */
class HadoopFsSpec extends AnyFunSuite {
  import graft.sources.HadoopFs

  test("dirSlug: clean local paths normalize; URI-style dirs keep their raw slug (ADVICE r16)") {
    assert(HadoopFs.dirSlug("/root/testdata/sf0.01") == "_root_testdata_sf0_01")
    // normalization is identity-preserving noise removal for local paths
    assert(HadoopFs.dirSlug("/root/testdata/./sf0.01/") ==
      HadoopFs.dirSlug("/root/testdata/sf0.01"))
    // a URI's "//" must NOT collapse — the pre-r16 raw form is the
    // committed identity for remote roots
    assert(HadoopFs.dirSlug("hdfs://nn:8020/data/sf1") ==
      "hdfs___nn_8020_data_sf1")
    assert(HadoopFs.dirSlug("s3a://bucket/corpus") == "s3a___bucket_corpus")
  }

  test("contentKey: totalBytes + fileCount + maxFileBytes; absent/empty corpora have no identity") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val d = Files.createTempDirectory("graft_ck")
    assert(HadoopFs.contentKey(conf, d.resolve("nope").toString).isEmpty)
    val corpus = Files.createDirectory(d.resolve("t.parquet"))
    assert(HadoopFs.contentKey(conf, corpus.toString).isEmpty, "empty dir has no identity")
    Files.write(corpus.resolve("part-0"), Array.fill[Byte](1000)(1))
    Files.write(corpus.resolve("part-1"), Array.fill[Byte](234)(1))
    assert(HadoopFs.contentKey(conf, corpus.toString).contains("1234b2f1000"))
    // single-file parquet (the testdata shape) keys on the file itself
    val f = d.resolve("single.parquet")
    Files.write(f, Array.fill[Byte](77)(1))
    assert(HadoopFs.contentKey(conf, f.toString).contains("77b1f77"))
  }
}
