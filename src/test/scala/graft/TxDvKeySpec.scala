package graft.storage

import org.scalatest.funsuite.AnyFunSuite

/** [[TxDv.tailKey]] — the identity under which deletion vectors are
  * matched to data files. Regression pin for the r13 review finding:
  * the old last-two-segments rule dropped the staging uuid dir for
  * PARTITIONED executor-staged files (`data/<uuid>/__p_c=v/part-...`),
  * whose `part-<pid>-<tid>-s<seq>` names RESTART across Spark
  * applications — two files in one partition could collide and one
  * file's DV would silently filter the other's rows. The key is now
  * the full `data/`-rooted rel path (in test package `graft.storage`
  * because the helper is rightly `private[storage]`). */
class TxDvKeySpec extends AnyFunSuite {

  test("partitioned staged files with identical tails but different uuid dirs stay distinct") {
    val a = "data/0b1e2f33-aaaa-bbbb-cccc-000000000001/__p_g=x/part-00000-0-s0.parquet"
    val b = "data/0b1e2f33-aaaa-bbbb-cccc-000000000002/__p_g=x/part-00000-0-s0.parquet"
    assert(TxDv.tailKey(a) != TxDv.tailKey(b),
      "uuid dir dropped from the DV file key — cross-application DV collision")
  }

  test("absolute reader paths key to the manifest rel path, across root renderings") {
    val rel = "data/0b1e2f33-aaaa-bbbb-cccc-000000000001/__p_g=x/part-00000-7-s0.parquet"
    assert(TxDv.tailKey(rel) == rel, "rel paths are already the key")
    for (prefix <- Seq("file:/tmp/wh/t/", "/tmp/wh/t/", "file:///tmp/other/data/t/"))
      assert(TxDv.tailKey(prefix + rel) == rel,
        s"abs path under root '$prefix' did not key to its rel path")
  }

  test("unpartitioned staged files keep the uuid dir in the key") {
    val rel = "data/4fa0c9d0-1111-2222-3333-444444444444/part-00003-9.parquet"
    assert(TxDv.tailKey(s"file:/w/t/$rel") == rel)
  }
}
