package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** Row-level DML on TxLog tables (copy-on-write DELETE / UPDATE /
  * MERGE over the `removes` manifest protocol).
  *
  * The properties: (1) result row-identity to the set-algebra
  * definition of each operation, including three-valued-logic null
  * traps; (2) MINIMAL rewrite — only the files that actually hold an
  * affected row are removed/replaced (the zone-map + candidate-scan
  * narrowing), observable through Rewrite's file accounting and the
  * survival of untouched files in the live set; (3) serializable
  * publish — a concurrent commit between read and publish is a loud
  * conflict, never a lost update; (4) exactly-once under token replay;
  * (5) history (time travel) and vacuum behave like compaction's:
  * pre-DML snapshots live until vacuum collects the removed files. */
class TxDmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txdml_").resolve("t").toString

  /** (id, grp, score, name) — score nullable for null-trap tests. */
  private def batch(ids: Range, grp: String,
                    scoreOf: Int => java.lang.Double = i => i / 10.0): DataFrame =
    ids.map(i => (i.toLong, grp, scoreOf(i), s"name-$i"))
      .toDF("id", "grp", "score", "name")

  /** Three single-file commits with disjoint id ranges, so zone maps
    * separate them and "minimal rewrite" is observable. */
  private def clustered3(): String = {
    val t = freshTable()
    TxLog.commit(batch(0 until 100, "alpha").coalesce(1), t, "w", 0L)
    TxLog.commit(batch(100 until 200, "beta").coalesce(1), t, "w", 1L)
    TxLog.commit(batch(200 until 300, "gamma").coalesce(1), t, "w", 2L)
    t
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("delete: row-identity to filter(not pred), only the matching file rewritten") {
    val t = clustered3()
    val expected = rows(TxLog.snapshot(spark, t).get
      .where(not(coalesce($"id" >= 150L && $"id" < 160L, lit(false)))))
    val r = TxLog.delete(spark, t, $"id" >= 150L && $"id" < 160L, "del", 0L)
    assert(r.version == 3L)
    assert(r.removedFiles == 1, s"expected 1 file rewritten, got ${r.removedFiles}")
    assert(rows(TxLog.snapshot(spark, t).get) == expected)
    // untouched files survive: live set is 2 originals + the rewrite
    assert(TxLog.pruneCount(spark, t, lit(true) === lit(true))._2 == 3)
    // and zone maps still discriminate on the new state
    assert(TxLog.pruneCount(spark, t, $"id" === 50L)._1 == 1)
  }

  test("delete: no match is a no-op (head unchanged, nothing rewritten)") {
    val t = clustered3()
    val before = rows(TxLog.snapshot(spark, t).get)
    val r = TxLog.delete(spark, t, $"id" === 99999L, "del", 0L)
    assert(r == TxLog.Rewrite(2L, 0, 0))
    assert(TxLog.headVersion(spark, t) == 2L)
    assert(rows(TxLog.snapshot(spark, t).get) == before)
  }

  test("delete: NULL-predicate rows survive (SQL deletes only TRUE rows)") {
    val t = freshTable()
    TxLog.commit(batch(0 until 10, "a", i => if (i % 2 == 0) null else i / 10.0)
      .coalesce(1), t, "w", 0L)
    TxLog.delete(spark, t, $"score" < 100.0, "del", 0L) // NULL for even ids
    val left = TxLog.snapshot(spark, t).get
    assert(left.count() == 5)
    assert(rows(left.select($"id")) == rows(Seq(0L, 2L, 4L, 6L, 8L).toDF("id")))
  }

  test("update: set-expression applies only where pred is TRUE, schema invariant") {
    val t = clustered3()
    val pre = TxLog.snapshot(spark, t).get
    val expected = rows(pre.select(
      $"id", $"grp",
      when($"grp" === "beta", $"score" * 2).otherwise($"score").as("score"),
      when($"grp" === "beta", concat($"name", lit("!"))).otherwise($"name").as("name")))
    val r = TxLog.update(spark, t, $"grp" === "beta",
      Map("score" -> ($"score" * 2), "name" -> concat($"name", lit("!"))), "upd", 0L)
    assert(r.removedFiles == 1)
    val post = TxLog.snapshot(spark, t).get
    assert(post.schema == pre.schema, "update changed the table schema")
    assert(rows(post) == expected)
  }

  test("update: unknown set column is a loud error") {
    val t = clustered3()
    val e = intercept[IllegalArgumentException] {
      TxLog.update(spark, t, $"id" === 0L, Map("nope" -> lit(1)), "upd", 0L)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("merge: matched keys replaced, new keys appended, one file touched") {
    val t = clustered3()
    // 5 updates into the beta file + 3 brand-new keys
    val source = ((150 until 155).map(i => (i.toLong, "BETA2", 99.0, s"upd-$i")) ++
      (900 until 903).map(i => (i.toLong, "new", 1.0, s"ins-$i")))
      .toDF("id", "grp", "score", "name")
    val pre = TxLog.snapshot(spark, t).get
    val expected = rows(pre.join(source.select("id").distinct(), Seq("id"), "left_anti")
      .unionByName(source))
    val r = TxLog.merge(source, t, Seq("id"), "mrg", 0L)
    assert(r.removedFiles == 1, s"expected only the beta file rewritten, got ${r.removedFiles}")
    assert(rows(TxLog.snapshot(spark, t).get) == expected)
    assert(TxLog.snapshot(spark, t).get.where($"grp" === "BETA2").count() == 5)
  }

  test("merge: empty table is an append; replay with the same token is exactly-once") {
    val t = freshTable()
    val src = batch(0 until 20, "x").coalesce(1)
    val r1 = TxLog.merge(src, t, Seq("id"), "mrg", 7L)
    assert(r1.version == 0L && r1.removedFiles == 0)
    assert(TxLog.snapshot(spark, t).get.count() == 20)
    val r2 = TxLog.merge(src, t, Seq("id"), "mrg", 7L)
    assert(r2 == TxLog.Rewrite(-1L, 0, 0))
    assert(TxLog.snapshot(spark, t).get.count() == 20, "replayed merge duplicated rows")
  }

  test("merge: null-keyed target rows survive, null-keyed source rows append") {
    val t = freshTable()
    val target = Seq((java.lang.Long.valueOf(1L), "a"), (null.asInstanceOf[java.lang.Long], "tnull"))
      .toDF("id", "grp")
    TxLog.commit(target.coalesce(1), t, "w", 0L)
    val source = Seq((java.lang.Long.valueOf(1L), "A2"), (null.asInstanceOf[java.lang.Long], "snull"))
      .toDF("id", "grp")
    TxLog.merge(source, t, Seq("id"), "mrg", 0L)
    val got = rows(TxLog.snapshot(spark, t).get)
    // id=1 replaced; BOTH null-keyed rows present (null never matches null)
    assert(got == rows(Seq((java.lang.Long.valueOf(1L), "A2"),
      (null.asInstanceOf[java.lang.Long], "tnull"),
      (null.asInstanceOf[java.lang.Long], "snull")).toDF("id", "grp")))
  }

  test("serializable publish: a concurrent commit between read and publish conflicts loudly") {
    val t = clustered3()
    val sneak = batch(150 until 152, "sneak").coalesce(1)
    val e = intercept[java.util.ConcurrentModificationException] {
      TxLog.delete(spark, t, $"id" >= 150L && $"id" < 160L, "del", 0L,
        beforeCommit = () => { TxLog.commit(sneak, t, "sneaker", 0L); () })
    }
    assert(e.getMessage.contains("re-run"))
    // the failed rewrite left NO trace in the read set: all 300 original
    // rows plus the sneaked 2 are visible, nothing deleted
    assert(TxLog.snapshot(spark, t).get.count() == 302)
    // the staged-but-unpublished rewrite dir is vacuum-collectable garbage
    assert(TxLog.vacuum(spark, t, minAgeMs = 0L) >= 1)
    assert(TxLog.snapshot(spark, t).get.count() == 302)
    // the re-run (new snapshot) now succeeds and sees the sneaked rows too
    val r = TxLog.delete(spark, t, $"id" >= 150L && $"id" < 160L, "del", 1L)
    assert(r.removedFiles == 2, "re-run should rewrite the beta file AND the sneaked file")
    assert(TxLog.snapshot(spark, t).get.count() == 290)
  }

  test("history: pre-DML snapshots time-travel until vacuum collects the removed files") {
    val t = clustered3()
    TxLog.delete(spark, t, $"grp" === "beta", "del", 0L)
    assert(TxLog.snapshot(spark, t).get.count() == 200)
    assert(TxLog.snapshotAt(spark, t, 2L).get.count() == 300, "pre-delete version lost")
    // collected = the removed beta parquet + the committer _SUCCESS
    // markers (never live by construction) — ≥1 data file is the claim
    val collected = TxLog.vacuum(spark, t, minAgeMs = 0L)
    assert(collected >= 1, s"removed beta file not collected ($collected)")
    assert(TxLog.snapshot(spark, t).get.count() == 200)
  }

  test("skipping composes with DML: post-merge zone maps prune on the rewritten state") {
    val t = clustered3()
    val source = (150 until 155).map(i => (i.toLong, "beta", 99.0, s"u-$i"))
      .toDF("id", "grp", "score", "name")
    TxLog.merge(source, t, Seq("id"), "mrg", 0L)
    // the rewritten beta file carries fresh stats: a beta-range point
    // lookup prunes to 1 of 3 live files, and scanWhere is row-identical
    assert(TxLog.pruneCount(spark, t, $"id" === 152L) == ((1, 3)))
    assert(rows(TxLog.scanWhere(spark, t, $"id" === 152L).get) ==
      rows(TxLog.snapshot(spark, t).get.where($"id" === 152L)))
    assert(TxLog.scanWhere(spark, t, $"id" === 152L).get.first().getString(3) == "u-152")
  }

  test("one row-level op pins ONE snapshot: a commit between its two scans cannot split their views") {
    // Spark plans a row-level op as TWO scans (the runtime group-filter
    // subquery and the ReplaceData scan). If each listed the log
    // independently, a commit landing between the listings would let
    // the rewrite publish at the NEW head while the subquery's file set
    // excluded the new file — a silent skip instead of the documented
    // serialization conflict (r12 review finding).
    import org.apache.spark.sql.connector.write.RowLevelOperation
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import graft.storage.TxLogRowLevelOperation
    val t = clustered3()
    val sch = TxLog.snapshot(spark, t).get.schema
    def fileSet(parts: Array[org.apache.spark.sql.connector.read.InputPartition]) =
      parts.flatMap(_.asInstanceOf[FilePartition].files.map(_.filePath.toString)).toSet
    val op = new TxLogRowLevelOperation(t, sch, RowLevelOperation.Command.DELETE)
    val scan1 = op.newScanBuilder(CaseInsensitiveStringMap.empty).build()
    val files1 = fileSet(scan1.toBatch.planInputPartitions()) // pins the snapshot
    // a concurrent append lands between the op's two scan constructions
    batch(300 until 400, "delta").coalesce(1)
      .write.format("txlog").mode("append").save(t)
    val scan2 = op.newScanBuilder(CaseInsensitiveStringMap.empty).build()
    val files2 = fileSet(scan2.toBatch.planInputPartitions())
    assert(files2 == files1,
      "second scan of the same op saw a different snapshot than the first")
    assert(files1.size == 3, s"pinned snapshot must be the 3 pre-commit files: $files1")
    // a FRESH op (a new statement) does see the new head
    val op2 = new TxLogRowLevelOperation(t, sch, RowLevelOperation.Command.DELETE)
    val files3 = fileSet(op2.newScanBuilder(CaseInsensitiveStringMap.empty)
      .build().toBatch.planInputPartitions())
    assert(files3.size == 4, "a new operation must list the current head")
    // and end-to-end, the pinned head turns the race into a LOUD conflict:
    // SQL DELETE planned over the old op would now publish at the stale
    // head — verified by the serialization-conflict suite; here we pin
    // the observable that makes it work (one listing per op)
  }
}
