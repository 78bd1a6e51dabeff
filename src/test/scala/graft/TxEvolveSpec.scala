package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** Schema evolution on TxLog tables: appends may ADD nullable columns;
  * the manifest records the merged table schema, every read (snapshot,
  * time travel, scanWhere, DML, compaction, the txlog source) applies
  * it, and pre-evolution files backfill the added columns with null —
  * parquet matches columns by name, so no file is ever rewritten for
  * an evolution. Type changes and non-nullable additions are loud
  * errors; `overwrite` is the sanctioned schema-replacement path. */
class TxEvolveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txevo_").resolve("t").toString

  private def v1(ids: Range): DataFrame =
    ids.map(i => (i.toLong, s"name-$i")).toDF("id", "name")

  private def v2(ids: Range): DataFrame =
    ids.map(i => (i.toLong, s"name-$i", java.lang.Double.valueOf(i / 10.0)))
      .toDF("id", "name", "score")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("append with a new nullable column: old files backfill null, schema is the merge") {
    val t = freshTable()
    TxLog.commit(v1(0 until 100).coalesce(1), t, "w", 0L)
    TxLog.commit(v2(100 until 200).coalesce(1), t, "w", 1L)
    val snap = TxLog.snapshot(spark, t).get
    assert(snap.columns.toSeq == Seq("id", "name", "score"))
    assert(snap.count() == 200)
    assert(snap.where($"score".isNull).count() == 100, "old rows did not backfill null")
    assert(snap.where($"id" === 150L).first().getDouble(2) == 15.0)
    // time travel sees the schema AS OF the version
    assert(TxLog.snapshotAt(spark, t, 0L).get.columns.toSeq == Seq("id", "name"))
  }

  test("zone maps on the evolved column: new files prune, old files (no stats) stay") {
    val t = freshTable()
    TxLog.commit(v1(0 until 100).coalesce(1), t, "w", 0L)
    TxLog.commit(v2(100 until 200).coalesce(1), t, "w", 1L)
    TxLog.commit(v2(200 until 300).coalesce(1), t, "w", 2L)
    // score >= 25 is provably absent from the [100,200) file; the old
    // file has no score stats and must be kept (it is all-null, so the
    // IS NOT NULL-bearing comparison finds nothing there — correct)
    val (kept, total) = TxLog.pruneCount(spark, t, $"score" >= 25.0)
    assert(total == 3 && kept == 2, s"kept $kept of $total")
    assert(rows(TxLog.scanWhere(spark, t, $"score" >= 25.0).get) ==
      rows(TxLog.snapshot(spark, t).get.where($"score" >= 25.0)))
  }

  test("nested nullability merges truthfully instead of erroring") {
    val t = freshTable()
    // parquet reads list elements back as containsNull=true; a later
    // batch whose encoder proves containsNull=false must still append
    // (its data satisfies the recorded shape) — and the reverse
    // direction relaxes the recorded element to nullable
    Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "xs")
      .write.format("txlog").mode("append").save(t)
    Seq((2L, Seq(3.0f))).toDF("id", "xs")
      .write.format("txlog").mode("append").save(t) // strict element: ok
    val df = spark.read.format("txlog").load(t)
    assert(df.count() == 2L)
    import org.apache.spark.sql.types._
    assert(df.schema("xs").dataType.asInstanceOf[ArrayType].containsNull,
      "recorded element nullability must stay relaxed (the union)")
    // element TYPE changes stay loud
    val e = intercept[Exception] {
      Seq((3L, Seq(1.0))).toDF("id", "xs")
        .write.format("txlog").mode("append").save(t)
    }
    assert(e.getMessage.contains("cannot change"), e.getMessage)
  }

  test("type change and non-nullable addition are loud; overwrite replaces the schema") {
    val t = freshTable()
    TxLog.commit(v1(0 until 10).coalesce(1), t, "w", 0L)
    val badType = (0 until 5).map(i => (i.toLong, i)).toDF("id", "name") // name: int
    val e = intercept[IllegalArgumentException] { TxLog.commit(badType, t, "w", 1L) }
    assert(e.getMessage.contains("name"))
    // a write MISSING a NOT-NULL column is rejected BEFORE staging data
    // (the recorded DDL must never lie about required columns)
    val missing = (0 until 5).map(i => s"n-$i").toDF("name")
    val e2 = intercept[IllegalArgumentException] { TxLog.commit(missing, t, "w", 2L) }
    assert(e2.getMessage.contains("NOT-NULL") && e2.getMessage.contains("id"))
    // (name, a nullable string, stays omittable — only required columns gate)
    assert(TxLog.snapshot(spark, t).get.schema("name").nullable)
    // overwrite may narrow/replace
    TxLog.overwrite((0 until 5).map(i => (i.toLong, i * 2L)).toDF("id", "twice"), t)
    assert(TxLog.snapshot(spark, t).get.columns.toSeq == Seq("id", "twice"))
    assert(TxLog.snapshotAt(spark, t, 0L).get.columns.toSeq == Seq("id", "name"))
  }

  test("DML across generations reads and writes the evolved schema") {
    val t = freshTable()
    TxLog.commit(v1(0 until 100).coalesce(1), t, "w", 0L)
    TxLog.commit(v2(100 until 200).coalesce(1), t, "w", 1L)
    // update a PRE-evolution row's evolved column: the touched old file
    // rewrites at the evolved schema with backfilled nulls preserved
    val r = TxLog.update(spark, t, $"id" === 5L, Map("score" -> lit(99.9)), "u", 0L)
    assert(r.removedFiles == 1)
    val snap = TxLog.snapshot(spark, t).get
    assert(snap.where($"id" === 5L).first().getDouble(2) == 99.9)
    assert(snap.where($"score".isNull).count() == 99)
    // merge an evolved-schema source into keys living in the old file
    val src = Seq((7L, "name-7b", java.lang.Double.valueOf(7.7)))
      .toDF("id", "name", "score")
    TxLog.merge(src, t, Seq("id"), "m", 0L)
    val after = TxLog.snapshot(spark, t).get
    assert(after.count() == 200)
    assert(after.where($"id" === 7L).first().getString(1) == "name-7b")
    // delete by the evolved column removes only non-null matches:
    // i=151..199 (score 15.1..19.9, 49 rows) plus the 99.9 update
    TxLog.delete(spark, t, $"score" > 15.0, "d", 0L)
    assert(TxLog.snapshot(spark, t).get.count() == 200 - 49 - 1)
  }

  test("compaction and the txlog source carry the evolved schema") {
    val t = freshTable()
    TxLog.commit(v1(0 until 50).coalesce(1), t, "w", 0L)
    TxLog.commit(v2(50 until 100).coalesce(1), t, "w", 1L)
    TxLog.compact(spark, t, targetBytes = 1L << 30)
    val snap = TxLog.snapshot(spark, t).get
    assert(snap.columns.toSeq == Seq("id", "name", "score"))
    assert(snap.where($"score".isNull).count() == 50)
    val viaSource = spark.read.format("txlog").load(t)
    assert(viaSource.columns.toSeq == Seq("id", "name", "score"))
    assert(rows(viaSource) == rows(snap))
  }

  test("compact rebases a concurrent append's EVOLVED schema into the checkpoint") {
    val t = freshTable()
    TxLog.commit(v1(0 until 50).coalesce(1), t, "w", 0L)
    val v = TxLog.compact(spark, t, targetBytes = 1L << 30,
      beforeCommit = () => { TxLog.commit(v2(50 until 60).coalesce(1), t, "sneak", 0L); () })
    assert(v > 0)
    val snap = TxLog.snapshot(spark, t).get
    assert(snap.columns.toSeq == Seq("id", "name", "score"),
      "checkpoint dropped the rebased append's evolved column")
    assert(snap.count() == 60)
    assert(snap.where($"score".isNotNull).count() == 10)
  }
}
