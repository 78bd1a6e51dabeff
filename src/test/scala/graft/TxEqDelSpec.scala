package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.{TxEqDel, TxLog}

/** EQUALITY DELETES / keyed CDC upsert ([[TxLog.deleteByKeys]] /
  * [[TxLog.upsertByKeys]] / [[TxEqDel]]): key-addressed merge-on-read
  * deletes — the write NEVER reads the table (one key sidecar + the
  * upsert's data files commit in one manifest), readers anti-join the
  * bounded live key debt scoped by file add-version (an entry applies
  * only to files added BEFORE it), and compact()/materializeEqDels()
  * convert the debt back to rewrites/positions. */
class TxEqDelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("txeqd_").resolve("t").toString

  private def rows(t: String): Seq[(Long, String)] =
    TxLog.snapshot(spark, t).map(_.select("id", "v").orderBy("id")
      .as[(Long, String)].collect().toSeq).getOrElse(Seq.empty)

  /** two files: ids 0..3 ("a") and 4..7 ("b") */
  private def build(): String = {
    val t = fresh()
    spark.range(4).select(col("id"), lit("a").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    spark.range(4, 8).select(col("id"), lit("b").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    t
  }

  test("GQD1 sidecar round-trips: single long, single string, multi-column") {
    val l = TxEqDel.keySetOf(Seq("k"), Seq(LongType),
      Iterator(Seq(5L), Seq(-3L), Seq(5L), Seq(Long.MaxValue)))
    val l2 = TxEqDel.deserialize(TxEqDel.serialize(l))
    assert(l2.cardinality == 3L)
    assert(l2.containsLong(-3L) && l2.containsLong(Long.MaxValue) && !l2.containsLong(4L))
    val s0 = TxEqDel.keySetOf(Seq("n"), Seq(StringType), Iterator(
      Seq(org.apache.spark.unsafe.types.UTF8String.fromString("héllo")),
      Seq(org.apache.spark.unsafe.types.UTF8String.fromString(""))))
    val s2 = TxEqDel.deserialize(TxEqDel.serialize(s0))
    assert(s2.cardinality == 2L)
    assert(s2.contains(org.apache.spark.unsafe.types.UTF8String.fromString("héllo")))
    val m0 = TxEqDel.keySetOf(Seq("a", "b"), Seq(IntegerType, StringType), Iterator(
      Seq(1, org.apache.spark.unsafe.types.UTF8String.fromString("x")),
      Seq(2, null))) // null tuple dropped
    val m2 = TxEqDel.deserialize(TxEqDel.serialize(m0))
    assert(m2.cardinality == 1L)
    assert(m2.contains(List(java.lang.Long.valueOf(1L),
      org.apache.spark.unsafe.types.UTF8String.fromString("x"))))
  }

  test("deleteByKeys removes matching rows from every prior file — without a table read") {
    val t = build()
    val v = TxLog.deleteByKeys(Seq(1L, 6L, 99L).toDF("id"), t, "delk", 0L)
    assert(v > 0)
    assert(rows(t).map(_._1) == Seq(0L, 2L, 3L, 4L, 5L, 7L))
    // exactly-once: the same (writer, batch) token replays as a no-op
    assert(TxLog.deleteByKeys(Seq(0L).toDF("id"), t, "delk", 0L) == -1L)
    assert(rows(t).map(_._1) == Seq(0L, 2L, 3L, 4L, 5L, 7L))
    // a LATER insert of a deleted key survives (the entry scopes to
    // files added before it)
    spark.range(1).select((col("id") + 1).as("id"), lit("c").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    assert(rows(t) == Seq(0L -> "a", 1L -> "c", 2L -> "a", 3L -> "a",
      4L -> "b", 5L -> "b", 7L -> "b"))
  }

  test("upsertByKeys == merge semantics (replace matched, insert new, own rows survive)") {
    val t = build()
    val m = build()
    val src = Seq((2L, "X"), (6L, "Y"), (10L, "Z")).toDF("id", "v")
    TxLog.upsertByKeys(src, t, Seq("id"), "ups", 0L)
    TxLog.merge(src, m, Seq("id"), "mrg", 0L)
    assert(rows(t) == rows(m), s"${rows(t)} vs ${rows(m)}")
    assert(rows(t).toMap.apply(2L) == "X" && rows(t).toMap.apply(10L) == "Z")
    // replay is a no-op
    assert(TxLog.upsertByKeys(src, t, Seq("id"), "ups", 0L) == -1L)
    assert(rows(t) == rows(m))
    // chained upserts keep converging with merge
    val src2 = Seq((2L, "XX"), (0L, "W")).toDF("id", "v")
    TxLog.upsertByKeys(src2, t, Seq("id"), "ups", 1L)
    TxLog.merge(src2, m, Seq("id"), "mrg", 1L)
    assert(rows(t) == rows(m), s"${rows(t)} vs ${rows(m)}")
  }

  test("string and multi-column keys; NULL keys never match (null-rejecting)") {
    val t = fresh()
    Seq((1L, "a", "u"), (2L, "b", "u"), (3L, null.asInstanceOf[String], "u"))
      .toDF("id", "k", "v").coalesce(1)
      .write.format("txlog").mode("append").save(t)
    // delete by string key incl. a NULL key row (dropped) — the table's
    // null-keyed row survives
    TxLog.deleteByKeys(Seq("a", null.asInstanceOf[String]).toDF("k"), t, "sk", 0L)
    val got = TxLog.snapshot(spark, t).get.select("id").orderBy("id")
      .as[Long].collect().toSeq
    assert(got == Seq(2L, 3L), got.toString)
    // multi-column key
    val t2 = fresh()
    Seq((1L, "a", "x"), (1L, "b", "y"), (2L, "a", "z")).toDF("id", "k", "v")
      .coalesce(1).write.format("txlog").mode("append").save(t2)
    TxLog.deleteByKeys(Seq((1L, "a")).toDF("id", "k"), t2, "mk", 0L)
    assert(TxLog.snapshot(spark, t2).get.select("v").orderBy("v")
      .as[String].collect().toSeq == Seq("y", "z"))
  }

  test("time travel: versionAsOf before the keyed delete still sees the rows") {
    val t = build()
    val before = TxLog.headVersion(spark, t)
    TxLog.deleteByKeys(Seq(0L, 4L).toDF("id"), t, "tt", 0L)
    assert(rows(t).size == 6)
    val past = TxLog.snapshotAt(spark, t, before).get
    assert(past.count() == 8L, "pre-delete snapshot must not apply the entry")
  }

  test("compact materializes the debt: rows identical, entries gone, clean scans") {
    val t = build()
    TxLog.deleteByKeys(Seq(1L, 5L).toDF("id"), t, "cm", 0L)
    val want = rows(t)
    TxLog.compact(spark, t)
    assert(rows(t) == want)
    assert(TxLog.liveEqDelCount(spark, t) == 0L, "checkpoint must end the scope")
    // and a later delete works against the compacted generation
    TxLog.deleteByKeys(Seq(2L).toDF("id"), t, "cm", 1L)
    assert(rows(t).map(_._1) == Seq(0L, 3L, 4L, 6L, 7L))
  }

  test("materializeEqDels converts the debt to deletion vectors in place") {
    val t = build()
    TxLog.deleteByKeys(Seq(1L, 5L).toDF("id"), t, "mat", 0L)
    // plus an upsert so one entry scopes over another's data files
    TxLog.upsertByKeys(Seq((0L, "N"), (9L, "N")).toDF("id", "v"), t, Seq("id"), "mat-u", 0L)
    val want = rows(t)
    val r = TxLog.materializeEqDels(spark, t)
    assert(r.version > 0)
    assert(TxLog.liveEqDelCount(spark, t) == 0L)
    assert(rows(t) == want, s"${rows(t)} vs $want")
    // idempotent re-run: nothing to do
    assert(TxLog.materializeEqDels(spark, t).removedFiles == 0)
    // a restore to a version where entries were LIVE is refused loudly;
    // at/after the materialization it works
    val eInner = intercept[IllegalArgumentException](
      TxLog.restore(spark, t, r.version - 1))
    assert(eInner.getMessage.contains("equality deletes"), eInner.getMessage)
    TxLog.restore(spark, t, r.version)
    assert(rows(t) == want)
  }

  test("the key-debt cap: deleteByKeys refuses, upsertByKeys falls back to merge") {
    val t = build()
    TxLog.setProperties(spark, t, Map(TxEqDel.MaxKeysProp -> "3"))
    TxLog.deleteByKeys(Seq(0L, 1L).toDF("id"), t, "cap", 0L) // debt 2
    val e = intercept[IllegalArgumentException](
      TxLog.deleteByKeys(Seq(2L, 3L).toDF("id"), t, "cap", 1L))
    assert(e.getMessage.contains(TxEqDel.MaxKeysProp), e.getMessage)
    // the upsert still lands — through the position-based merge
    TxLog.upsertByKeys(Seq((4L, "U"), (5L, "U")).toDF("id", "v"), t, Seq("id"), "cap-u", 0L)
    assert(rows(t) == Seq(2L -> "a", 3L -> "a", 4L -> "U", 5L -> "U",
      6L -> "b", 7L -> "b"), rows(t).toString)
    assert(TxLog.liveEqDelCount(spark, t) == 2L, "the fallback must not grow the debt")
  }

  test("change-feed interplay: keyed writes stay keyed AND capture their delta; " +
      "enable over pre-feed debt refused") {
    val t = build()
    TxLog.setProperties(spark, t, Map("changeFeed" -> "true"))
    // the keyed delete lands as an equality delete (no merge fallback)
    // WITH its delta captured — the full CDF story is TxEqDelCdfSpec
    TxLog.deleteByKeys(Seq(0L).toDF("id"), t, "cdf", 0L)
    assert(TxLog.liveEqDelCount(spark, t) == 1L, "feed delete must stay keyed")
    TxLog.upsertByKeys(Seq((1L, "C")).toDF("id", "v"), t, Seq("id"), "cdf-u", 0L)
    assert(rows(t).toMap.apply(1L) == "C")
    assert(TxLog.liveEqDelCount(spark, t) == 2L, "feed upsert must stay keyed")
    // enabling the feed over live (pre-feed, uncaptured) debt is refused
    val t2 = build()
    TxLog.deleteByKeys(Seq(0L).toDF("id"), t2, "cdf2", 0L)
    val e2 = intercept[IllegalArgumentException](
      TxLog.setProperties(spark, t2, Map("changeFeed" -> "true")))
    assert(e2.getMessage.contains("equality deletes"), e2.getMessage)
  }

  test("schema interplay: rename keeps keys (physical), drop of a key column refused, " +
      "widening keeps pre-widen keys matching") {
    val t = fresh()
    spark.range(6).select(col("id").cast("int").as("k"), lit("a").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.deleteByKeys(Seq(1, 4).toDF("k"), t, "sch", 0L)
    // rename: the sidecar is physical-keyed — deletes keep applying
    TxLog.renameColumn(spark, t, "k", "key")
    assert(TxLog.snapshot(spark, t).get.select("key").as[Int].collect().sorted.toSeq
      == Seq(0, 2, 3, 5))
    // drop of the key column is refused while the debt lives
    val e = intercept[IllegalArgumentException](TxLog.dropColumn(spark, t, "key"))
    assert(e.getMessage.contains("equality-delete"), e.getMessage)
    // widening the key column: canonical-long domain keeps matching
    TxLog.widenColumnType(spark, t, "key", LongType)
    assert(TxLog.snapshot(spark, t).get.select("key").as[Long].collect().sorted.toSeq
      == Seq(0L, 2L, 3L, 5L))
    // and post-widen keyed deletes with LONG keys work
    TxLog.deleteByKeys(Seq(2L).toDF("key"), t, "sch", 1L)
    assert(TxLog.snapshot(spark, t).get.select("key").as[Long].collect().sorted.toSeq
      == Seq(0L, 3L, 5L))
  }

  test("an interleaved keyed delete CONFLICTS with a rebasing row-level rewrite") {
    val t = build()
    TxLog.setProperties(spark, t, Map("isolation" -> "writeSerializable"))
    val e = intercept[java.util.ConcurrentModificationException] {
      TxLog.delete(spark, t, col("id") >= 6L, "coww", 0L,
        beforeCommit = () =>
          TxLog.deleteByKeys(Seq(0L).toDF("id"), t, "race", 0L))
    }
    assert(e.getMessage.contains("equality deletes"), e.getMessage)
    // the keyed delete itself landed; the COW delete did not
    assert(rows(t).map(_._1) == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("DV + equality delete on the SAME file compose; library DML reads the debt") {
    val t = build()
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    // MoR positional delete of id=0 (file 1 gets a DV)
    TxLog.delete(spark, t, col("id") === 0L, "dvdel", 0L)
    // keyed delete of id=2 (same file, equality entry)
    TxLog.deleteByKeys(Seq(2L).toDF("id"), t, "dvdel", 1L)
    assert(rows(t).map(_._1) == Seq(1L, 3L, 4L, 5L, 6L, 7L))
    // a COW-style UPDATE through the library reads THROUGH the debt:
    // the rewritten file must not resurrect id=2
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeCow))
    TxLog.update(spark, t, col("id") === 3L, Map("v" -> lit("U")), "updl", 0L)
    assert(rows(t) == Seq(1L -> "a", 3L -> "U", 4L -> "b", 5L -> "b",
      6L -> "b", 7L -> "b"), rows(t).toString)
  }

  test("vacuum keeps referenced sidecars and collects orphans once aged") {
    val t = build()
    TxLog.deleteByKeys(Seq(1L).toDF("id"), t, "vac", 0L)
    val root = new org.apache.hadoop.fs.Path(t)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // plant an orphan sidecar (a crashed writer's leftovers)
    val orphan = new org.apache.hadoop.fs.Path(t, "eqdel/orphan.eqd")
    val out = fs.create(orphan, false)
    out.write(TxEqDel.serialize(TxEqDel.keySetOf(Seq("id"), Seq(LongType),
      Iterator(Seq(0L))))); out.close()
    assert(TxLog.vacuum(spark, t, minAgeMs = 0L) >= 1)
    assert(!fs.exists(orphan), "orphan sidecar must be collected")
    assert(rows(t).map(_._1) == Seq(0L, 2L, 3L, 4L, 5L, 6L, 7L),
      "the referenced sidecar must survive vacuum")
  }

  test("partitioned table: upsertByKeys preserves the layout and the manifest pv") {
    val t = fresh()
    val df = spark.range(8).select(col("id"), (col("id") % 2).cast("int").as("p"),
      lit("a").as("v"))
    TxLog.commitPartitioned(df, t, Seq("p"), "pw", 0L)
    TxLog.upsertByKeys(
      Seq((0L, 0, "X"), (9L, 1, "X")).toDF("id", "p", "v"), t, Seq("id"), "pu", 0L)
    val got = TxLog.snapshot(spark, t).get.orderBy("id")
      .select("id", "v").as[(Long, String)].collect().toSeq
    assert(got.toMap.apply(0L) == "X" && got.toMap.apply(9L) == "X" && got.size == 9)
    // partition pruning still works over the upserted layout
    assert(TxLog.scanWhere(spark, t, col("p") === 1).get.count() == 5L)
  }

  // ------------------------------------------------------------------
  // the V2 read path (r16): format("txlog") scans, metadata aggregates
  // and the stream source all read through the key debt
  // ------------------------------------------------------------------

  test("V2 scan applies the debt: full, column-pruned and filtered reads; " +
      "count(*) bypasses MetaAgg until materialization") {
    val t = build()
    TxLog.deleteByKeys(Seq(1L, 6L).toDF("id"), t, "v2k", 0L)
    val v2 = spark.read.format("txlog").load(t)
    assert(v2.select("id").orderBy("id").as[Long].collect().toSeq ==
      Seq(0L, 2L, 3L, 4L, 5L, 7L))
    // a projection EXCLUDING the key column — the probe must read the
    // key through the appended (hidden) working block
    assert(v2.groupBy("v").count().orderBy("v").as[(String, Long)]
      .collect().toSeq == Seq(("a", 3L), ("b", 3L)))
    // pushed filters compose with the probes
    assert(v2.where(col("id") >= 4L).select("v").orderBy("v")
      .as[String].collect().toSeq == Seq("b", "b", "b"))
    // metadata aggregates REFUSE under live debt (match counts are
    // unknowable from footers) — and the values stay exact
    val agg = v2.agg(count(lit(1)).as("n"), min($"id").as("lo"),
      max($"id").as("hi"))
    val r = agg.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((6L, 0L, 7L)))
    assert(!agg.queryExecution.executedPlan.toString.contains("MetaAgg"),
      "count under live key debt must scan, not trust footer stats")
    assert(v2.count() == 6L)
    // materializing the debt restores the metadata push
    TxLog.materializeEqDels(spark, t)
    val v2b = spark.read.format("txlog").load(t)
    val agg2 = v2b.agg(count(lit(1)).as("n"))
    assert(agg2.collect()(0).getLong(0) == 6L)
    assert(agg2.queryExecution.executedPlan.toString.contains("MetaAgg"),
      "materialization must restore the manifest-only aggregate")
  }

  test("V2 time travel applies exactly the debt live AT the pinned version") {
    val t = build()
    val v = TxLog.deleteByKeys(Seq(1L, 6L).toDF("id"), t, "tt", 0L)
    // re-insert a deleted key AFTER the delete: the head read serves it,
    // the pinned read doesn't
    spark.range(1).select((col("id") + 1L).as("id"), lit("c").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    assert(spark.read.format("txlog").option("versionAsOf", v).load(t)
      .select("id").orderBy("id").as[Long].collect().toSeq ==
      Seq(0L, 2L, 3L, 4L, 5L, 7L))
    assert(spark.read.format("txlog").option("versionAsOf", v - 1L).load(t)
      .select("id").orderBy("id").as[Long].collect().toSeq == (0L to 7L))
    assert(spark.read.format("txlog").load(t)
      .select("id").orderBy("id").as[Long].collect().toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L, 5L, 7L))
  }

  test("V2 scan composes a DV and the key debt on the same file") {
    val t = build()
    // DV on the first file (MoR delete of id=0), then a keyed delete
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.delete(spark, t, col("id") === 0L, "mor", 0L)
    TxLog.deleteByKeys(Seq(2L, 5L).toDF("id"), t, "kd", 0L)
    val v2 = spark.read.format("txlog").load(t)
    assert(v2.select("id").orderBy("id").as[Long].collect().toSeq ==
      Seq(1L, 3L, 4L, 6L, 7L))
    // column-pruned read over the composed filters (ri + key appended)
    assert(v2.groupBy("v").count().orderBy("v").as[(String, Long)]
      .collect().toSeq == Seq(("a", 2L), ("b", 3L)))
  }

  test("stream source: the initial snapshot applies the debt; a tail keyed delete is LOUD") {
    val t = build()
    TxLog.deleteByKeys(Seq(1L, 6L).toDF("id"), t, "st", 0L)
    val name = s"txeq_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("txlog").option("path", t).load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("txeq_st_").toString)
      .start()
    q.processAllAvailable()
    assert(spark.table(name).select("id").orderBy("id").as[Long]
      .collect().toSeq == Seq(0L, 2L, 3L, 4L, 5L, 7L),
      "snapshot batch served keyed-deleted rows")
    // an append tails fine
    spark.range(8, 10).select(col("id"), lit("c").as("v")).coalesce(1)
      .write.format("txlog").mode("append").save(t)
    q.processAllAvailable()
    assert(spark.table(name).count() == 8)
    // a keyed delete rewrites rows the stream already served — loud
    TxLog.deleteByKeys(Seq(0L).toDF("id"), t, "st2", 0L)
    val e = intercept[Exception] { q.processAllAvailable() }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(t0 =>
        Option(t0.getMessage).toSeq ++ msgs(t0.getCause))
    assert(msgs(e).exists(_.contains("equality delete")), msgs(e).toString)
    q.stop()
  }
}
