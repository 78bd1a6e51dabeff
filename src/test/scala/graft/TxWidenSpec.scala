package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** TYPE WIDENING (r15): ALTER COLUMN TYPE as a metadata-only
  * transaction ([[TxLog.widenColumnType]]). The recorded schema widens
  * the column; files written before keep their narrow physical type
  * and every reader upcasts at scan time (Spark's parquet readers
  * promote INT32→long/double, FLOAT→double and decimal precision
  * natively) — so an int key column outgrowing 2^31 on a 100 TB table
  * costs one manifest put, not a rewrite. Zone maps stay sound: the
  * integral stats domain is long-widened at collect time, so pruning
  * and meta-aggregates keep working bit-exactly across mixed eras. */
class TxWidenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txwiden_").resolve("t").toString

  private def dfi(ids: Range) =
    ids.map(i => (i, s"g${i % 3}", i / 2.0f)).toDF("id", "grp", "score")

  private def dataFileCount(t: String): Int = {
    val root = java.nio.file.Paths.get(t, "data")
    if (!java.nio.file.Files.exists(root)) 0
    else {
      var n = 0
      java.nio.file.Files.walk(root).forEach(p =>
        if (p.toString.endsWith(".parquet")) n += 1)
      n
    }
  }

  test("int->long widen is metadata-only; both eras read, filter, aggregate exactly") {
    val t = freshTable()
    TxLog.createTable(spark, t, dfi(0 until 0).schema)
    dfi(0 until 100).coalesce(1).write.format("txlog").mode("append").save(t)
    val before = dataFileCount(t)
    val v = TxLog.widenColumnType(spark, t, "id", LongType)
    assert(v == 2L)
    assert(dataFileCount(t) == before, "widen must move zero data bytes")
    assert(TxLog.history(spark, t).orderBy(col("version").desc)
      .first().getAs[String]("operation") == "ALTER COLUMN TYPE")
    // post-widen append writes true INT64 — including values beyond int
    (0 until 10).map(i => (4000000000L + i, "gx", 1.0f))
      .toDF("id", "grp", "score")
      .write.format("txlog").mode("append").save(t)
    val df = spark.read.format("txlog").load(t)
    assert(df.schema("id").dataType == LongType)
    assert(df.count() == 110L)
    // mixed-era aggregate: old int32 files upcast exactly
    assert(df.agg(sum("id")).first().getLong(0) ==
      (0 until 100).map(_.toLong).sum + (0 until 10).map(4000000000L + _).sum)
    // filters across the eras, both sides of the int boundary
    assert(df.where(col("id") === 42L).count() == 1L)
    assert(df.where(col("id") > Int.MaxValue.toLong).count() == 10L)
  }

  test("zone maps prune soundly across the widen (old int32 stats, long predicates)") {
    val t = freshTable()
    TxLog.createTable(spark, t, dfi(0 until 0).schema)
    // three disjoint-range files pre-widen
    TxLog.commit(dfi(0 until 100).coalesce(1), t, "w", 0L)
    TxLog.commit(dfi(100 until 200).coalesce(1), t, "w", 1L)
    TxLog.widenColumnType(spark, t, "id", LongType)
    // one beyond-int-range file post-widen
    TxLog.commit((0 until 50).map(i => (5000000000L + i, "gz", 0.0f))
      .toDF("id", "grp", "score").coalesce(1), t, "w", 2L)
    // a long literal inside the first file's (int-written) bounds keeps
    // exactly that file
    val (k1, n1) = TxLog.pruneCount(spark, t, col("id") === 50L)
    assert(n1 == 3 && k1 == 1, s"kept $k1 of $n1")
    // a beyond-int literal keeps only the post-widen file
    val (k2, n2) = TxLog.pruneCount(spark, t, col("id") >= 5000000000L)
    assert(k2 == 1, s"kept $k2 of $n2")
    // nothing matches below zero anywhere
    val (k3, _) = TxLog.pruneCount(spark, t, col("id") < 0L)
    assert(k3 == 0)
    // and the pruned scan stays row-identical to the full one
    assert(TxLog.scanWhere(spark, t, col("id") === 150L).get.count() == 1L)
  }

  test("float->double and decimal precision growth widen and read both eras") {
    val t = freshTable()
    TxLog.createTable(spark, t, dfi(0 until 0).schema)
    dfi(0 until 60).write.format("txlog").mode("append").save(t)
    TxLog.widenColumnType(spark, t, "score", DoubleType)
    Seq((1000, "gd", 2.25)).toDF("id", "grp", "score")
      .write.format("txlog").mode("append").save(t)
    val df = spark.read.format("txlog").load(t)
    assert(df.schema("score").dataType == DoubleType)
    // float 0.5f upcasts to exactly 0.5 (IEEE exact for halves)
    assert(df.where(col("id") === 1).select("score").as[Double].head() == 0.5)
    assert(df.where(col("score") === 2.25).count() == 1L)
    // decimal(5,2) -> decimal(12,2)
    val t2 = freshTable()
    val d1 = Seq((1, BigDecimal("123.45"))).toDF("k", "d")
      .select($"k", $"d".cast(DecimalType(5, 2)).as("d"))
    TxLog.createTable(spark, t2, d1.schema)
    d1.write.format("txlog").mode("append").save(t2)
    TxLog.widenColumnType(spark, t2, "d", DecimalType(12, 2))
    Seq((2, BigDecimal("9876543210.99"))).toDF("k", "d")
      .select($"k", $"d".cast(DecimalType(12, 2)).as("d"))
      .write.format("txlog").mode("append").save(t2)
    val dd = spark.read.format("txlog").load(t2)
    assert(dd.schema("d").dataType == DecimalType(12, 2))
    assert(dd.agg(sum("d")).first().getDecimal(0) ==
      new java.math.BigDecimal("9876543334.44"))
  }

  test("refusals: narrowing, long->double, unknown column, partition source") {
    val t = freshTable()
    TxLog.createTable(spark, t, dfi(0 until 0).schema)
    dfi(0 until 10).write.format("txlog").mode("append").save(t)
    // narrowing and lossy changes are loud
    intercept[IllegalArgumentException](
      TxLog.widenColumnType(spark, t, "id", ShortType))
    intercept[IllegalArgumentException](
      TxLog.widenColumnType(spark, t, "grp", LongType)) // string -> long
    val e = intercept[IllegalArgumentException] {
      TxLog.widenColumnType(spark, t, "id", IntegerType) // same type: no-op widen
    }
    assert(e.getMessage.contains("widening"))
    intercept[IllegalArgumentException](
      TxLog.widenColumnType(spark, t, "nope", LongType))
    // long -> double would truncate past 2^53
    val t2 = freshTable()
    val big = Seq((1L, "a")).toDF("k", "s")
    TxLog.createTable(spark, t2, big.schema)
    intercept[IllegalArgumentException](
      TxLog.widenColumnType(spark, t2, "k", DoubleType))
    // partition sources are typed by the layout — refuse
    val t3 = freshTable()
    val p = (0 until 20).map(i => (i, s"r${i % 2}")).toDF("id", "region")
    TxLog.createTable(spark, t3, p.schema, Seq("bucket(4, id)"))
    TxLog.commitPartitioned(p, t3, Seq("bucket(4, id)"), "w", 0L)
    val e3 = intercept[IllegalArgumentException](
      TxLog.widenColumnType(spark, t3, "id", LongType))
    assert(e3.getMessage.contains("partition source"))
  }

  test("time travel serves each version's own type; narrow appends post-widen are loud") {
    val t = freshTable()
    TxLog.createTable(spark, t, dfi(0 until 0).schema)
    dfi(0 until 30).write.format("txlog").mode("append").save(t) // v1
    TxLog.widenColumnType(spark, t, "id", LongType)              // v2
    val past = spark.read.format("txlog").option("versionAsOf", "1").load(t)
    assert(past.schema("id").dataType == IntegerType)
    assert(past.agg(sum("id")).first().getLong(0) == (0 until 30).sum.toLong)
    // a writer still speaking int is refused (cast upstream, loudly)
    val e = intercept[Exception] {
      dfi(30 until 40).write.format("txlog").mode("append").save(t)
    }
    assert(e.getMessage != null && e.getMessage.toLowerCase.contains("schema"),
      s"got: ${e.getMessage}")
  }

  test("widen composes with rename, MoR DML and the change feed") {
    val t = freshTable()
    TxLog.createTable(spark, t, dfi(0 until 0).schema,
      props = Map(TxLog.ChangeFeedProp -> "true",
        TxLog.DmlModeProp -> TxLog.DmlModeMor))
    dfi(0 until 90).write.format("txlog").mode("append").save(t)  // v1
    TxLog.renameColumn(spark, t, "id", "key")                     // v2
    TxLog.widenColumnType(spark, t, "key", LongType)              // v3
    // MoR delete on the widened+renamed column over pre-widen files
    TxLog.delete(spark, t, col("key") >= 80L, "d", 0L)            // v4
    val live = spark.read.format("txlog").load(t)
    assert(live.count() == 80L)
    assert(live.schema("key").dataType == LongType)
    // the feed reads the whole history under the current name AND type
    val feed = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", "0").load(t)
    assert(feed.schema("key").dataType == LongType)
    val dels = feed.where(col("_change_type") === "delete")
    assert(dels.count() == 10L)
    assert(dels.agg(sum("key")).first().getLong(0) == (80 until 90).sum.toLong)
    // compaction rewrites to the widened type and stays exact
    TxLog.compact(spark, t)
    val post = spark.read.format("txlog").load(t)
    assert(post.agg(sum("key")).first().getLong(0) == (0 until 80).sum.toLong)
  }

  test("SQL ALTER TABLE ALTER COLUMN TYPE through the catalog; mixed ALTER validates up front") {
    val wh = Files.createTempDirectory("txwiden_wh_").toString
    spark.conf.set("spark.sql.catalog.wcat", "graft.storage.GraftCatalog")
    spark.conf.set("spark.sql.catalog.wcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wcat.ns")
    spark.sql("CREATE TABLE wcat.ns.t (id INT, grp STRING, v FLOAT) USING txlog")
    spark.sql("INSERT INTO wcat.ns.t SELECT id, concat('g', id % 3), cast(id as float) FROM range(90)")
    spark.sql("ALTER TABLE wcat.ns.t ALTER COLUMN id TYPE BIGINT")
    assert(spark.table("wcat.ns.t").schema("id").dataType == LongType)
    spark.sql("INSERT INTO wcat.ns.t VALUES (8000000000, 'gx', 7.0)")
    assert(spark.sql(
      "SELECT count(*) FROM wcat.ns.t WHERE id > 100").first().getLong(0) == 1L)
    assert(spark.sql("SELECT sum(id) FROM wcat.ns.t").first().getLong(0) ==
      (0 until 90).sum.toLong + 8000000000L)
    // DML on the widened column through SQL
    spark.sql("DELETE FROM wcat.ns.t WHERE id >= 8000000000")
    assert(spark.table("wcat.ns.t").count() == 90L)
    // an ALTER whose SECOND change is invalid must apply NOTHING (the
    // catalog validates the whole change set up front) — SQL cannot
    // express a mixed multi-change ALTER, so drive the V2 catalog API
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, TableChange}
    val cat = spark.sessionState.catalogManager.catalog("wcat")
      .asInstanceOf[TableCatalog]
    val before = spark.table("wcat.ns.t").schema
    intercept[Exception] {
      cat.alterTable(Identifier.of(Array("ns"), "t"),
        TableChange.renameColumn(Array("grp"), "cohort"),
        TableChange.updateColumnType(Array("v"), IntegerType)) // float->int: narrowing
    }
    assert(spark.table("wcat.ns.t").schema == before,
      "a failed multi-change ALTER must leave the table untouched")
    spark.sql("DROP TABLE wcat.ns.t")
    // rename-then-widen of a PARTITION SOURCE in one change set: the
    // validation must resolve the renamed name back to the original
    // and refuse up front — not rename and then fail the widen
    spark.sql("""CREATE TABLE wcat.ns.p (k INT, v STRING)
                 USING txlog PARTITIONED BY (bucket(4, k))""")
    spark.sql("INSERT INTO wcat.ns.p SELECT id, concat('v', id) FROM range(20)")
    val pBefore = spark.table("wcat.ns.p").schema
    intercept[Exception] {
      cat.alterTable(Identifier.of(Array("ns"), "p"),
        TableChange.renameColumn(Array("k"), "key"),
        TableChange.updateColumnType(Array("key"), LongType))
    }
    assert(spark.table("wcat.ns.p").schema == pBefore,
      "the rename half must not apply when the widen half is refused")
    spark.sql("DROP TABLE wcat.ns.p")
  }

  test("a widen mid-stream fails the tail LOUDLY; widen-the-sink + restart resumes exactly-once") {
    // the streaming contract: a running tail resolved the narrow schema
    // at start, so the first post-widen batch fails with a parquet
    // type-mismatch — loud, never silently narrowed rows. Recovery is
    // the documented pair: widen the sink table the same way, restart
    // from the checkpoint — the source re-resolves the WIDE schema,
    // replays the failed epoch exactly once, and the tail continues.
    val t = freshTable()
    val sink = freshTable()
    TxLog.createTable(spark, t,
      (0 until 0).map(i => (i, s"g$i")).toDF("id", "grp").schema)
    (0 until 50).map(i => (i, s"g$i")).toDF("id", "grp")
      .write.format("txlog").mode("append").save(t)
    val ckpt = Files.createTempDirectory("txwiden_ck_").toString
    def tail() = spark.readStream.format("txlog").load(t)
      .writeStream.format("txlog")
      .option("checkpointLocation", ckpt)
      .start(sink)
    val q = tail()
    q.processAllAvailable()
    assert(spark.read.format("txlog").load(sink).count() == 50L)
    TxLog.widenColumnType(spark, t, "id", LongType)
    (1000 until 1020).map(i => (i.toLong, s"h$i")).toDF("id", "grp")
      .write.format("txlog").mode("append").save(t)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    assert(!q.isActive, "the tail must stop, not serve narrowed rows")
    assert(e.getMessage.contains("PARQUET_COLUMN_DATA_TYPE_MISMATCH"),
      e.getMessage.take(300))
    // recovery: widen the sink the same way, restart from the checkpoint
    TxLog.widenColumnType(spark, sink, "id", LongType)
    val q2 = tail()
    q2.processAllAvailable()
    q2.stop()
    val b = spark.read.format("txlog").load(sink)
    assert(b.schema("id").dataType == LongType)
    assert(b.count() == 70L, "the replayed epoch must land exactly once")
    assert(b.where(col("id") >= 1000L).count() == 20L)
    assert(b.select("id").distinct().count() == 70L)
  }

  test("NDV sketches agree across widen eras (canonical-type hashing)") {
    // pre-widen ints and post-widen longs carrying the SAME values must
    // hash into one domain, or the merged KMV double-counts every
    // shared value and the estimate inflates toward 2x
    val t = freshTable()
    val schema = (0 until 0).map(i => (i, "x")).toDF("k", "v").schema
    TxLog.createTable(spark, t, schema,
      props = Map(TxLog.NdvColsProp -> "k"))
    // era 1: ints 0..999
    (0 until 1000).map(i => (i, s"a$i")).toDF("k", "v")
      .write.format("txlog").mode("append").save(t)
    TxLog.widenColumnType(spark, t, "k", LongType)
    // era 2: longs over the SAME value range (full overlap)
    (0 until 1000).map(i => (i.toLong, s"b$i")).toDF("k", "v")
      .write.format("txlog").mode("append").save(t)
    val st = {
      val saved = spark.conf.getOption("spark.sql.cbo.enabled")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try spark.read.format("txlog").load(t).queryExecution.optimizedPlan.stats
      finally saved match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
    }
    val ndv = st.attributeStats.toSeq
      .collectFirst { case (a, cs) if a.name == "k" => cs }
      .flatMap(_.distinctCount).map(_.toLong).getOrElse(0L)
    // true NDV is 1000; cross-domain hashing would read ~2000
    assert(ndv > 800L && ndv < 1300L,
      s"widen-era sketches must share one hash domain: ndv $ndv")
  }

  test("metadata aggregates and CBO bounds stay exact across the widen") {
    val t = freshTable()
    TxLog.createTable(spark, t, dfi(0 until 0).schema)
    TxLog.commit(dfi(0 until 100).coalesce(1), t, "w", 0L)
    TxLog.widenColumnType(spark, t, "id", LongType)
    TxLog.commit((0 until 10).map(i => (6000000000L + i, "gy", 0.0f))
      .toDF("id", "grp", "score").coalesce(1), t, "w", 1L)
    // the meta-agg push answers min/max/count from manifest stats alone
    // across both eras — and must agree with the data
    val agg = spark.read.format("txlog").load(t)
      .agg(count(lit(1)), min("id"), max("id")).first()
    assert(agg.getLong(0) == 110L)
    assert(agg.getLong(1) == 0L)
    assert(agg.getLong(2) == 6000000009L)
  }
}
