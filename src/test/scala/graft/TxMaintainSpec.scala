package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** The maintenance POLICY LOOP ([[TxLog.maintain]] / `CALL
  * system.maintain`): health observables from the manifest log decide
  * — and trigger — the cheapest restoring action. The spec churns
  * ingest/DML until each threshold trips and asserts both the action
  * and the restored observable (file counts, DV debt, probe prune
  * counts). */
class TxMaintainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("txmaint_").resolve("t").toString

  test("small-file debt: churn appends until the policy fires, then it's quiet") {
    val t = fresh()
    val schema = Seq((1L, "x")).toDF("id", "v").schema
    TxLog.createTable(spark, t, schema)
    // churn: 12 tiny single-file appends
    (0 until 12).foreach { b =>
      Seq((b.toLong, s"v$b")).toDF("id", "v").coalesce(1)
        .write.format("txlog").mode("append").save(t)
    }
    val before = TxLog.maintain(spark, t, smallFilesTrigger = 8)
    assert(before.compacted && !before.clustered,
      s"expected compaction, got $before")
    assert(before.smallFiles == 12)
    // restored: the live set collapsed and the data is intact
    // (observe-only re-read: thresholds out of reach)
    val obs = TxLog.maintain(spark, t, smallFilesTrigger = 1000)
    assert(obs.smallFiles < 12, s"still ${obs.smallFiles} small files")
    assert(spark.read.format("txlog").load(t).count() == 12L)
    // healthy table: the loop is a no-op listing
    val after = TxLog.maintain(spark, t, smallFilesTrigger = 8)
    assert(!after.compacted && !after.clustered, s"fired again: $after")
  }

  test("DV debt: merge-on-read deletes trip the ratio, compaction pays it back") {
    val t = fresh()
    val df = (0 until 4000).map(i => (i.toLong, s"p$i")).toDF("id", "v")
    TxLog.createTable(spark, t, df.schema,
      props = Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    df.coalesce(4).write.format("txlog").mode("append").save(t)
    // churn DML until the DV debt crosses 5% of recorded rows
    var pct = 0.0
    var b = 0
    while (pct <= 5.0 && b < 10) {
      TxLog.delete(spark, t, col("id") % 37 === b.toLong, "churn", b.toLong)
      val r = TxLog.maintain(spark, t, smallFilesTrigger = 1000,
        dvRowsTriggerPct = 100.0) // observe only: thresholds out of reach
      pct = r.dvRows * 100.0 / r.rawRows
      b += 1
    }
    assert(pct > 5.0, s"churn never crossed the threshold: $pct%")
    val fired = TxLog.maintain(spark, t, smallFilesTrigger = 1000,
      dvRowsTriggerPct = 5.0)
    assert(fired.compacted, s"expected DV purge, got $fired")
    // debt fully paid: no live DVs, counts exact
    val obs = TxLog.maintain(spark, t, smallFilesTrigger = 1000,
      dvRowsTriggerPct = 100.0)
    assert(obs.dvRows == 0L, s"DV debt survived: $obs")
    val expected = 4000L - (0 until 4000).count(i => (0 until b).contains(i % 37))
    assert(spark.read.format("txlog").load(t).count() == expected)
  }

  test("layout decay: interleaved ingest smears ranges, the loop re-clusters") {
    val t = fresh()
    val schema = Seq((1L, 1.0)).toDF("k", "x").schema
    TxLog.createTable(spark, t, schema)
    // well-clustered start: 8 disjoint ranges
    (0 until 8).foreach { b =>
      (b * 1000 until (b + 1) * 1000).map(i => (i.toLong, i * 0.5)).toDF("k", "x")
        .coalesce(1).write.format("txlog").mode("append").save(t)
    }
    val healthy = TxLog.maintain(spark, t, smallFilesTrigger = 1000,
      clusterColumns = Seq("k"), clusterTargetFiles = 8)
    assert(!healthy.clustered && healthy.overlapPct == 0.0, s"$healthy")
    val (k0, n0) = TxLog.pruneCount(spark, t, col("k") === 4242L)
    assert(n0 == 8 && k0 == 1, s"healthy probe kept $k0 of $n0")
    // churn: interleaved ingest (round-robin keys) smears every file
    // across the whole key range
    (0 until 6).foreach { b =>
      (0 until 1000).map(i => ((i * 8 + b).toLong % 8000, 1.0)).toDF("k", "x")
        .coalesce(1).write.format("txlog").mode("append").save(t)
    }
    val (k1, n1) = TxLog.pruneCount(spark, t, col("k") === 4242L)
    assert(k1 > 1, s"decay probe kept $k1 of $n1")
    val fired = TxLog.maintain(spark, t, smallFilesTrigger = 1000,
      clusterColumns = Seq("k"), clusterTargetFiles = 8,
      overlapTriggerPct = 30.0)
    assert(fired.clustered && fired.overlapPct > 30.0, s"$fired")
    // probe latency restored: the point probe opens one file again
    val (k2, n2) = TxLog.pruneCount(spark, t, col("k") === 4242L)
    assert(n2 == 8 && k2 == 1, s"restored probe kept $k2 of $n2")
    assert(spark.read.format("txlog").load(t).count() == 14000L)
  }

  test("layout decay is the WORST column: a second-column smear still fires") {
    // r15: the overlap sweep maxes over ALL declared cluster columns —
    // a decay visible only on the second z-order column must not hide
    // behind a still-clustered first column
    val t = fresh()
    val schema = Seq((1L, 1L)).toDF("a", "b").schema
    TxLog.createTable(spark, t, schema)
    // a stays perfectly clustered (disjoint ranges); b is smeared over
    // the full range in EVERY file
    (0 until 6).foreach { f =>
      (0 until 500).map(i => ((f * 500 + i).toLong, (i * 6 + f).toLong % 3000))
        .toDF("a", "b").coalesce(1)
        .write.format("txlog").mode("append").save(t)
    }
    val aOnly = TxLog.maintain(spark, t, smallFilesTrigger = 1000,
      clusterColumns = Seq("a"), clusterTargetFiles = 6)
    assert(!aOnly.clustered && aOnly.overlapPct == 0.0, s"$aOnly")
    val both = TxLog.maintain(spark, t, smallFilesTrigger = 1000,
      clusterColumns = Seq("a", "b"), clusterTargetFiles = 6,
      overlapTriggerPct = 50.0)
    assert(both.clustered && both.overlapPct > 50.0,
      s"second-column decay must fire the trigger: $both")
  }

  test("live files without stats count as fully decayed, not silently dropped") {
    // legacy-manifest conservatism: a file the sweep cannot judge must
    // push the observable toward re-layout (overlapPct's documented
    // contract), never vanish from it
    val t = fresh()
    val schema = Seq((1L, 1.0)).toDF("k", "x").schema
    TxLog.createTable(spark, t, schema)
    (0 until 4).foreach { b =>
      (b * 100 until (b + 1) * 100).map(i => (i.toLong, 1.0)).toDF("k", "x")
        .coalesce(1).write.format("txlog").mode("append").save(t)
    }
    // commit one live file WITHOUT stats (the legacy-manifest shape):
    // stage the parquet directly, publish with an empty stats list
    val uuid = java.util.UUID.randomUUID().toString
    val dir = new org.apache.hadoop.fs.Path(t, s"data/$uuid")
    Seq((9999L, 0.0)).toDF("k", "x").coalesce(1).write.parquet(dir.toString)
    val hfs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rel = hfs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => s"data/$uuid/${st.getPath.getName}").toSeq
    TxLog.commitStaged(spark, t, rel, Seq.empty, "legacy", 0L, incoming = schema)
    val r = TxLog.maintain(spark, t, smallFilesTrigger = 1000,
      clusterColumns = Seq("k"), clusterTargetFiles = 4,
      overlapTriggerPct = 99.0)
    assert(r.overlapPct == 100.0,
      s"a stats-less live file must read as fully decayed: $r")
    assert(r.clustered, s"expected the re-layout to fire: $r")
    // the re-layout recollected stats; the table is healthy and intact
    val after = TxLog.maintain(spark, t, smallFilesTrigger = 1000,
      clusterColumns = Seq("k"), clusterTargetFiles = 4)
    assert(!after.clustered && after.overlapPct == 0.0, s"$after")
    assert(spark.read.format("txlog").load(t).count() == 401L)
  }

  test("the decay trigger CONVERGES: sparse and unjudgeable cluster columns can't fire forever") {
    // an all-null file prunes perfectly on the column (mayMatch is
    // false for every comparison), so it is not an overlap problem and
    // no re-layout could change it — counting it as decayed would
    // re-cluster the table on EVERY maintain call, unboundedly
    val t = fresh()
    val schema = Seq((1L, Option(1L))).toDF("k", "sparse").schema
    TxLog.createTable(spark, t, schema)
    (0 until 4).foreach { b => // k clustered; sparse is NULL in half the files
      (b * 100 until (b + 1) * 100)
        .map(i => (i.toLong, if (b % 2 == 0) Some(i.toLong) else None))
        .toDF("k", "sparse").coalesce(1)
        .write.format("txlog").mode("append").save(t)
    }
    val r1 = TxLog.maintain(spark, t, smallFilesTrigger = 1000,
      clusterColumns = Seq("k", "sparse"), clusterTargetFiles = 4,
      overlapTriggerPct = 50.0)
    assert(!r1.clustered,
      s"all-null files must not read as decay (nothing to fix): $r1")
    // a decimal cluster column can never carry zone-map stats — it must
    // be skipped, not counted as 100% decayed after every rewrite
    val t2 = fresh()
    val d = Seq((1L, BigDecimal("1.00"))).toDF("k", "price")
    TxLog.createTable(spark, t2, d.schema)
    (0 until 3).foreach { b =>
      (b * 50 until (b + 1) * 50).map(i => (i.toLong, BigDecimal(i) / 100))
        .toDF("k", "price").coalesce(1)
        .write.format("txlog").mode("append").save(t2)
    }
    val r2 = TxLog.maintain(spark, t2, smallFilesTrigger = 1000,
      clusterColumns = Seq("price"), clusterTargetFiles = 3,
      overlapTriggerPct = 50.0)
    assert(!r2.clustered && r2.overlapPct == 0.0,
      s"an unjudgeable column type must contribute nothing: $r2")
  }

  test("CALL system.maintain drives the loop over a transform-partitioned table") {
    val wh = Files.createTempDirectory("txmaint_wh_").toString
    spark.conf.set("spark.sql.catalog.mcat", "graft.storage.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mcat.ns")
    spark.sql("""CREATE TABLE mcat.ns.ev (d DATE, id BIGINT, v STRING)
                 USING txlog PARTITIONED BY (days(d))""")
    // churn: 10 tiny inserts into the SAME day partitions
    (0 until 10).foreach { b =>
      spark.sql(s"""INSERT INTO mcat.ns.ev
                    SELECT DATE'2024-03-0${b % 3 + 1}', id + $b * 100, 'x'
                    FROM range(20)""")
    }
    val dir = s"$wh/ns/ev"
    val nBefore = spark.sql("CALL mcat.system.detail(table => 'ns.ev')")
      .collect()(0).getAs[Int]("n_files")
    val row = spark.sql(
      "CALL mcat.system.maintain(table => 'ns.ev', small_files_trigger => 5)")
      .collect()(0)
    assert(row.getAs[Boolean]("compacted"), row.toString)
    assert(row.getAs[Int]("small_files") == nBefore)
    val nAfter = spark.sql("CALL mcat.system.detail(table => 'ns.ev')")
      .collect()(0).getAs[Int]("n_files")
    assert(nAfter < nBefore, s"$nAfter vs $nBefore")
    // the compacted layout still prunes on the transform partition
    val (kept, total) = TxLog.pruneCount(spark, dir,
      col("d") === java.sql.Date.valueOf("2024-03-02"))
    assert(kept < total, s"kept $kept of $total — transform layout lost")
    assert(spark.table("mcat.ns.ev").count() == 200L)
    // quiet when healthy
    val again = spark.sql(
      "CALL mcat.system.maintain(table => 'ns.ev', small_files_trigger => 5)")
      .collect()(0)
    assert(!again.getAs[Boolean]("compacted") && !again.getAs[Boolean]("clustered"))
    spark.sql("DROP TABLE mcat.ns.ev")
  }

  test("equality-delete key debt past the threshold triggers materialization") {
    val t = java.nio.file.Files.createTempDirectory("maint_eq_")
      .resolve("t").toString
    spark.range(2000).select($"id", lit("x").as("v")).coalesce(2)
      .write.format("txlog").mode("append").save(t)
    // a small cap so the 50% threshold is reachable with a tiny debt
    TxLog.setProperties(spark, t, Map(graft.storage.TxEqDel.MaxKeysProp -> "1000"))
    import spark.implicits._
    TxLog.deleteByKeys((0L until 300L).toDF("id"), t, "mk", 0L)
    // below threshold (300 of 1000): observability only, no action
    val quiet = TxLog.maintain(spark, t, smallFilesTrigger = 1000)
    assert(!quiet.eqdelMaterialized && quiet.eqdelKeys == 300L, quiet.toString)
    assert(TxLog.liveEqDelCount(spark, t) == 300L)
    // past the threshold (600 of 1000 > 50%): the loop materializes
    TxLog.deleteByKeys((300L until 600L).toDF("id"), t, "mk", 1L)
    val fired = TxLog.maintain(spark, t, smallFilesTrigger = 1000)
    assert(fired.eqdelMaterialized && fired.eqdelKeys == 600L, fired.toString)
    assert(TxLog.liveEqDelCount(spark, t) == 0L,
      "materialization must clear the live key debt")
    assert(spark.read.format("txlog").load(t).count() == 1400L)
    // healthy again: quiet
    val after = TxLog.maintain(spark, t, smallFilesTrigger = 1000)
    assert(!after.eqdelMaterialized && after.eqdelKeys == 0L, after.toString)
  }
}
