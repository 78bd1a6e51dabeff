package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.storage.TxLog

/** 100×-decade scale probe for the STORAGE heads (r15 verdict item 7):
  * the standing sf1 gate proves 10× the bench SF; this one-off probes
  * the NEXT decade for the rows whose cost is PROTOCOL-bound, on a
  * synthesized 100× orders (replica key-offsets, the ScaleUp scheme,
  * but committed STRAIGHT into a txlog table in `replicas` generations
  * — no single-writer parquet funnel, and the many-generation history
  * is itself the point):
  *
  *  1. INGEST: `replicas` commits (~4 files each) — the manifest
  *     protocol's cost curve over a long history;
  *  2. ANALYZE BACKFILL: KMV NDV over two columns with a batch size
  *     that forces multi-batch composition (driver memory and manifest
  *     size bounded per commit at ANY table size); re-analyze ~free;
  *  3. BROAD MoR DELETE: a predicate hitting every file (~33% of all
  *     rows) — sidecars only, no rewrite; then the DV'd full-table
  *     read, then compact materializing the debt;
  *  4. SPJ: the bucketed fact⋈dim join at 100× — co-partitioned
  *     bucket(8) tables, exchange-free plan, wall-clock sanity.
  *
  * Usage: runMain graft.tools.DecadeProbe [sfDir=/root/testdata/sf0.1]
  *          [replicas=100]
  * Prints one JSON line. */
object DecadeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def ms[A](f: => A): (A, Long) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1000000L)
    }

    val orders = graft.Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val srcRows = orders.count()
    val maxKey = orders.agg(max("o_orderkey")).first().getLong(0) + 1L

    // ---- 1. ingest: `replicas` key-offset generations
    val t1 = Files.createTempDirectory("decade_").resolve("t").toString
    val (_, ingestMs) = ms {
      (0 until replicas).foreach { r =>
        orders.select(
          (col("o_orderkey") + lit(r * maxKey)).as("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"), col("o_orderpriority"))
          .coalesce(4)
          .write.format("txlog").mode("append").save(t1)
      }
    }
    // live-file count from the public history surface (adds − removes)
    val nFiles = {
      import org.apache.spark.sql.functions.{sum => fsum}
      val h = TxLog.history(spark, t1)
        .agg(fsum("n_files").cast("long"),
          fsum("n_removes").cast("long")).first()
      (h.getLong(0) - h.getLong(1)).toInt
    }
    val total = srcRows * replicas

    // ---- 2. analyze backfill, multi-batch composition
    val batchFiles = math.max(32, nFiles / 4)
    val (r1, analyzeMs) = ms {
      TxLog.analyze(spark, t1, Seq("o_custkey", "o_orderpriority"),
        batchFiles = batchFiles)
    }
    val (r2, reAnalyzeMs) = ms {
      TxLog.analyze(spark, t1, Seq("o_custkey", "o_orderpriority"))
    }
    require(r1.filesUpdated == nFiles && r1.filesSkipped == 0, r1.toString)
    require(r2.filesUpdated == 0, s"re-analyze must be covered: $r2")

    // ---- 3a. PARTIALLY-DIRTY incremental materialization (r17): the
    // M65 watch item was compact's one-off table-scale rewrite. Dirty
    // ~10% of the 100-generation layout (a ranged half-delete leaves
    // real deletion vectors in ~1 in 10 files), then clear the debt
    // through compactSmall's bounded batches — the rewrite cost must
    // track DIRTY bytes, not table bytes, each call bounded, with row
    // ids carried (the identity checksum pins it at this scale).
    TxLog.setProperties(spark, t1, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    val dirtyBound = maxKey * (replicas.toLong / 10L)
    val (_, partialDelMs) = ms {
      TxLog.delete(spark, t1,
        col("o_orderkey") < dirtyBound && col("o_orderkey") % 2 === 0,
        "decade-del2", 0L)
    }
    def idSig(): (Long, Long) = {
      val r = TxLog.snapshotLineage(spark, t1)
        .get.agg(count(lit(1)), sum(col("_row_id") % 1000003L)).first()
      (r.getLong(0), r.getLong(1))
    }
    val sigBefore = idSig()
    val dirtyFiles = TxLog.history(spark, t1).orderBy(desc("version")).first()
      .getAs[Long]("n_dvs")
    var incrCalls = 0
    var incrTotalMs = 0L
    var incrMaxMs = 0L
    var go = true
    while (go) {
      val (v, m) = ms {
        TxLog.compactSmall(spark, t1, targetBytes = 1L,
          maxBatchBytes = 16L << 20)
      }
      if (v < 0L) go = false
      else { incrCalls += 1; incrTotalMs += m; incrMaxMs = math.max(incrMaxMs, m) }
    }
    val sigAfter = idSig()
    require(sigBefore == sigAfter,
      s"incremental materialization changed rows/ids: $sigBefore -> $sigAfter")

    // ---- 3. broad MoR DELETE (~1/3 of every file), DV'd read, compact
    val (del, deleteMs) = ms {
      TxLog.delete(spark, t1, col("o_orderkey") % 3 === 1, "decade-del", 0L)
    }
    val (liveCnt, dvReadMs) = ms {
      spark.read.format("txlog").load(t1).count()
    }
    require(liveCnt > total / 2 && liveCnt < total,
      s"~1/3 delete expected, got $liveCnt of $total live")
    val (_, compactMs) = ms { TxLog.compact(spark, t1, targetBytes = 256L << 20) }
    val (liveCnt2, cleanReadMs) = ms {
      spark.read.format("txlog").load(t1).count()
    }
    require(liveCnt == liveCnt2, s"compact changed the count: $liveCnt -> $liveCnt2")

    // ---- 4. SPJ at 100×: bucketed fact ⋈ bucketed dim, no exchange
    val wh = Files.createTempDirectory("decade_spj_").toString
    spark.conf.set("spark.sql.catalog.dprobe", "graft.storage.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dprobe.warehouse", wh)
    spark.read.format("txlog").load(t1).createOrReplaceTempView("dp_orders")
    graft.Tables(spark, sfDir, "customer")
      .select("c_custkey", "c_nationkey").createOrReplaceTempView("dp_customer")
    spark.sql("""CREATE TABLE dprobe.default.o_b
      (o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
       o_orderpriority STRING)
      USING txlog PARTITIONED BY (bucket(8, o_custkey))""")
    val (_, spjLoadMs) = ms {
      spark.sql("INSERT INTO dprobe.default.o_b SELECT * FROM dp_orders")
    }
    spark.sql("""CREATE TABLE dprobe.default.c_b
      (c_custkey BIGINT, c_nationkey BIGINT)
      USING txlog PARTITIONED BY (bucket(8, c_custkey))""")
    spark.sql("INSERT INTO dprobe.default.c_b SELECT * FROM dp_customer")
    // the plan assertion needs AQE + broadcast OFF (the TxSpjSpec
    // protocol) so the join really consumes both scans'
    // KeyGroupedPartitioning; expected join exchanges = 0 (the final
    // agg keeps its one)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val join = spark.table("dprobe.default.o_b")
      .join(spark.table("dprobe.default.c_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
    val (joinRows, spjJoinMs) = ms { join.collect().length }
    val exchanges = join.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    println(s"""{"metric":"decade_probe","src_rows":$srcRows,""" +
      s""""replicas":$replicas,"total_rows":$total,"files":$nFiles,""" +
      s""""ingest_s":${ingestMs / 1000.0},""" +
      s""""analyze_s":${analyzeMs / 1000.0},"analyze_batch_files":$batchFiles,""" +
      s""""analyze_version":${r1.version},""" +
      s""""reanalyze_s":${reAnalyzeMs / 1000.0},""" +
      s""""mor_delete_s":${deleteMs / 1000.0},""" +
      s""""dv_touched_files":${del.removedFiles},""" +
      s""""dv_read_s":${dvReadMs / 1000.0},"live_rows":$liveCnt,""" +
      s""""compact_s":${compactMs / 1000.0},""" +
      s""""clean_read_s":${cleanReadMs / 1000.0},""" +
      s""""partial_del_s":${partialDelMs / 1000.0},""" +
      s""""dirty_files":$dirtyFiles,"incr_calls":$incrCalls,""" +
      s""""incr_total_s":${incrTotalMs / 1000.0},""" +
      s""""incr_max_call_s":${incrMaxMs / 1000.0},"rowid_stable":true,""" +
      s""""spj_load_s":${spjLoadMs / 1000.0},""" +
      s""""spj_join_s":${spjJoinMs / 1000.0},"spj_groups":$joinRows,""" +
      s""""spj_agg_exchanges":$exchanges}""")
    spark.stop()
  }
}
