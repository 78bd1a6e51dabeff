package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** ANALYZE ([[TxLog.analyze]] / `CALL system.analyze`): opt columns
  * into the NDV sketch channel and BACKFILL sketches onto existing
  * live files as a stats-only commit — closing the gap where a table
  * with history could never serve a real distinct count (the
  * estimator refuses half-sketched columns; only data commits attach
  * sketches; a full rewrite was the only cure). */
class TxAnalyzeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fresh(): String =
    Files.createTempDirectory("txanalyze_").resolve("t").toString

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def strDf(n: Int, off: Int = 0) = spark.range(n).select(
    md5((col("id") + off).cast("string")).as("skey"),
    (col("id") % 37).cast("string").as("grp"),
    col("id"))

  private def ndvOf(t: String, name: String): Option[BigInt] =
    withConfsNdv(t, name)
  private def withConfsNdv(t: String, name: String): Option[BigInt] = {
    var out: Option[BigInt] = None
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val st = spark.read.format("txlog").load(t)
        .queryExecution.optimizedPlan.stats
      out = st.attributeStats.toSeq
        .collectFirst { case (a, cs) if a.name == name => cs }
        .flatMap(_.distinctCount)
    }
    out
  }

  test("backfill: a table with history gains NDV for a string key; idempotent") {
    val t = fresh()
    // three separate commits, NO opt-in property — write-time sketches
    // never attached
    strDf(8000).coalesce(1).write.format("txlog").mode("append").save(t)
    strDf(8000, 4000).coalesce(1).write.format("txlog").mode("append").save(t)
    strDf(2000, 12000).coalesce(1).write.format("txlog").mode("append").save(t)
    // pre: no sketch anywhere -> no distinct count for the string key
    assert(ndvOf(t, "skey").isEmpty, s"pre-analyze skey ndv ${ndvOf(t, "skey")}")
    val r = TxLog.analyze(spark, t, Seq("skey", "grp"))
    assert(r.version >= 0 && r.filesSkipped == 0, r.toString)
    assert(r.filesUpdated == 3, r.toString) // every live file re-recorded
    // the property is now set: future commits attach their own
    assert(TxLog.properties(spark, t).get(TxLog.NdvColsProp)
      .exists(_.split(',').contains("skey")))
    // post: true distinct counts (grp exact under k; skey within KMV error)
    assert(ndvOf(t, "grp").contains(BigInt(37)), s"grp ${ndvOf(t, "grp")}")
    val skeyNdv = ndvOf(t, "skey").map(_.toLong).getOrElse(0L)
    assert(skeyNdv > 11000L && skeyNdv < 17000L, s"skey ndv $skeyNdv (~14000 true)")
    // idempotent: everything covered -> nothing committed
    val r2 = TxLog.analyze(spark, t, Seq("skey", "grp"))
    assert(r2.version == -1L && r2.filesUpdated == 0, r2.toString)
    // data untouched by construction (stats-only manifest)
    assert(spark.read.format("txlog").load(t).count() == 18000L)
  }

  test("the backfill batches: one stats-only commit per batch, composing newest-wins") {
    val t = fresh()
    (0 until 5).foreach(i => strDf(2000, i * 2000).coalesce(1)
      .write.format("txlog").mode("append").save(t))
    val v0 = TxLog.headVersion(spark, t)
    // batchFiles = 2 → ceil(5/2) = 3 stats-only commits (+1 property)
    val r = TxLog.analyze(spark, t, Seq("skey"), batchFiles = 2)
    assert(r.filesUpdated == 5 && r.filesSkipped == 0, r.toString)
    assert(TxLog.headVersion(spark, t) == v0 + 4,
      "expected 1 property + 3 batched stats commits")
    // the batches COMPOSE: full coverage, real NDV served
    val ndv = ndvOf(t, "skey").map(_.toLong).getOrElse(0L)
    assert(ndv > 8000L && ndv < 12000L, s"skey ndv $ndv (~10000 true)")
    // and a re-run finds nothing uncovered
    val r2 = TxLog.analyze(spark, t, Seq("skey"), batchFiles = 2)
    assert(r2.version == -1L && r2.filesUpdated == 0, r2.toString)
  }

  test("distributed footer collection (>64 files in one commit) yields exact stats") {
    val t = fresh()
    // one commit, 80 files: stats collection takes the executor-side
    // path; the metadata aggregate then proves every footer was read
    // exactly (count/min/max answer from the manifest, 0 data files)
    spark.range(80000).select(col("id"), (col("id") % 37).cast("string").as("grp"))
      .repartition(80).write.format("txlog").mode("append").save(t)
    val agg = spark.read.format("txlog").load(t)
      .agg(count(col("id")), min(col("id")), max(col("id")))
    assert(agg.queryExecution.executedPlan.toString.contains("MetaAgg"),
      agg.queryExecution.executedPlan.toString)
    val row = agg.first()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((80000L, 0L, 79999L)))
    // and zone maps prune with the distributed-collected bounds
    val (kept, total) = TxLog.pruneCount(spark, t, col("id") === -1L)
    assert(kept == 0 && total == 80, s"$kept of $total")
  }

  test("backfilled sketches equal write-time sketches (same NDV served)") {
    val a = fresh(); val b = fresh()
    val df = strDf(20000)
    TxLog.createTable(spark, a, df.schema, props = Map(TxLog.NdvColsProp -> "skey"))
    df.coalesce(2).write.format("txlog").mode("append").save(a)
    df.coalesce(2).write.format("txlog").mode("append").save(b)
    TxLog.analyze(spark, b, Seq("skey"))
    assert(ndvOf(a, "skey").isDefined)
    assert(ndvOf(a, "skey") == ndvOf(b, "skey"),
      s"write-time ${ndvOf(a, "skey")} vs backfilled ${ndvOf(b, "skey")}")
  }

  test("schema-evolved column: pre-evolution files get an exact all-null entry") {
    val t = fresh()
    strDf(5000).coalesce(1).write.format("txlog").mode("append").save(t)
    // evolve in a new string column, then land data that has it
    val withTag = strDf(5000, 5000).withColumn("tag",
      concat(lit("t"), (col("id") % 11).cast("string")))
    withTag.coalesce(1).write.format("txlog").mode("append").save(t)
    val r = TxLog.analyze(spark, t, Seq("tag"))
    assert(r.filesSkipped == 0 && r.version >= 0, r.toString)
    // NDV = the 11 real values; the pre-evolution file contributes an
    // all-null (complete-but-empty) sketch, not a refusal
    assert(ndvOf(t, "tag").contains(BigInt(11)), s"tag ${ndvOf(t, "tag")}")
    // and the synthesized null count is served too (5000 nulls exactly)
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val st = spark.read.format("txlog").load(t)
        .queryExecution.optimizedPlan.stats
      val nulls = st.attributeStats.toSeq
        .collectFirst { case (a, cs) if a.name == "tag" => cs }
        .flatMap(_.nullCount)
      assert(nulls.contains(BigInt(5000)), s"tag nulls $nulls")
    }
  }

  test("mixed widen eras hash in one domain: NDV does not double-count") {
    val t = fresh()
    spark.range(4000).select(col("id").cast("int").as("k"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.widenColumnType(spark, t, "k", org.apache.spark.sql.types.LongType)
    // the SAME 4000 values again, now written as longs, plus 1000 new
    spark.range(5000).select(col("id").as("k"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.analyze(spark, t, Seq("k"))
    val ndv = ndvOf(t, "k").map(_.toLong).getOrElse(0L)
    // true NDV 5000; double-counting across eras would read ~9000
    assert(ndv > 4000L && ndv < 6000L, s"k ndv $ndv (5000 true)")
  }

  test("renamed column resolves through the mapping; CALL returns the report") {
    val wh = Files.createTempDirectory("txanalyze_cat_").toString
    withConfs(
      "spark.sql.catalog.anacat" -> "graft.storage.GraftCatalog",
      "spark.sql.catalog.anacat.warehouse" -> wh) {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS anacat.ns")
      spark.sql("CREATE TABLE anacat.ns.t (skey STRING, grp STRING, id BIGINT) USING txlog")
      strDf(6000).write.insertInto("anacat.ns.t")
      spark.sql("ALTER TABLE anacat.ns.t RENAME COLUMN skey TO ukey")
      val row = spark.sql(
        "CALL anacat.system.analyze(table => 'ns.t', columns => 'ukey')").first()
      assert(row.getLong(0) >= 0L && row.getInt(1) >= 1 && row.getInt(2) == 0,
        row.toString)
      val t = s"$wh/ns/t"
      val ndv = ndvOf(t, "ukey").map(_.toLong).getOrElse(0L)
      assert(ndv > 4800L && ndv < 7200L, s"ukey ndv $ndv (6000 true)")
    }
  }

  test("analyze races a concurrent DML: the stats-only commit lands, coverage holds") {
    val t = fresh()
    strDf(4000).coalesce(1).write.format("txlog").mode("append").save(t)
    strDf(4000, 4000).coalesce(1).write.format("txlog").mode("append").save(t)
    // inject a COW DELETE between analyze's stats staging and its
    // publish: the delete REMOVES files analyze just computed stats for
    // and ADDS rewritten ones (which carry write-time sketches — the
    // opt-in property landed before the delete staged)
    graft.storage.TxLog.publishRaceForTests = () => {
      TxLog.delete(spark, t, col("id") % 7 === 3, "race-del", 0L); ()
    }
    val r = try TxLog.analyze(spark, t, Seq("skey"))
      finally graft.storage.TxLog.publishRaceForTests = null
    assert(r.version >= 0, r.toString)
    // values exact after the race (the analyze entries stranded on the
    // removed files are never consulted)
    val expected = strDf(4000).unionAll(strDf(4000, 4000))
      .where(!(col("id") % 7 === 3)).count()
    assert(spark.read.format("txlog").load(t).count() == expected)
    // full sketch coverage: analyze covered the survivors, the delete's
    // rewritten files attached their own -> a real NDV is served
    assert(ndvOf(t, "skey").isDefined, "estimator refused after the race")
  }

  test("refusals are loud: unknown column, never-statable type") {
    val t = fresh()
    spark.range(100).select(col("id"), lit(java.math.BigDecimal.ONE).as("dec"))
      .write.format("txlog").mode("append").save(t)
    val e1 = intercept[IllegalArgumentException](
      TxLog.analyze(spark, t, Seq("nope")))
    assert(e1.getMessage.contains("not in"))
    val e2 = intercept[IllegalArgumentException](
      TxLog.analyze(spark, t, Seq("dec")))
    assert(e2.getMessage.contains("can never carry"))
  }

  test("analyze survives compaction: the property keeps rewrites sketched") {
    val t = fresh()
    strDf(4000).coalesce(1).write.format("txlog").mode("append").save(t)
    strDf(4000, 4000).coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.analyze(spark, t, Seq("skey"))
    assert(ndvOf(t, "skey").isDefined)
    TxLog.compact(spark, t)
    // the checkpoint rewrote every file; write-time attachment (via the
    // property analyze set) kept the column fully sketched
    val ndv = ndvOf(t, "skey").map(_.toLong).getOrElse(0L)
    assert(ndv > 6400L && ndv < 9600L, s"post-compact skey ndv $ndv (8000 true)")
  }

  test("concurrent analyze opt-ins UNION the column list (no lost update)") {
    val t = fresh()
    strDf(2000).coalesce(2).write.format("txlog").mode("append").save(t)
    // two racing analyze calls with DISJOINT column sets: the opt-in
    // property merge recomputes from the freshly-listed props inside
    // the CAS loop, so neither call's columns can be silently dropped
    // (a lost update would stop maintaining the loser's sketches and
    // quietly revert its NDV estimates)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def run(cols: Seq[String]): Runnable = () => {
      gate.await()
      try TxLog.analyze(spark, t, cols)
      catch { case e: Throwable => errs.add(e) }
    }
    pool.submit(run(Seq("skey")))
    pool.submit(run(Seq("grp")))
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(errs.isEmpty, errs.toString)
    val declared = TxLog.properties(spark, t)("graft.stats.ndv.cols")
      .split(',').map(_.trim).toSet
    assert(declared == Set("skey", "grp"),
      s"concurrent opt-ins lost a column: $declared")
    assert(ndvOf(t, "skey").isDefined && ndvOf(t, "grp").isDefined,
      "both racers' sketches must be served")
  }
}
