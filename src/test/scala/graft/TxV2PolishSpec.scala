package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.{TxLog, TxLogV2}

/** The r12 V2 polish surface:
  *
  *  - `option("versionAsOf", v)` — time travel through the PRODUCTION
  *    `format("txlog")` door: same manifest-prefix replay as
  *    [[TxLog.snapshotAt]] (schema as of v, loud beyond-head), pinned
  *    relations are read-only, and zone-map pruning still works inside
  *    the pinned prefix;
  *  - metadata-only aggregates — whole-table count(*)/count(col)/
  *    min/max answered from manifest stats with ZERO data files opened
  *    (plan shows `MetaAgg`), refused (ordinary scan, identical
  *    results) whenever stats can't answer exactly: filters, GROUP BY,
  *    DISTINCT, double (NaN hazard) or string (footer truncation
  *    hazard) extrema. */
class TxV2PolishSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txv2p_").resolve("t").toString

  private def batch(ids: Range, grp: String): DataFrame =
    ids.map(i => (i.toLong, grp, s"name-$i", i * 0.5)).toDF("id", "grp", "name", "score")

  /** v0: [0,100) alpha · v1: [100,200) beta · v2: DELETE id < 50 ·
    * v3: [200,300) gamma — history with a rewrite in the middle. */
  private def history(): String = {
    val t = freshTable()
    batch(0 until 100, "alpha").coalesce(1).write.format("txlog").mode("append").save(t)
    batch(100 until 200, "beta").coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.delete(spark, t, $"id" < 50L, "ttl-del", 0L)
    batch(200 until 300, "gamma").coalesce(1).write.format("txlog").mode("append").save(t)
    t
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def readAt(t: String, v: Long): DataFrame =
    spark.read.format("txlog").option("versionAsOf", v).load(t)

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  // ------------------------------------------------------------------
  // versionAsOf
  // ------------------------------------------------------------------

  test("versionAsOf replays the log prefix exactly (incl. pre-DML rows)") {
    val t = history()
    assert(TxLog.headVersion(spark, t) == 3L)
    for (v <- 0L to 3L) {
      val expected = rows(TxLog.snapshotAt(spark, t, v).get)
      assert(rows(readAt(t, v)) == expected, s"versionAsOf=$v diverged from snapshotAt")
    }
    // v1 still sees the rows v2's DELETE removed; head does not
    assert(readAt(t, 1L).where($"id" < 50L).count() == 50L)
    assert(spark.read.format("txlog").load(t).where($"id" < 50L).count() == 0L)
  }

  test("versionAsOf beyond head / non-numeric is loud, not empty") {
    val t = history()
    val e = intercept[Exception] { readAt(t, 17L).collect() }
    assert(e.getMessage.contains("version 17"), e.getMessage)
    // a non-numeric reference resolves as a NAMED TAG (r16) — an
    // unknown name is loud and names the bad reference
    val e2 = intercept[Exception] {
      spark.read.format("txlog").option("versionAsOf", "tuesday").load(t).collect()
    }
    assert(e2.getMessage.contains("tuesday") &&
      e2.getMessage.contains("no such tag"), e2.getMessage)
  }

  test("versionAsOf serves the schema AS OF the version (pre-evolution)") {
    val t = history()
    // when() keeps the new column nullable (evolution's contract)
    batch(300 until 310, "delta").withColumn("flag", when($"id" >= 0L, true))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    assert(spark.read.format("txlog").load(t).schema.fieldNames.contains("flag"))
    assert(!readAt(t, 3L).schema.fieldNames.contains("flag"),
      "evolved column leaked into a pre-evolution snapshot")
  }

  test("a version-pinned relation is read-only") {
    val t = history()
    val e = intercept[Exception] {
      batch(900 until 910, "x").write.format("txlog")
        .option("versionAsOf", 1L).mode("append").save(t)
    }
    assert(e.getMessage.contains("read-only"), e.getMessage)
    // and it cannot be a stream source (the tail is unpinned by definition)
    val e2 = intercept[Exception] {
      spark.readStream.format("txlog").option("versionAsOf", 1L).load(t)
        .writeStream.format("memory").queryName("ttl_pin_stream")
        .option("checkpointLocation",
          Files.createTempDirectory("ttl_ckpt_").toString)
        .start().processAllAvailable()
    }
    assert(e2.getMessage.contains("versionAsOf")
      || Option(e2.getCause).exists(_.getMessage.contains("versionAsOf")),
      e2.getMessage)
  }

  test("zone-map pruning still applies inside the pinned prefix") {
    val t = history()
    // v1 prefix = 2 one-file generations with disjoint id ranges
    readAt(t, 1L).where($"id" === 150L).collect()
    assert(TxLogV2.lastPrune.get() == ((1, 2)))
  }

  // ------------------------------------------------------------------
  // metadata-only aggregates
  // ------------------------------------------------------------------

  test("whole-table count/min/max answer from the manifest (MetaAgg plan)") {
    val t = history()
    val df = spark.read.format("txlog").load(t)
    val agg = df.agg(
      count(lit(1)).as("n"), min($"id").as("lo"), max($"id").as("hi"),
      count($"name").as("n_name"))
    val r = agg.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((250L, 50L, 299L, 250L)))
    assert(planOf(agg).contains("MetaAgg"),
      s"expected manifest-only aggregate plan: ${planOf(agg)}")
    // Dataset.count() too — the everyday call
    assert(df.count() == 250L)
  }

  test("DML rewrites keep meta-aggregates exact (stats re-collected)") {
    val t = history()
    TxLog.update(spark, t, $"id" === 299L, Map("id" -> lit(1000L)), "ttl-up", 0L)
    val agg = spark.read.format("txlog").load(t).agg(max($"id").as("hi"))
    assert(agg.collect()(0).getLong(0) == 1000L)
    assert(planOf(agg).contains("MetaAgg"))
  }

  test("meta-aggregate at a pinned version: history counts, not head counts") {
    val t = history()
    val agg = readAt(t, 1L).agg(count(lit(1)).as("n"), min($"id").as("lo"))
    val r = agg.collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((200L, 0L)))
    assert(planOf(agg).contains("MetaAgg"))
  }

  test("refusals fall back to the ordinary scan with identical results") {
    val t = history()
    val df = spark.read.format("txlog").load(t)
    val cases: Seq[(String, DataFrame, Seq[String])] = Seq(
      ("filter", df.where($"id" >= 100L).agg(count(lit(1)).as("n")),
        Seq("[200]")),
      ("group by", df.groupBy($"grp").agg(count(lit(1)).as("n")).orderBy($"grp"),
        Seq("[alpha,50]", "[beta,100]", "[gamma,100]")),
      ("distinct", df.agg(countDistinct($"grp").as("n")), Seq("[3]")),
      ("double extremum (NaN hazard)", df.agg(min($"score").as("m")), Seq("[25.0]")),
      ("sum", df.agg(sum($"id").cast("long").as("s")),
        Seq(s"[${(50 until 300).map(_.toLong).sum}]")))
    for ((clue, q, expected) <- cases) {
      assert(rows(q) == expected.sorted, s"$clue: wrong result")
      assert(!planOf(q).contains("MetaAgg"), s"$clue: must NOT push to metadata")
    }
  }

  // ------------------------------------------------------------------
  // exact string extrema (r16): commit-time-collected bounds carry the
  // exact marker (the writer pins statistics truncation OFF), so
  // min/max(string) answers from the manifest like count(*) does
  // ------------------------------------------------------------------

  test("string min/max answer from the manifest when every bound is exact-marked") {
    val t = history() // includes a COW DELETE — rewritten stats re-collect
    val df = spark.read.format("txlog").load(t)
    val agg = df.agg(min($"grp").as("glo"), max($"grp").as("ghi"),
      min($"name").as("nlo"), max($"name").as("nhi"))
    val r = agg.collect()(0)
    assert((r.getString(0), r.getString(1), r.getString(2), r.getString(3)) ==
      (("alpha", "gamma", "name-100", "name-99")),
      r.toString) // unsigned byte order: "name-99" > "name-2xx"
    assert(planOf(agg).contains("MetaAgg"),
      s"exact-marked string extrema must push: ${planOf(agg)}")
  }

  test("unmarked (pre-r16 / uncertified) string bounds refuse; count(*) still pushes") {
    val t = history()
    // simulate pre-feature manifests: strip the exact markers from the
    // GAMMA append's JSON in place (a LIVE file) — its bounds stay
    // pruning-grade while every other live file keeps the marker
    val v3 = java.nio.file.Paths.get(s"$t/_txlog/v${"%020d".format(3)}.json")
    val json = new String(Files.readAllBytes(v3),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(json.contains(", \"x\": \"1\""), "expected exact markers in v3")
    Files.write(v3, json.replace(", \"x\": \"1\"", "")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val df = spark.read.format("txlog").load(t)
    val agg = df.agg(min($"grp").as("glo"))
    assert(agg.collect()(0).getString(0) == "alpha")
    assert(!planOf(agg).contains("MetaAgg"),
      "one uncertified bound must refuse the string push (fallback scan)")
    // integral extrema and count(*) are unaffected by the marker
    val star = df.agg(count(lit(1)).as("n"), max($"id").as("hi"))
    val r = star.collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((250L, 299L)))
    assert(planOf(star).contains("MetaAgg"))
  }

  // ------------------------------------------------------------------
  // startingVersion (stream tail without the snapshot) + history
  // ------------------------------------------------------------------

  test("startingVersion tails from v inclusive, skipping the snapshot") {
    val t = freshTable()
    batch(0 until 100, "alpha").coalesce(1).write.format("txlog").mode("append").save(t)
    batch(100 until 200, "beta").coalesce(1).write.format("txlog").mode("append").save(t)
    batch(200 until 300, "gamma").coalesce(1).write.format("txlog").mode("append").save(t)
    def drain(opt: String): Long = {
      val name = s"sv_${opt.replace("-", "m")}_${System.nanoTime()}"
      val q = spark.readStream.format("txlog").option("startingVersion", opt).load(t)
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", Files.createTempDirectory("sv_ckpt_").toString)
        .start()
      q.processAllAvailable(); q.stop()
      spark.table(name).count()
    }
    assert(drain("1") == 200L, "v1 inclusive = beta + gamma")
    assert(drain("0") == 300L, "v0 = everything")
    assert(drain("latest") == 0L, "latest = only post-start commits")
    val e = intercept[Exception] { drain("9") }
    assert(e.getMessage.contains("startingVersion")
      || Option(e.getCause).exists(_.getMessage.contains("startingVersion")),
      e.getMessage)
  }

  test("history describes the log: one row per version, structural operations") {
    val t = history()
    val h = TxLog.history(spark, t).orderBy($"version").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(h.map(_.getString(1)).toSeq == Seq("APPEND", "APPEND", "REWRITE", "APPEND"))
    assert(h(0).getLong(8) == 100L, "v0 wrote 100 rows")
    assert(h(2).getLong(7) > 0L, "the DELETE removed files")
    assert(h.forall(_.getLong(10) == 0L), "no change feed here -> n_changes 0")
    // every commit records its wall clock, and monotonized order holds
    val ts = h.map(_.getTimestamp(2))
    assert(ts.forall(_ != null), "new commits must carry timestamps")
    assert(ts.sliding(2).forall(p => !p(1).before(p(0))),
      "in-process commits are clock-ordered")
    // SQL DML goes through the V2 writer-id namespace -> named statement
    spark.read.format("txlog").load(t).createOrReplaceTempView("ttl_hist_now")
    val p = freshTable()
    batch(0 until 10, "a").coalesce(1).write.format("txlog").mode("append").save(p)
    spark.sql(s"CREATE TABLE ttl_hist_t USING txlog OPTIONS (path '$p')")
    try {
      spark.sql("DELETE FROM ttl_hist_t WHERE id < 3")
      val ops = TxLog.history(spark, p).orderBy($"version")
        .collect().map(_.getString(1)).toSeq
      assert(ops == Seq("APPEND", "DELETE"), ops.toString)
    } finally spark.sql("DROP TABLE ttl_hist_t")
  }

  test("meta-aggregate × evolution: an evolved column refuses (some files have no stats for it), count(*) still pushes") {
    val t = history()
    batch(300 until 310, "delta").withColumn("flag", when($"id" >= 0L, true))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    val df = spark.read.format("txlog").load(t)
    val evolved = df.agg(count($"flag").as("n"))
    assert(evolved.collect()(0).getLong(0) == 10L)
    assert(!planOf(evolved).contains("MetaAgg"),
      "count(evolved col) must fall back: pre-evolution files carry no stats for it")
    val star = df.agg(count(lit(1)).as("n"))
    assert(star.collect()(0).getLong(0) == 260L)
    assert(planOf(star).contains("MetaAgg"))
  }

  test("emptied table: count 0 / null extrema straight from the log") {
    val t = freshTable()
    batch(0 until 10, "a").coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.delete(spark, t, lit(true), "ttl-wipe", 0L)
    val agg = spark.read.format("txlog").load(t)
      .agg(count(lit(1)).as("n"), min($"id").as("lo"))
    val r = agg.collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1))
    assert(planOf(agg).contains("MetaAgg"))
  }
}
