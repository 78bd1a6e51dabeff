package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.{Materialized, TxLog}

/** Incrementally maintained aggregates ([[Materialized]]): the view
  * equals a full recompute after EVERY interleaving the feed can
  * produce — appends, COW DML, merge-on-read DML, compaction, restore
  * — and every refresh is exactly-once (the merge token IS the
  * cursor, so replays are no-ops). */
class TxMviewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val spec = Materialized.Spec(groupBy = Seq("grp"), sums = Seq("amount"))

  private def fresh(name: String): String =
    Files.createTempDirectory(name).resolve("t").toString

  private def rows(ids: Range, g: Int => String, amt: Int => Double) =
    ids.map(i => (i.toLong, g(i), amt(i))).toDF("id", "grp", "amount")

  /** Full recompute of what the view should hold. */
  private def expected(source: String): Map[String, (Long, Double)] =
    TxLog.snapshot(spark, source).get
      .groupBy("grp").agg(count(lit(1)).as("n_rows"), sum("amount").as("amount_sum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  private def view(target: String) =
    Materialized.read(spark, target)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_rows"),
        r.getAs[Double]("amount_sum"))).map(t => t._1 -> (t._2, t._3)).toMap

  private def assertCurrent(source: String, target: String, clue: String): Unit =
    assert(view(target) == expected(source), s"$clue: view diverged from recompute")

  test("view == recompute through appends, COW DML, compaction, restore") {
    val src = fresh("mv_src_"); val tgt = fresh("mv_tgt_")
    TxLog.createTable(spark, src, rows(0 until 0, _ => "", _ => 0).schema,
      props = Map(TxLog.ChangeFeedProp -> "true"))
    rows(0 until 100, i => s"g${i % 3}", _.toDouble)
      .write.format("txlog").mode("append").save(src)
    assert(Materialized.refresh(spark, src, tgt, spec) == 1L)
    assertCurrent(src, tgt, "after first append")
    // more appends + a COW delete + an update, all in one window
    rows(100 until 200, i => s"g${i % 5}", i => i * 2.0)
      .write.format("txlog").mode("append").save(src)
    TxLog.delete(spark, src, col("id") % 7 === 0, "d", 0L)
    TxLog.update(spark, src, col("id") % 11 === 0,
      Map("amount" -> (col("amount") + 1000.0)), "u", 0L)
    Materialized.refresh(spark, src, tgt, spec)
    assertCurrent(src, tgt, "after append+delete+update")
    // compaction is feed-transparent; restore records its delta
    TxLog.compact(spark, src)
    Materialized.refresh(spark, src, tgt, spec)
    assertCurrent(src, tgt, "after compaction (empty delta window)")
    val preHead = TxLog.headVersion(spark, src)
    rows(200 until 220, _ => "gx", _ => 5.0)
      .write.format("txlog").mode("append").save(src)
    TxLog.restore(spark, src, preHead) // drops the gx generation again
    Materialized.refresh(spark, src, tgt, spec)
    assertCurrent(src, tgt, "after append+restore")
    // the zeroed group is tombstoned out of read()
    assert(!view(tgt).contains("gx"))
  }

  test("merge-on-read source: DV deltas fold exactly") {
    val src = fresh("mv_mor_"); val tgt = fresh("mv_mtg_")
    TxLog.createTable(spark, src, rows(0 until 0, _ => "", _ => 0).schema,
      props = Map(TxLog.ChangeFeedProp -> "true",
        TxLog.DmlModeProp -> TxLog.DmlModeMor))
    rows(0 until 300, i => s"g${i % 4}", _.toDouble)
      .write.format("txlog").mode("append").save(src)
    Materialized.refresh(spark, src, tgt, spec)
    TxLog.delete(spark, src, col("id") % 3 === 0, "d", 0L) // DV only, no rewrite
    TxLog.update(spark, src, col("id") % 10 === 1,
      Map("amount" -> (col("amount") * 10)), "u", 0L)
    Materialized.refresh(spark, src, tgt, spec)
    assertCurrent(src, tgt, "after MoR delete+update")
  }

  test("refresh is exactly-once: replays are token no-ops, interleaved or not") {
    val src = fresh("mv_r_"); val tgt = fresh("mv_rt_")
    TxLog.createTable(spark, src, rows(0 until 0, _ => "", _ => 0).schema,
      props = Map(TxLog.ChangeFeedProp -> "true"))
    rows(0 until 50, i => s"g${i % 2}", _ => 1.0)
      .write.format("txlog").mode("append").save(src)
    val v1 = Materialized.refresh(spark, src, tgt, spec)
    // an immediate replay of the same window must not double-apply
    assert(Materialized.refresh(spark, src, tgt, spec) == v1)
    assertCurrent(src, tgt, "after replayed refresh")
    // crash-sim: the merge committed but the caller died — the NEXT
    // refresh recovers the cursor from the token and applies only the
    // genuinely new window
    rows(50 until 60, _ => "g9", _ => 2.0)
      .write.format("txlog").mode("append").save(src)
    Materialized.refresh(spark, src, tgt, spec)
    Materialized.refresh(spark, src, tgt, spec)
    assertCurrent(src, tgt, "after double refresh of the second window")
    // and the counts are exact, not just set-equal
    assert(view(tgt)("g9") == (10L, 20.0))
  }

  test("continuous maintenance: the streamed view tracks recompute across restart") {
    val src = fresh("mv_c_"); val tgt = fresh("mv_ct_")
    val ckpt = Files.createTempDirectory("mv_ckpt_").toString
    TxLog.createTable(spark, src, rows(0 until 0, _ => "", _ => 0).schema,
      props = Map(TxLog.ChangeFeedProp -> "true"))
    rows(0 until 100, i => s"g${i % 3}", _.toDouble)
      .write.format("txlog").mode("append").save(src)
    val q1 = Materialized.continuous(spark, src, tgt, spec, ckpt)
    try {
      q1.processAllAvailable()
      assertCurrent(src, tgt, "streamed: snapshot epoch")
      rows(100 until 150, i => s"g${i % 4}", i => i * 3.0)
        .write.format("txlog").mode("append").save(src)
      TxLog.delete(spark, src, col("id") % 5 === 2, "d", 0L)
      q1.processAllAvailable()
      assertCurrent(src, tgt, "streamed: append + delete epochs")
    } finally q1.stop()
    // commits while the stream is DOWN, then restart from the same
    // checkpoint: the missed window folds exactly once
    TxLog.update(spark, src, col("id") % 9 === 0,
      Map("amount" -> (col("amount") + 50.0)), "u", 0L)
    rows(150 until 160, _ => "gz", _ => 7.0)
      .write.format("txlog").mode("append").save(src)
    val q2 = Materialized.continuous(spark, src, tgt, spec, ckpt)
    try {
      q2.processAllAvailable()
      assertCurrent(src, tgt, "streamed: restart catch-up")
    } finally q2.stop()
  }

  // ---- MIN/MAX hybrid maintenance (r14) ---------------------------

  private val specMx = Materialized.Spec(groupBy = Seq("grp"),
    sums = Seq("amount"), mins = Seq("amount"), maxs = Seq("amount"))

  private def expectedMx(source: String): Map[String, (Long, Double, Double, Double)] =
    TxLog.snapshot(spark, source).get
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("amount").as("s"),
        min("amount").as("mn"), max("amount").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

  private def viewMx(target: String): Map[String, (Long, Double, Double, Double)] =
    Materialized.read(spark, target)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("amount_sum"),
          r.getAs[Double]("amount_min"), r.getAs[Double]("amount_max"))).toMap

  test("MIN/MAX hybrid: pure-fold inserts, rescan only on extremum retraction") {
    val src = fresh("mvx_src_"); val tgt = fresh("mvx_tgt_")
    TxLog.createTable(spark, src, rows(0 until 0, _ => "", _ => 0).schema,
      props = Map(TxLog.ChangeFeedProp -> "true"))
    // window 1: pure inserts — extrema fold without any rescan
    rows(0 until 90, i => s"g${i % 3}", i => i.toDouble)
      .write.format("txlog").mode("append").save(src)
    Materialized.refresh(spark, src, tgt, specMx)
    assert(viewMx(tgt) == expectedMx(src), "after pure inserts")
    // window 2: delete NON-extremum rows (g0's min is id=0, max id=87;
    // deleting mid-range ids must stay exact — fold or rescan)
    TxLog.delete(spark, src, col("id") === 42L || col("id") === 45L, "d1", 0L)
    Materialized.refresh(spark, src, tgt, specMx)
    assert(viewMx(tgt) == expectedMx(src), "after mid-range delete")
    // window 3: delete THE minimum of g0 (id=0) and THE maximum of g1
    // (id=88) — the retraction rescan must find the next extrema
    TxLog.delete(spark, src, col("id") === 0L || col("id") === 88L, "d2", 0L)
    Materialized.refresh(spark, src, tgt, specMx)
    assert(viewMx(tgt) == expectedMx(src), "after extremum deletes")
    // window 4: an UPDATE that lowers a group's min below everything
    // (retract + insert through the feed) and inserts in the same window
    TxLog.update(spark, src, col("id") === 50L,
      Map("amount" -> lit(-999.0)), "u1", 0L)
    rows(90 until 120, i => s"g${i % 3}", i => i * 3.0)
      .write.format("txlog").mode("append").save(src)
    Materialized.refresh(spark, src, tgt, specMx)
    assert(viewMx(tgt) == expectedMx(src), "after update+append window")
    // window 5: empty one group entirely -> tombstone (filtered from
    // read), then refill it -> fresh extrema
    TxLog.delete(spark, src, col("grp") === "g2", "d3", 0L)
    Materialized.refresh(spark, src, tgt, specMx)
    assert(viewMx(tgt) == expectedMx(src), "after emptying g2")
    assert(!viewMx(tgt).contains("g2"))
    rows(200 until 206, _ => "g2", i => i * 1.5)
      .write.format("txlog").mode("append").save(src)
    Materialized.refresh(spark, src, tgt, specMx)
    assert(viewMx(tgt) == expectedMx(src), "after refilling g2")
    // MoR source: extremum delete through deletion vectors
    TxLog.setProperties(spark, src, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.delete(spark, src, col("amount") === -999.0, "d4", 0L)
    Materialized.refresh(spark, src, tgt, specMx)
    assert(viewMx(tgt) == expectedMx(src), "after MoR extremum delete")
  }

  test("over-cap windows bound driver memory: snapshot current read, semi-join rescan") {
    // r15: a wide window must never collect every touched group key to
    // the driver — under a shrunk cap, a many-group refresh takes the
    // full-snapshot current read, and a many-group extremum retraction
    // takes the left-semi-join rescan (no isin literal), both exact.
    val src = fresh("mvcap_src_"); val tgt = fresh("mvcap_tgt_")
    TxLog.createTable(spark, src, rows(0 until 0, _ => "", _ => 0).schema,
      props = Map(TxLog.ChangeFeedProp -> "true"))
    val saved = Materialized.MaxPruneKeys
    Materialized.MaxPruneKeys = 5
    try {
      // 20 groups of 3 rows each: over the cap of 5 on every path
      rows(0 until 60, i => s"g${i % 20}", i => i.toDouble)
        .write.format("txlog").mode("append").save(src)
      Materialized.refresh(spark, src, tgt, specMx)
      assert(Materialized.lastFoldPaths._1 == "snapshot",
        s"expected over-cap snapshot read, took ${Materialized.lastFoldPaths}")
      assert(viewMx(tgt) == expectedMx(src), "after over-cap insert window")
      // delete every group's MINIMUM (ids 0..19) — 20 retracted groups
      // force the rescan over the cap → semi-join, never a 20-key isin
      TxLog.delete(spark, src, col("id") < 20L, "d", 0L)
      Materialized.refresh(spark, src, tgt, specMx)
      assert(Materialized.lastFoldPaths._2 == "semijoin",
        s"expected over-cap semi-join rescan, took ${Materialized.lastFoldPaths}")
      assert(viewMx(tgt) == expectedMx(src), "after over-cap extremum retraction")
      // an under-cap window still takes the pruned paths
      TxLog.delete(spark, src, col("id") === 20L, "d2", 0L) // g0's new min
      Materialized.refresh(spark, src, tgt, specMx)
      assert(Materialized.lastFoldPaths == ("isin", "isin"),
        s"expected pruned paths under the cap, took ${Materialized.lastFoldPaths}")
      assert(viewMx(tgt) == expectedMx(src), "after under-cap retraction")
    } finally Materialized.MaxPruneKeys = saved
  }

  test("MIN/MAX refresh is exactly-once and survives a concurrent writer") {
    val src = fresh("mvx2_src_"); val tgt = fresh("mvx2_tgt_")
    TxLog.createTable(spark, src, rows(0 until 0, _ => "", _ => 0).schema,
      props = Map(TxLog.ChangeFeedProp -> "true"))
    rows(0 until 60, i => s"g${i % 2}", i => i.toDouble)
      .write.format("txlog").mode("append").save(src)
    // delete the global min, then refresh TWICE: the second is a token
    // no-op (the rescan must not double-apply)
    TxLog.delete(spark, src, col("id") === 0L, "d", 0L)
    val v1 = Materialized.refresh(spark, src, tgt, specMx)
    // a writer lands PAST the window before the replay — the replayed
    // window must still fold exactly once
    rows(100 until 110, _ => "g0", _ => 5000.0)
      .write.format("txlog").mode("append").save(src)
    assert(Materialized.refresh(spark, src, tgt, specMx) > v1)
    assert(viewMx(tgt) == expectedMx(src), "after replay + concurrent append")
  }

  test("refusals and the append-only grace: feed-off appends fold, feed-off DML is loud") {
    // append-only history needs no enabled feed — appends ARE their own
    // change record, so a rollup over a plain ingest table just works
    val src = fresh("mv_n_")
    rows(0 until 10, _ => "g", _ => 1.0).write.format("txlog").mode("append").save(src)
    val tgt = fresh("mv_nt_")
    Materialized.refresh(spark, src, tgt, spec)
    assertCurrent(src, tgt, "feed-off append-only")
    // ... but a DML version with no captured delta must refuse, not
    // silently serve a gap
    TxLog.delete(spark, src, col("id") === 1L, "d", 0L)
    val e = intercept[Exception](Materialized.refresh(spark, src, tgt, spec))
    assert(e.getMessage.toLowerCase.contains("change feed") ||
      e.getMessage.toLowerCase.contains("changefeed"), e.getMessage)
    intercept[IllegalArgumentException](
      Materialized.Spec(groupBy = Seq("g"), sums = Seq("g")))
    intercept[IllegalArgumentException](
      Materialized.Spec(groupBy = Seq.empty, sums = Seq("amount")))
  }

  test("NULL group keys are refused loudly (merge matching is null-rejecting)") {
    // r13 review finding: merge APPENDS null-keyed source rows next to
    // the surviving old row, so a null group would accumulate one
    // partial row per refresh — the fold must refuse instead
    val src = fresh("mv_null_"); val tgt = fresh("mv_nullt_")
    Seq((0L, "g0", 1.0), (1L, null.asInstanceOf[String], 2.0), (2L, null.asInstanceOf[String], 3.0))
      .toDF("id", "grp", "amount")
      .write.format("txlog").mode("append").save(src)
    val e = intercept[IllegalArgumentException](
      Materialized.refresh(spark, src, tgt, spec))
    assert(e.getMessage.contains("NULL"), e.getMessage)
    // coalescing upstream is the documented path: a view over the
    // coalesced source folds the same rows fine
    assert(TxLog.headVersion(spark, tgt) <= 0L,
      "refused refresh must not have merged data into the view")
  }

  test("metadata-only FIRST window still creates the view with schema and provenance") {
    // r13 review finding: the empty-delta token commit used to run
    // BEFORE create-if-absent, permanently forfeiting the declared
    // schema + SourceProp/SpecProp when the first window held only
    // metadata commits
    val src = fresh("mv_meta_"); val tgt = fresh("mv_metat_")
    TxLog.createTable(spark, src, rows(0 until 0, _ => "", _ => 0).schema,
      props = Map(TxLog.ChangeFeedProp -> "true"))
    TxLog.setProperties(spark, src, Map("owner" -> "spec")) // v1, metadata-only
    assert(Materialized.refresh(spark, src, tgt, spec) == 1L)
    val props = TxLog.properties(spark, tgt)
    assert(props.get(Materialized.SourceProp).contains(src), props.toString)
    assert(props.contains(Materialized.SpecProp), props.toString)
    // the declared schema binds later folds: real data now arrives and
    // the view reads back with the spec's column names
    rows(0 until 30, i => s"g${i % 2}", _.toDouble)
      .write.format("txlog").mode("append").save(src)
    Materialized.refresh(spark, src, tgt, spec)
    assertCurrent(src, tgt, "fold after metadata-only first window")
  }
}
