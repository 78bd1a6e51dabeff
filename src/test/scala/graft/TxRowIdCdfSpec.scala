package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** ID-PAIRED CHANGE FEED (r18): the change feed serves `_row_id` —
  * change files STORE each d/i row's id at capture (the d-side's from
  * the pre-image read, the i-side's from stored/adopted grid or the
  * commit's pre-assigned allocation), and append entries derive
  * `firstRowId + position` through the same reader rule as the main
  * scan ([[graft.storage.TxRowId]]).
  *
  * The semantics that make the ids USEFUL to a consumer:
  *  - keyed upserts ADOPT the replaced row's id ([[TxLog.adoptGrid]]):
  *    an identical re-upsert is a no-op in value AND id space (feed
  *    silent, snapshot id stable), and an UPDATE-shaped upsert's
  *    retract/add pair SHARES one id — the pairing the feed consumer
  *    needs;
  *  - COW and MoR UPDATE preserve ids (library and SQL doors alike);
  *  - ids survive compaction, so a consumer pairs events across any
  *    layout churn. */
class TxRowIdCdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("txridcdf_").resolve("t").toString

  /** feed table, two appends: ids 0..3 ("a"), 4..7 ("b") */
  private def build(): String = {
    val t = fresh()
    spark.range(4).select(col("id"), lit("a").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    spark.range(4, 8).select(col("id"), lit("b").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    t
  }

  private def feed(t: String, from: Long = 0L): Seq[(Long, String, Option[Long], Long, String)] =
    spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", from.toString).load(t)
      .select(col("_commit_version"), col("_change_type"), col("_row_id"),
        col("id"), col("v"))
      .as[(Long, String, Option[Long], Long, String)]
      .collect().toSeq.sortBy(r => (r._1, r._2, r._4))

  private def ids(t: String): Map[Long, (Long, String)] =
    TxLog.snapshotLineage(spark, t).get
      .select("_row_id", "id", "v").as[(Long, Long, String)]
      .collect().map { case (r, i, v) => r -> (i, v) }.toMap

  test("appends serve derived ids through the feed; every row is id-paired") {
    val t = build()
    val f = feed(t)
    assert(f.size == 8)
    assert(f.forall(_._3.isDefined), "append feed rows must carry _row_id")
    assert(f.map(_._3.get).toSet == (0L to 7L).toSet)
    // feed ids == snapshot ids, row for row
    assert(f.map(r => r._3.get -> ((r._4, r._5))).toMap == ids(t))
  }

  test("keyed upsert: identical re-upsert silent AND id-stable; update's " +
      "d/i pair shares the adopted id; fresh keys mint") {
    val t = build()
    val before = ids(t)
    val head0 = TxLog.headVersion(spark, t)
    // id 2's row updated, id 5's re-upserted identically, id 100 fresh
    TxLog.upsertByKeys(Seq((2L, "U"), (5L, "b"), (100L, "n")).toDF("id", "v"),
      t, Seq("id"), "u", 0L)
    val v = TxLog.headVersion(spark, t)
    assert(v > head0)
    val after = ids(t)
    val rid2 = before.find(_._2 == ((2L, "a"))).get._1
    val rid5 = before.find(_._2 == ((5L, "b"))).get._1
    // adoption: the updated row KEEPS its id; the identical one is untouched
    assert(after(rid2) == ((2L, "U")), "updated row must adopt its prior id")
    assert(after(rid5) == ((5L, "b")), "identical re-upsert must keep the id")
    val f = feed(t, v).filter(_._1 == v)
    // the identical re-upsert is SILENT (no rows for id 5)
    assert(!f.exists(_._4 == 5L), s"identical re-upsert leaked into the feed: $f")
    // the update pairs by id: d and i share rid2
    val dIds = f.filter(_._2 == "delete").flatMap(_._3)
    val iById = f.filter(_._2 == "insert").map(r => r._4 -> r._3.get).toMap
    assert(dIds == Seq(rid2), s"delete side: $f")
    assert(iById(2L) == rid2, "the update's insert must carry the SAME id")
    // the fresh key minted a new id
    assert(!before.contains(iById(100L)) && after(iById(100L)) == ((100L, "n")))
  }

  test("ids pair across compaction: a keyed delete AFTER compact retracts " +
      "the ids the consumer learned BEFORE it") {
    val t = build()
    TxLog.upsertByKeys(Seq((0L, "Z")).toDF("id", "v"), t, Seq("id"), "u", 0L)
    val preCompact = ids(t)
    assert(TxLog.compact(spark, t) > 0L) // feed- and id-invariant
    val vDel = {
      TxLog.deleteByKeys(Seq(3L, 6L).toDF("id"), t, "d", 0L)
      TxLog.headVersion(spark, t)
    }
    val f = feed(t, vDel).filter(_._1 == vDel)
    assert(f.forall(_._2 == "delete") && f.size == 2)
    val expect = preCompact.collect { case (r, (i, _)) if i == 3L || i == 6L => r }.toSet
    assert(f.flatMap(_._3).toSet == expect,
      "post-compact deletes must carry the PRE-compact ids — pairing across layout churn")
  }

  test("COW and MoR UPDATE both preserve ids through the SQL and library doors") {
    val t = build()
    val before = ids(t)
    // library COW update
    TxLog.update(spark, t, col("id") === 1L, Map("v" -> lit("X")), "w", 0L)
    val rid1 = before.find(_._2._1 == 1L).get._1
    assert(ids(t)(rid1) == ((1L, "X")))
    // library MoR update (r18: preserved, was mint-fresh)
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.update(spark, t, col("id") === 2L, Map("v" -> lit("Y")), "w", 1L)
    val rid2 = before.find(_._2._1 == 2L).get._1
    assert(ids(t)(rid2) == ((2L, "Y")), "MoR update must keep the row's id")
    // the MoR update's feed pair shares the id
    val v = TxLog.headVersion(spark, t)
    val f = feed(t, v).filter(_._1 == v)
    assert(f.flatMap(_._3).distinct == Seq(rid2), s"MoR update pair: $f")
    // SQL COW door (fresh table to reset dml mode)
    val t2 = build()
    val b2 = ids(t2)
    val name = s"ridcdf_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $name USING txlog OPTIONS (path '$t2')")
    try {
      spark.sql(s"UPDATE $name SET v = 'Q' WHERE id = 3")
      val rid3 = b2.find(_._2._1 == 3L).get._1
      assert(ids(t2)(rid3) == ((3L, "Q")),
        "SQL COW UPDATE must preserve ids (ReplaceData metadata writeback)")
      spark.sql(s"DELETE FROM $name WHERE id = 0")
      val rid0 = b2.find(_._2._1 == 0L).get._1
      assert(!ids(t2).contains(rid0), "deleted id gone")
      assert(ids(t2)(rid3) == ((3L, "Q")), "survivors keep ids through SQL DELETE")
      // SQL MoR door (r19 — the fourth and last UPDATE door): the
      // delta writer's reinsert post-image ADOPTS the scanned id
      // (metadata-carried), so a _row_id-keyed consumer sees an
      // update, not a phantom delete+insert of different rows
      TxLog.setProperties(spark, t2, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
      val vPre = TxLog.headVersion(spark, t2)
      spark.sql(s"UPDATE $name SET v = 'R' WHERE id = 5")
      val rid5 = b2.find(_._2._1 == 5L).get._1
      assert(ids(t2)(rid5) == ((5L, "R")),
        "SQL MoR UPDATE must preserve ids (delta reinsert adoption)")
      val fm = feed(t2, vPre + 1).filter(_._1 > vPre)
      assert(fm.flatMap(_._3).distinct == Seq(rid5),
        s"SQL MoR update pair must share one id: $fm")
      // and a SQL MoR MERGE: matched post-images adopt, fresh inserts mint
      Seq((6L, "S"), (60L, "s")).toDF("id", "v").createOrReplaceTempView("src_ridcdf")
      spark.sql(s"MERGE INTO $name t USING src_ridcdf s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET v = s.v " +
        "WHEN NOT MATCHED THEN INSERT *")
      val rid6 = b2.find(_._2._1 == 6L).get._1
      assert(ids(t2)(rid6) == ((6L, "S")),
        "SQL MoR MERGE matched post-image must adopt the scanned id")
      assert(ids(t2).exists { case (r, (i, v)) => i == 60L && v == "s" && !b2.contains(r) },
        "SQL MoR MERGE unmatched insert mints a fresh id")
    } finally spark.sql(s"DROP TABLE $name")
  }

  test("merge on a feed table adopts ids; the downstream consumer tracks " +
      "an update+merge+compact+delete history exactly (values AND ids)") {
    val t = build()
    TxLog.merge(Seq((4L, "M"), (50L, "m")).toDF("id", "v"), t, Seq("id"), "m", 0L)
    assert(TxLog.compactSmall(spark, t, targetBytes = 1L << 30) > 0L)
    TxLog.deleteByKeys(Seq(7L).toDF("id"), t, "d", 0L)
    TxLog.update(spark, t, col("id") === 0L, Map("v" -> lit("E")), "w", 0L)
    // replay the feed as an id-keyed consumer
    val all = feed(t)
    val lastV = all.groupBy(_._3.get).view.mapValues(_.map(_._1).max).toMap
    val consumer = all.filter(r => r._1 == lastV(r._3.get) && r._2 == "insert")
      .map(r => r._3.get -> ((r._4, r._5))).toMap
    assert(consumer == ids(t),
      s"consumer ${consumer.toSeq.sortBy(_._1)} vs snapshot ${ids(t).toSeq.sortBy(_._1)}")
  }

  test("the CDF STREAM still serves id-carrying captures (values exact; " +
      "_row_id is a batch-read column)") {
    val t = build()
    val name = s"txridcdf_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("txlog").option("readChangeFeed", "true")
      .load(t).writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("txridcdf_s_").toString)
      .start()
    q.processAllAvailable() // initial snapshot: 8 inserts
    TxLog.upsertByKeys(Seq((2L, "U")).toDF("id", "v"), t, Seq("id"), "u", 0L)
    q.processAllAvailable(); q.stop() // tail: the id-carrying capture pair
    val got = spark.table(name)
    assert(!got.columns.contains("_row_id"),
      "the DEFAULT stream schema carries the value feed only")
    // the snapshot batch + the upsert tail, exact values
    assert(got.count() == 10L) // 8 snapshot inserts + d/i pair
    assert(got.where(col("_change_type") === "delete").count() == 1L)
  }

  test("withRowIds STREAM: the feed schema carries _row_id — snapshot ids " +
      "match lineage (through a DV'd snapshot), tail pairs share the id") {
    val t = build()
    // MoR-delete one row BEFORE the stream: the initial snapshot must
    // exclude it while the survivors keep their derived ids
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.delete(spark, t, col("id") === 7L, "d0", 0L)
    val lineage = ids(t)
    val name = s"txridcdfw_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("txlog").option("readChangeFeed", "true")
      .option("withRowIds", "true")
      .load(t).writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("txridcdfw_").toString)
      .start()
    q.processAllAvailable()
    val snap = spark.table(name)
      .select(col("_row_id"), col("id"), col("v"))
      .as[(Long, Long, String)].collect().map { case (r, i, v) => r -> ((i, v)) }.toMap
    assert(snap == lineage, s"snapshot ids: $snap vs $lineage")
    val head0 = TxLog.headVersion(spark, t) // snapshot rows carry this version
    TxLog.upsertByKeys(Seq((2L, "U")).toDF("id", "v"), t, Seq("id"), "u", 0L)
    q.processAllAvailable(); q.stop()
    val tail = spark.table(name)
      .where(col("_commit_version") > head0)
      .select(col("_change_type"), col("_row_id"), col("id"), col("v"))
      .as[(String, Long, Long, String)].collect().toSeq.sortBy(_._1)
    val rid2 = lineage.collectFirst { case (r, (2L, _)) => r }.get
    assert(tail == Seq(("delete", rid2, 2L, "a"), ("insert", rid2, 2L, "U")),
      s"the streamed pair must share the adopted id: $tail")
  }

  test("a concurrent BRANCH commit minting ids during a feed upsert's " +
      "capture REBASES (r19: fresh mints are offsets, resolved at publish)") {
    val t = build()
    TxLog.createBranch(spark, t, "side")
    // injected between the upsert's capture and its publish: the branch
    // commit mints ids from the shared global counter. r18 pre-assigned
    // the capture's i-side ids and had to conflict here; r19 stores
    // only the commit-relative offset, so the publish re-allocates past
    // the branch commit and the staged capture stays valid verbatim.
    val upserted = Seq((2L, "U"), (100L, "n")).toDF("id", "v")
    TxLog.upsertByKeys(upserted, t, Seq("id"),
      "u", 0L, beforeCommit = () =>
        TxLog.onBranch("side") {
          TxLog.commit(Seq((500L, "b")).toDF("id", "v"), t, "bw", 0L)
          ()
        })
    // main: 8 pre-fork ids (id 2 ADOPTED) + 1 fresh mint (key 100);
    // branch: 8 pre-fork + 1 branch mint. All distinct globally.
    val mainIds = ids(t)
    val brIds = TxLog.onBranch("side") {
      TxLog.snapshotLineage(spark, t).get
        .select("_row_id").as[Long].collect().toSet
    }
    assert(mainIds.size == 9 && brIds.size == 9 &&
      (mainIds.keySet ++ brIds).size == 10,
      s"ids must stay globally unique across lineages: $mainIds / $brIds")
    // the FEED serves the rebased commit's true ids: the fresh mint's
    // id in the feed equals its id in the snapshot (resolved from the
    // manifest's recorded base, not from a stale pre-assignment)
    val f = feed(t).filter(_._4 == 100L)
    assert(f.nonEmpty && f.forall(_._3 ==
      mainIds.collectFirst { case (r, (100L, _)) => r }),
      s"feed id of the fresh mint must match the snapshot: $f vs $mainIds")
    TxLog.dropBranch(spark, t, "side")
  }

  test("a concurrent APPEND during a feed-table MoR UPDATE's capture " +
      "REBASES under writeSerializable (no id-allocation conflict), and " +
      "the feed's fresh ids stay snapshot-true") {
    val t = build()
    TxLog.setProperties(spark, t, Map(
      TxLog.DmlModeProp -> TxLog.DmlModeMor,
      TxLog.IsolationProp -> TxLog.IsolationWriteSerializable))
    // MoR UPDATE captures a d/i pair (i-side = staged post-image rows,
    // ids ADOPTED); the injected append mints ids between capture and
    // publish. r18's rid-base guard conflicted; r19 rebases — the
    // adopted ids are historical and the capture carries no absolutes.
    TxLog.update(spark, t, col("id") === 1L,
      Map("v" -> lit("Z")), "w", 0L, beforeCommit = () => {
        spark.range(200, 204).select(col("id"), lit("x").as("v"))
          .coalesce(1).write.format("txlog").mode("append").save(t)
        ()
      })
    val m = ids(t)
    assert(m.size == 12, s"8 originals + 4 appended: $m")
    assert(m.exists { case (_, (1L, v)) => v == "Z"; case _ => false })
    // feed replay equals snapshot, row for row, id for id — including
    // the appended rows' derived ids and the update pair's shared id
    val all = feed(t)
    val lastV = all.groupBy(_._3.get).view.mapValues(_.map(_._1).max).toMap
    val consumer = all.filter(r => r._1 == lastV(r._3.get) && r._2 == "insert")
      .map(r => r._3.get -> ((r._4, r._5))).toMap
    assert(consumer == m, s"consumer $consumer vs snapshot $m")
  }

  test("mixed capture formats in ONE withRowIds window: an upsert's " +
      "offset-resolved `-i2` entries and a branch merge's absolute-id " +
      "`-i` entries serve snapshot-true ids through the same read") {
    val t = build()
    TxLog.setProperties(spark, t,
      Map(TxLog.IsolationProp -> TxLog.IsolationWriteSerializable))
    // -i2 capture: keyed upsert (id 2 adopted, key 100 offset-resolved)
    TxLog.upsertByKeys(Seq((2L, "U"), (100L, "n")).toDF("id", "v"),
      t, Seq("id"), "u", 0L)
    // the merge needs a debt-free fork — materialize main's key debt
    // (row-invariant eqdrop commit; the feed stays silent) then fork
    assert(TxLog.materializeEqDels(spark, t).version > 0L)
    // -i capture: a staged branch merged past a diverged main — the
    // merge capture reads COMMITTED branch files (absolute ids)
    TxLog.createBranch(spark, t, "st")
    TxLog.onBranch("st") {
      TxLog.commit(Seq((200L, "b")).toDF("id", "v"), t, "bw", 0L)
    }
    spark.range(300, 302).select(col("id"), lit("m").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    assert(TxLog.mergeBranch(spark, t, "st") > 0L)
    // one id-keyed replay over the whole window = the snapshot, exactly
    val all = feed(t)
    assert(all.forall(_._3.isDefined), s"every feed row id-bearing: $all")
    val lastV = all.groupBy(_._3.get).view.mapValues(_.map(_._1).max).toMap
    val consumer = all.filter(r => r._1 == lastV(r._3.get) && r._2 == "insert")
      .map(r => r._3.get -> ((r._4, r._5))).toMap
    assert(consumer == ids(t), s"consumer $consumer vs snapshot ${ids(t)}")
  }

  test("`-i2` resolution survives the foreign-manifest sweep: the base is " +
      "the MANIFEST-RECORDED nrid, not a log derivation a vacuumed " +
      "dropped-branch commit could shift") {
    val t = build()
    // a branch commit mints ids from the shared counter...
    TxLog.createBranch(spark, t, "tmp")
    TxLog.onBranch("tmp") {
      TxLog.commit(spark.range(1000, 1100).selectExpr("id", "'b' as v")
        .coalesce(1).toDF(), t, "bw", 0L)
      ()
    }
    // ...so the upsert's allocation base sits PAST 100 branch mints
    TxLog.upsertByKeys(Seq((2L, "U"), (100L, "n")).toDF("id", "v"),
      t, Seq("id"), "u", 0L)
    val vU = TxLog.headVersion(spark, t)
    val want = ids(t) // snapshot truth before any sweep
    // drop the branch, pin main's below-checkpoint prefix with a tag,
    // checkpoint, and sweep with zero retention: the branch manifests
    // (and their stats — the only other record of those 100 mints)
    // are COLLECTED while every main manifest survives
    TxLog.dropBranch(spark, t, "tmp")
    TxLog.tag(spark, t, "keep", vU)
    assert(TxLog.compact(spark, t) > 0L)
    def logCount: Int =
      new java.io.File(t, "_txlog").listFiles().count(_.getName.endsWith(".json"))
    val before = logCount
    TxLog.vacuum(spark, t, minAgeMs = 0L)
    assert(logCount < before,
      "the sweep must actually collect the dropped-branch manifests " +
        "(otherwise this test pins nothing)")
    // the feed window still serves snapshot-true ids: the fresh mint
    // resolves against the upsert manifest's own recorded base
    val f = feed(t, vU).filter(r => r._1 == vU && r._2 == "insert")
    assert(f.nonEmpty && f.forall(_._3.isDefined), s"id-bearing: $f")
    assert(f.map(r => r._3.get -> ((r._4, r._5))).toMap ==
      want.filter { case (_, (k, _)) => k == 2L || k == 100L },
      s"post-sweep feed ids must stay snapshot-true: $f vs $want")
  }

  test("a keyed upsert racing a plain MAIN append still conflicts on the " +
      "pre-image (captureBase — the d-side could be silently wrong), " +
      "and the retry lands cleanly") {
    val t = build()
    val e = intercept[java.util.ConcurrentModificationException] {
      TxLog.upsertByKeys(Seq((2L, "U")).toDF("id", "v"), t, Seq("id"),
        "u", 0L, beforeCommit = () => {
          spark.range(300, 302).select(col("id"), lit("y").as("v"))
            .coalesce(1).write.format("txlog").mode("append").save(t)
          ()
        })
    }
    assert(e.getMessage.contains("changed rows"), e.getMessage)
    TxLog.upsertByKeys(Seq((2L, "U")).toDF("id", "v"), t, Seq("id"), "u2", 0L)
    assert(ids(t).size == 10) // 8 + 2 appended; id 2 adopted
  }
}
