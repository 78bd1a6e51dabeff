package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** ROW LINEAGE ([[graft.storage.TxRowId]]): stable row ids minted at
  * commit (per-file first-row-id in the manifest stats; derived
  * `rid + position` for rows born in a file) and MATERIALIZED by
  * rewrites (COW DML, compact, cluster, incremental optimize) into the
  * hidden grid column — `coalesce(stored, rid + pos)` is the one
  * serving rule. Appends store nothing; identity survives any layout
  * churn. */
class TxRowIdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("txrid_").resolve("t").toString

  /** two files: ids 0..3 ("a") and 4..7 ("b") — row ids 0..7 */
  private def build(): String = {
    val t = fresh()
    spark.range(4).select(col("id"), lit("a").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    spark.range(4, 8).select(col("id"), lit("b").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    t
  }

  private def idMap(t: String): Map[Long, (Long, String)] =
    TxLog.snapshotLineage(spark, t).get
      .select("_row_id", "id", "v").as[(Long, Long, String)]
      .collect().map { case (r, i, v) => r -> (i, v) }.toMap

  test("appends derive ids from the commit allocation — nothing stored") {
    val t = build()
    val m = idMap(t)
    assert(m.keySet == (0L to 7L).toSet, m.toString)
    assert(m.values.map(_._1).toSet == (0L to 7L).toSet)
    // the mapping is positional per file: file 1 = ids 0..3 over "a"
    assert(m.filter(_._2._2 == "a").keySet == (0L to 3L).toSet)
  }

  test("COW delete and update keep surviving rows' ids; merge keeps carried " +
      "rows and mints fresh ids for new ones") {
    val t = build()
    val before = idMap(t)
    TxLog.delete(spark, t, col("id") === 1L, "d", 0L)
    val afterDel = idMap(t)
    assert(afterDel == before.filterNot(_._2._1 == 1L),
      "survivors must keep their ids through the COW rewrite")
    TxLog.update(spark, t, col("id") === 2L, Map("v" -> lit("U")), "u", 0L)
    val afterUpd = idMap(t)
    val rid2 = before.find(_._2._1 == 2L).get._1
    assert(afterUpd(rid2) == ((2L, "U")), "COW update keeps the row's id")
    assert(afterUpd - rid2 == afterDel - rid2)
    // merge: replace id=3, insert id=10
    TxLog.merge(Seq((3L, "M"), (10L, "M")).toDF("id", "v"), t, Seq("id"), "m", 0L)
    val afterMrg = idMap(t)
    val untouched = afterUpd.filterNot(kv => Seq(3L, 10L).contains(kv._2._1))
    assert(untouched.forall { case (r, v) => afterMrg.get(r).contains(v) },
      "carried rows keep ids through the merge rewrite")
    val rid3old = before.find(_._2._1 == 3L).get._1
    assert(!afterMrg.contains(rid3old), "the replaced row's id retires")
    val fresh3 = afterMrg.find(_._2._1 == 3L).get._1
    assert(!before.contains(fresh3), "the replacement minted a FRESH id")
    assert(afterMrg.keySet.size == afterMrg.size, "ids stay unique")
  }

  test("compact, clusterBy, z-order cluster and compactSmall are id-invariant") {
    val t = build()
    TxLog.delete(spark, t, col("id") === 0L, "d", 0L)
    val want = idMap(t)
    TxLog.compact(spark, t)
    assert(idMap(t) == want, "compact must carry every id")
    TxLog.clusterBy(spark, t, Seq("id"), targetFiles = 2)
    assert(idMap(t) == want, "clusterBy must carry every id")
    TxLog.cluster(spark, t, "id", "id", targetFiles = 2)
    assert(idMap(t) == want, "z-order cluster must carry every id")
    TxLog.compactSmall(spark, t)
    assert(idMap(t) == want, "incremental optimize must carry every id")
  }

  test("merge-on-read interplay: DV survivors and keyed-delete survivors keep " +
      "derived ids; materialization and the post-compact state agree") {
    val t = build()
    val before = idMap(t)
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.delete(spark, t, col("id") === 2L, "mor", 0L) // DV
    TxLog.deleteByKeys(Seq(5L).toDF("id"), t, "kd", 0L) // eqdel
    val after = idMap(t)
    assert(after == before.filterNot(kv => Seq(2L, 5L).contains(kv._2._1)),
      "DV'd and keyed-deleted rows drop; survivors keep derived ids")
    TxLog.materializeEqDels(spark, t)
    assert(idMap(t) == after, "materialization (debt -> vectors) is id-invariant")
    TxLog.compact(spark, t)
    assert(idMap(t) == after, "the materializing checkpoint carries ids")
  }

  test("time travel: ids are a stable join key across history") {
    val t = build()
    val v0 = TxLog.headVersion(spark, t)
    TxLog.update(spark, t, col("id") >= 6L, Map("v" -> lit("X")), "u", 0L)
    TxLog.compact(spark, t)
    val pre = TxLog.snapshotLineageAt(spark, t, v0).get
      .select(col("_row_id").as("r"), col("id").as("id0"), col("v").as("v0"))
    val post = TxLog.snapshotLineage(spark, t).get
    val j = post.join(pre, post("_row_id") === pre("r"), "inner")
      .select("id", "id0", "v", "v0")
      .as[(Long, Long, String, String)].collect().toSeq
    assert(j.size == 8, "every live row joins its past self by id")
    assert(j.forall { case (i, i0, _, _) => i == i0 })
    assert(j.count { case (_, _, v, v0) => v != v0 } == 2,
      "exactly the two updated rows changed values under their ids")
  }

  test("V2 scan serves _row_id: plain, filtered, with _pos/_file, across " +
      "rewrites, and composed with DV + key-debt filtering") {
    val t = build()
    val v2ids = spark.read.format("txlog").load(t)
      .select("_row_id", "id", "v").as[(Long, Long, String)]
      .collect().map { case (r, i, v) => r -> (i, v) }.toMap
    assert(v2ids == idMap(t), "V2 must serve exactly the library ids")
    // pushed filter composes; _pos and _file ride along
    val one = spark.read.format("txlog").load(t).where(col("id") === 5L)
      .select("_row_id", "_pos", "_file").collect()(0)
    assert(one.getLong(0) == 5L && one.getLong(1) == 1L &&
      one.getString(2).nonEmpty)
    // COW update + compact: V2 ids stable
    TxLog.update(spark, t, col("id") === 3L, Map("v" -> lit("U")), "u", 0L)
    TxLog.compact(spark, t)
    val after = spark.read.format("txlog").load(t)
      .select("_row_id", "id").as[(Long, Long)].collect().toMap
    assert(after == (0L to 7L).map(i => i -> i).toMap,
      "compacted V2 read must serve the materialized ids")
    // DV + keyed delete live: the scan composes filters with serving
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.delete(spark, t, col("id") === 0L, "mor", 0L)
    TxLog.deleteByKeys(Seq(6L).toDF("id"), t, "kd", 0L)
    val worked = spark.read.format("txlog").load(t)
      .select("_row_id", "id").as[(Long, Long)].collect().toMap
    assert(worked == (1L to 7L).filterNot(_ == 6L).map(i => i -> i).toMap,
      worked.toString)
    // column-pruned lineage read (neither the key column nor _pos asked)
    assert(spark.read.format("txlog").load(t).select("_row_id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 7L))
    // versionAsOf serves the ids in force AT the version
    assert(spark.read.format("txlog").option("versionAsOf", 1L).load(t)
      .select("_row_id").as[Long].collect().sorted.toSeq == (0L to 7L))
  }

  test("branch commits mint globally: no id collisions across lineages, " +
      "stable through fast-forward") {
    val t = build()
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.commit(Seq((20L, "br")).toDF("id", "v").coalesce(1), t, "bw", 0L)
    }
    // a concurrent MAIN append after the branch commit
    spark.range(30, 32).select(col("id"), lit("m").as("v")).coalesce(1)
      .write.format("txlog").mode("append").save(t)
    val branchIds = TxLog.onBranch("b")(idMap(t))
    val mainIds = idMap(t)
    val brNew = branchIds.filter(_._2._1 == 20L).keySet
    val mainNew = mainIds.filter(kv => Seq(30L, 31L).contains(kv._2._1)).keySet
    assert((brNew & mainNew).isEmpty, "global mint: lineages never collide")
    TxLog.dropBranch(spark, t, "b")
    // fresh branch, write, ff: adopted rows keep their branch-minted ids
    TxLog.createBranch(spark, t, "b2")
    TxLog.onBranch("b2") {
      TxLog.commit(Seq((40L, "b2")).toDF("id", "v").coalesce(1), t, "b2w", 0L)
    }
    val onBr = TxLog.onBranch("b2")(idMap(t))
    TxLog.fastForward(spark, t, "b2")
    assert(idMap(t) == onBr, "adoption preserves the branch's ids verbatim")
    assert(idMap(t).keySet.size == idMap(t).size)
  }
}
