package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** NAMED TAGS ([[TxLog.tag]], r16): immutable version pins published
  * through the property CAS. The contract under test: a tagged
  * snapshot stays byte-reproducible — vacuum keeps its files and the
  * manifests that reconstruct it, every read door resolves the name
  * (library ref, V2 `versionAsOf` option, SQL `VERSION AS OF`), and
  * dropping the tag returns the history to ordinary retention. */
class TxTagSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("txtag_").resolve("t").toString

  private def gen(t: String, from: Int, until: Int): Unit =
    spark.range(from, until).select($"id", lit(s"g$from").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)

  test("tag, read by name through every door, re-point, drop") {
    val t = fresh()
    gen(t, 0, 100)   // v0
    gen(t, 100, 200) // v1
    val vTag = TxLog.tag(spark, t, "cut-1", 0L)
    assert(vTag == 2L, "the tag itself is a committed version")
    gen(t, 200, 300) // v3
    assert(TxLog.tags(spark, t) == Map("cut-1" -> 0L))
    // V2 reader option resolves the name
    assert(spark.read.format("txlog").option("versionAsOf", "cut-1").load(t)
      .count() == 100L)
    // numeric references still work
    assert(spark.read.format("txlog").option("versionAsOf", "1").load(t)
      .count() == 200L)
    // library resolution
    assert(TxLog.resolveVersionRef(spark, t, "cut-1") == 0L)
    intercept[IllegalArgumentException] {
      TxLog.resolveVersionRef(spark, t, "nope")
    }
    // re-point is an ordinary committed transaction
    TxLog.tag(spark, t, "cut-1", 1L)
    assert(spark.read.format("txlog").option("versionAsOf", "cut-1").load(t)
      .count() == 200L)
    TxLog.dropTag(spark, t, "cut-1")
    assert(TxLog.tags(spark, t).isEmpty)
    val e = intercept[Exception] {
      spark.read.format("txlog").option("versionAsOf", "cut-1").load(t).count()
    }
    assert(e.getMessage.contains("no such tag"), e.getMessage)
    // guards: numeric-shadow and bad names refuse; beyond-head refuses
    intercept[IllegalArgumentException] { TxLog.tag(spark, t, "7", 0L) }
    intercept[IllegalArgumentException] { TxLog.tag(spark, t, "a b", 0L) }
    intercept[Exception] { TxLog.tag(spark, t, "ok", 99L) }
  }

  test("tags window the change feed and start a stream tail") {
    val t = fresh()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    gen(t, 0, 100)   // v1
    TxLog.tag(spark, t, "cut-a", 1L) // v2
    gen(t, 100, 250) // v3
    TxLog.tag(spark, t, "cut-b", 3L) // v4
    gen(t, 250, 300) // v5
    // the feed windowed by tag names — the options keep their numeric
    // semantics (both INCLUSIVE), the names just resolve: [cut-a,
    // cut-b] = v1's 100 + v3's 150
    val feed = spark.read.format("txlog")
      .option("readChangeFeed", "true")
      .option("startingVersion", "cut-a").option("endingVersion", "cut-b")
      .load(t)
    assert(feed.count() == 250L, s"inclusive [cut-a, cut-b] window: ${feed.count()}")
    // a stream tail starting AT a tag's version (inclusive): the cut's
    // own append + everything after
    val name = s"tagtail_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("txlog")
      .option("path", t).option("startingVersion", "cut-b").load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("txtag_st_").toString)
      .start()
    q.processAllAvailable(); q.stop()
    assert(spark.table(name).count() == 200L,
      "tail from the tag (inclusive) = the cut's append + the post-cut one")
    // 'latest' stays the stream sentinel — the name refuses at mint
    intercept[IllegalArgumentException] { TxLog.tag(spark, t, "latest", 1L) }
  }

  test("tagging a snapshot an earlier vacuum already broke refuses at mint") {
    val t = fresh()
    gen(t, 0, 100)   // v0
    TxLog.delete(spark, t, $"id" < 50L, "d", 0L) // v1 rewrites v0's file
    TxLog.vacuum(spark, t, minAgeMs = 0L)        // v0's file collected
    val e = intercept[IllegalArgumentException] {
      TxLog.tag(spark, t, "late", 0L)
    }
    assert(e.getMessage.contains("already vacuumed"), e.getMessage)
    // the head is always taggable
    TxLog.tag(spark, t, "head-pin", 1L)
    assert(spark.read.format("txlog").option("versionAsOf", "head-pin")
      .load(t).count() == 50L)
  }

  test("SQL: CALL system.tag + VERSION AS OF '<name>' + drop_tag") {
    val wh = Files.createTempDirectory("txtag_cat_").toString
    spark.conf.set("spark.sql.catalog.tagcat", "graft.storage.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tagcat.warehouse", wh)
    spark.sql("CREATE TABLE tagcat.default.t (id BIGINT, v STRING) USING txlog")
    spark.sql("INSERT INTO tagcat.default.t SELECT id, 'a' FROM range(50)")
    val r = spark.sql(
      "CALL tagcat.system.tag(table => 'default.t', name => 'nightly')")
      .collect()(0)
    assert(r.getAs[Long]("tagged_version") == 1L, r.toString)
    spark.sql("INSERT INTO tagcat.default.t SELECT id, 'b' FROM range(50, 150)")
    assert(spark.sql(
      "SELECT count(*) FROM tagcat.default.t VERSION AS OF 'nightly'")
      .as[Long].head() == 50L)
    assert(spark.table("tagcat.default.t").count() == 150L)
    spark.sql("CALL tagcat.system.drop_tag(table => 'default.t', name => 'nightly')")
    intercept[Exception] {
      spark.sql("SELECT count(*) FROM tagcat.default.t VERSION AS OF 'nightly'")
        .collect()
    }
    spark.sql("DROP TABLE tagcat.default.t")
  }

  test("RESTORE past a tag refuses (the pin is a promise); dropTag unblocks") {
    val t = fresh()
    gen(t, 0, 100)   // v0
    gen(t, 100, 200) // v1
    TxLog.tag(spark, t, "pin", 1L) // v2, minted AFTER v0
    val e = intercept[IllegalArgumentException] { TxLog.restore(spark, t, 0L) }
    assert(e.getMessage.contains("pin"), e.getMessage)
    TxLog.dropTag(spark, t, "pin")
    TxLog.restore(spark, t, 0L)
    assert(spark.read.format("txlog").load(t).count() == 100L)
  }

  test("vacuum keeps a tagged snapshot's files and manifests; drop releases them") {
    val t = fresh()
    gen(t, 0, 100)   // v0: one file
    gen(t, 100, 200) // v1
    TxLog.tag(spark, t, "pin", 1L) // v2
    // a COW delete rewrites v0/v1's files; compact checkpoints
    TxLog.delete(spark, t, $"id" < 150L, "tagdel", 0L) // v3
    TxLog.compact(spark, t, targetBytes = 1L << 30)    // v4 checkpoint
    assert(spark.read.format("txlog").load(t).count() == 50L)
    // vacuum at zero age: without the tag the pre-delete files AND the
    // below-checkpoint manifests would go; the pin keeps both
    TxLog.vacuum(spark, t, minAgeMs = 0L)
    assert(spark.read.format("txlog").option("versionAsOf", "pin").load(t)
      .orderBy("id").as[(Long, String)].collect().length == 200,
      "the tagged snapshot must survive vacuum byte-for-byte")
    assert(spark.read.format("txlog").load(t).count() == 50L)
    // drop the tag: the history becomes ordinary retention and the
    // same vacuum now truncates + collects
    TxLog.dropTag(spark, t, "pin")
    TxLog.vacuum(spark, t, minAgeMs = 0L)
    intercept[Exception] {
      spark.read.format("txlog").option("versionAsOf", "1").load(t).count()
    }
    assert(spark.read.format("txlog").load(t).count() == 50L,
      "the live state must be untouched by the release")
  }
}
