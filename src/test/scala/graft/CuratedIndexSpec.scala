package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.CuratedIndex
import graft.storage.TxLog

/** The CDF-maintained band index ([[CuratedIndex]]): through appends,
  * row-level deletes, text updates, in-loop maintenance, stream
  * restarts and a same-window insert-then-delete, the incrementally
  * maintained index stays ROW-IDENTICAL to a from-scratch banding of
  * the live corpus, and probes against it match probes against a
  * rebuilt index (with retracted documents gone from the pairs). */
class CuratedIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"curidx_$tag").resolve("t").toString

  /** Deterministic 30-token text; near-dups share all but one token. */
  private def text(i: Long): String =
    (0 until 30).map(k => s"w${(i * 7 + k * 13) % 50}").mkString(" ")

  private def docs(ids: Seq[Long], dup: Map[Long, Long] = Map.empty): DataFrame =
    ids.map(i => (i, dup.get(i).map(o => text(o) + " extra").getOrElse(text(i))))
      .toDF("doc_id", "text")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def assertIndexExact(corpus: String, index: String, clue: String): Unit =
    assert(rows(spark.read.format("txlog").load(index))
      == rows(CuratedIndex.rebuild(spark, corpus)), clue)

  test("the maintained index equals a rebuild through curation, maintenance and restart") {
    val corpus = fresh("c"); val index = fresh("i")
    val ckpt = Files.createTempDirectory("curidx_ckpt_").toString
    TxLog.setProperties(spark, corpus, Map(TxLog.ChangeFeedProp -> "true"))

    def append(df: DataFrame): Unit =
      df.coalesce(2).write.format("txlog").mode("append").save(corpus)

    // first data precedes the stream (a schema-less table cannot be a
    // source); the feed's initial snapshot-as-inserts picks it up
    append(docs(0L until 50L))
    var q = CuratedIndex.maintainFromFeed(spark, corpus, index, ckpt, clusterEvery = 4)
    try {
      q.processAllAvailable()
      assertIndexExact(corpus, index, "after first append")

      // curation: a batch of new docs, a range delete, a text update
      append(docs(50L until 100L, dup = Map(60L -> 3L)))
      TxLog.delete(spark, corpus, $"doc_id".between(10L, 19L), "spec-del", 0L)
      TxLog.update(spark, corpus, $"doc_id" === 5L,
        Map("text" -> lit(text(500L))), "spec-up", 0L)
      q.processAllAvailable()
      assertIndexExact(corpus, index, "after delete + update")

      // the updated doc is banded by its NEW text only
      val idx = spark.read.format("txlog").load(index)
      assert(rows(idx.where($"doc_old" === 5L)) ==
        rows(CuratedIndex.rebuild(spark, corpus).where($"doc_old" === 5L)))
      // deleted docs left no index rows
      assert(idx.where($"doc_old".between(10L, 19L)).count() == 0L)

      // probes agree with a from-scratch index, incl. retraction:
      // probe doc 1003 is a near-dup of live doc 3; probe doc 1015 of
      // DELETED doc 15 — the curated index must pair the former only
      val probeBatch = docs(Seq(1003L, 1015L), dup = Map(1003L -> 3L, 1015L -> 15L))
      val rebuilt = fresh("r")
      TxLog.commit(CuratedIndex.rebuild(spark, corpus), rebuilt, "spec-rebuild", 0L)
      val got = rows(CuratedIndex.probe(probeBatch, index))
      assert(got == rows(CuratedIndex.probe(probeBatch, rebuilt)), "probe parity")
      assert(got.exists(_.startsWith("[1003,3")), s"near-dup of live doc found: $got")
      assert(!got.exists(_.contains(",15]")), s"retracted doc must not pair: $got")
    } finally q.stop()

    // restart on the same checkpoint: more curation accrued while down,
    // including a SAME-WINDOW insert-then-delete (doc 999 must net out)
    append(docs(100L until 110L))
    TxLog.delete(spark, corpus, $"doc_id".between(60L, 69L), "spec-del2", 0L)
    append(docs(Seq(999L)))
    TxLog.delete(spark, corpus, $"doc_id" === 999L, "spec-del3", 0L)
    q = CuratedIndex.maintainFromFeed(spark, corpus, index, ckpt, clusterEvery = 4)
    try {
      q.processAllAvailable()
      assertIndexExact(corpus, index, "after restart over offline curation")
      assert(spark.read.format("txlog").load(index)
        .where($"doc_old" === 999L).count() == 0L,
        "insert-then-delete within one window must net out")
    } finally q.stop()
  }
}
