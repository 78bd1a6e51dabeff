package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.{CuratedIvfPq, Similarity}
import graft.storage.TxLog

/** The CDF-maintained IVF-PQ index ([[CuratedIvfPq]]): through
  * appends, vector deletions and an embedding EDIT, the maintained
  * index stays row-identical to a from-scratch frozen-codebook encode
  * of the live corpus, and full probes (ADC + exact re-rank) agree —
  * with retracted vectors gone from the neighbor lists. */
class CuratedIvfPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"curpq_$tag").resolve("t").toString

  /** Deterministic 64-dim float vector; `shift` makes an edited twin. */
  private def vec(i: Long, shift: Int = 0): Seq[Float] =
    (0 until 64).map(k => (((i * 31 + k * 17 + shift) % 97) / 97.0f) - 0.5f)

  private def embeddings(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, vec(i), (i % 4).toInt)).toDF("vec_id", "embedding", "label")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("the maintained IVF-PQ index equals a frozen-codebook rebuild through curation") {
    val corpus = fresh("c"); val index = fresh("i")
    val tag = System.nanoTime()
    val (cb, coarse) = (s"curpq_cb_$tag", s"curpq_coarse_$tag")
    val ckpt = Files.createTempDirectory("curpq_ckpt_").toString
    TxLog.setProperties(spark, corpus, Map(TxLog.ChangeFeedProp -> "true"))

    embeddings(0L until 80L).coalesce(2)
      .write.format("txlog").mode("append").save(corpus)
    // freeze codebooks on the initial corpus (the encode contract)
    Similarity.trainIvfPqCodebooks(
      spark.read.format("txlog").load(corpus), cb, coarse)

    def assertIndexExact(clue: String): Unit =
      assert(rows(spark.read.format("txlog").load(index))
        == rows(CuratedIvfPq.rebuild(spark, corpus, cb, coarse)), clue)

    val q = CuratedIvfPq.maintainFromFeed(spark, corpus, index, cb, coarse, ckpt)
    try {
      q.processAllAvailable()
      assertIndexExact("after initial snapshot")

      // curation: new vectors, a range delete, an embedding EDIT
      embeddings(80L until 100L).coalesce(1)
        .write.format("txlog").mode("append").save(corpus)
      TxLog.delete(spark, corpus, $"vec_id".between(20L, 29L), "pq-del", 0L)
      TxLog.update(spark, corpus, $"vec_id" === 40L,
        Map("embedding" -> typedLit(vec(40L, shift = 13))), "pq-up", 0L)
      q.processAllAvailable()
      assertIndexExact("after delete + embedding edit")

      val idx = spark.read.format("txlog").load(index)
      assert(idx.where($"vec_id".between(20L, 29L)).count() == 0L,
        "retracted vectors left code rows")
      // the edited vector re-encoded (codes/cell from the NEW embedding)
      assert(rows(idx.where($"vec_id" === 40L)) ==
        rows(CuratedIvfPq.rebuild(spark, corpus, cb, coarse)
          .where($"vec_id" === 40L)))

      // full probe parity, and no neighbor list names a deleted vector
      val got = CuratedIvfPq.probe(spark, index, cb, coarse)
      assert(rows(got) == rows(Similarity.probeIvfPqIndexOf(
        CuratedIvfPq.rebuild(spark, corpus, cb, coarse),
        spark.table(cb), spark.table(coarse))), "probe parity")
      assert(got.where($"vec_id".between(20L, 29L)).count() == 0L,
        "a deleted vector surfaced as a neighbor")
    } finally q.stop()
  }
}
