package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** CHECK constraints (`graft.check.<name>` table properties): per-row
  * enforcement at every write path BEFORE the commit point, SQL CHECK
  * null semantics (NULL passes), add-time validation of existing data. */
class TxCheckSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("check_wh_").toString
    s.conf.set("spark.sql.catalog.chkcat", "graft.storage.GraftCatalog")
    s.conf.set("spark.sql.catalog.chkcat.warehouse", wh)
    s
  }
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txcheck_").resolve("t").toString

  private def rows(xs: Seq[(Long, java.lang.Double, String)]) =
    xs.toDF("id", "amount", "code")

  private def chain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString("\n")

  test("V2 append: violating write fails atomically, valid write lands") {
    val t = freshTable()
    rows(Seq((1L, 10.0, "a"))).write.format("txlog").mode("append").save(t)
    TxLog.setProperties(spark, t, Map("graft.check.pos" -> "amount > 0"))
    val e = intercept[Exception](
      rows(Seq((2L, 5.0, "b"), (3L, -1.0, "c")))
        .write.format("txlog").mode("append").save(t))
    assert(chain(e).contains("CHECK constraint pos"), chain(e))
    // nothing committed: the failed write left no partial state
    assert(spark.read.format("txlog").load(t).count() == 1L)
    rows(Seq((2L, 5.0, "b"))).write.format("txlog").mode("append").save(t)
    assert(spark.read.format("txlog").load(t).count() == 2L)
  }

  test("NULL passes (SQL CHECK semantics); FALSE alone violates") {
    val t = freshTable()
    TxLog.createTable(spark, t, rows(Seq.empty).schema,
      props = Map("graft.check.pos" -> "amount > 0"))
    rows(Seq((1L, null, "a"), (2L, 3.5, "b")))
      .write.format("txlog").mode("append").save(t)
    assert(spark.read.format("txlog").load(t).count() == 2L)
  }

  test("SQL DML through the V2 rewrite honors constraints") {
    val t = freshTable()
    rows(Seq((1L, 10.0, "a"), (2L, 20.0, "b")))
      .write.format("txlog").mode("append").save(t)
    TxLog.setProperties(spark, t, Map("graft.check.pos" -> "amount > 0"))
    val name = s"chk_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $name USING txlog OPTIONS (path '$t')")
    try {
      val e = intercept[Exception](
        spark.sql(s"UPDATE $name SET amount = -5 WHERE id = 1"))
      assert(chain(e).contains("CHECK constraint pos"), chain(e))
      // the failed statement changed nothing
      assert(spark.table(name).where($"amount" === 10.0).count() == 1L)
      spark.sql(s"UPDATE $name SET amount = 15 WHERE id = 1")
      assert(spark.table(name).where($"amount" === 15.0).count() == 1L)
    } finally spark.sql(s"DROP TABLE $name")
  }

  test("SQL DML through the MERGE-ON-READ delta write honors constraints") {
    val t = freshTable()
    rows(Seq((1L, 10.0, "a"), (2L, 20.0, "b")))
      .write.format("txlog").mode("append").save(t)
    TxLog.setProperties(spark, t, Map(
      "graft.check.pos" -> "amount > 0",
      TxLog.DmlModeProp -> TxLog.DmlModeMor))
    val name = s"chkmor_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $name USING txlog OPTIONS (path '$t')")
    try {
      // the post-image rows route through the delta write's insert
      // writer — the same bound-check seam as every other V2 path
      val e = intercept[Exception](
        spark.sql(s"UPDATE $name SET amount = -5 WHERE id = 1"))
      assert(chain(e).contains("CHECK constraint pos"), chain(e))
      // the failed statement changed nothing: no deletion vector, no
      // post-image, the original row intact
      assert(spark.table(name).where($"amount" === 10.0).count() == 1L)
      assert(spark.table(name).count() == 2L)
      spark.sql(s"UPDATE $name SET amount = 15 WHERE id = 1")
      assert(spark.table(name).where($"amount" === 15.0).count() == 1L)
    } finally spark.sql(s"DROP TABLE $name")
  }

  test("driver-path commit and library UPDATE honor constraints") {
    val t = freshTable()
    TxLog.createTable(spark, t, rows(Seq.empty).schema,
      props = Map("graft.check.code_len" -> "length(code) <= 2"))
    val e = intercept[Exception](
      TxLog.commit(rows(Seq((1L, 1.0, "toolong"))), t, "w", 0L))
    assert(chain(e).contains("CHECK constraint code_len"), chain(e))
    TxLog.commit(rows(Seq((1L, 1.0, "ok"))), t, "w", 1L)
    val e2 = intercept[Exception](
      TxLog.update(spark, t, col("id") === 1L,
        Map("code" -> lit("alsotoolong")), "u", 0L))
    assert(chain(e2).contains("CHECK constraint code_len"), chain(e2))
    assert(TxLog.snapshot(spark, t).get.select("code").first().getString(0) == "ok")
  }

  test("adding a constraint violated by existing rows is refused with the count") {
    val t = freshTable()
    rows(Seq((1L, -1.0, "a"), (2L, -2.0, "b"), (3L, 3.0, "c")))
      .write.format("txlog").mode("append").save(t)
    val e = intercept[IllegalArgumentException](
      TxLog.setProperties(spark, t, Map("graft.check.pos" -> "amount > 0")))
    assert(e.getMessage.contains("2 existing row(s)"), e.getMessage)
    // UNSET re-opens the gate
    TxLog.setProperties(spark, t, Map("graft.check.neg" -> "amount < 10"))
    TxLog.removeProperties(spark, t, Seq("graft.check.neg"))
    rows(Seq((4L, 99.0, "d"))).write.format("txlog").mode("append").save(t)
    assert(spark.read.format("txlog").load(t).count() == 4L)
  }

  test("catalog DDL: constraints in TBLPROPERTIES, loud on bad SQL or missing column") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chkcat.c")
    spark.sql("""CREATE TABLE chkcat.c.t (id BIGINT, amount DOUBLE) USING txlog
                 TBLPROPERTIES ('graft.check.pos' = 'amount > 0')""")
    val e = intercept[Exception](
      spark.sql("INSERT INTO chkcat.c.t VALUES (1, -3.0)"))
    assert(chain(e).contains("CHECK constraint pos"), chain(e))
    spark.sql("INSERT INTO chkcat.c.t VALUES (1, 3.0)")
    assert(spark.table("chkcat.c.t").count() == 1L)
    // unknown column at declaration time is loud
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE chkcat.c.t SET TBLPROPERTIES ('graft.check.bad' = 'nope > 0')"))
    assert(chain(e2).contains("does not resolve"), chain(e2))
    // a write whose schema omits a checked column is rejected loudly
    val e3 = intercept[Exception](
      Seq((9L)).toDF("id").write.format("txlog").mode("append")
        .save(spark.conf.get("spark.sql.catalog.chkcat.warehouse") + "/c/t"))
    assert(chain(e3).contains("does not resolve") || chain(e3).contains("amount"),
      chain(e3))
  }
}
