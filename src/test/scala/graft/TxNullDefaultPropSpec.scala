package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.storage.TxLog

/** Property battery over the NOT NULL × initial-DEFAULT write contract
  * (r15 verdict item 4): for EVERY write door — library commit, V2
  * append, SQL INSERT, streaming epoch, DML post-image — a batch
  * carrying NULL into a declared NOT NULL column is REFUSED with the
  * table unchanged, a clean batch lands exactly, and on a defaulted
  * column the absent-file fill / stored-null split reads back
  * row-exact. Fuzzed over batch sizes and null placements (the grid
  * tests in TxDefaultSpec pin the named interactions; this suite
  * sweeps the value space so a placement-dependent hole — first row,
  * last row, all rows, interior runs — cannot hide). */
object TxNullDefaultProps extends Properties("TxNullDefault") {
  lazy val spark = TestSpark.spark

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(6)

  private val batchGen: Gen[(Int, Set[Int])] = for {
    n <- Gen.chooseNum(1, 30)
    nulls <- Gen.someOf(0 until n)
  } yield (n, nulls.toSet)

  private val schemaNN = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType, nullable = false)))

  private def fresh(): String =
    Files.createTempDirectory("txnn_").resolve("t").toString

  private def mk(n: Int, nulls: Set[Int], shift: Int = 0): DataFrame = {
    import spark.implicits._
    (0 until n).map(i =>
      ((i + shift).toLong, if (nulls(i)) null else s"v$i")).toDF("id", "v")
  }

  private def stateOf(t: String): Seq[String] =
    TxLog.snapshot(spark, t).map(_.collect().map(_.toString).sorted.toSeq)
      .getOrElse(Seq.empty)

  /** One door trial: the write must succeed iff the batch holds no
    * nulls; on refusal the table state must be unchanged. */
  private def doorHolds(door: (DataFrame, String) => Unit)
                       (n: Int, nulls: Set[Int]): Boolean = {
    val t = fresh()
    TxLog.createTable(spark, t, schemaNN)
    val before = stateOf(t)
    val ok = try { door(mk(n, nulls), t); true } catch { case _: Throwable => false }
    if (nulls.isEmpty) ok && stateOf(t).size == n
    else !ok && stateOf(t) == before
  }

  property("library commit: NULL into NOT NULL refuses, clean batches land") =
    forAll(batchGen) { case (n, nulls) =>
      doorHolds((df, t) => { TxLog.commit(df, t, "w", 0L); () })(n, nulls)
    }

  property("V2 append: NULL into NOT NULL refuses, clean batches land") =
    forAll(batchGen) { case (n, nulls) =>
      doorHolds((df, t) =>
        df.write.format("txlog").mode("append").save(t))(n, nulls)
    }

  private lazy val cat: String = {
    val wh = Files.createTempDirectory("txnn_cat_").toString
    spark.conf.set("spark.sql.catalog.nncat", "graft.storage.GraftCatalog")
    spark.conf.set("spark.sql.catalog.nncat.warehouse", wh)
    "nncat"
  }
  private val ctr = new java.util.concurrent.atomic.AtomicInteger

  property("SQL INSERT: NULL into NOT NULL refuses, clean batches land") =
    forAll(batchGen) { case (n, nulls) =>
      val name = s"$cat.default.t${ctr.incrementAndGet()}"
      spark.sql(s"CREATE TABLE $name (id BIGINT, v STRING NOT NULL) USING txlog")
      mk(n, nulls).createOrReplaceTempView("txnn_src")
      val ok = try {
        spark.sql(s"INSERT INTO $name SELECT * FROM txnn_src"); true
      } catch { case _: Throwable => false }
      val count = spark.table(name).count()
      if (nulls.isEmpty) ok && count == n else !ok && count == 0
    }

  property("streaming epoch: NULL into NOT NULL refuses, clean batches land") =
    forAll(batchGen) { case (n, nulls) =>
      val t = fresh()
      TxLog.createTable(spark, t, schemaNN)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val q = mem.toDF.toDF("id", "v").writeStream.format("txlog")
        .option("checkpointLocation",
          Files.createTempDirectory("txnn_ck_").toString)
        .start(t)
      mem.addData((0 until n).map(i =>
        (i.toLong, if (nulls(i)) null else s"v$i")): _*)
      val ok = try { q.processAllAvailable(); true }
               catch { case _: Throwable => false }
      q.stop()
      if (nulls.isEmpty) ok && stateOf(t).size == n
      else !ok && stateOf(t).isEmpty
    }

  property("UPDATE post-image: SET to NULL on NOT NULL refuses, table unchanged") =
    forAll(Gen.chooseNum(1, 20), Gen.oneOf(true, false)) { (n, toNull) =>
      val t = fresh()
      TxLog.createTable(spark, t, schemaNN)
      TxLog.commit(mk(n, Set.empty), t, "w", 0L)
      val ok = try {
        TxLog.update(spark, t, col("id") >= 0L,
          Map("v" -> (if (toNull) lit(null).cast("string") else lit("x"))),
          "u", 0L)
        true
      } catch { case _: Throwable => false }
      val vs = TxLog.snapshot(spark, t).get.select("v")
        .collect().map(_.getString(0)).toSeq
      if (toNull) !ok && vs.size == n && vs.forall(v => v != null && v != "x")
      else ok && vs.size == n && vs.forall(_ == "x")
    }

  property("defaulted column: absent files read the default, stored NULLs stay") =
    forAll(batchGen) { case (n, nulls) =>
      val t = fresh()
      TxLog.createTable(spark, t, StructType(Seq(StructField("id", LongType))))
      import spark.implicits._
      TxLog.commit((0 until n).map(_.toLong).toDF("id"), t, "w", 0L)
      TxLog.addColumnWithDefault(spark, t, "v", StringType, "'D'")
      mk(n, nulls, shift = n).write.format("txlog").mode("append").save(t)
      val got = TxLog.snapshot(spark, t).get
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expect = (0 until n).map(i => i.toLong -> "D").toMap ++
        (0 until n).map(i =>
          (i + n).toLong -> (if (nulls(i)) null else s"v$i")).toMap
      got == expect
    }

  property("NOT NULL + DEFAULT: SQL INSERT omitting the column fills; explicit NULL refuses") =
    forAll(Gen.chooseNum(1, 15)) { n =>
      val name = s"$cat.default.d${ctr.incrementAndGet()}"
      spark.sql(s"""CREATE TABLE $name
        (id BIGINT, v STRING NOT NULL DEFAULT 'D') USING txlog""")
      spark.sql(s"INSERT INTO $name (id) SELECT id FROM range($n)")
      val filled = spark.table(name).where(col("v") === "D").count()
      val refused = try {
        spark.sql(s"INSERT INTO $name VALUES (999, NULL)"); false
      } catch { case _: Throwable => true }
      filled == n && refused && spark.table(name).count() == n
    }
}
