package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.{TxGen, TxLog}

/** GENERATED COLUMNS ([[TxGen]], `GENERATED ALWAYS AS (expr)`):
  * declared at CREATE (SQL door via the catalog capability, library
  * door via `graft.generated.*` props), enforced per row at every
  * write door — NULL incoming values fill from the expression,
  * contradicting non-null values refuse, DML post-images recompute —
  * and the derived column is a plain STORED column, so partition
  * transforms and zone maps over it prune like any other (the 100 TB
  * point: `PARTITIONED BY (day)` + `WHERE day = X` prunes derived
  * layout from the manifest alone). */
class TxGenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("txgen_").resolve("t").toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("txt", StringType),
    StructField("twice", LongType)))
  private val gprops = Map(TxGen.Prefix + "twice" -> "id * 2")

  test("declaration validates: unknown column, non-determinism, aggregates, chains, bad types refuse") {
    val t = fresh()
    intercept[IllegalArgumentException] {
      TxLog.createTable(spark, t, schema,
        props = Map(TxGen.Prefix + "nope" -> "id * 2"))
    }
    intercept[Exception] {
      TxLog.createTable(spark, t, schema,
        props = Map(TxGen.Prefix + "twice" -> "rand()"))
    }
    intercept[Exception] {
      TxLog.createTable(spark, t, schema,
        props = Map(TxGen.Prefix + "twice" -> "max(id)"))
    }
    intercept[Exception] { // long expr into a declared... id is long, txt string
      TxLog.createTable(spark, t, StructType(schema.fields.toSeq.map(f =>
        if (f.name == "twice") f.copy(dataType = IntegerType) else f)),
        props = gprops) // long expr does not down-cast to int
    }
    intercept[Exception] { // chain: a generated column referencing one
      TxLog.createTable(spark, t, schema, props = gprops +
        (TxGen.Prefix + "txt" -> "CAST(twice AS STRING)"))
    }
    // a valid declaration passes and the table exists
    TxLog.createTable(spark, t, schema, props = gprops)
    assert(TxGen.gensIn(TxLog.properties(spark, t)) == Map("twice" -> "id * 2"))
  }

  test("library door: NULL fills, matching values pass, contradictions refuse") {
    val t = fresh()
    TxLog.createTable(spark, t, schema, props = gprops)
    // absent column refused loudly (provide NULLs to have it filled)
    val e = intercept[Exception] {
      TxLog.commit(Seq((1L, "a")).toDF("id", "txt"), t, "w", 0L)
    }
    assert(e.getMessage.contains("generated column"), e.getMessage)
    // NULLs fill; matching explicit values pass
    TxLog.commit(Seq((1L, "a", null.asInstanceOf[java.lang.Long]),
      (2L, "b", java.lang.Long.valueOf(4L)))
      .toDF("id", "txt", "twice"), t, "w", 1L)
    assert(TxLog.snapshot(spark, t).get.orderBy("id")
      .select("id", "twice").as[(Long, Long)].collect().toSeq ==
      Seq(1L -> 2L, 2L -> 4L))
    // a contradicting non-null value refuses the whole write
    intercept[Exception] {
      TxLog.commit(Seq((3L, "c", java.lang.Long.valueOf(7L)))
        .toDF("id", "txt", "twice"), t, "w", 2L)
    }
    assert(TxLog.snapshot(spark, t).get.count() == 2,
      "a refused write must stage nothing visible")
  }

  test("V2 door (format append + SQL INSERT + streaming epoch) fills and validates") {
    val t = fresh()
    TxLog.createTable(spark, t, schema, props = gprops)
    // V2 path append with NULLs
    Seq((1L, "a", null.asInstanceOf[java.lang.Long])).toDF("id", "txt", "twice")
      .write.format("txlog").mode("append").save(t)
    // V2 path append with a contradiction dies in the write job
    intercept[Exception] {
      Seq((2L, "b", java.lang.Long.valueOf(99L))).toDF("id", "txt", "twice")
        .write.format("txlog").mode("append").save(t)
    }
    // streaming epoch
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF.toDF("id", "txt")
      .select($"id", $"txt", lit(null).cast("long").as("twice"))
      .writeStream.format("txlog")
      .option("checkpointLocation", Files.createTempDirectory("txgen_ck_").toString)
      .start(t)
    mem.addData((5L, "e"))
    q.processAllAvailable(); q.stop()
    assert(TxLog.snapshot(spark, t).get.orderBy("id")
      .select("id", "twice").as[(Long, Long)].collect().toSeq ==
      Seq(1L -> 2L, 5L -> 10L))
  }

  test("SQL catalog door: GENERATED ALWAYS AS at CREATE, INSERT fills, DESCRIBE shows it") {
    val wh = Files.createTempDirectory("txgen_cat_").toString
    spark.conf.set("spark.sql.catalog.gencat", "graft.storage.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gencat.warehouse", wh)
    spark.sql("""CREATE TABLE gencat.default.gt
      (ts TIMESTAMP, day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
      USING txlog""")
    val dir = s"$wh/default/gt"
    assert(TxGen.gensIn(TxLog.properties(spark, dir)).keySet == Set("day"))
    spark.sql("""INSERT INTO gencat.default.gt
      VALUES (TIMESTAMP '2024-03-05 10:00:00', NULL),
             (TIMESTAMP '2024-03-06 11:00:00', DATE '2024-03-06')""")
    assert(spark.table("gencat.default.gt").orderBy("ts")
      .select(col("day").cast("string")).as[String].collect().toSeq ==
      Seq("2024-03-05", "2024-03-06"))
    // contradicting INSERT refuses
    intercept[Exception] {
      spark.sql("""INSERT INTO gencat.default.gt
        VALUES (TIMESTAMP '2024-03-07 10:00:00', DATE '1999-01-01')""")
    }
    // the derivation is visible on the catalog schema surface (the
    // connector's Table.schema — DESCRIBE and column listings read it;
    // the analyzer strips field metadata from query output attributes)
    val f = graft.storage.TxLogTable(dir, None).schema("day")
    assert(org.apache.spark.sql.catalyst.util.GeneratedColumn
      .getGenerationExpression(f).contains("CAST(ts AS DATE)"))
    spark.sql("DROP TABLE gencat.default.gt")
  }

  test("DML: UPDATE of a source recomputes, UPDATE SET of the generated column refuses; MERGE keeps the invariant") {
    val t = fresh()
    TxLog.createTable(spark, t, schema, props = gprops)
    TxLog.commit(spark.range(8).select($"id", lit("x").as("txt"),
      lit(null).cast("long").as("twice")), t, "w", 0L)
    intercept[IllegalArgumentException] {
      TxLog.update(spark, t, $"id" === 1L, Map("twice" -> lit(0L)), "u", 0L)
    }
    // COW recompute
    TxLog.update(spark, t, $"id" === 1L, Map("id" -> lit(100L)), "u", 1L)
    // MoR recompute
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.update(spark, t, $"id" === 2L, Map("id" -> lit(200L)), "u", 2L)
    val got = TxLog.snapshot(spark, t).get
    assert(got.where(!($"twice" <=> $"id" * 2)).count() == 0,
      "an UPDATE left a stale derived value")
    assert(got.where($"id" === 100L || $"id" === 200L).count() == 2)
    // MERGE with NULL derived values in the source fills
    TxLog.merge(Seq((3L, "r", null.asInstanceOf[java.lang.Long]),
      (50L, "n", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "txt", "twice"), t, Seq("id"), "m", 0L)
    val after = TxLog.snapshot(spark, t).get
    assert(after.where(!($"twice" <=> $"id" * 2)).count() == 0)
    assert(after.count() == 9)
  }

  test("SQL-planned DML (catalog delta + COW) recomputes the derived value") {
    val wh = Files.createTempDirectory("txgen_dml_").toString
    spark.conf.set("spark.sql.catalog.gdml", "graft.storage.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdml.warehouse", wh)
    Seq("cow" -> "", "mor" -> ", 'graft.dml.mode' = 'mergeOnRead'").foreach {
      case (nm, extra) =>
        spark.sql(s"""CREATE TABLE gdml.default.t_$nm
          (id BIGINT, twice BIGINT GENERATED ALWAYS AS (id * 2))
          USING txlog TBLPROPERTIES ('k' = 'v'$extra)""")
        spark.sql(s"INSERT INTO gdml.default.t_$nm SELECT id, id * 2 FROM range(8)")
        spark.sql(s"UPDATE gdml.default.t_$nm SET id = id + 100 WHERE id = 3")
        val got = spark.table(s"gdml.default.t_$nm")
        assert(got.where(!($"twice" <=> $"id" * 2)).count() == 0,
          s"$nm: SQL UPDATE left a stale derived value")
        assert(got.where($"id" === 103L).count() == 1, nm)
        spark.sql(s"DROP TABLE gdml.default.t_$nm")
    }
  }

  test("declaration is CREATE-time only; schema changes that break a declaration refuse") {
    val t = fresh()
    TxLog.createTable(spark, t, schema, props = gprops)
    TxLog.commit(spark.range(4).select($"id", lit("x").as("txt"),
      ($"id" * 2).as("twice")), t, "w", 0L)
    // late opt-in on a table with data: refused
    intercept[Exception] {
      TxLog.setProperties(spark, t, Map(TxGen.Prefix + "txt" -> "'y'"))
    }
    // rename/drop/widen of the SOURCE column: refused
    intercept[Exception] { TxLog.renameColumn(spark, t, "id", "key") }
    intercept[Exception] { TxLog.dropColumn(spark, t, "id") }
    // rename of the generated column itself: fine (physical-keyed)
    TxLog.renameColumn(spark, t, "twice", "dbl")
    Seq((10L, "z", null.asInstanceOf[java.lang.Long])).toDF("id", "txt", "dbl")
      .write.format("txlog").mode("append").save(t)
    assert(TxLog.snapshot(spark, t).get.where($"id" === 10L)
      .select("dbl").as[Long].head() == 20L)
    // drop of the generated column retires the declaration (inert)
    TxLog.dropColumn(spark, t, "dbl")
    Seq((11L, "w")).toDF("id", "txt")
      .write.format("txlog").mode("append").save(t)
    assert(TxLog.snapshot(spark, t).get.count() == 6)
    // and a re-added same-name column (schema-evolving append mints a
    // FRESH physical) does NOT inherit the retired derivation
    Seq((12L, "v", java.lang.Long.valueOf(999L))).toDF("id", "txt", "dbl")
      .write.format("txlog").mode("append").save(t)
    assert(TxLog.snapshot(spark, t).get.where($"id" === 12L)
      .select("dbl").as[Long].head() == 999L)
  }

  test("INSERT OVERWRITE keeps a still-valid declaration; REPLACE TABLE resets it") {
    val t = fresh()
    TxLog.createTable(spark, t, schema, props = gprops)
    TxLog.commit(spark.range(4).select($"id", lit("x").as("txt"),
      lit(null).cast("long").as("twice")), t, "w", 0L)
    // overwrite with the same shape: the declaration survives and fills
    spark.range(2).select(($"id" + 10).as("id"), lit("o").as("txt"),
      lit(null).cast("long").as("twice"))
      .write.format("txlog").mode("overwrite").save(t)
    assert(TxLog.snapshot(spark, t).get.orderBy("id")
      .select("twice").as[Long].collect().toSeq == Seq(20L, 22L))
    assert(TxGen.gensIn(TxLog.properties(spark, t)).keySet == Set("twice"))
  }

  test("keyed CDC upsert composes with generated columns (fill + recompute)") {
    val t = fresh()
    TxLog.createTable(spark, t, schema, props = gprops)
    TxLog.commit(spark.range(6).select($"id", lit("x").as("txt"),
      lit(null).cast("long").as("twice")), t, "w", 0L)
    // upsert replaces id=2 (new txt, NULL derived -> filled) and
    // inserts id=50; its own rows survive its delete entry
    TxLog.upsertByKeys(Seq((2L, "r", null.asInstanceOf[java.lang.Long]),
      (50L, "n", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "txt", "twice"), t, Seq("id"), "up", 0L)
    val got = TxLog.snapshot(spark, t).get
    assert(got.count() == 7)
    assert(got.where(!($"twice" <=> $"id" * 2)).count() == 0,
      "keyed upsert left an unfilled/stale derived value")
    assert(got.where($"id" === 2L).select("txt").as[String].head() == "r")
    // a contradicting derived value in the upsert source refuses
    intercept[Exception] {
      TxLog.upsertByKeys(Seq((3L, "z", java.lang.Long.valueOf(999L)))
        .toDF("id", "txt", "twice"), t, Seq("id"), "up", 1L)
    }
    assert(TxLog.snapshot(spark, t).get.count() == 7)
  }

  test("a generated column drives partition-transform pruning (the layout point)") {
    val t = fresh()
    val sch = StructType(Seq(StructField("ts", TimestampType),
      StructField("day", DateType)))
    TxLog.createTable(spark, t, sch, partitionBy = Seq("day"),
      props = Map(TxGen.Prefix + "day" -> "CAST(ts AS DATE)"))
    val df = spark.range(200).select(
      (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("long") +
        $"id" * 86400 / 4).cast("timestamp").as("ts"),
      lit(null).cast("date").as("day"))
    df.write.format("txlog").mode("append").save(t)
    val (kept, total) = TxLog.pruneCount(spark, t,
      col("day") === java.sql.Date.valueOf("2024-01-10"))
    assert(total > 1 && kept < total,
      s"derived-partition prune had no effect ($kept/$total)")
    assert(spark.read.format("txlog").load(t)
      .where(col("day") === java.sql.Date.valueOf("2024-01-10")).count() == 4)
  }
}
