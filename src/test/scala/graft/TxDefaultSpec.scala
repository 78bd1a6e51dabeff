package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** INITIAL DEFAULTS ([[TxLog.addColumnWithDefault]] / ALTER TABLE ADD
  * COLUMN ... DEFAULT / CREATE TABLE (c T DEFAULT ...)): a column added
  * with a default reads that default from every file that PREDATES it
  * (the file has no physical column — Iceberg's initial-default),
  * while files that carry the column serve their stored values
  * (stored null stays null). Served through Spark's own
  * EXISTS_DEFAULT field metadata: the vectorized and MR parquet
  * readers fill absent columns as constant vectors — zero per-row
  * cost, inside whole-stage codegen. */
class TxDefaultSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fresh(): String =
    Files.createTempDirectory("txdflt_").resolve("t").toString

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** gen0 without `flag`, ADD COLUMN flag INT DEFAULT 7, gen1 with
    * stored values incl. a genuine null. */
  private def build(): String = {
    val t = fresh()
    spark.range(4).select(col("id"), lit("a").as("grp"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.addColumnWithDefault(spark, t, "flag", IntegerType, "7")
    spark.range(4, 8).select(col("id"), lit("b").as("grp"),
        when(col("id") === 6, lit(null)).otherwise(col("id"))
          .cast("int").as("flag"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    t
  }

  private def flags(t: String): Seq[(Long, Option[Int])] =
    spark.read.format("txlog").load(t).orderBy("id").collect().toSeq
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("flag"))) None
         else Some(r.getInt(r.fieldIndex("flag")))))

  test("pre-add files read the default; stored values (incl. null) win; both readers") {
    val t = build()
    val expect = Seq(0L -> Some(7), 1L -> Some(7), 2L -> Some(7), 3L -> Some(7),
      4L -> Some(4), 5L -> Some(5), 6L -> None, 7L -> Some(7))
    assert(flags(t) == expect, flags(t).toString)
    withConfs("spark.sql.parquet.enableVectorizedReader" -> "false") {
      assert(flags(t) == expect, "MR reader diverged")
    }
    // filters can't mis-skip: the default rows match flag = 7
    val hit = spark.read.format("txlog").load(t)
      .where(col("flag") === 7).select("id").collect().map(_.getLong(0)).sorted
    assert(hit.toSeq == Seq(0L, 1L, 2L, 3L, 7L), hit.mkString(","))
    assert(spark.read.format("txlog").load(t)
      .where(col("flag").isNull).count() == 1L)
  }

  test("the default and the evolved schema publish atomically (one manifest)") {
    val t = fresh()
    spark.range(2).coalesce(1).write.format("txlog").mode("append").save(t)
    val v = TxLog.addColumnWithDefault(spark, t, "c", LongType, "5 + 1")
    // canonicalized literal, recorded in the SAME version's props
    assert(TxLog.propertiesAt(spark, t, v)
      .get(TxLog.DefaultPropPrefix + "c").contains("6L"))
    assert(TxLog.propertiesAt(spark, t, v - 1)
      .get(TxLog.DefaultPropPrefix + "c").isEmpty)
    // refusals: non-constant, null-after-cast, lossy parse
    intercept[IllegalArgumentException](
      TxLog.addColumnWithDefault(spark, t, "d", IntegerType, "rand()"))
    intercept[IllegalArgumentException](
      TxLog.addColumnWithDefault(spark, t, "d", IntegerType, "CAST(null AS INT)"))
    intercept[IllegalArgumentException](
      TxLog.addColumnWithDefault(spark, t, "d", IntegerType, "'abc"))
    // immutability: the property is owned by the evolve transaction
    intercept[IllegalArgumentException](
      TxLog.setProperties(spark, t, Map(TxLog.DefaultPropPrefix + "c" -> "9")))
    intercept[IllegalArgumentException](
      TxLog.removeProperties(spark, t, Seq(TxLog.DefaultPropPrefix + "c")))
  }

  test("SQL surface: ALTER ADD DEFAULT, INSERT fills it, CREATE TABLE DEFAULT") {
    val wh = Files.createTempDirectory("txdflt_cat_").toString
    withConfs(
      "spark.sql.catalog.dfcat" -> "graft.storage.GraftCatalog",
      "spark.sql.catalog.dfcat.warehouse" -> wh) {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS dfcat.ns")
      spark.sql("CREATE TABLE dfcat.ns.t (id BIGINT, grp STRING) USING txlog")
      spark.sql("INSERT INTO dfcat.ns.t VALUES (1, 'a'), (2, 'b')")
      spark.sql("ALTER TABLE dfcat.ns.t ADD COLUMN tag STRING DEFAULT 'x'")
      // pre-add rows read 'x'; an INSERT that omits the column fills it
      spark.sql("INSERT INTO dfcat.ns.t (id, grp) VALUES (3, 'c')")
      // an INSERT that stores null keeps null
      spark.sql("INSERT INTO dfcat.ns.t VALUES (4, 'd', NULL)")
      val got = spark.table("dfcat.ns.t").orderBy("id").collect()
        .map(r => r.getLong(0) -> Option(r.getString(2))).toSeq
      assert(got == Seq(1L -> Some("x"), 2L -> Some("x"),
        3L -> Some("x"), 4L -> None), got.toString)
      // CREATE TABLE with an inline DEFAULT
      spark.sql("CREATE TABLE dfcat.ns.u (a INT, b STRING DEFAULT 'z') USING txlog")
      spark.sql("INSERT INTO dfcat.ns.u (a) VALUES (1)")
      assert(spark.table("dfcat.ns.u").first().getString(1) == "z")
    }
  }

  test("rename keeps the default (physical-keyed); time travel is era-exact") {
    val t = build()
    val vPost = TxLog.headVersion(spark, t)
    TxLog.renameColumn(spark, t, "flag", "mark")
    val got = spark.read.format("txlog").load(t).where(col("mark") === 7)
    assert(got.count() == 5L)
    // pre-add version: no column at all
    val pre = spark.read.format("txlog").option("versionAsOf", 0).load(t)
    assert(!pre.columns.contains("flag") && !pre.columns.contains("mark"))
    // post-add pinned version: old name, defaults served
    val post = spark.read.format("txlog").option("versionAsOf", vPost).load(t)
    assert(post.where(col("flag") === 7).count() == 5L)
  }

  test("DML across eras: predicates see the default; rewrites materialize it") {
    val t = build()
    TxLog.update(spark, t, col("flag") === 7 && col("id") < 2,
      Map("grp" -> lit("upd")), "df-upd", 0L)
    TxLog.delete(spark, t, col("flag").isNull, "df-del", 0L)
    val rows = flags(t)
    assert(rows == Seq(0L -> Some(7), 1L -> Some(7), 2L -> Some(7),
      3L -> Some(7), 4L -> Some(4), 5L -> Some(5), 7L -> Some(7)), rows.toString)
    assert(spark.read.format("txlog").load(t)
      .where(col("grp") === "upd").count() == 2L)
    // compaction materializes the default into the rewritten files and
    // reads stay identical
    TxLog.compact(spark, t)
    assert(flags(t) == rows)
  }

  test("change feed pre-images serve the default for pre-add rows") {
    val t = fresh()
    spark.range(3).select(col("id"), lit("a").as("grp"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    TxLog.addColumnWithDefault(spark, t, "flag", IntegerType, "7")
    TxLog.delete(spark, t, col("id") === 1, "df-cdf", 0L)
    val del = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", 0).load(t)
      .where(col("_change_type") === "delete")
    assert(del.count() == 1L)
    assert(del.first().getAs[Int]("flag") == 7,
      "the deleted pre-add row's pre-image must carry the default")
  }

  test("analyze synthesizes default-exact stats: metadata count/min/max and real NDV") {
    val t = build()
    val r = TxLog.analyze(spark, t, Seq("flag"))
    assert(r.version >= 0 && r.filesSkipped == 0, r.toString)
    // metadata-only aggregate: count(flag) = 7 non-null (1 stored null),
    // min 4, max 7 — the pre-add file contributes min=max=7, nulls=0
    val agg = spark.read.format("txlog").load(t)
      .agg(count(col("flag")), min(col("flag")), max(col("flag")))
    assert(agg.queryExecution.optimizedPlan.toString.contains("MetaAgg") ||
      agg.queryExecution.executedPlan.toString.contains("MetaAgg"),
      agg.queryExecution.executedPlan.toString)
    val row = agg.first()
    assert((row.getLong(0), row.getInt(1), row.getInt(2)) == ((7L, 4, 7)))
    // CBO: the sketch folds the synthetic one-hash default sketch with
    // the scanned era's — distinct = {4, 5, 7}
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val st = spark.read.format("txlog").load(t)
        .queryExecution.optimizedPlan.stats
      val ndv = st.attributeStats.toSeq
        .collectFirst { case (a, cs) if a.name == "flag" => cs }
        .flatMap(_.distinctCount)
      assert(ndv.contains(BigInt(3)), s"flag ndv $ndv")
    }
  }

  test("zone maps prune with default-synthesized bounds, never against them") {
    val t = build()
    TxLog.analyze(spark, t, Seq("flag"))
    // flag = 7 must keep the pre-add file (its synthesized bounds are
    // [7,7]); flag = 99 may prune everything
    val (kept7, total) = TxLog.pruneCount(spark, t, col("flag") === 7)
    assert(kept7 == 2 && total == 2, s"kept $kept7 of $total")
    val (kept99, _) = TxLog.pruneCount(spark, t, col("flag") === 99)
    assert(kept99 == 0, s"kept $kept99 files for flag = 99")
    // correctness floor: the pruned scan returns the same rows
    assert(spark.read.format("txlog").load(t).where(col("flag") === 7).count() == 5L)
    assert(spark.read.format("txlog").load(t).where(col("flag") === 99).count() == 0L)
  }

  test("widening a defaulted column re-renders the literal at the new type") {
    val t = build()
    TxLog.widenColumnType(spark, t, "flag", LongType)
    // the property now stores the LONG rendering, atomically with the widen
    assert(TxLog.properties(spark, t)
      .get(TxLog.DefaultPropPrefix + "flag").contains("7L"),
      TxLog.properties(spark, t).toString)
    val rows = flags2L(t)
    assert(rows == Seq(0L -> Some(7L), 1L -> Some(7L), 2L -> Some(7L),
      3L -> Some(7L), 4L -> Some(4L), 5L -> Some(5L), 6L -> None, 7L -> Some(7L)),
      rows.toString)
    // post-widen ingest beyond int range coexists with defaulted eras
    spark.range(8, 9).select(col("id"), lit("c").as("grp"),
        lit(5000000000L).as("flag"))
      .write.format("txlog").mode("append").save(t)
    assert(spark.read.format("txlog").load(t)
      .where(col("flag") === 5000000000L).count() == 1L)
    assert(spark.read.format("txlog").load(t)
      .where(col("flag") === 7L).count() == 5L)
  }

  private def flags2L(t: String): Seq[(Long, Option[Long])] =
    spark.read.format("txlog").load(t).orderBy("id").collect().toSeq
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("flag"))) None
         else Some(r.getLong(r.fieldIndex("flag")))))

  test("a defaulted column minted on a MAPPED table; drop + re-add gets a fresh slot") {
    val t = fresh()
    spark.range(3).select(col("id"), lit("a").as("grp"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    // create the mapping first: the add must mint its physical and key
    // the default to it inside one commit
    TxLog.renameColumn(spark, t, "grp", "label")
    TxLog.addColumnWithDefault(spark, t, "flag", IntegerType, "7")
    assert(spark.read.format("txlog").load(t)
      .where(col("flag") === 7).count() == 3L)
    // drop retires the physical; the re-added same-name column is a
    // DIFFERENT column: no inherited default, no resurrected values
    TxLog.dropColumn(spark, t, "flag")
    TxLog.evolveSchema(spark, t, org.apache.spark.sql.types.StructType(
      spark.read.format("txlog").load(t).schema.fields :+
        StructField("flag", IntegerType, nullable = true)))
    val re = spark.read.format("txlog").load(t)
    assert(re.where(col("flag").isNull).count() == 3L,
      "a re-added column must not inherit the dropped column's default or values")
  }

  test("NOT NULL needs a DEFAULT: the declaration stays truthful across eras") {
    val t = fresh()
    spark.range(3).select(col("id"), lit("a").as("grp"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    // plain evolution still refuses a required column (null backfill
    // would lie); with a default it is sound
    intercept[IllegalArgumentException](TxLog.evolveSchema(spark, t,
      org.apache.spark.sql.types.StructType(
        spark.read.format("txlog").load(t).schema.fields :+
          StructField("req", IntegerType, nullable = false))))
    TxLog.addColumnWithDefault(spark, t, "req", IntegerType, "9",
      nullable = false)
    val df = spark.read.format("txlog").load(t)
    assert(!df.schema("req").nullable)
    assert(df.where(col("req") === 9).count() == 3L)
    assert(df.where(col("req").isNull).count() == 0L)
    // a write MISSING the required-but-defaulted column is sound (its
    // rows read 9); one CARRYING it keeps Spark's null check
    spark.range(3, 4).select(col("id"), lit("b").as("grp"))
      .write.format("txlog").mode("append").save(t)
    assert(spark.read.format("txlog").load(t)
      .where(col("req") === 9).count() == 4L)
    // SQL: ADD COLUMN ... NOT NULL DEFAULT through the catalog
    val wh = Files.createTempDirectory("txdflt_nn_").toString
    withConfs(
      "spark.sql.catalog.nncat" -> "graft.storage.GraftCatalog",
      "spark.sql.catalog.nncat.warehouse" -> wh) {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS nncat.ns")
      spark.sql("CREATE TABLE nncat.ns.t (id BIGINT) USING txlog")
      spark.sql("INSERT INTO nncat.ns.t VALUES (1)")
      spark.sql("ALTER TABLE nncat.ns.t ADD COLUMN lvl INT NOT NULL DEFAULT 3")
      assert(spark.table("nncat.ns.t").where(col("lvl") === 3).count() == 1L)
      intercept[Exception](
        spark.sql("ALTER TABLE nncat.ns.t ADD COLUMN bad INT NOT NULL"))
    }
  }

  test("a TIMESTAMP default is zone-proof: the instant survives a session-TZ flip") {
    val t = fresh()
    spark.range(2).coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.addColumnWithDefault(spark, t, "ts", TimestampType,
      "TIMESTAMP '2026-01-02 03:04:05'") // parsed under the UTC session
    val stored = TxLog.properties(spark, t)(TxLog.DefaultPropPrefix + "ts")
    assert(stored.startsWith("TIMESTAMP '") && stored.endsWith("+00:00'"),
      stored) // UTC wall text WITH offset: zone-proof AND re-parse-foldable
    def micros(): Long = spark.read.format("txlog").load(t)
      .select(unix_micros(col("ts"))).first().getLong(0)
    val inUtc = micros()
    withConfs("spark.sql.session.timeZone" -> "America/Los_Angeles") {
      assert(micros() == inUtc,
        "the default's instant must not re-interpret under another session TZ")
    }
  }

  test("TIMESTAMP defaults survive every re-ingest: rename/widen, CREATE, analyze") {
    val t = fresh()
    spark.range(3).select(col("id").cast("int").as("id"), lit("a").as("grp"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.addColumnWithDefault(spark, t, "ts", TimestampType,
      "TIMESTAMP '2026-01-02 03:04:05.123456'")
    val us = spark.read.format("txlog").load(t)
      .select(unix_micros(col("ts"))).first().getLong(0)
    // commitColMap re-renders every stored default: a rename (and a
    // widen of another column) must re-parse the timestamp rendering
    TxLog.renameColumn(spark, t, "grp", "label")
    TxLog.widenColumnType(spark, t, "id", LongType)
    assert(spark.read.format("txlog").load(t)
      .select(unix_micros(col("ts"))).first().getLong(0) == us)
    // analyze parses + evaluates the stored literal for the synthetic
    // stats; the metadata min/max then serve the exact instant
    val r = TxLog.analyze(spark, t, Seq("ts"))
    assert(r.version >= 0 && r.filesSkipped == 0, r.toString)
    val agg = spark.read.format("txlog").load(t)
      .agg(count(col("ts")), min(col("ts")), max(col("ts")))
    assert(agg.queryExecution.executedPlan.toString.contains("MetaAgg"),
      agg.queryExecution.executedPlan.toString)
    val row = agg.first()
    assert(row.getLong(0) == 3L)
    assert(row.getTimestamp(1) == row.getTimestamp(2))
    // CREATE TABLE with an inline TIMESTAMP DEFAULT re-validates the
    // canonical rendering through validateProps
    val wh = Files.createTempDirectory("txdflt_ts_").toString
    withConfs(
      "spark.sql.catalog.tscat" -> "graft.storage.GraftCatalog",
      "spark.sql.catalog.tscat.warehouse" -> wh) {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS tscat.ns")
      spark.sql("CREATE TABLE tscat.ns.t (id BIGINT, " +
        "ts TIMESTAMP DEFAULT TIMESTAMP '2026-01-01 00:00:00') USING txlog")
      spark.sql("INSERT INTO tscat.ns.t (id) VALUES (1)")
      assert(spark.table("tscat.ns.t").where(col("ts").isNull).count() == 0L)
    }
  }

  test("a pinned explicit-schema read resolves defaults through the mapping AS OF") {
    val t = fresh()
    spark.range(3).select(col("id"), lit("a").as("grp"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    // mint a mapping FIRST so flag's physical differs from its logical
    TxLog.renameColumn(spark, t, "grp", "label")
    TxLog.addColumnWithDefault(spark, t, "flag", IntegerType, "7")
    val vPinned = TxLog.headVersion(spark, t)
    val pinnedSchema = spark.read.format("txlog")
      .option("versionAsOf", vPinned).load(t).schema
    // rename flag AFTER the pin: a current-mapping lookup of 'flag'
    // would miss the default (keyed by the minted physical)
    TxLog.renameColumn(spark, t, "flag", "mark")
    val got = spark.read.schema(pinnedSchema)
      .option("versionAsOf", vPinned).format("txlog").load(t)
    assert(got.where(col("flag") === 7).count() == 3L,
      "the pinned-era explicit schema must serve the default through the AS-OF mapping")
  }

  test("UPDATE ... SET col = DEFAULT resolves through the catalog surface") {
    val wh = Files.createTempDirectory("txdflt_upd_").toString
    withConfs(
      "spark.sql.catalog.upcat" -> "graft.storage.GraftCatalog",
      "spark.sql.catalog.upcat.warehouse" -> wh) {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS upcat.ns")
      spark.sql("CREATE TABLE upcat.ns.t (id BIGINT, tag STRING DEFAULT 'x') USING txlog")
      spark.sql("INSERT INTO upcat.ns.t VALUES (1, 'a'), (2, 'b')")
      spark.sql("UPDATE upcat.ns.t SET tag = DEFAULT WHERE id = 2")
      val got = spark.table("upcat.ns.t").orderBy("id").collect()
        .map(_.getString(1)).toSeq
      assert(got == Seq("a", "x"), got.toString)
    }
  }

  test("a streaming read's initial snapshot serves the default for pre-add files") {
    val t = build()
    val name = s"txdflt_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("txlog").option("path", t).load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("txdflt_st_").toString)
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table(name)
    assert(got.count() == 8L)
    assert(got.where(col("flag") === 7).count() == 5L,
      "the stream's snapshot must fill the default for pre-add files")
    assert(got.where(col("flag").isNull).count() == 1L)
  }

  test("restore to a pre-add version drops the column; forward keeps the default") {
    val t = build()
    val vHead = TxLog.headVersion(spark, t)
    TxLog.restore(spark, t, 0L)
    assert(!spark.read.format("txlog").load(t).columns.contains("flag"))
    TxLog.restore(spark, t, vHead)
    assert(spark.read.format("txlog").load(t)
      .where(col("flag") === 7).count() == 5L)
  }

  test("overwrite strips a DROPPED column's orphaned default — a re-added " +
      "name can never inherit it") {
    val t = build()
    TxLog.dropColumn(spark, t, "flag") // default key orphaned (physical retired)
    assert(TxLog.properties(spark, t).keys
      .exists(_.startsWith(TxLog.DefaultPropPrefix)), "orphaned key still inert-present")
    // overwrite RESETS the mapping (retired list cleared) — the stale
    // key must not survive into the re-opened identity namespace
    TxLog.overwrite(spark.range(3).select(col("id"), lit("z").as("grp")), t)
    assert(!TxLog.properties(spark, t).keys
      .exists(_.startsWith(TxLog.DefaultPropPrefix)),
      "overwrite carried a stale graft.default.* key past the cmap reset")
    // the ADVICE scenario end-to-end: plain nullable re-add of the same
    // name mints the identity physical — pre-add files must read NULL,
    // never the old column's default
    TxLog.evolveSchema(spark, t, StructType(
      TxLog.tableSchema(spark, t).get.fields :+
        StructField("flag", IntegerType, nullable = true)))
    val got = spark.read.format("txlog").load(t)
    assert(got.where(col("flag").isNull).count() == 3L,
      "post-overwrite pre-add files silently read the stale default")
  }

  test("overwrite KEEPS the default of a column that survives into the " +
      "replacement schema; truncate re-keys a renamed column's default") {
    val t = build()
    // overwrite with a schema that still carries `flag`: the declared
    // default survives the data replacement — a later append omitting
    // the column still fills it
    TxLog.overwrite(spark.range(10, 12).select(col("id"),
      lit("c").as("grp"), lit(1).as("flag")), t)
    assert(TxLog.properties(spark, t)
      .get(TxLog.DefaultPropPrefix + "flag").contains("7"))
    spark.range(20, 22).select(col("id"), lit("d").as("grp"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    val got = spark.read.format("txlog").load(t).where(col("id") >= 20)
    assert(got.where(col("flag") === 7).count() == 2L)
    // truncate on a MAPPED table: rename flag -> f2 (physical stays
    // `flag`), truncate resets the mapping — the key must RE-KEY to
    // the new identity physical `f2`, not strand under `flag`
    TxLog.renameColumn(spark, t, "flag", "f2")
    TxLog.truncate(spark, t)
    val props = TxLog.properties(spark, t)
    assert(props.get(TxLog.DefaultPropPrefix + "f2").contains("7"), props.toString)
    assert(!props.contains(TxLog.DefaultPropPrefix + "flag"), props.toString)
    spark.range(2).select(col("id"), lit("e").as("grp"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    assert(spark.read.format("txlog").load(t)
      .where(col("f2") === 7).count() == 2L,
      "the re-keyed default must keep filling omitted-column appends")
  }

  test("append does NOT demote a NOT NULL column to nullable; an actual " +
      "null row is refused at the write") {
    val t = fresh()
    spark.range(3).coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.addColumnWithDefault(spark, t, "req", IntegerType, "5",
      nullable = false)
    assert(TxLog.tableSchema(spark, t).get("req").nullable == false)
    // a DataFrame claims its columns nullable (file sources force it) —
    // appending one with NO actual nulls must keep the declared contract
    spark.range(3, 6).select(col("id"),
        col("id").cast("int").as("req"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    assert(TxLog.tableSchema(spark, t).get("req").nullable == false,
      "first nullable-claimed append demoted the NOT NULL contract")
    // ... and one with an actual null is refused per-row at staging
    val bad = spark.range(6, 8).select(col("id"),
      when(col("id") === 7, lit(null)).otherwise(lit(1))
        .cast("int").as("req"))
    val e = intercept[Exception] {
      TxLog.commit(bad.coalesce(1), t, "w-null", 1L)
    }
    assert(e.getMessage != null || e.getCause != null)
    // the failed write staged nothing visible
    assert(spark.read.format("txlog").load(t).count() == 6L)
    assert(spark.read.format("txlog").load(t)
      .where(col("req").isNull).count() == 0L)
  }

  test("reserved writer-id refusal names the prefix that matched") {
    val t = fresh()
    spark.range(1).write.format("txlog").mode("append").save(t)
    val e = intercept[IllegalArgumentException] {
      TxLog.commit(spark.range(1).toDF(), t, "widen-nightly", 0L)
    }
    assert(e.getMessage.contains("widen-"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      TxLog.commit(spark.range(1).toDF(), t, "colmap-x", 0L)
    }
    assert(e2.getMessage.contains("colmap-"), e2.getMessage)
  }
}
