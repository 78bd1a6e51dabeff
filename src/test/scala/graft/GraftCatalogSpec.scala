package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** The named front door: `GraftCatalog` as a Spark `TableCatalog` +
  * `ProcedureCatalog` over a warehouse of txlog tables — SQL DDL,
  * inserts, native row-level DML, time-travel clauses and CALL
  * maintenance, all through catalog identifiers. */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft_wh_").toString
    s.conf.set("spark.sql.catalog.testcat", "graft.storage.GraftCatalog")
    s.conf.set("spark.sql.catalog.testcat.warehouse", wh)
    s
  }
  import spark.implicits._

  private def wh: String = spark.conf.get("spark.sql.catalog.testcat.warehouse")

  test("CREATE TABLE + INSERT + SELECT through catalog identifiers") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.main")
    spark.sql("""CREATE TABLE testcat.main.events
                 (id BIGINT, region STRING, v STRING) USING txlog
                 PARTITIONED BY (region)
                 TBLPROPERTIES ('graft.tag' = 'r13')""")
    // the created table reports its contract back
    val desc = spark.sql("DESCRIBE TABLE EXTENDED testcat.main.events")
      .collect().map(_.toString).mkString("\n")
    assert(desc.contains("region"))
    spark.sql("""INSERT INTO testcat.main.events
                 SELECT id, concat('r', cast(id % 3 AS STRING)), concat('v', id)
                 FROM range(300)""")
    assert(spark.table("testcat.main.events").count() == 300L)
    // partition pruning works through the catalog read
    val t = s"$wh/main/events"
    val (kept, total) = TxLog.pruneCount(spark, t, col("region") === "r1")
    assert(kept < total, s"kept $kept of $total")
    assert(TxLog.properties(spark, t)("graft.tag") == "r13")
    assert(TxLog.partitionColumns(spark, t) == Seq("region"))
  }

  test("native SQL DML + time travel clauses on catalog tables") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.tt")
    spark.sql("CREATE TABLE testcat.tt.t (id BIGINT, grp STRING) USING txlog")
    spark.sql("INSERT INTO testcat.tt.t SELECT id, 'a' FROM range(100)")
    spark.sql("INSERT INTO testcat.tt.t SELECT id + 100, 'b' FROM range(100)")
    spark.sql("DELETE FROM testcat.tt.t WHERE grp = 'a' AND id < 50")
    assert(spark.table("testcat.tt.t").count() == 150L)
    spark.sql("UPDATE testcat.tt.t SET grp = 'c' WHERE id >= 150")
    assert(spark.sql("SELECT count(*) FROM testcat.tt.t WHERE grp = 'c'")
      .first().getLong(0) == 50L)
    // VERSION AS OF: v2 = after both inserts, before the delete
    assert(spark.sql("SELECT count(*) FROM testcat.tt.t VERSION AS OF 2")
      .first().getLong(0) == 200L)
    // MERGE through the catalog (multi-action)
    Seq((150L, "z"), (999L, "new")).toDF("id", "grp")
      .createOrReplaceTempView("m_src")
    spark.sql("""MERGE INTO testcat.tt.t AS tgt USING m_src AS src ON tgt.id = src.id
                 WHEN MATCHED THEN UPDATE SET grp = src.grp
                 WHEN NOT MATCHED THEN INSERT *""")
    val after = spark.table("testcat.tt.t")
    assert(after.count() == 151L)
    assert(after.where($"id" === 150L).select("grp").first().getString(0) == "z")
    // a version-pinned relation is read-only
    val e = intercept[Exception](
      spark.sql("DELETE FROM (SELECT * FROM testcat.tt.t VERSION AS OF 1) WHERE id = 1"))
  }

  test("TIMESTAMP AS OF resolves through the monotonized commit clock") {
    TxLog.clockForTests = {
      var t = 1000000L
      () => { t += 1000L; t }
    }
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.ts")
      spark.sql("CREATE TABLE testcat.ts.t (id BIGINT) USING txlog")
      spark.sql("INSERT INTO testcat.ts.t SELECT id FROM range(10)")
      spark.sql("INSERT INTO testcat.ts.t SELECT id + 10 FROM range(10)")
      val t = s"$wh/ts/t"
      val h = TxLog.history(spark, t).orderBy("version")
        .select("version", "timestamp").collect()
      val tsOfV1 = h(1).getTimestamp(1) // first insert's commit instant
      val lit = tsOfV1.toString.stripSuffix(".0")
      val n = spark.sql(
        s"SELECT count(*) FROM testcat.ts.t TIMESTAMP AS OF '$lit'")
        .first().getLong(0)
      assert(n == 10L, s"as-of $lit saw $n rows")
    } finally TxLog.clockForTests = null
  }

  test("CTAS, ALTER TABLE, RENAME, DROP") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.ddl")
    spark.sql("""CREATE TABLE testcat.ddl.c USING txlog AS
                 SELECT id, cast(id % 5 AS STRING) AS grp FROM range(50)""")
    assert(spark.table("testcat.ddl.c").count() == 50L)
    spark.sql("ALTER TABLE testcat.ddl.c ADD COLUMN score DOUBLE")
    assert(spark.table("testcat.ddl.c").columns.toSeq == Seq("id", "grp", "score"))
    assert(spark.table("testcat.ddl.c").where($"score".isNull).count() == 50L)
    spark.sql("ALTER TABLE testcat.ddl.c SET TBLPROPERTIES ('x' = '1')")
    assert(TxLog.properties(spark, s"$wh/ddl/c")("x") == "1")
    spark.sql("ALTER TABLE testcat.ddl.c UNSET TBLPROPERTIES ('x')")
    assert(!TxLog.properties(spark, s"$wh/ddl/c").contains("x"))
    // RENAME COLUMN is metadata-only through the column mapping (r14)
    spark.sql("ALTER TABLE testcat.ddl.c RENAME COLUMN grp TO g")
    assert(spark.table("testcat.ddl.c").columns.toSeq == Seq("id", "g", "score"))
    assert(spark.sql("SELECT count(*) FROM testcat.ddl.c WHERE g = '3'")
      .first().getLong(0) == 10L)
    // a LOSSY type change is loud, not silent (r15: lossless widenings
    // are supported — TxWidenSpec — anything else refuses up front)
    val e = intercept[Exception](
      spark.sql("ALTER TABLE testcat.ddl.c ALTER COLUMN id TYPE STRING"))
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    assert(msgs(e).contains("widening"), msgs(e))
    // the RENAME TO target resolves inside the SAME catalog — no
    // catalog qualifier on the new name
    spark.sql("ALTER TABLE testcat.ddl.c RENAME TO ddl.c2")
    assert(spark.table("testcat.ddl.c2").count() == 50L)
    assert(!spark.catalog.tableExists("testcat.ddl.c"))
    spark.sql("DROP TABLE testcat.ddl.c2")
    assert(!spark.catalog.tableExists("testcat.ddl.c2"))
  }

  test("ALTER resolves target columns case-insensitively (Spark resolution)") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, TableChange}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.ci")
    spark.sql("""CREATE TABLE testcat.ci.t USING txlog AS
                 SELECT id, cast(id AS INT) AS val, cast(id AS STRING) AS s
                 FROM range(10)""")
    // direct catalog API with the WRONG case — bypasses any analyzer
    // normalization, so this pins the catalog's own resolution
    val cat = spark.sessionState.catalogManager.catalog("testcat")
      .asInstanceOf[TableCatalog]
    val id = Identifier.of(Array("ci"), "t")
    cat.alterTable(id, TableChange.renameColumn(Array("VAL"), "v2"))
    assert(spark.table("testcat.ci.t").columns.toSeq == Seq("id", "v2", "s"))
    cat.alterTable(id, TableChange.updateColumnType(Array("V2"),
      org.apache.spark.sql.types.LongType))
    assert(spark.table("testcat.ci.t").schema("v2").dataType ==
      org.apache.spark.sql.types.LongType)
    cat.alterTable(id, TableChange.deleteColumn(Array("S"), false))
    assert(spark.table("testcat.ci.t").columns.toSeq == Seq("id", "v2"))
    // data still reads correctly through the renamed+widened column
    assert(spark.sql("SELECT sum(v2) FROM testcat.ci.t").first().getLong(0) == 45L)
    spark.sql("DROP TABLE testcat.ci.t")
  }

  test("namespaces: create/list/alter/drop; non-empty drop needs CASCADE") {
    spark.sql("CREATE NAMESPACE testcat.nsa COMMENT 'alpha'")
    spark.sql("CREATE NAMESPACE testcat.nsa.inner")
    spark.sql("CREATE TABLE testcat.nsa.inner.t (id INT) USING txlog")
    val names = spark.sql("SHOW NAMESPACES IN testcat.nsa")
      .collect().map(_.getString(0)).toSeq
    assert(names.contains("nsa.inner"), s"got $names")
    val tbls = spark.sql("SHOW TABLES IN testcat.nsa.inner")
      .collect().map(_.getString(1)).toSeq
    assert(tbls == Seq("t"))
    spark.sql("ALTER NAMESPACE testcat.nsa SET PROPERTIES ('k' = 'v')")
    val meta = spark.sql("DESCRIBE NAMESPACE EXTENDED testcat.nsa")
      .collect().map(_.toString).mkString("\n")
    assert(meta.contains("k=v") || meta.contains("(k,v)") || meta.contains("k -> v"),
      s"got:\n$meta")
    val e = intercept[Exception](spark.sql("DROP NAMESPACE testcat.nsa.inner"))
    spark.sql("DROP NAMESPACE testcat.nsa.inner CASCADE")
    assert(spark.sql("SHOW NAMESPACES IN testcat.nsa").collect().isEmpty)
  }

  test("CALL system procedures: optimize, history, restore, vacuum") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.mx")
    spark.sql("CREATE TABLE testcat.mx.t (id BIGINT, grp STRING) USING txlog")
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO testcat.mx.t SELECT id + ${i * 100}, 'g$i' FROM range(100)")
    }
    val hist = spark.sql("CALL testcat.system.history(table => 'mx.t')")
    assert(hist.columns.toSeq.take(3) == Seq("version", "operation", "timestamp"))
    assert(hist.count() == 5L) // create + 4 inserts
    // optimize → one checkpoint version; table content unchanged
    val v = spark.sql("CALL testcat.system.optimize(table => 'mx.t')")
      .first().getLong(0)
    assert(v == 5L)
    assert(spark.table("testcat.mx.t").count() == 400L)
    // restore to the pre-optimize version is addressable and exact
    val rv = spark.sql("CALL testcat.system.restore(table => 'mx.t', version => 4)")
      .first().getLong(0)
    assert(rv == 6L)
    assert(spark.table("testcat.mx.t").count() == 400L)
    // vacuum with age 0 collects the superseded generation
    val deleted = spark.sql("CALL testcat.system.vacuum(table => 'mx.t', min_age_ms => 0)")
      .first().getInt(0)
    assert(deleted > 0)
    assert(spark.table("testcat.mx.t").count() == 400L)
    // re-cluster the layout through CALL (zorder needs numeric dims —
    // this table's discriminating key is (grp, id), a range-cluster)
    val zv = spark.sql(
      "CALL testcat.system.cluster_by(table => 'mx.t', columns => 'grp,id', target_files => 4)")
      .first().getLong(0)
    assert(spark.table("testcat.mx.t").count() == 400L)
    // DESCRIBE DETAIL: live-state observables from the log alone —
    // counts exact after the maintenance above, zero DVs on a COW table
    val det = spark.sql("CALL testcat.system.detail(table => 'mx.t')").first()
    assert(det.getAs[Int]("n_files") == 4 && det.getAs[Long]("rows") == 400L)
    assert(det.getAs[Int]("n_dvs") == 0 && det.getAs[Long]("dv_rows") == 0L)
    assert(det.getAs[String]("dml_mode") == "copyOnWrite" &&
      !det.getAs[Boolean]("change_feed"))
    assert(det.getAs[Long]("bytes") > 0L && det.getAs[String]("partition_cols") == "")
    // ...and the DV debt signal on a merge-on-read table
    spark.sql("ALTER TABLE testcat.mx.t SET TBLPROPERTIES " +
      "('graft.dml.mode' = 'mergeOnRead')")
    spark.sql("DELETE FROM testcat.mx.t WHERE id % 10 = 3")
    val det2 = spark.sql("CALL testcat.system.detail(table => 'mx.t')").first()
    assert(det2.getAs[Int]("n_dvs") > 0 && det2.getAs[Long]("dv_rows") == 40L)
    assert(det2.getAs[Long]("rows") == 400L, // RAW recorded rows; net = rows − dv_rows
      s"raw rows must stay pre-DV: $det2")
    assert(det2.getAs[String]("dml_mode") == "mergeOnRead")
    assert(spark.table("testcat.mx.t").count() == 360L)
    // unknown procedure names its alternatives (Spark wraps the
    // catalog's error in FAILED_TO_LOAD_ROUTINE — walk the chain)
    val e = intercept[Exception](spark.sql("CALL testcat.system.nope()"))
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("\n")
    assert(msgs.contains("available") || msgs.contains("ROUTINE"), msgs)
  }

  test("atomic RTAS: a failing REPLACE query leaves the old table byte-identical") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.rt")
    spark.sql("""CREATE TABLE testcat.rt.t USING txlog
                 TBLPROPERTIES ('graft.keep' = 'old') AS
                 SELECT id, 'orig' AS tag FROM range(100)""")
    val before = spark.table("testcat.rt.t").orderBy("id").collect().toSeq
    // the replacement query fails mid-write: the staged files are never
    // named by a manifest, so the old snapshot survives untouched
    val e = intercept[Exception](spark.sql(
      """CREATE OR REPLACE TABLE testcat.rt.t USING txlog AS
         SELECT id, assert_true(id < 5, 'boom') AS tag FROM range(10)"""))
    assert(spark.table("testcat.rt.t").orderBy("id").collect().toSeq == before,
      "failed REPLACE mutated the table")
    assert(TxLog.properties(spark, s"$wh/rt/t")("graft.keep") == "old")
    // a SUCCEEDING replace swaps schema, layout and properties in one
    // atomic checkpoint — and the old state stays time-travelable
    spark.sql("""CREATE OR REPLACE TABLE testcat.rt.t USING txlog
                 PARTITIONED BY (grp)
                 TBLPROPERTIES ('graft.keep' = 'new') AS
                 SELECT id * 2 AS id2, cast(id % 2 AS STRING) AS grp FROM range(50)""")
    val t = s"$wh/rt/t"
    assert(spark.table("testcat.rt.t").count() == 50L)
    assert(spark.table("testcat.rt.t").columns.toSeq == Seq("id2", "grp"))
    assert(TxLog.partitionColumns(spark, t) == Seq("grp"))
    assert(TxLog.properties(spark, t)("graft.keep") == "new")
    val (kept, total) = TxLog.pruneCount(spark, t, col("grp") === "0")
    assert(kept < total, s"replacement lost the partitioned layout: $kept/$total")
    // pre-replace generation still addressable
    assert(spark.read.format("txlog").option("versionAsOf", 0).load(t)
      .columns.toSeq == Seq("id", "tag"))
  }

  test("atomic CTAS: a failing CREATE query leaves no table behind") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.ct")
    val e = intercept[Exception](spark.sql(
      """CREATE TABLE testcat.ct.nope USING txlog AS
         SELECT id, assert_true(id < 5, 'boom') AS tag FROM range(10)"""))
    assert(!spark.catalog.tableExists("testcat.ct.nope"))
    // the sweep is best-effort: Spark aborts while cancelled tasks may
    // still be flushing committer temp files, so under load a re-created
    // staging file can outlive any bounded re-sweep. The BINDING
    // contract is (a) no table came into existence and (b) the name is
    // immediately reusable — leftover staging files are unreferenced by
    // any manifest, invisible to reads, and ordinary vacuum litter.
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$wh/ct/nope/_txlog")))
    spark.sql("CREATE TABLE testcat.ct.nope (id BIGINT, tag STRING) USING txlog")
    spark.sql("INSERT INTO testcat.ct.nope VALUES (7, 'ok')")
    assert(spark.table("testcat.ct.nope").count() == 1L)
    spark.sql("DROP TABLE testcat.ct.nope")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$wh/ct/nope")))
    // plain CREATE OR REPLACE without AS SELECT publishes the empty form
    spark.sql("""CREATE OR REPLACE TABLE testcat.ct.empty
                 (id BIGINT, grp STRING) USING txlog PARTITIONED BY (grp)""")
    assert(spark.table("testcat.ct.empty").count() == 0L)
    assert(TxLog.partitionColumns(spark, s"$wh/ct/empty") == Seq("grp"))
    // REPLACE dropping partitioning is refused loudly, not silent
    val e2 = intercept[Exception](spark.sql(
      "CREATE OR REPLACE TABLE testcat.ct.empty (id BIGINT) USING txlog"))
    val msgs = Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("\n")
    assert(msgs.contains("cannot drop"), msgs)
  }

  test("managed-only: external locations and foreign providers are loud") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.guard")
    val e1 = intercept[Exception](spark.sql(
      s"CREATE TABLE testcat.guard.x (id INT) USING txlog LOCATION '/tmp/elsewhere'"))
    assert(e1.getMessage.contains("MANAGED"))
    val e2 = intercept[Exception](spark.sql(
      "CREATE TABLE testcat.guard.y (id INT) USING parquet"))
    assert(e2.getMessage.contains("txlog"))
    // reserved namespace
    val e3 = intercept[Exception](spark.sql("CREATE NAMESPACE testcat.system"))
    assert(e3.getMessage.contains("reserved"))
  }

  test("catalog streaming read: readStream.table tails a catalog table") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.sr")
    spark.sql("CREATE TABLE testcat.sr.src (id BIGINT, grp STRING) USING txlog")
    spark.sql("INSERT INTO testcat.sr.src SELECT id, 'a' FROM range(50)")
    val out = Files.createTempDirectory("cat_stream_out_").resolve("o").toString
    val q = spark.readStream.table("testcat.sr.src")
      .writeStream.format("parquet")
      .option("checkpointLocation", Files.createTempDirectory("ckpt_").toString)
      .option("path", out)
      .start()
    q.processAllAvailable()
    // a post-start append is tailed version-exactly
    spark.sql("INSERT INTO testcat.sr.src SELECT id + 50, 'b' FROM range(50)")
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(out).count() == 100L)
  }

  test("catalog streaming: writeStream into a catalog table path") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.st")
    spark.sql("CREATE TABLE testcat.st.sink (v BIGINT, region STRING) USING txlog PARTITIONED BY (region)")
    val t = s"$wh/st/sink"
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    mem.addData(0L until 20L: _*)
    val q = mem.toDF().selectExpr("value AS v", "concat('r', cast(value % 2 AS STRING)) AS region")
      .writeStream.format("txlog")
      .option("checkpointLocation", Files.createTempDirectory("ckpt_").toString)
      .start(t)
    q.processAllAvailable(); q.stop()
    assert(spark.table("testcat.st.sink").count() == 20L)
    // the streamed epoch kept the partition layout
    val (kept, total) = TxLog.pruneCount(spark, t, col("region") === "r0")
    assert(kept < total, s"kept $kept of $total")
  }
}
