package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** VIEW SCHEMA-BINDING MODES (r17, [[graft.plans.GraftViewModes]]):
  * `CREATE VIEW ... WITH SCHEMA BINDING | COMPENSATION | TYPE
  * EVOLUTION` against a GraftCatalog, exercised over evolve / widen /
  * rename / drop of the base tables per mode. The parsed mode is
  * honored verbatim — Spark's parser default (COMPENSATION) included —
  * while pre-mode view documents (no stored key) keep r16's
  * late-binding EVOLUTION. BINDING and COMPENSATION pin the
  * CREATE-time schema and cast-or-refuse on drift (UpCast vs ANSI
  * Cast); TYPE EVOLUTION pins the column set and lets types track. */
class TxViewModeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh: String = {
    val d = Files.createTempDirectory("gvmode_wh_").toString
    spark.conf.set("spark.sql.catalog.vmcat", "graft.storage.GraftCatalog")
    spark.conf.set("spark.sql.catalog.vmcat.warehouse", d)
    d
  }

  private var n = 0
  /** fresh base table (id BIGINT, v INT) with 4 rows; returns its FQN */
  private def base(): String = {
    wh; n += 1
    val t = s"vmcat.default.b$n"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v INT) USING txlog")
    Seq((0L, 10), (1L, 11), (2L, 12), (3L, 13)).toDF("id", "v")
      .createOrReplaceTempView(s"vm_src_$n")
    spark.sql(s"INSERT INTO $t SELECT * FROM vm_src_$n")
    t
  }

  /** the txlog path of base table `t` (vmcat.default.bN) */
  private def pathOf(t: String): String = s"$wh/default/${t.split('.').last}"

  test("EVOLUTION: SELECT * tracks added base columns") {
    val t = base()
    spark.sql(s"CREATE VIEW ${t}_ve WITH SCHEMA EVOLUTION AS SELECT * FROM $t")
    assert(spark.sql(s"SELECT * FROM ${t}_ve").columns.toSeq == Seq("id", "v"))
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (extra STRING)")
    assert(spark.sql(s"SELECT * FROM ${t}_ve").columns.toSeq ==
      Seq("id", "v", "extra"), "late binding must track the evolved base")
  }

  test("BINDING: schema pinned at CREATE — added columns invisible, " +
      "widening the base REFUSES (no safe cast back), drop is loud") {
    val t = base()
    spark.sql(s"CREATE VIEW ${t}_vb WITH SCHEMA BINDING AS SELECT * FROM $t")
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (extra STRING)")
    assert(spark.sql(s"SELECT * FROM ${t}_vb").columns.toSeq == Seq("id", "v"),
      "BINDING pins the create-time column set")
    assert(spark.sql(s"SELECT sum(v) FROM ${t}_vb").as[Long].head() == 46L)
    // widen v INT -> BIGINT: the view's pinned INT cannot be safely
    // re-derived from a BIGINT column — UpCast refuses at analysis
    TxLog.widenColumnType(spark, pathOf(t), "v", org.apache.spark.sql.types.LongType)
    val e = intercept[Exception](spark.sql(s"SELECT * FROM ${t}_vb").collect())
    assert(e.getMessage.toLowerCase.contains("up-cast") ||
      e.getMessage.contains("CANNOT_UP_CAST"), e.getMessage)
    // a dropped pinned column is loud, never silently absent
    val t2 = base()
    spark.sql(s"CREATE VIEW ${t2}_vb2 WITH SCHEMA BINDING AS SELECT * FROM $t2")
    spark.sql(s"ALTER TABLE $t2 DROP COLUMN v")
    val e2 = intercept[Exception](spark.sql(s"SELECT * FROM ${t2}_vb2").collect())
    assert(e2.getMessage.contains("v") &&
      (e2.getMessage.contains("UNRESOLVED") ||
        e2.getMessage.toLowerCase.contains("cannot be resolved")), e2.getMessage)
  }

  test("COMPENSATION: widening the base is CAST back to the pinned type; " +
      "values serve") {
    val t = base()
    spark.sql(s"CREATE VIEW ${t}_vc WITH SCHEMA COMPENSATION AS SELECT * FROM $t")
    TxLog.widenColumnType(spark, pathOf(t), "v", org.apache.spark.sql.types.LongType)
    val df = spark.sql(s"SELECT * FROM ${t}_vc")
    assert(df.schema("v").dataType == org.apache.spark.sql.types.IntegerType,
      "COMPENSATION serves the CREATE-time type through a cast")
    assert(df.agg(sum("v")).as[Long].head() == 46L)
  }

  test("TYPE EVOLUTION: column set pinned, types track the base") {
    val t = base()
    spark.sql(
      s"CREATE VIEW ${t}_vt WITH SCHEMA TYPE EVOLUTION AS SELECT * FROM $t")
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (extra STRING)")
    TxLog.widenColumnType(spark, pathOf(t), "v", org.apache.spark.sql.types.LongType)
    val df = spark.sql(s"SELECT * FROM ${t}_vt")
    assert(df.columns.toSeq == Seq("id", "v"), "column set pinned")
    assert(df.schema("v").dataType == org.apache.spark.sql.types.LongType,
      "types track the widened base")
    assert(df.agg(sum("v")).as[Long].head() == 46L)
  }

  test("mode survives the document round-trip, DESCRIBE shows it, " +
      "ALTER VIEW AS keeps it, rename of the base column is loud per pin") {
    val t = base()
    spark.sql(s"CREATE VIEW ${t}_vm WITH SCHEMA COMPENSATION AS " +
      s"SELECT id, v FROM $t")
    val desc = spark.sql(s"DESCRIBE EXTENDED ${t}_vm").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("View Schema Mode").contains("COMPENSATION"), desc.toString)
    // redefinition keeps properties, hence the mode
    spark.sql(s"ALTER VIEW ${t}_vm AS SELECT id, v FROM $t WHERE id > 0")
    val desc2 = spark.sql(s"DESCRIBE EXTENDED ${t}_vm").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc2.get("View Schema Mode").contains("COMPENSATION"))
    assert(spark.sql(s"SELECT count(*) FROM ${t}_vm").as[Long].head() == 3L)
    // rename the pinned column out from under the view: loud
    TxLog.renameColumn(spark, pathOf(t), "v", "w")
    val e = intercept[Exception](spark.sql(s"SELECT * FROM ${t}_vm").collect())
    assert(e.getMessage.contains("v"), e.getMessage)
    // no WITH SCHEMA clause: Spark's parser default (COMPENSATION)
    // is honored verbatim — pre-mode view DOCUMENTS (no stored key)
    // keep the r16 late-binding EVOLUTION behavior
    val t2 = base()
    spark.sql(s"CREATE VIEW ${t2}_vd AS SELECT * FROM $t2")
    val d3 = spark.sql(s"DESCRIBE EXTENDED ${t2}_vd").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d3.get("View Schema Mode").contains("COMPENSATION"), d3.toString)
  }
}
