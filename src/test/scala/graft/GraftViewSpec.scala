package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.{GraftViews, TxLog}

/** SQL VIEWS over [[graft.storage.GraftCatalog]] (r16, verdict item 5):
  * CREATE/DROP/SHOW VIEW and reference resolution via the injected
  * [[graft.plans.GraftViewRules]] — OSS Spark parses the commands but
  * ships no V2 view exec. Late-binding semantics documented on the
  * rules: the stored SQL re-analyzes at query time, so views track
  * schema evolution of the underlying tables. */
class GraftViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val cat: String = {
    val wh = Files.createTempDirectory("gview_wh_").toString
    spark.conf.set("spark.sql.catalog.vcat", "graft.storage.GraftCatalog")
    spark.conf.set("spark.sql.catalog.vcat.warehouse", wh)
    "vcat"
  }

  private def setup(): Unit = {
    cat
    if (!spark.catalog.tableExists("vcat.default.base")) {
      spark.sql("""CREATE TABLE vcat.default.base
        (id BIGINT, grp STRING, score DOUBLE) USING txlog""")
      spark.range(100).select($"id", concat(lit("g"), $"id" % 5).as("grp"),
        ($"id" * 0.5).as("score"))
        .createOrReplaceTempView("gview_src")
      spark.sql("INSERT INTO vcat.default.base SELECT * FROM gview_src")
    }
  }

  test("CREATE VIEW / query through it / DROP VIEW round-trips") {
    setup()
    spark.sql("""CREATE VIEW vcat.default.v_top AS
      SELECT grp, count(*) AS n, sum(id) AS id_sum
      FROM vcat.default.base WHERE id >= 50 GROUP BY grp""")
    val got = spark.sql("SELECT * FROM vcat.default.v_top ORDER BY grp")
      .collect().map(_.toString).toSeq
    val want = spark.sql("""SELECT grp, count(*) AS n, sum(id) AS id_sum
      FROM vcat.default.base WHERE id >= 50 GROUP BY grp ORDER BY grp""")
      .collect().map(_.toString).toSeq
    assert(got == want && got.size == 5, got.toString)
    // joins against the view work like any relation
    val joined = spark.sql("""SELECT b.grp, v.n FROM vcat.default.base b
      JOIN vcat.default.v_top v ON b.grp = v.grp WHERE b.id = 60""")
      .collect()
    assert(joined.length == 1)
    spark.sql("DROP VIEW vcat.default.v_top")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM vcat.default.v_top").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cannot be found") ||
      e.getMessage.toLowerCase.contains("not found"), e.getMessage)
  }

  test("view text resolves in the context captured at CREATE (unqualified refs)") {
    setup()
    val prevCat = spark.catalog.currentCatalog()
    try {
      spark.catalog.setCurrentCatalog(cat)
      // unqualified reference to `base` — captured as vcat.default
      spark.sql("CREATE VIEW v_ctx AS SELECT count(*) AS n FROM base")
    } finally spark.catalog.setCurrentCatalog(prevCat)
    // queried from a DIFFERENT context, the view still means vcat's base
    assert(spark.sql("SELECT n FROM vcat.default.v_ctx").as[Long].head() == 100L)
    spark.sql("DROP VIEW vcat.default.v_ctx")
  }

  test("late binding: the view tracks evolution and DML of the underlying table") {
    setup()
    spark.sql("""CREATE VIEW vcat.default.v_live AS
      SELECT count(*) AS n FROM vcat.default.base""")
    val before = spark.sql("SELECT n FROM vcat.default.v_live").as[Long].head()
    spark.sql("DELETE FROM vcat.default.base WHERE id % 10 = 7")
    val after = spark.sql("SELECT n FROM vcat.default.v_live").as[Long].head()
    assert(after == before - 10,
      s"view must read the CURRENT table state ($before -> $after)")
    // restore the rows for other tests
    spark.sql("INSERT INTO vcat.default.base SELECT * FROM gview_src WHERE id % 10 = 7")
    spark.sql("DROP VIEW vcat.default.v_live")
  }

  test("column aliases apply; CREATE OR REPLACE and IF NOT EXISTS behave") {
    setup()
    spark.sql("""CREATE VIEW vcat.default.v_al (key, cnt) AS
      SELECT grp, count(*) FROM vcat.default.base GROUP BY grp""")
    val cols = spark.sql("SELECT * FROM vcat.default.v_al").columns.toSeq
    assert(cols == Seq("key", "cnt"), cols.toString)
    // IF NOT EXISTS on an existing view: no-op, original text kept
    spark.sql("""CREATE VIEW IF NOT EXISTS vcat.default.v_al AS
      SELECT id FROM vcat.default.base""")
    assert(spark.sql("SELECT * FROM vcat.default.v_al").columns.toSeq ==
      Seq("key", "cnt"))
    // OR REPLACE swaps the definition
    spark.sql("""CREATE OR REPLACE VIEW vcat.default.v_al AS
      SELECT max(id) AS hi FROM vcat.default.base""")
    assert(spark.sql("SELECT hi FROM vcat.default.v_al").as[Long].head() == 99L)
    spark.sql("DROP VIEW vcat.default.v_al")
  }

  test("SHOW VIEWS lists; name collisions with tables refuse both ways") {
    setup()
    spark.sql("""CREATE VIEW vcat.default.v_show AS
      SELECT id FROM vcat.default.base""")
    val shown = spark.sql("SHOW VIEWS IN vcat.default")
      .select("viewName").as[String].collect().toSeq
    assert(shown.contains("v_show"), shown.toString)
    // a table cannot take a view's name, and vice versa
    intercept[Exception] {
      spark.sql("CREATE TABLE vcat.default.v_show (id BIGINT) USING txlog")
    }
    intercept[Exception] {
      spark.sql("""CREATE VIEW vcat.default.base AS
        SELECT 1 AS one""")
    }
    spark.sql("DROP VIEW vcat.default.v_show")
    // DROP of a missing view: loud without IF EXISTS, silent with
    intercept[Exception] { spark.sql("DROP VIEW vcat.default.v_show") }
    spark.sql("DROP VIEW IF EXISTS vcat.default.v_show")
  }

  test("nested views and temp-view shadowing") {
    setup()
    spark.sql("""CREATE VIEW vcat.default.v_inner AS
      SELECT id, grp FROM vcat.default.base WHERE id < 20""")
    spark.sql("""CREATE VIEW vcat.default.v_outer AS
      SELECT grp, count(*) AS n FROM vcat.default.v_inner GROUP BY grp""")
    assert(spark.sql("SELECT sum(n) FROM vcat.default.v_outer")
      .as[Long].head() == 20L)
    spark.sql("DROP VIEW vcat.default.v_outer")
    spark.sql("DROP VIEW vcat.default.v_inner")
  }

  test("ALTER VIEW AS redefines keeping properties; SET/UNSET TBLPROPERTIES round-trip") {
    setup()
    spark.sql("""CREATE VIEW vcat.default.v_alter
      TBLPROPERTIES ('who' = 'me')
      AS SELECT count(*) AS n FROM vcat.default.base""")
    spark.sql("ALTER VIEW vcat.default.v_alter AS SELECT max(id) AS hi FROM vcat.default.base")
    assert(spark.sql("SELECT hi FROM vcat.default.v_alter").as[Long].head() == 99L)
    // properties survived the redefinition
    val dir = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.catalog.vcat.warehouse") + "/default")
    val stored = GraftViews.read(spark, dir, "v_alter").get
    assert(stored.properties.get("who").contains("me"), stored.properties.toString)
    assert(stored.sql.toLowerCase.contains("max(id)"))
    // SET adds, UNSET removes (loud on a missing key without IF EXISTS)
    spark.sql("ALTER VIEW vcat.default.v_alter SET TBLPROPERTIES ('a' = '1')")
    assert(GraftViews.read(spark, dir, "v_alter").get.properties.get("a")
      .contains("1"))
    spark.sql("ALTER VIEW vcat.default.v_alter UNSET TBLPROPERTIES ('a')")
    assert(!GraftViews.read(spark, dir, "v_alter").get.properties.contains("a"))
    intercept[Exception] {
      spark.sql("ALTER VIEW vcat.default.v_alter UNSET TBLPROPERTIES ('nope')")
    }
    spark.sql(
      "ALTER VIEW vcat.default.v_alter UNSET TBLPROPERTIES IF EXISTS ('nope')")
    // ALTER VIEW AS on a missing view is loud
    intercept[Exception] {
      spark.sql("ALTER VIEW vcat.default.v_missing AS SELECT 1 AS one")
    }
    spark.sql("DROP VIEW vcat.default.v_alter")
  }

  test("DESCRIBE [EXTENDED] works on views; tables keep Spark's own path") {
    setup()
    spark.sql("""CREATE VIEW vcat.default.v_desc AS
      SELECT grp, count(*) AS n FROM vcat.default.base GROUP BY grp""")
    val plain = spark.sql("DESCRIBE vcat.default.v_desc")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(plain == Seq("grp" -> "string", "n" -> "bigint"), plain.toString)
    val ext = spark.sql("DESCRIBE EXTENDED vcat.default.v_desc")
      .collect().map(_.getString(0)).toSeq
    assert(ext.contains("View Text") && ext.contains("# Detailed View Information"),
      ext.toString)
    // DESCRIBE on a TABLE still takes Spark's own V2 path
    val tbl = spark.sql("DESCRIBE vcat.default.base")
      .collect().map(_.getString(0)).toSeq
    assert(tbl.take(3) == Seq("id", "grp", "score"), tbl.toString)
    spark.sql("DROP VIEW vcat.default.v_desc")
  }

  test("view documents round-trip exactly (storage layer)") {
    val nsDir = new org.apache.hadoop.fs.Path(
      Files.createTempDirectory("gview_raw_").toString)
    val v = GraftViews.Stored(
      sql = "SELECT * FROM t WHERE s = 'it''s \"quoted\"\n\ttab'",
      currentCatalog = "c", currentNamespace = Seq("a", "b"),
      schemaDdl = "id BIGINT,v STRING",
      queryColumnNames = Seq("id", "v"), columnAliases = Seq("x", "y"),
      columnComments = Seq("", "why"), properties = Map("p" -> "q\\r"))
    assert(GraftViews.write(spark, nsDir, "v1", v, replace = false))
    assert(!GraftViews.write(spark, nsDir, "v1", v, replace = false),
      "double create must refuse")
    assert(GraftViews.read(spark, nsDir, "v1").contains(v))
    assert(GraftViews.list(spark, nsDir) == Seq("v1"))
    assert(GraftViews.delete(spark, nsDir, "v1"))
    assert(GraftViews.read(spark, nsDir, "v1").isEmpty)
  }
}
