package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stats-driven (CBO) join selection — the no-hint counterpart to the
  * pinned q05 plan.
  *
  * q05 carries a `shuffle_hash` hint because raw-path parquet reads give
  * Catalyst only file sizes: the pruned-column estimate once picked the
  * FACT table as a broadcast build side (600k lineitem rows at sf0.1).
  * This demo shows the production alternative a real deployment uses:
  * register the tables in the catalog, `ANALYZE TABLE … COMPUTE
  * STATISTICS FOR ALL COLUMNS`, enable `spark.sql.cbo.enabled`, and let
  * Catalyst derive the SAME scale-safe shape from statistics alone —
  * the fact side is never the build side, because the optimizer now
  * KNOWS orders⋈customer is the smaller relation (row counts + column
  * NDVs flow through the join estimation), rather than being told by a
  * hint. PlanAuditSpec pins both regimes: the default threshold (build
  * = the stats-smaller side) and a 100 TB-modeled threshold where no
  * side fits a broadcast and the join falls back to a partitioned one.
  *
  * At 100 TB this is the operational recipe: nightly `ANALYZE` on the
  * warehouse catalog, hints reserved for the cases stats cannot see. */
object CboDemo {

  /** Database name is derived from the data dir so two sessions (or two
    * tests) ANALYZE-ing different dirs against a shared warehouse cannot
    * race on DROP/CREATE and read stats for the wrong data. SHA-256 (not
    * String.hashCode, whose 32-bit collisions would silently re-open the
    * race this exists to close). */
  def db(dir: String): String =
    "graft_cbo_" + java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString

  private val TablesUsed =
    Seq("lineitem", "orders", "customer", "supplier", "nation", "region")

  /** Registers `dir`'s parquet tables as EXTERNAL catalog tables (no
    * data copy) and computes table + column statistics for each. Safe to
    * re-run (drops and re-creates, so stats always describe `dir`). */
  def setup(s: SparkSession, dir: String): Unit = {
    val Db = db(dir)
    s.sql(s"CREATE DATABASE IF NOT EXISTS $Db")
    TablesUsed.foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $Db.$t")
      s.sql(s"CREATE TABLE $Db.$t USING parquet LOCATION '$dir/$t.parquet'")
      s.sql(s"ANALYZE TABLE $Db.$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
  }

  private def dsum(c: Column): Column =
    (sum(floor(c * 100).cast("long")) / 100.0).cast("double")

  /** q05's exact join/agg shape with ZERO hints and ZERO broadcast()
    * calls, resolved against the ANALYZE'd catalog tables — every join
    * strategy and build-side choice is the optimizer's, from stats.
    * Row-identical to Declared.q05 by construction (same predicates,
    * same arithmetic). */
  def q05NoHint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val Db = db(dir)
    val orderCust = s.table(s"$Db.orders")
      .join(s.table(s"$Db.customer"), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_nationkey")
    s.table(s"$Db.lineitem")
      .join(orderCust, $"l_orderkey" === $"o_orderkey")
      .join(s.table(s"$Db.supplier"),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(s.table(s"$Db.nation"), $"s_nationkey" === $"n_nationkey")
      .join(s.table(s"$Db.region"), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
      .orderBy($"n_name")
  }

  /** q05's joins written in a DELIBERATELY bad order — the fact table
    * joined to hint-less supplier first, the selective region filter
    * last — as one flat inner-equi-join chain, which is exactly the
    * shape `spark.sql.cbo.joinReorder.enabled` (DP-based, Selinger
    * style) is allowed to rewrite. With stats present the optimizer
    * should NOT execute this order; PlanAuditSpec pins that the
    * optimized leaf order differs from the authored order while results
    * stay row-identical. */
  def q05BadOrder(s: SparkSession, dir: String): DataFrame = {
    val Db = db(dir)
    s.sql(
      s"""SELECT n_name,
         |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS revenue
         |FROM $Db.lineitem
         |JOIN $Db.supplier ON l_suppkey = s_suppkey
         |JOIN $Db.orders   ON l_orderkey = o_orderkey
         |JOIN $Db.customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN $Db.nation   ON s_nationkey = n_nationkey
         |JOIN $Db.region   ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY n_name""".stripMargin)
  }

  /** Left-to-right catalog-table leaf order of the OPTIMIZED plan — the
    * join order the optimizer actually chose (what the reorder pin
    * compares against the authored order). */
  def leafJoinOrder(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.catalogTable.map(_.identifier.table)
      case _ => None
    }

  /** Catalog statistics for `table` (rowCount, colStats) — what ANALYZE
    * wrote; exposed for the spec's assertions. */
  def stats(s: SparkSession, dir: String, table: String): org.apache.spark.sql.catalyst.catalog.CatalogStatistics = {
    val id = org.apache.spark.sql.catalyst.TableIdentifier(table, Some(db(dir)))
    s.sessionState.catalog.getTableMetadata(id).stats
      .getOrElse(sys.error(s"no stats on ${db(dir)}.$table — ANALYZE did not run"))
  }
}
