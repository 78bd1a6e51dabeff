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

  val Db = "graft_cbo"

  private val TablesUsed =
    Seq("lineitem", "orders", "customer", "supplier", "nation", "region")

  /** Registers `dir`'s parquet tables as EXTERNAL catalog tables (no
    * data copy) and computes table + column statistics for each. Safe to
    * re-run (drops and re-creates, so stats always describe `dir`). */
  def setup(s: SparkSession, dir: String): Unit = {
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
  def q05NoHint(s: SparkSession): DataFrame = {
    import s.implicits._
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

  /** Catalog statistics for `table` (rowCount, colStats) — what ANALYZE
    * wrote; exposed for the spec's assertions. */
  def stats(s: SparkSession, table: String): org.apache.spark.sql.catalyst.catalog.CatalogStatistics = {
    val id = org.apache.spark.sql.catalyst.TableIdentifier(table, Some(Db))
    s.sessionState.catalog.getTableMetadata(id).stats
      .getOrElse(sys.error(s"no stats on $Db.$table — ANALYZE did not run"))
  }
}
