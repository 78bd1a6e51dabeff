package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Stretch S4 (SURVEY §2.5): table profiling. `profileStats` is the
  * exact, oracle-checked version; `profileHll` swaps the distinct counts
  * for approx_count_distinct (HyperLogLog++) — the 100 TB shape, where
  * exact distincts need a full shuffle per column but HLL sketches merge
  * map-side in one pass. Accuracy vs exact is asserted in ProfilesSpec
  * (rows-only for the driver: sketch values are Spark-implementation-
  * specific). */
object Profiles {

  def profileStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders").agg(
      count(lit(1)).as("n_rows"),
      countDistinct($"o_custkey").as("n_custs"),
      countDistinct($"o_orderstatus").as("n_statuses"),
      countDistinct($"o_orderpriority").as("n_priorities"),
      min($"o_totalprice").as("min_price"),
      max($"o_totalprice").as("max_price"))
  }

  def profileHll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders").agg(
      count(lit(1)).as("n_rows"),
      approx_count_distinct($"o_custkey").as("approx_custs"),
      approx_count_distinct($"o_orderkey").as("approx_orders"),
      approx_count_distinct($"o_orderpriority").as("approx_priorities"),
      // approx_percentile (t-digest-style sketch) is the quantile scale
      // path: mergeable partial sketches, one pass, no per-group value
      // shuffle — vs Q23's exact percentile sort. Accuracy vs exact is
      // asserted in ProfilesSpec.
      approx_percentile($"o_totalprice", lit(0.5), lit(1000)).as("approx_median_price"),
      approx_percentile($"o_totalprice", lit(0.99), lit(1000)).as("approx_p99_price"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_stats" -> profileStats _,
    "profile_hll" -> profileHll _)

  val oracleSql: Map[String, String] = Map(
    "profile_stats" ->
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT o_custkey) AS n_custs,
        |  count(DISTINCT o_orderstatus) AS n_statuses,
        |  count(DISTINCT o_orderpriority) AS n_priorities,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price
        |FROM orders""".stripMargin)
}
