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

  /** Minima kept per column by the KMV sketch. */
  val KmvK = 256

  /** K-minimum-values distinct sketch with an ENGINE-PORTABLE hash —
    * the hash-checkable twin of profile_hll's HLL counts (the one
    * rows-only profiling entry). h(x) = (a·x + b) mod p with p =
    * 2^31−1 prime and (a, b) = the shared portable-minhash constants
    * (graft.functions.Signatures.PortableA/B(0), interpolated as
    * literals into the oracle SQL) — injective for keys < p, so at
    * test scale the estimate sketches TRUE cardinality; a 64-bit key
    * domain would swap in a full mixer. Estimator: (k−1)·p / h(k)
    * (Bar-Yossef et al. 2002, the classic KMV bound); columns with
    * fewer than k distinct hashes report their exact count (the
    * sketch holds the whole hash set). ONE table scan profiles every
    * column: the per-column hashes fan out as (col_name, h) rows from
    * a single pass, and the k-minima-per-column rank filter compiles
    * to WindowGroupLimit — per-partition k-item heaps per column
    * merged across the shuffle, which IS the KMV merge a 100 TB
    * profiler ships between executors (vs HLL's register max-merge):
    * k longs per column of state, no full distinct shuffle, and adding
    * profiled columns does NOT add scans. Every output value is
    * integer-or-exact-double arithmetic both engines reproduce
    * bit-for-bit. */
  def profileKmvPortable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = 2147483647L
    val a = graft.functions.Signatures.PortableA(0)
    val b = graft.functions.Signatures.PortableB(0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"col_name").orderBy($"h")
    Tables(s, dir, "orders")
      .select(explode(map(
        lit("o_custkey"), ($"o_custkey" * a + b) % p,
        lit("o_orderkey"), ($"o_orderkey" * a + b) % p)).as(Seq("col_name", "h")))
      .distinct()
      .withColumn("rn", row_number().over(w)).filter($"rn" <= KmvK)
      .groupBy($"col_name")
      .agg(count(lit(1)).cast("int").as("k_used"), max($"h").as("kth_min_hash"))
      .select($"col_name", $"k_used", $"kth_min_hash",
        when($"k_used" < KmvK, $"k_used".cast("double"))
          .otherwise(lit((KmvK - 1).toDouble) * lit(p.toDouble) / $"kth_min_hash")
          .as("est_distinct"))
      .orderBy($"col_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_stats" -> profileStats _,
    "profile_hll" -> profileHll _,
    "profile_kmv_portable" -> profileKmvPortable _)

  val oracleSql: Map[String, String] = Map(
    "profile_stats" ->
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT o_custkey) AS n_custs,
        |  count(DISTINCT o_orderstatus) AS n_statuses,
        |  count(DISTINCT o_orderpriority) AS n_priorities,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price
        |FROM orders""".stripMargin,

    // portable-KMV twin: constants interpolated from Signatures so
    // tuning can't desynchronize the engines; the est_distinct CASE is
    // the same exact-double arithmetic Spark computes
    "profile_kmv_portable" -> {
      val a = graft.functions.Signatures.PortableA(0)
      val b = graft.functions.Signatures.PortableB(0)
      val k = KmvK
      s"""WITH c1 AS (SELECT DISTINCT (o_custkey * $a + $b) % 2147483647 AS h
        |  FROM orders ORDER BY h LIMIT $k),
        |r1 AS (SELECT 'o_custkey' AS col_name, CAST(count(*) AS INT) AS k_used,
        |  max(h) AS kth_min_hash FROM c1),
        |c2 AS (SELECT DISTINCT (o_orderkey * $a + $b) % 2147483647 AS h
        |  FROM orders ORDER BY h LIMIT $k),
        |r2 AS (SELECT 'o_orderkey' AS col_name, CAST(count(*) AS INT) AS k_used,
        |  max(h) AS kth_min_hash FROM c2),
        |u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
        |SELECT col_name, k_used, kth_min_hash,
        |  CASE WHEN k_used < $k THEN CAST(k_used AS DOUBLE)
        |       ELSE ${k - 1}.0 * 2147483647.0 / kth_min_hash END AS est_distinct
        |FROM u ORDER BY col_name""".stripMargin
    })
}
