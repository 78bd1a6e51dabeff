package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** The 20 declared capability queries (SURVEY.md §2.4) — the
  * DuckDB-oracle-checked surface. Each query:
  *  - is authored Spark-first (DataFrame API; Catalyst picks join
  *    strategies, pushes filters to parquet, prunes columns);
  *  - ends in a total ORDER BY over a unique key set;
  *  - computes every floating-point SUM on exact integer cents
  *    (floor(x*100) → LongType) and divides back to DOUBLE so neither
  *    accumulation order nor rounding mode can change results
  *    (determinism contract shared with the DuckDB oracle in [[Oracle]]);
  *  - aliases every computed column identically to the oracle SQL (the
  *    driver's compare sorts columns by name before hashing).
  *
  * Scale notes (100 TB design target) are in the per-query comments:
  * small dims (region/nation/supplier/customer at low SF) broadcast
  * automatically under AQE; fact-fact joins shuffle on their keys; all
  * scans carry pruned schemas + pushed filters (verified via
  * `.explain("formatted")` during the bench pass).
  */
object Declared {

  private type Q = (SparkSession, String) => DataFrame

  /** Deterministic float SUM shared with the oracle: floor the row value
    * to integer cents (floor(x*100) is an exact, engine-identical IEEE
    * step — unlike double→decimal casts, whose rounding mode differs
    * between Spark's HALF_UP and DuckDB's half-to-even), sum exactly in
    * LongType, divide back to double. Accumulation order cannot change
    * the result (SURVEY.md §2.4 determinism contract).
    *
    * Capacity bound: int64 cents hold ~9.2e16 dollars per GROUP — about
    * 1.8e11 rows of ~5e5-dollar values. Beyond that (global sums at
    * extreme SF), switch the accumulator to decimal(38,0): Spark stays
    * exact (slower), and the DuckDB oracle already sums into HUGEINT. */
  private def dsum(c: Column): Column =
    (sum(floor(c * 100).cast("long")) / 100.0).cast("double")

  // ---------------------------------------------------------------- Q1
  /** Scan + filter + project over lineitem. Filters and the 5-column
    * projection reach the parquet reader (PushedFilters/ReadSchema). */
  val q01: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-01-01").cast("timestamp") &&
        $"l_discount".between(0.03, 0.07))
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_discount")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  // ---------------------------------------------------------------- Q2
  /** String functions over customer.c_name. Pure per-row codegen'd
    * expressions — no shuffle except the final sort. */
  val q02: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "customer")
      .select(
        $"c_custkey",
        upper($"c_name").as("name_upper"),
        lower($"c_name").as("name_lower"),
        substring($"c_name", 1, 8).as("name_sub"),
        concat($"c_name", lit("#"), $"c_mktsegment").as("name_cat"),
        trim($"c_name").as("name_trim"),
        expr("replace(c_name, '0', '_')").as("name_repl"),
        length($"c_name").as("name_len"),
        lpad($"c_name", 25, "*").as("name_lpad"))
      .orderBy($"c_custkey")
  }

  // ---------------------------------------------------------------- Q3
  /** Date functions over orders.o_orderdate. */
  val q03: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .select(
        $"o_orderkey",
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("d"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date")).as("days_since"))
      .orderBy($"o_orderkey")
  }

  // ---------------------------------------------------------------- Q4
  /** Inner equi-join orders ⋈ customer. customer is the smaller side —
    * Catalyst broadcasts it below the 10 MB threshold; at cluster scale
    * this becomes a shuffled hash/SMJ on the key automatically. */
  val q04: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"o_totalprice", $"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"o_orderkey")
  }

  // ---------------------------------------------------------------- Q5
  /** TPC-H Q5 shape: 6-way join filtered by region, revenue by nation,
    * written as the canonical scale plan: LINEITEM (the one table that
    * can never be a broadcast build side) streams; the orders⋈customer
    * fact-fact join meets it in a SHUFFLED HASH JOIN hash-partitioned
    * on the order key (the `shuffle_hash` hint — per-partition build of
    * the smaller side, no sort; build memory is governed by
    * spark.sql.shuffle.partitions, and SMJ is a one-word hint swap if a
    * deployment prefers sort-robustness); the constant-size dims
    * (nation 25, region 5 rows at every SF) broadcast explicitly,
    * supplier by AQE's runtime size. Measured ~2× faster than letting
    * the optimizer choose: the pruned-column size estimate otherwise
    * picked LINEITEM itself as a broadcast build side — a 600k-row
    * driver-built hashed relation per run at sf0.1, and a plan shape
    * that could never survive the scale-up. */
  val q05: Q = (s, dir) => {
    import s.implicits._
    val orderCust = Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_nationkey")
    Tables(s, dir, "lineitem")
      .join(orderCust.hint("shuffle_hash"), $"l_orderkey" === $"o_orderkey")
      .join(Tables(s, dir, "supplier"),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(Tables(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
      .orderBy($"n_name")
  }

  // ---------------------------------------------------------------- Q6
  /** TPC-H Q6 shape: filtered global aggregate — fully map-side until the
    * single-row final combine. */
  val q06: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-01-01").cast("timestamp") &&
        $"l_discount".between(0.04, 0.08) && $"l_quantity" < 24)
      .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  // ---------------------------------------------------------------- Q7
  /** Distinct aggregate: COUNT(DISTINCT) triggers Spark's two-phase
    * distinct-aggregate expansion; grouped by priority. */
  val q07: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("n_custs"), count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  // ---------------------------------------------------------------- Q8
  /** Left outer join + null handling: customers with zero orders stay
    * visible with count 0 / total 0. */
  val q08: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "customer")
      .join(Tables(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey", $"c_name")
      .agg(count($"o_orderkey").as("order_cnt"),
        coalesce(dsum($"o_totalprice"), lit(0.0)).as("total_spent"))
      .orderBy($"c_custkey")
  }

  // ---------------------------------------------------------------- Q9
  /** Semi join (EXISTS): left_semi keeps customer columns only and
    * short-circuits per key — no row multiplication, broadcast-able. */
  val q09: Q = (s, dir) => {
    import s.implicits._
    val highValue = Tables(s, dir, "orders")
      .filter($"o_totalprice" > 450000).select($"o_custkey")
    Tables(s, dir, "customer")
      .join(highValue, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  // ---------------------------------------------------------------- Q10
  /** Anti join (NOT EXISTS): customers with no high-value order. */
  val q10: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "customer")
      .join(Tables(s, dir, "orders").filter($"o_totalprice" > 450000).select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  // ---------------------------------------------------------------- Q11
  /** Ranking window: top-3 orders per customer. One shuffle on
    * o_custkey feeds all three rank functions (same window spec). */
  val q11: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"))
      .filter($"rn" <= 3)
      .orderBy($"o_custkey", $"rn")
  }

  // ---------------------------------------------------------------- Q12
  /** Analytic window + running frame: LAG/LEAD and a running decimal sum
    * per customer in (o_orderdate, o_orderkey) order. */
  val q12: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice",
        lag($"o_totalprice", 1).over(w).as("prev_price"),
        lead($"o_totalprice", 1).over(w).as("next_price"),
        (sum(floor($"o_totalprice" * 100).cast("long")).over(running) / 100.0)
          .cast("double").as("running_total"))
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  // ---------------------------------------------------------------- Q13
  /** Sort + limit top-k: Spark plans TakeOrderedAndProject — per-partition
    * top-25 then a single driver merge, no global sort shuffle. */
  val q13: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(25)
  }

  // ---------------------------------------------------------------- Q14
  /** Set ops over customer-key sets from two predicates. Spark's union is
    * UNION ALL; SQL UNION = union+distinct; intersect/except are distinct
    * ops in both engines. Tagged with an op column, totally ordered
    * (duplicate rows within union_all are identical, so order among them
    * cannot affect the hash). */
  val q14: Q = (s, dir) => {
    import s.implicits._
    val c = Tables(s, dir, "customer")
    val a = c.filter($"c_acctbal" > 5000).select($"c_custkey")
    val b = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val tagged =
      a.union(b).select(lit("1_union_all").as("op"), $"c_custkey")
        .union(a.union(b).distinct().select(lit("2_union").as("op"), $"c_custkey"))
        .union(a.intersect(b).select(lit("3_intersect").as("op"), $"c_custkey"))
        .union(a.except(b).select(lit("4_except").as("op"), $"c_custkey"))
    tagged.orderBy($"op", $"c_custkey")
  }

  // ---------------------------------------------------------------- Q15
  /** ROLLUP with GROUPING() disambiguation. Explicit nulls-first ordering
    * (Spark's asc default) mirrored in the oracle. */
  val q15: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(dsum($"o_totalprice").as("total"),
        count(lit(1)).as("n"),
        grouping($"o_orderstatus").cast("int").as("g_status"),
        grouping($"o_orderpriority").cast("int").as("g_prio"))
      .orderBy($"g_status", $"g_prio",
        $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  /** CUBE companion to Q15: all four grouping combinations. */
  val q15b: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(dsum($"o_totalprice").as("total"),
        count(lit(1)).as("n"),
        grouping($"o_orderstatus").cast("int").as("g_status"),
        grouping($"o_orderpriority").cast("int").as("g_prio"))
      .orderBy($"g_status", $"g_prio",
        $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  // ---------------------------------------------------------------- Q16
  /** Conditional / null functions over part. */
  val q16: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "part")
      .select($"p_partkey",
        when($"p_size" > 25, "big").when($"p_size" > 10, "medium")
          .otherwise("small").as("size_class"),
        coalesce(nullif($"p_brand", lit("Brand#13")), lit("(none)")).as("brand_or_none"),
        least($"p_size", length($"p_name")).cast("int").as("least_v"),
        greatest($"p_retailprice", lit(1000.0)).as("greatest_v"))
      .orderBy($"p_partkey")
  }

  // ---------------------------------------------------------------- Q17
  /** Batch tumbling window (streaming semantics in batch): hourly buckets
    * per event_type. date_trunc keeps the aggregate a plain hash-agg on
    * (hour, type) — one shuffle. */
  val q17: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("window_start"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .orderBy($"window_start", $"event_type")
  }

  // ---------------------------------------------------------------- Q18
  /** Theta/range join over the two smallest dims — planned as a broadcast
    * nested-loop join (correct choice at any scale for 25×5 dims). */
  val q18: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "nation")
      .join(Tables(s, dir, "region"), $"n_regionkey" <= $"r_regionkey")
      .select($"n_nationkey", $"n_name", $"r_regionkey", $"r_name")
      .orderBy($"n_nationkey", $"r_regionkey")
  }

  // ---------------------------------------------------------------- Q19
  /** JSON extraction + cast + grouped aggregate over events.props. */
  val q19: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "events")
      .select(get_json_object($"props", "$.k").cast("int").as("k"))
      .select(when($"k" % 2 === 0, "even").otherwise("odd").as("parity"), $"k")
      .groupBy($"parity")
      .agg(count(lit(1)).as("n"), sum($"k").cast("bigint").as("sum_k"))
      .orderBy($"parity")
  }

  // ---------------------------------------------------------------- Q20
  /** Array fns + explode + text analysis: per-lang top-5 token counts with
    * deterministic (count desc, token asc) tiebreak. At scale the
    * groupBy(lang, token) partial-aggregates map-side before one shuffle;
    * the window runs over the already-tiny per-lang count table. */
  val q20: Q = (s, dir) => {
    import s.implicits._
    val toks = Tables(s, dir, "documents")
      .select($"lang", explode(split($"text", graft.functions.Signatures.TokenSepRegex)).as("token"))
      .filter($"token" =!= "")
    val counts = toks.groupBy($"lang", $"token").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"lang").orderBy($"cnt".desc, $"token")
    counts.select($"lang", $"token", $"cnt", row_number().over(w).as("rn"))
      .filter($"rn" <= 5)
      .orderBy($"lang", $"rn")
  }

  /** As-of join (operator Spark's Scala API lacks — composed in
    * graft.operators.AsOfJoin): each click matched to the user's most
    * recent prior-or-simultaneous purchase. Oracle = DuckDB's native
    * ASOF LEFT JOIN. */
  val q21: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"value").as("purchase_value"))
    graft.operators.AsOfJoin.asOf(clicks, purchases, "user_id", "ts",
      Seq("purchase_value"))
      .select($"event_id", $"user_id", $"ts".as("click_ts"),
        $"asof_purchase_value")
      .orderBy($"event_id")
  }

  /** Embeddings companion to Q20: size(embedding) histogram by label. */
  val q20b: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "embeddings")
      .groupBy($"label", size($"embedding").as("dim"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"label", $"dim")
  }

  /** queries-map entries, keyed to sort in SURVEY §2.4 order. */
  val queries: Map[String, Q] = Map(
    "q01_scan_filter" -> q01,
    "q02_string_fns" -> q02,
    "q03_date_fns" -> q03,
    "q04_inner_join" -> q04,
    "q05_multiway_join_agg" -> q05,
    "q06_filtered_agg" -> q06,
    "q07_distinct_agg" -> q07,
    "q08_left_join_null" -> q08,
    "q09_semi_join" -> q09,
    "q10_anti_join" -> q10,
    "q11_rank_window" -> q11,
    "q12_analytic_window" -> q12,
    "q13_topk" -> q13,
    "q14_set_ops" -> q14,
    "q15_rollup" -> q15,
    "q15b_cube" -> q15b,
    "q16_conditional" -> q16,
    "q17_tumbling_window" -> q17,
    "q18_range_join" -> q18,
    "q19_json_cast" -> q19,
    "q20_token_topk" -> q20,
    "q20b_embedding_dims" -> q20b,
    "q21_asof_join" -> q21)
}
