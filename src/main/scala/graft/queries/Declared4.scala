package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 additions to the declared capability inventory (SURVEY §2.4):
  * interval (point-in-range) join, CDC-style latest-per-key compaction,
  * argmax/argmin aggregation, calendar densification, bitwise
  * aggregates, and window contribution shares. Same authoring contract
  * as [[Declared]]..[[Declared3]]: total ORDER BY over a unique key set,
  * exact integer accumulation wherever a float would make the result
  * order-dependent, column names aliased identically to [[Oracle4]].
  */
object Declared4 {

  private type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- Q41
  /** Interval join: attribute every event to its user's session window
    * (sessions = q25's >30-min-gap islands). The point-in-interval join
    * is executed as an EQUI-join on user_id with the BETWEEN as a
    * post-join filter — the scale shape for interval joins whose
    * intervals are keyed (the equi key bounds the pair explosion;
    * un-keyed big×big interval joins need time-band bucketing instead).
    * Sessions of a user are disjoint, so each event lands in exactly
    * one window and event_id stays a unique order key. */
  val q41: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = Tables(s, dir, "events").select($"user_id", $"event_id", $"ts")
    val withSess = ev.select($"user_id", $"event_id", $"ts",
      sum(when((unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w))
          .isNull.or(unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w) > 1800000000L), 1)
        .otherwise(0)).over(run).cast("int").as("session_idx"))
    val sess = withSess.groupBy($"user_id", $"session_idx")
      .agg(min($"ts").as("s_start"), max($"ts").as("s_end"),
        count(lit(1)).as("n_events"))
      .withColumnRenamed("user_id", "s_user")
    ev.join(sess, ev("user_id") === sess("s_user") &&
        $"ts" >= $"s_start" && $"ts" <= $"s_end")
      .select($"event_id", ev("user_id"), $"session_idx", $"n_events")
      .orderBy($"event_id")
  }

  // ---------------------------------------------------------------- Q42
  /** Latest-per-key compaction (CDC upsert semantics): the newest event
    * per (user_id, event_type) by (ts, event_id). row_number over a
    * descending window + rn=1 filter — Spark plans the rank-filter as
    * WindowGroupLimit (partial top-1 per partition BEFORE the shuffle),
    * which is what makes log compaction feasible at 100 TB: the shuffle
    * carries one candidate row per key per input partition, not the
    * full log. */
  val q42: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".desc, $"event_id".desc)
    Tables(s, dir, "events")
      .select($"user_id", $"event_type", $"event_id", $"ts", $"value",
        row_number().over(w).as("rn"))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id".as("last_event_id"),
        $"ts".as("last_ts"), $"value".as("last_value"))
      .orderBy($"user_id", $"event_type")
  }

  // ---------------------------------------------------------------- Q43
  /** Argmax/argmin aggregation: per nation, the customer holding the
    * max (and min) account balance — max_by/min_by with a DETERMINISTIC
    * composite ordinal (exact cents × 10^7 + custkey; custkey < 10^7,
    * so the ordinal is a strictly monotone total order and ties cannot
    * exist) — mirrored as DuckDB arg_max/arg_min on the same ordinal.
    * One broadcast join + one partial-agg shuffle of (nation) rows. */
  val q43: Q = (s, dir) => {
    import s.implicits._
    val cust = Tables(s, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_nationkey",
        (floor($"c_acctbal" * 100).cast("long") * 10000000L + $"c_custkey")
          .as("ord"),
        floor($"c_acctbal" * 100).cast("long").as("bal_cents"))
    cust.join(broadcast(Tables(s, dir, "nation")
        .select($"n_nationkey".as("c_nationkey"), $"n_name")), "c_nationkey")
      .groupBy($"n_name")
      .agg(max_by($"c_name", $"ord").as("richest"),
        max($"bal_cents").as("max_cents"),
        min_by($"c_name", $"ord").as("poorest"),
        min($"bal_cents").as("min_cents"),
        count(lit(1)).as("n_customers"))
      .orderBy($"n_name")
  }

  // ---------------------------------------------------------------- Q44
  /** Calendar densification (date spine): one row per day between the
    * corpus's min and max order date, zero-filled where no orders exist
    * — the standard repair before any daily time-series model. The
    * spine generates from a 1-row bound aggregate (sequence + explode);
    * the daily aggregate shuffles (day) rows only, and the spine side
    * broadcasts onto it. */
  val q44: Q = (s, dir) => {
    import s.implicits._
    val orders = Tables(s, dir, "orders")
    val bounds = orders.agg(min(to_date($"o_orderdate")).as("d0"),
      max(to_date($"o_orderdate")).as("d1"))
    val spine = bounds.select(explode(sequence($"d0", $"d1")).as("day"))
    val daily = orders.groupBy(to_date($"o_orderdate").as("day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor($"o_totalprice" * 100).cast("long")).as("cents"))
    spine.join(daily, Seq("day"), "left")
      .select($"day", coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"cents", lit(0L)).as("cents"))
      .orderBy($"day")
  }

  // ---------------------------------------------------------------- Q45
  /** Bitwise aggregates: AND/OR/XOR-fold of order keys per priority
    * (XOR-folds are how set-reconciliation / checksum passes summarize
    * key sets cheaply — order-insensitive, so perfectly partial-agg
    * friendly), plus an exact shifted sum. All integer ops — no float
    * anywhere. */
  val q45: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(expr("bit_and(o_orderkey)").as("key_and"),
        expr("bit_or(o_orderkey)").as("key_or"),
        expr("bit_xor(o_orderkey)").as("key_xor"),
        sum(shiftright($"o_orderkey", 3)).as("sum_shr3"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderpriority")
  }

  // ---------------------------------------------------------------- Q46
  /** Contribution shares: each order's share of its customer's total
    * and of the corpus total. Both denominators are exact-cents sums;
    * the one float op per output cell is a single int÷int division —
    * the identical IEEE operation in both engines. The corpus total
    * comes from a 1-row aggregate cross-joined (broadcast) onto the
    * stream — NOT an empty-partition global window, which would funnel
    * every row through one task at 100 TB. */
  val q46: Q = (s, dir) => {
    import s.implicits._
    val o = Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey",
        floor($"o_totalprice" * 100).cast("long").as("cents"))
    val wCust = Window.partitionBy($"o_custkey")
    val total = o.agg(sum($"cents").as("total_cents"))
    o.select($"o_orderkey", $"o_custkey", $"cents",
        sum($"cents").over(wCust).as("cust_cents"))
      .crossJoin(broadcast(total))
      .select($"o_orderkey", $"o_custkey", $"cents",
        ($"cents".cast("double") / $"cust_cents".cast("double")).as("share_of_customer"),
        ($"cents".cast("double") / $"total_cents".cast("double")).as("share_of_total"))
      .orderBy($"o_orderkey")
  }

  // ---------------------------------------------------------------- Q47
  /** TIME-based RANGE frame: per user, trailing-1-hour event count and
    * exact scaled-int value sum ordered by ts — the temporal sibling of
    * Q35's numeric RANGE frame and the canonical feature-engineering
    * window ("activity in the last hour"). Peers enter the frame by
    * TIMESTAMP VALUE, so ts ties (same instant, different events)
    * contribute symmetrically and the result is deterministic without a
    * unique order key. One shuffle on user_id; single sliding pass per
    * partition. Via the SQL front end (RANGE BETWEEN INTERVAL frames
    * have no DataFrame-API spelling). */
  val q47: Q = (s, dir) => {
    Tables(s, dir, "events").createOrReplaceTempView("events_q47")
    s.sql(
      """SELECT event_id, user_id, ts,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
        |  CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) OVER w AS BIGINT) AS v_last_hour
        |FROM events_q47
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)
  }

  // ---------------------------------------------------------------- Q48
  /** FILTER-clause aggregation: one pass over lineitem computing
    * differently-predicated aggregates side by side (the SQL:2003
    * FILTER form of "sum(case when)") — the profile-report shape that
    * replaces N self-joins with one scan + one shuffle of (flag) rows.
    * All sums exact cents. Via the SQL front end. */
  val q48: Q = (s, dir) => {
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_q48")
    s.sql(
      """SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
        |    FILTER (WHERE l_quantity >= 25) AS BIGINT) AS cents_bulk,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
        |    FILTER (WHERE l_quantity < 25) AS BIGINT) AS cents_small,
        |  COUNT(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R') AS n_supp_returned
        |FROM lineitem_q48
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  // ---------------------------------------------------------------- Q49
  /** LATERAL correlated subquery: per nation, its top-2 customers by
    * (exact-cents balance, custkey) through a LATERAL ORDER BY/LIMIT —
    * the SQL spelling of "top-k per group" that Catalyst rewrites into
    * the same rank-window shape as Q11 (asserted there); here the
    * declared surface is the LATERAL syntax itself. Deterministic: the
    * lateral ordering is total. */
  val q49: Q = (s, dir) => {
    Tables(s, dir, "nation").createOrReplaceTempView("nation_q49")
    Tables(s, dir, "customer").createOrReplaceTempView("customer_q49")
    s.sql(
      """SELECT n_name, c_custkey, c_name, bal_cents
        |FROM nation_q49,
        |LATERAL (
        |  SELECT c_custkey, c_name,
        |    CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer_q49
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY bal_cents DESC, c_custkey
        |  LIMIT 2)
        |ORDER BY n_name, bal_cents DESC, c_custkey""".stripMargin)
  }

  // --------------------------------------------------------------- Q21b
  /** Forward as-of join — each click paired with the user's NEXT
    * purchase at-or-after it (conversion attribution), the mirror of
    * Q21's backward as-of, via [[graft.operators.AsOfJoin.asOfForward]].
    * Same single-shuffle union+window shape; DuckDB's ASOF JOIN with
    * `<=` is the oracle. */
  val q21b: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"value").as("purchase_value"))
    graft.operators.AsOfJoin.asOfForward(clicks, purchases, "user_id", "ts",
      Seq("purchase_value"))
      .select($"event_id", $"user_id", $"ts".as("click_ts"),
        $"asof_purchase_value")
      .orderBy($"event_id")
  }

  // ---------------------------------------------------------------- Q50
  /** Array set algebra: per document, the sorted union / intersection /
    * difference of its short-token and long-token vocabularies, plus
    * their cardinalities — `array_union`/`array_intersect`/
    * `array_except` + `array_sort`. Sorted arrays are emitted as
    * space-joined strings: deterministic values AND scalar columns the
    * driver's hash compare handles (array-typed result cells are not
    * comparable in its pandas path). Pure per-row projection — no
    * shuffle but the presentation sort. */
  val q50: Q = (s, dir) => {
    import s.implicits._
    val toks = array_distinct(filter(split($"text", graft.functions.Signatures.TokenSepRegex), t => t =!= ""))
    Tables(s, dir, "documents")
      .select($"doc_id",
        filter(toks, t => length(t) <= 5).as("short_toks"),
        filter(toks, t => length(t) >= 4).as("long_toks"))
      .select($"doc_id",
        array_join(array_sort(array_union($"short_toks", $"long_toks")), " ").as("vocab"),
        size(array_union($"short_toks", $"long_toks")).as("n_vocab"),
        array_join(array_sort(array_intersect($"short_toks", $"long_toks")), " ").as("both"),
        array_join(array_sort(array_except($"short_toks", $"long_toks")), " ").as("only_short"),
        size(array_except($"short_toks", $"long_toks")).as("n_only_short"))
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- Q51
  /** Map higher-order functions: per-document token-count map →
    * `map_filter` keeps repeated tokens → `transform_values` doubles the
    * counts → exploded back to sorted (doc, token, weight) rows. The
    * map round-trip exercises map_from_entries / map_filter /
    * transform_values; the RESULT is relational, which is what the
    * oracle checks (DuckDB reproduces the same table without the map
    * detour — maps are an execution detail, not a semantic). */
  val q51: Q = (s, dir) => {
    import s.implicits._
    val counts = Tables(s, dir, "documents")
      // partition for the compute — single-file scans serialize the
      // token fan-out on one task otherwise
      .repartition(s.sparkContext.defaultParallelism, $"doc_id")
      .select($"doc_id", explode(filter(split($"text", graft.functions.Signatures.TokenSepRegex), t => t =!= "")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("n"))
      .groupBy($"doc_id")
      .agg(map_from_entries(collect_list(struct($"tok", $"n"))).as("m"))
    counts
      .select($"doc_id",
        transform_values(
          map_filter($"m", (_, v) => v > 1), (_, v) => v * 2).as("m2"))
      .select($"doc_id", explode($"m2").as(Seq("token", "weight")))
      .orderBy($"doc_id", $"token")
  }

  val queries: Map[String, Q] = Map(
    "q21b_asof_forward" -> q21b,
    "q50_array_setops" -> q50,
    "q51_map_hof" -> q51,
    "q41_interval_join" -> q41,
    "q42_latest_per_key" -> q42,
    "q43_argmax" -> q43,
    "q44_date_spine" -> q44,
    "q45_bitops" -> q45,
    "q46_share_of_total" -> q46,
    "q47_time_range_frame" -> q47,
    "q48_filter_clause" -> q48,
    "q49_lateral_topk" -> q49)
}
