package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Round-2 additions to the declared capability inventory (SURVEY §2.4,
  * rows Q22-Q30): pivot, exact percentiles, deterministic hash sampling,
  * sessionization, histograms, regex functions, GROUPING SETS via the SQL
  * front end, higher-order array functions, and distribution window
  * functions. Same authoring contract as [[Declared]]: total ORDER BY
  * over a unique key set, decimal-cents accumulation for float sums,
  * column names aliased identically to the oracle SQL in [[Oracle2]].
  */
object Declared2 {

  private type Q = (SparkSession, String) => DataFrame

  /** See [[Declared.dsum]] — exact integer-cents sum, order-insensitive. */
  private def dsum(c: Column): Column =
    (sum(floor(c * 100).cast("long")) / 100.0).cast("double")

  /** Deterministic Knuth multiplicative hash of an int64 key into
    * [0, 2^32) — the single definition behind every hash-sampling site
    * (Q24, pipeline_curate) and mirrored by [[Oracle2.hashSampleSql]].
    * Overflow-safe at any key scale: the key is reduced below 2^31
    * FIRST, so the multiply peaks at ~5.7e18 < 2^63. A bare
    * key*2654435761 wraps silently in Spark but promotes to HUGEINT in
    * DuckDB — a silent engine divergence at large-SF keys. Sign-safe on
    * ALL int64 keys: pmod here is always non-negative, and the SQL twin
    * mirrors it with ((key % m + m) % m) rather than DuckDB's
    * sign-keeping bare `%`. */
  private[queries] def hashSample(key: Column): Column =
    pmod(pmod(key, lit(2147483647L)) * 2654435761L, lit(4294967296L))

  // ---------------------------------------------------------------- Q22
  /** Pivot: order totals per priority, one column per order status. A
    * pivot is a groupBy with a conditional-aggregate fan-out — map-side
    * partial aggregation keeps it one shuffle at any scale; the explicit
    * value list (F/O/P) avoids the extra values-discovery job Spark runs
    * for an unlisted pivot. */
  val q22: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum($"o_totalprice"))
      .withColumnsRenamed(Map("F" -> "total_f", "O" -> "total_o", "P" -> "total_p"))
      .orderBy($"o_orderpriority")
  }

  // ---------------------------------------------------------------- Q23
  /** Exact percentiles (percentile = sort-based exact quantile with
    * linear interpolation — same p·(n-1) rank formula as DuckDB's
    * quantile_cont) per return flag. Exact percentiles shuffle the group's
    * values; at 100 TB you'd reach for approx_percentile (see
    * profile_stats) — this query is the exact-math reference point. */
  val q23: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        expr("percentile(l_quantity, 0.99)").as("p99"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  // ---------------------------------------------------------------- Q24
  /** Deterministic stratified hash sampling — the reproducible-sampling
    * primitive a training-data pipeline needs (rand()-based sampling is
    * neither reproducible nor oracle-checkable). Key → Knuth
    * multiplicative hash in exact int64 → per-stratum keep threshold
    * (20% for urgent orders, 10% otherwise). Embarrassingly parallel:
    * the filter pushes no shuffle; sampling rate is exact-in-expectation
    * and identical on every engine/run. */
  val q24: Q = (s, dir) => {
    import s.implicits._
    val h = hashSample($"o_orderkey")
    val thresh = when($"o_orderpriority" === "1-URGENT", 858993459L)
      .otherwise(429496729L)
    Tables(s, dir, "orders")
      .filter(h < thresh)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_sampled"), dsum($"o_totalprice").as("sampled_total"))
      .orderBy($"o_orderpriority")
  }

  // ---------------------------------------------------------------- Q25
  /** Sessionization (gaps-and-islands): events per user split into
    * sessions at >30 min inactivity. One shuffle on user_id feeds both
    * windows AND the final per-session aggregate (same partitioning).
    * Gap math in exact integer microseconds (unix_micros) — identical in
    * both engines, no float time arithmetic. */
  val q25: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withGap = Tables(s, dir, "events")
      .select($"user_id", $"event_id", $"ts",
        (unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w)).as("gap_us"))
    val withSess = withGap
      .select($"user_id", $"event_id", $"ts",
        sum(when($"gap_us".isNull || $"gap_us" > 1800000000L, 1).otherwise(0))
          .over(run).cast("int").as("session_idx"))
    withSess.groupBy($"user_id", $"session_idx")
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        (unix_micros(max($"ts")) - unix_micros(min($"ts"))).as("duration_us"))
      .orderBy($"user_id", $"session_idx")
  }

  // ---------------------------------------------------------------- Q26
  /** Numeric histogram: fixed-width buckets over o_totalprice. The bucket
    * expression is a pure projection — the histogram is one map-side
    * partial agg + one shuffle of (n_buckets) rows, the right shape for
    * profiling a 100 TB column. */
  val q26: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .groupBy((floor($"o_totalprice" / 50000) * 50000).cast("long").as("bucket_lo"))
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy($"bucket_lo")
  }

  // ---------------------------------------------------------------- Q27
  /** Regex functions over part — extraction, global replacement, and
    * match predicate, all codegen'd per-row (no shuffle but the sort).
    * Patterns stay in the RE2 ∩ java.util.regex intersection so both
    * engines agree. */
  val q27: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "part")
      .select($"p_partkey",
        regexp_extract($"p_name", "^(\\w+)", 1).as("first_word"),
        regexp_extract($"p_type", "(\\w+)$", 1).as("last_type_word"),
        regexp_replace($"p_name", "[aeiou]", "").as("devoweled"),
        $"p_name".rlike("s$").as("plural_ish"))
      .orderBy($"p_partkey")
  }

  // --------------------------------------------------------------- Q15c
  /** GROUPING SETS via the SQL front end (rollup/cube's general form —
    * and the one surface exercised through spark.sql rather than the
    * DataFrame API). */
  val q15c: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("orders_q15c")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority,
        CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total,
        count(*) AS n,
        CAST(grouping(o_orderstatus) AS INT) AS g_status,
        CAST(grouping(o_orderpriority) AS INT) AS g_prio
      FROM orders_q15c
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY g_status, g_prio,
        o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
  }

  // ---------------------------------------------------------------- Q28
  /** Higher-order array functions over embeddings: aggregate (fold),
    * filter, array_max/min — per-row lambdas, no shuffle. The fold
    * accumulates in exact scaled int64 so the result is order- and
    * engine-independent (SURVEY §2.4 determinism contract applied to
    * arrays). */
  val q28: Q = (s, dir) => {
    import s.implicits._
    // size > 0 guard: Spark's fold seed would yield 0 for an empty array
    // where DuckDB's list_sum yields NULL — degenerate rows are excluded
    // so both engines agree on any corpus, not just the fixed-64-dim one
    Tables(s, dir, "embeddings")
      .filter(size($"embedding") > 0)
      .select($"vec_id",
        expr("aggregate(cast(embedding as array<double>), 0L, (acc, x) -> acc + cast(floor(x * 1000000) as long))").as("sum_scaled"),
        expr("size(filter(embedding, x -> x > 0))").as("n_pos"),
        expr("cast(array_max(cast(embedding as array<double>)) as double)").as("max_val"),
        expr("cast(array_min(cast(embedding as array<double>)) as double)").as("min_val"))
      .orderBy($"vec_id")
  }

  // --------------------------------------------------------------- Q28b
  /** zip_with + reverse companion to Q28: element-wise product of each
    * embedding with its own reversal, folded in exact scaled int64 — the
    * binary higher-order form (zip_with) Q28's unary fold doesn't cover. */
  val q28b: Q = (s, dir) => {
    import s.implicits._
    // size > 0 guard: the oracle's unnest+self-join drops empty-embedding
    // vec_ids entirely while Spark's fold would keep them with 0
    Tables(s, dir, "embeddings")
      .filter(size($"embedding") > 0)
      .select($"vec_id",
        expr("""aggregate(
          zip_with(cast(embedding as array<double>),
                   reverse(cast(embedding as array<double>)),
                   (x, y) -> cast(floor(x * 1000) as bigint) * cast(floor(y * 1000) as bigint)),
          0L, (acc, e) -> acc + e)""").as("rev_dot_scaled"))
      .orderBy($"vec_id")
  }

  // ---------------------------------------------------------------- Q30
  /** Distribution window functions: ntile, percent_rank, cume_dist,
    * first/last value over an explicit full frame — the remaining window
    * surface beyond Q11/Q12's ranks and frames. percent_rank/cume_dist
    * are the same (rank-1)/(n-1) and rank_hi/n formulas in both
    * engines — exact given the unique total order. */
  val q30: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice", $"o_orderkey")
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, dir, "orders")
      .filter($"o_custkey" <= 100)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice",
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        first($"o_orderkey").over(full).as("cheapest_key"),
        last($"o_orderkey").over(full).as("priciest_key"))
      .orderBy($"o_orderpriority", $"o_orderkey")
  }

  /** Exact per-label centroids in scaled-int arithmetic — the
    * deterministic, oracle-checkable companion to sim_label_centroids'
    * float VectorAvg: posexplode to (label, dim, x), exact int64 sum of
    * floor(x·1e6), divide back. One shuffle on (label, dim); at scale
    * this is the shape that beats per-vector aggregation when dim is
    * large (narrow rows, perfect partial aggregation). */
  val simCentroidsExact: Q = (s, dir) => {
    import s.implicits._
    graft.sim.Similarity.exactCentroidRows(s, dir)
      .select($"label", ($"pos" + 1).cast("int").as("dim"), $"c")
      .orderBy($"label", $"dim")
  }

  // ---------------------------------------------------------------- Q29
  /** Full outer join: high-balance customers ⟗ their big orders — rows
    * survive from BOTH unmatched sides (customers with no big order,
    * big orders of low-balance customers). COALESCE folds the two key
    * columns; planned as a shuffled SMJ/hash join at scale (full outer
    * can't broadcast). */
  val q29: Q = (s, dir) => {
    import s.implicits._
    val a = Tables(s, dir, "customer")
      .filter($"c_acctbal" > 8000).select($"c_custkey", $"c_name")
    val b = Tables(s, dir, "orders")
      .filter($"o_totalprice" > 400000)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_big"), dsum($"o_totalprice").as("big_total"))
    a.join(b, $"c_custkey" === $"o_custkey", "full_outer")
      .select(coalesce($"c_custkey", $"o_custkey").as("custkey"),
        $"c_name",
        coalesce($"n_big", lit(0L)).as("n_big"),
        coalesce($"big_total", lit(0.0)).as("big_total"))
      .orderBy($"custkey")
  }

  // --------------------------------------------------------------- Q14b
  /** Multiset set ops — INTERSECT ALL / EXCEPT ALL keep duplicate
    * multiplicity (Q14 covers the distinct forms). Spark plans these as
    * aggregated count-compare joins; tagged + totally ordered like Q14. */
  val q14b: Q = (s, dir) => {
    import s.implicits._
    val o = Tables(s, dir, "orders")
    // duplicate-bearing multisets: one custkey per qualifying ORDER
    val a = o.filter($"o_totalprice" > 150000).select($"o_custkey".as("c_custkey"))
    val b = o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey".as("c_custkey"))
    a.intersectAll(b).select(lit("1_intersect_all").as("op"), $"c_custkey")
      .union(a.exceptAll(b).select(lit("2_except_all").as("op"), $"c_custkey"))
      .orderBy($"op", $"c_custkey")
  }

  // ---------------------------------------------------------------- Q31
  /** Correlated scalar subquery: orders 1.5× above their customer's
    * average — exercises Catalyst's subquery decorrelation (rewritten to
    * an aggregate + join; never a per-row subquery execution). The
    * average is computed in exact cents so the 1.5× boundary is the same
    * double in both engines. */
  val q31: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("orders_q31")
    s.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders_q31 o
      WHERE o_totalprice > 1.5 * (
        SELECT CAST(SUM(CAST(floor(o2.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / count(*) / 100.0
        FROM orders_q31 o2 WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""")
  }

  // --------------------------------------------------------------- Q22b
  /** Unpivot (wide → long, the inverse of Q22's pivot) via the Dataset
    * unpivot API — melts the per-status columns back to (status, total)
    * rows, dropping the nulls a missing stratum produced. */
  val q22b: Q = (s, dir) => {
    import s.implicits._
    q22(s, dir)
      .unpivot(Array($"o_orderpriority"),
        Array($"total_f", $"total_o", $"total_p"), "status_col", "total")
      .filter($"total".isNotNull)
      .orderBy($"o_orderpriority", $"status_col")
  }

  // ---------------------------------------------------------------- Q32
  /** Deterministic list/string aggregation: each customer's order-status
    * history as a string in exact (date, key) order. collect_list alone
    * is arrival-ordered (nondeterministic) — sorting an array of structs
    * restores determinism; DuckDB's ORDER BY inside string_agg is the
    * dialect mirror. */
  val q32: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .filter($"o_custkey" <= 200)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"),
        array_join(
          transform(
            array_sort(collect_list(struct($"o_orderdate", $"o_orderkey", $"o_orderstatus"))),
            x => x.getField("o_orderstatus")), "").as("status_history"))
      .orderBy($"o_custkey")
  }

  // ---------------------------------------------------------------- Q33
  /** Date arithmetic beyond Q3: month-add with end-of-month clamping,
    * day-add, last_day, quarter, ISO week and ISO day-of-week (Spark's
    * weekday() is 0=Monday; +1 aligns with the ISO 1=Monday convention
    * DuckDB's isodow uses — Spark's dayofweek() is 1=Sunday and has no
    * portable twin). Pure per-row projections. */
  val q33: Q = (s, dir) => {
    import s.implicits._
    val d = $"o_orderdate".cast("date")
    Tables(s, dir, "orders")
      .select($"o_orderkey",
        d.as("d"),
        add_months(d, 3).as("plus_3m"),
        date_add(d, 45).as("plus_45d"),
        last_day(d).as("eom"),
        quarter(d).as("q"),
        weekofyear(d).as("iso_week"),
        (weekday(d) + 1).as("iso_dow"))
      .orderBy($"o_orderkey")
  }

  // --------------------------------------------------------------- Q19b
  /** Q19 through Spark 4's VARIANT path: parse_json once into the binary
    * variant encoding, then typed variant_get extraction — at scale this
    * beats get_json_object when several fields are pulled from the same
    * document (one parse, many cheap binary probes, and variant columns
    * shred into parquet). Same result set as Q19. */
  val q19b: Q = (s, dir) => {
    import s.implicits._
    // try_parse_json, not parse_json: the string path (get_json_object)
    // yields null on malformed input, and "must agree with Q19" has to
    // hold on dirty data too — strict parse would kill the query instead
    Tables(s, dir, "events")
      .select(variant_get(try_parse_json($"props"), "$.k", "int").as("k"))
      .select(when($"k" % 2 === 0, "even").otherwise("odd").as("parity"), $"k")
      .groupBy($"parity")
      .agg(count(lit(1)).as("n"), sum($"k").cast("bigint").as("sum_k"))
      .orderBy($"parity")
  }

  // ---------------------------------------------------------------- Q34
  /** Map functions — the one Spark type family the earlier inventory
    * didn't touch: construct (map_from_arrays), combine (map_concat),
    * look up (element_at), introspect (size, map_keys), and explode to
    * rows. The final (key, value) explosion is totally ordered, so entry
    * iteration order can't leak into results. */
  val q34: Q = (s, dir) => {
    import s.implicits._
    val m = map_concat(
      map_from_arrays(array(lit("status")), array($"o_orderstatus")),
      map_from_arrays(array(lit("prio")), array($"o_orderpriority")))
    Tables(s, dir, "orders")
      .filter($"o_custkey" <= 100)
      .select($"o_orderkey", m.as("m"))
      .select($"o_orderkey",
        size($"m").as("n_entries"),
        element_at($"m", "status").as("status_lookup"),
        explode($"m").as(Seq("key", "value")))
      .orderBy($"o_orderkey", $"key")
  }

  /** End-to-end corpus curation — the composed shape a training-data
    * pipeline actually runs: quality gate → exact-dedup keep-list →
    * deterministic 50% hash sample. Each stage is itself oracle-checked
    * elsewhere (text_quality / dedup_exact / Q24); composing them stays
    * deterministic, so the whole pipeline is hash-checked too. At scale:
    * the gate is a pushed filter, the keep-list join is a shuffle on
    * doc_id (or broadcast if the dup rate leaves it small), the sample
    * is free. */
  val curate: Q = (s, dir) => {
    import s.implicits._
    val q = graft.text.TextAnalysis.quality(s, dir)
      .filter($"passes_quality")
      .select($"doc_id", $"lang", $"n_tokens")
    val keep = graft.dedup.Dedup.exact(s, dir).select($"keep_id".as("doc_id"))
    q.join(keep, "doc_id")
      .filter(hashSample($"doc_id") < 2147483648L)
      .orderBy($"doc_id")
  }

  val queries: Map[String, Q] = Map(
    "pipeline_curate" -> curate,
    "q14b_multiset_ops" -> q14b,
    "q22b_unpivot" -> q22b,
    "q29_full_outer" -> q29,
    "q31_corr_subquery" -> q31,
    "q32_string_agg" -> q32,
    "q33_date_arith" -> q33,
    "q34_map_fns" -> q34,
    "q15c_grouping_sets" -> q15c,
    "q19b_variant" -> q19b,
    "q22_pivot" -> q22,
    "q23_percentiles" -> q23,
    "q24_stratified_sample" -> q24,
    "q25_sessionize" -> q25,
    "q26_histogram" -> q26,
    "q27_regex" -> q27,
    "q28_array_hof" -> q28,
    "q28b_zipwith" -> q28b,
    "q30_window_dist" -> q30,
    "sim_centroids_exact" -> simCentroidsExact)
}
