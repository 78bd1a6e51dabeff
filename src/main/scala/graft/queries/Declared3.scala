package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-3 additions to the declared capability inventory (SURVEY §2.4):
  * value-based (RANGE) window frames, positional explode through the SQL
  * TVF surface, quantified subqueries (IN / NOT IN / uncorrelated
  * scalar), and exact-moment descriptive statistics. Same authoring
  * contract as [[Declared]]/[[Declared2]]: total ORDER BY over a unique
  * key set, exact integer accumulation wherever a float would make the
  * result order-dependent, column names aliased identically to
  * [[Oracle3]].
  */
object Declared3 {

  private type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- Q35
  /** Value-based window frame: per-priority running sum over orders whose
    * o_totalprice lies within 10,000 of the current row's (RANGE frame —
    * peers enter by VALUE, not by row position, so the result is
    * deterministic even under order-by ties; Q12's ROWS frames can't
    * express this). The summed measure is exact cents. One shuffle on
    * o_orderpriority; the frame scan is a single sliding pass per
    * partition at any scale. */
  val q35: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("orders_q35")
    s.sql("""
      SELECT o_orderkey, o_orderpriority, o_totalprice,
        CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER (
          PARTITION BY o_orderpriority ORDER BY o_totalprice
          RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS BIGINT)
          AS near_cents,
        CAST(COUNT(*) OVER (
          PARTITION BY o_orderpriority ORDER BY o_totalprice
          RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS BIGINT)
          AS near_n
      FROM orders_q35
      ORDER BY o_orderkey""")
  }

  // ---------------------------------------------------------------- Q36
  /** Positional explode through the SQL TVF surface (LATERAL VIEW
    * posexplode) — the table-generating-function form the DataFrame-API
    * explodes (Q20/Q34) don't exercise. Emits the first 8 tokens of each
    * low-id document with their 1-based positions. Narrow (no shuffle but
    * the sort); generator output is bounded per row. */
  val q36: Q = (s, dir) => {
    Tables(s, dir, "documents").createOrReplaceTempView("documents_q36")
    s.sql("""
      SELECT doc_id, CAST(pos + 1 AS INT) AS pos, token
      FROM documents_q36
        LATERAL VIEW posexplode(filter(split(text, ' '), x -> x != '')) t AS pos, token
      WHERE doc_id < 100 AND pos < 8
      ORDER BY doc_id, pos""")
  }

  // ---------------------------------------------------------------- Q37
  /** Quantified subqueries: IN (→ left semi join), NOT IN (→ null-aware
    * anti join), and an uncorrelated scalar subquery (→ broadcast of one
    * row), all decorrelated by Catalyst — no per-row subquery execution
    * survives in the optimized plan (asserted in Declared3Spec). The
    * NOT IN subquery is null-free by schema (c_custkey is a key); on a
    * nullable column ANSI NOT IN semantics would empty the result — the
    * hazard is documented here deliberately. The scalar mean is exact
    * cents so the comparison boundary is the same double in both
    * engines. */
  val q37: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("orders_q37")
    Tables(s, dir, "customer").createOrReplaceTempView("customer_q37")
    s.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders_q37
      WHERE o_custkey IN (SELECT c_custkey FROM customer_q37 WHERE c_acctbal > 7500)
        AND o_custkey NOT IN (SELECT c_custkey FROM customer_q37 WHERE c_mktsegment = 'BUILDING')
        AND o_totalprice > (SELECT CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                                   / count(*) / 100.0
                            FROM orders_q37)
      ORDER BY o_orderkey""")
  }

  // ---------------------------------------------------------------- Q38
  /** Exact-moment descriptive statistics per return flag: mean/stddev of
    * l_quantity and its correlation with the discount percentage, from
    * integer power sums (Σx, Σx², Σxy — all < 2^53 at ANY realistic SF,
    * so the int→double conversions are exact and the closed-form final
    * arithmetic is the identical IEEE sequence in both engines). This is
    * how order-insensitive statistics are done at 100 TB: the shuffle
    * carries five longs per group (perfect partial aggregation), never
    * the values; a naive stddev/corr aggregate is accumulation-order-
    * sensitive and non-reproducible across partitionings. l_quantity is
    * integral (1..50) and l_discount is exact cents after ×100 — both
    * exactly representable. */
  val q38: Q = (s, dir) => {
    import s.implicits._
    val q = floor($"l_quantity").cast("long")
    val d = floor($"l_discount" * 100).cast("long")
    val m = Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(q).as("sq"), sum(q * q).as("sqq"),
        sum(d).as("sd"), sum(d * d).as("sdd"),
        sum(q * d).as("sqd"))
    val nD = $"n".cast("double")
    def f(c: String) = col(c).cast("double")
    // Degenerate-group guards, decided in EXACT integer arithmetic (the
    // long moment sums) and mirrored verbatim in the Oracle3 SQL: n=1
    // makes std 0/0, zero variance makes corr 0/0, and NaN/Inf division
    // behavior differs across engines — so both engines agree to emit
    // NULL instead of dividing. (n·sqq − sq² ≥ 0 exactly by
    // Cauchy-Schwarz over integers, so the sqrt argument is never
    // negative when the guard passes.)
    val varQ = $"n" * $"sqq" - $"sq" * $"sq"
    val varD = $"n" * $"sdd" - $"sd" * $"sd"
    m.select($"l_returnflag", $"n",
        (f("sq") / nD).as("mean_qty"),
        when($"n" > 1,
          sqrt((nD * f("sqq") - f("sq") * f("sq")) / (nD * (nD - 1.0)))).as("std_qty"),
        when($"n" > 1 && varQ > 0 && varD > 0,
          (nD * f("sqd") - f("sq") * f("sd")) /
            (sqrt(nD * f("sqq") - f("sq") * f("sq")) *
             sqrt(nD * f("sdd") - f("sd") * f("sd")))).as("corr_qty_disc"))
      .orderBy($"l_returnflag")
  }

  // ---------------------------------------------------------------- Q39
  /** Gap filling via IGNORE NULLS windows (last observation carried
    * forward — the standard time-series repair step before feature
    * extraction). Nulls are synthesized deterministically (every 5th
    * event) so the operator is exercised on any corpus; the fill is the
    * most recent non-null value within the user's (ts, event_id) order.
    * One shuffle on user_id; the IGNORE NULLS frame scan is a single
    * pass per partition. The carried values are compared bit-for-bit —
    * no arithmetic touches them. */
  val q39: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "events")
      .select($"event_id", $"user_id", $"ts",
        when($"event_id" % 5 === 0, lit(null)).otherwise($"value").as("v"))
      .select($"event_id", $"user_id", $"v",
        last($"v", ignoreNulls = true).over(w).as("v_filled"))
      .orderBy($"event_id")
  }

  // ---------------------------------------------------------------- Q40
  /** Null-preserving generator (explode_outer): rows whose array is
    * empty survive with a null element instead of vanishing — the outer
    * form Q36's posexplode doesn't cover (an inner explode silently
    * drops empty-array parents, which is how corpus-stat pipelines lose
    * documents). Long tokens (>6 chars) are rare enough that many
    * documents exercise the empty path (the corpus tops out at 8-char
    * tokens, so >6 leaves both populated and empty arrays). */
  val q40: Q = (s, dir) => {
    import s.implicits._
    val longToks = filter(split($"text", graft.functions.Signatures.TokenSepRegex), t => length(t) > 6)
    Tables(s, dir, "documents")
      .select($"doc_id", size(longToks).cast("int").as("n_long"),
        explode_outer(longToks).as("long_tok"))
      .orderBy($"doc_id", $"long_tok".asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "q35_range_frame" -> q35,
    "q36_posexplode" -> q36,
    "q37_quantified_subq" -> q37,
    "q38_exact_stats" -> q38,
    "q39_locf" -> q39,
    "q40_explode_outer" -> q40)
}
