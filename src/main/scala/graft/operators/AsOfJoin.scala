package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` for the same key. Spark's Scala API has no
  * native operator for this (pandas-on-Spark does); rather than a custom
  * SparkPlan, this composes built-ins the Spark-first way (SURVEY §4.3
  * preference (a)):
  *
  * union both sides tagged → ONE window over (key) ordered by
  * (ts, side) → `last(right value, ignoreNulls)` carries the most recent
  * right row forward → keep left rows.
  *
  * Cost: a single shuffle on the key (the union sorts within partitions
  * for the window) — strictly better than the sort-merge-join +
  * re-aggregation a LEFT JOIN ... <= ... GROUP BY formulation needs, and
  * it never materializes the quadratic "all earlier rows" pair set. At
  * 100 TB both sides stream through one exchange; skew on the key is the
  * only hazard (hot keys → SkewJoin-style salting with per-salt-bucket
  * right replication).
  *
  * Tie rule: a right row AT the left row's timestamp matches (`<=`), the
  * standard as-of semantic (and DuckDB's `ASOF JOIN ... >=`, which the
  * oracle uses). Callers must make (key, ts) unique on the right side
  * (pre-aggregate) — as-of among same-instant right rows is undefined.
  */
object AsOfJoin {

  /** Backward as-of (the default sense): latest right row with
    * `right.ts <= left.ts`.
    *
    * @param left       probe side; all its columns survive
    * @param right      reference side, unique per (key, ts)
    * @param key        equi-key column name present on both sides
    * @param ts         event-time column name present on both sides
    * @param rightVals  right columns to carry (each emitted as
    *                   `asof_<name>`, null when no right row precedes) */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightVals: Seq[String]): DataFrame =
    asOfImpl(left, right, key, ts, rightVals, forward = false)

  /** Forward as-of: EARLIEST right row with `right.ts >= left.ts` —
    * the "next scheduled event" lookup (next maintenance window, next
    * price revision). Same single-shuffle shape as [[asOf]], mirrored:
    * the carry runs over the FOLLOWING frame and left rows sort before
    * equal-ts right rows so `>=` includes the same instant. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String, ts: String,
                  rightVals: Seq[String]): DataFrame =
    asOfImpl(left, right, key, ts, rightVals, forward = true)

  private def asOfImpl(left: DataFrame, right: DataFrame, key: String,
                       ts: String, rightVals: Seq[String],
                       forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // Carry the right row as ONE struct: last(.., ignoreNulls) over a
    // per-column carry would skip right rows whose column value is
    // legitimately null (carrying a stale older value) and could mix
    // columns from different right rows. The struct is non-null for
    // every right row even when its fields are null, so the nearest
    // right ROW is carried atomically.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(v => right.schema(v).copy(name = v)))
    // side ordinals put the right row INSIDE the frame at equal ts:
    // backward (frame ends at current row): right sorts before left;
    // forward (frame starts at current row): left sorts before right
    val (leftSide, rightSide) = if (forward) (0, 1) else (1, 0)
    val l = left
      .select((col(key) +: col(ts) +: lit(leftSide).as("__side") +:
        lit(null).cast(rStructType).as("__r") +:
        leftCols.filterNot(c => c == key || c == ts).map(col)): _*)
    val r = right
      .select((col(key) +: col(ts) +: lit(rightSide).as("__side") +:
        struct(rightVals.map(col): _*).as("__r") +:
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val wBase = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"))
    val carried = l.unionByName(r).withColumn("__asof",
      if (forward)
        first(col("__r"), ignoreNulls = true)
          .over(wBase.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("__r"), ignoreNulls = true)
          .over(wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    carried.filter(col("__side") === leftSide)
      .select((leftCols.map(col) ++
        rightVals.map(v => col(s"__asof.$v").as(s"asof_$v"))): _*)
  }
}
