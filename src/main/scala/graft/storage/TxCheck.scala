package graft.storage

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BasePredicate, BindReferences, Expression, IsNull, Not, Or, Predicate => CatPredicate}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions.{assert_true, coalesce, concat, expr, lit, struct, to_json}
import org.apache.spark.sql.types.StructType

/** CHECK constraints for txlog tables — declared as table properties
  * in the `graft.check.<name>` namespace:
  *
  * {{{
  *   ALTER TABLE t SET TBLPROPERTIES ('graft.check.positive' = 'amount > 0')
  *   -- or at create:
  *   CREATE TABLE ... TBLPROPERTIES ('graft.check.code' = 'code IN ("a","b")')
  * }}}
  *
  * Semantics are standard SQL CHECK: a row VIOLATES a constraint only
  * when the expression evaluates to FALSE — NULL passes. Enforcement
  * is per-row at EVERY write path before the commit point:
  *
  *  - the V2 executor writers evaluate a bound Catalyst predicate per
  *    row (codegen with interpreted fallback) — appends, streaming
  *    epochs and Spark-planned DML rewrites all pass through it;
  *  - the driver staging paths (commit / commitPartitioned / library
  *    DML / compaction) wrap the staged DataFrame in an `assert_true`
  *    projection, so the write job itself fails on the first
  *    violating row (no extra pass over the data);
  *  - adding a constraint to a table WITH data scans once and refuses
  *    if any existing row violates (the Delta ADD CONSTRAINT rule) —
  *    a published constraint therefore holds for every live row.
  *
  * A write whose schema omits a checked column is rejected loudly (the
  * constraint cannot be evaluated on the incoming rows); drop the
  * constraint first or include the column. */
object TxCheck {

  val Prefix = "graft.check."

  /** The declared constraints in `props`: name → boolean SQL. */
  def checksIn(props: Map[String, String]): Map[String, String] =
    props.collect { case (k, v) if k.startsWith(Prefix) =>
      k.stripPrefix(Prefix) -> v
    }

  /** Parse + resolve `sql` against `schema`; returns the resolved
    * condition and the attributes it is resolved against. Loud on
    * parse errors, unknown columns, non-boolean results. */
  private def resolve(s: SparkSession, schema: StructType, name: String,
                      sql: String): (Expression, Seq[Attribute]) = {
    val dummy = s.createDataFrame(
      java.util.Collections.emptyList[Row](), schema)
    val analyzed =
      try dummy.filter(expr(sql)).queryExecution.analyzed
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"CHECK constraint $name ('$sql') does not resolve against " +
              s"schema ${schema.simpleString}: ${e.getMessage}")
      }
    val cond = analyzed.collectFirst { case f: Filter => f.condition }
      .getOrElse(throw new IllegalArgumentException(
        s"CHECK constraint $name ('$sql') did not analyze to a filter condition"))
    require(cond.deterministic,
      s"CHECK constraint $name ('$sql') must be deterministic")
    (cond, analyzed.output)
  }

  /** Validate `checks` against `schema` (parse/resolve only — the
    * data-scan half lives in [[validateExisting]]). */
  def validateDeclared(s: SparkSession, schema: StructType,
                       checks: Map[String, String]): Unit =
    checks.foreach { case (n, sql) => resolve(s, schema, n, sql) }

  /** Refuse a new constraint that existing rows already violate —
    * scans once per ALTER, so a published constraint is an invariant
    * of the whole live row set, not just future writes. */
  def validateExisting(s: SparkSession, df: DataFrame,
                       checks: Map[String, String]): Unit =
    checks.foreach { case (n, sql) =>
      val bad = df.filter(!coalesce(expr(sql), lit(true))).count()
      require(bad == 0L,
        s"cannot add CHECK constraint $n ('$sql'): $bad existing row(s) violate it")
    }

  /** Driver-path guard: wrap `df` so the staging write job throws on
    * the first violating row (assert_true projects through codegen —
    * no extra scan). The violating row rides in the error as JSON. */
  def guard(s: SparkSession, df: DataFrame, props: Map[String, String]): DataFrame = {
    val checks = checksIn(props)
    if (checks.isEmpty) return df
    validateDeclared(s, df.schema, checks)
    checks.toSeq.sortBy(_._1).foldLeft(df) { case (d, (n, sql)) =>
      d.filter(assert_true(coalesce(expr(sql), lit(true)),
        concat(lit(s"CHECK constraint $n ('$sql') violated by row "),
          to_json(struct(df.columns.map(d(_)): _*)))).isNull)
    }
  }

  /** One bound per-row violation predicate for the V2 executor writers:
    * name, SQL, and the expression bound to `schema`'s field order
    * (violation = NOT (cond OR cond IS NULL)). */
  def bound(s: SparkSession, schema: StructType,
            props: Map[String, String]): Seq[BoundCheck] = {
    val checks = checksIn(props)
    if (checks.isEmpty) return Seq.empty
    checks.toSeq.sortBy(_._1).map { case (n, sql) =>
      val (cond, attrs) = resolve(s, schema, n, sql)
      BoundCheck(n, sql,
        BindReferences.bindReference(Not(Or(IsNull(cond), cond)), attrs))
    }
  }

  /** Serializable (name, sql, bound violation expression) triple; the
    * executor materializes the predicate lazily per writer. */
  case class BoundCheck(name: String, sql: String, violation: Expression) {
    @transient private lazy val pred: BasePredicate = CatPredicate.create(violation)
    def check(row: InternalRow): Unit =
      if (pred.eval(row)) throw new IllegalArgumentException(
        s"CHECK constraint $name ('$sql') violated by a written row")
  }
}
