package graft.plans

import org.apache.spark.sql.{functions => F, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.storage.{TxLog, TxLogRelation}

/** SQL row-level DML on `txlog` catalog tables — the analyzer seam that
  * turns Spark's v2-only `DELETE FROM` / `UPDATE` / `MERGE INTO` parse
  * trees into [[TxLog]]'s copy-on-write transactions, so a pure-SQL
  * user gets the full DML surface:
  *
  * {{{
  *   spark.sql("DELETE FROM t WHERE id > 10")
  *   spark.sql("UPDATE t SET score = score * 2 WHERE grp = 'beta'")
  *   spark.sql("""MERGE INTO t USING s ON t.id = s.id
  *                WHEN MATCHED THEN UPDATE SET *
  *                WHEN NOT MATCHED THEN INSERT *""")
  * }}}
  *
  * Injected via [[graft.GraftExtensions]] as a RESOLUTION rule: it must
  * replace the node before the built-in session-catalog analysis
  * rejects v1 relations ("only supported with v2 tables"). Predicates
  * and SET expressions are re-rendered to SQL and re-resolved by NAME
  * against the table's own scan inside TxLog — sidestepping exprId
  * binding across plans; sound because a TxLog relation's columns are
  * exactly its top-level names. MERGE supports the canonical upsert
  * shape (equi-key ON, `UPDATE SET *` / `INSERT *`, no extra
  * conditions) — anything richer is a loud unsupported error, not a
  * silent misread. */
case class TxLogSqlDml(session: SparkSession) extends Rule[LogicalPlan] {

  private def tableOf(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => tableOf(child)
    case lr: LogicalRelation => lr.relation match {
      case r: TxLogRelation => Some(r.table)
      case _ => None
    }
    case _ => None
  }

  /** Render an expression to SQL with every column reference reduced to
    * its bare name — a resolved attribute's `.sql` carries the full
    * catalog qualifier, which cannot re-resolve against the table's own
    * fresh scan inside TxLog. */
  private def unqualifiedSql(e: Expression): String =
    e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    }.sql

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"txlog SQL DML: $what (use the TxLog API for richer shapes)")

  /** Equi-key column names from a resolved MERGE ON conjunction of
    * `target.k = source.k` terms — SIDE-CHECKED: each equality must
    * bind one target attribute and one source attribute of the same
    * name (a same-side equality like `t.grp = t.grp` is a filter, not
    * a join key; accepting it would silently change the upsert's key).
    * Loud on anything else. */
  private def mergeKeys(cond: Expression, target: LogicalPlan,
                        source: LogicalPlan): Seq[String] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case x => Seq(x)
    }
    split(cond).map {
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if l.name == r.name &&
            ((target.outputSet.contains(l) && source.outputSet.contains(r)) ||
              (target.outputSet.contains(r) && source.outputSet.contains(l))) =>
        l.name
      case other =>
        unsupported(s"MERGE ON must be target.k = source.k conjunctions, got $other")
    }
  }

  /** Subqueries can't survive the SQL-rendering round trip (`.sql`
    * emits pseudo-functions like `listquery()`); reject them with OUR
    * message, not a cryptic downstream parse error. */
  private def noSubqueries(e: Expression): Expression = {
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      unsupported(s"subqueries are not supported in DML predicates: $e")
    e
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperators {
    case DeleteFromTable(t, cond) if tableOf(t).isDefined && cond.resolved =>
      TxDeleteCommand(tableOf(t).get, unqualifiedSql(noSubqueries(cond)))

    case UpdateTable(t, assignments, cond)
        if tableOf(t).isDefined && assignments.forall(_.resolved) &&
          cond.forall(_.resolved) =>
      val sets = assignments.map { a =>
        a.key match {
          case k: AttributeReference => k.name -> unqualifiedSql(noSubqueries(a.value))
          case other => unsupported(s"UPDATE key must be a plain column, got $other")
        }
      }
      val dup = sets.map(_._1).diff(sets.map(_._1).distinct).distinct
      if (dup.nonEmpty) unsupported(s"duplicate SET columns: ${dup.mkString(", ")}")
      TxUpdateCommand(tableOf(t).get, sets, cond.map(c => unqualifiedSql(noSubqueries(c))))

    case MergeIntoTable(t, source, cond, matched, notMatched, notMatchedBySource, _)
        if tableOf(t).isDefined && source.resolved && cond.resolved =>
      // `SET *` arrives either raw (UpdateStarAction) or already
      // expanded by the analyzer into per-column identity assignments —
      // accept both, requiring the expansion to be the COMPLETE
      // name-for-name mapping (anything else is a real column remap and
      // unsupported)
      def starLike(as: Seq[Assignment]): Boolean =
        as.size == t.output.size && as.forall { a =>
          (a.key, a.value) match {
            case (k: AttributeReference, v: AttributeReference) => k.name == v.name
            case _ => false
          }
        }
      val upsertShape =
        (matched match {
          case Seq(UpdateStarAction(None)) => true
          case Seq(UpdateAction(None, as, _)) => starLike(as)
          case _ => false
        }) &&
          (notMatched match {
            case Seq(InsertStarAction(None)) => true
            case Seq(InsertAction(None, as)) => starLike(as)
            case _ => false
          }) && notMatchedBySource.isEmpty
      if (!upsertShape)
        unsupported("MERGE supports WHEN MATCHED THEN UPDATE SET * / " +
          "WHEN NOT MATCHED THEN INSERT * (no extra conditions)")
      TxMergeCommand(tableOf(t).get, source, mergeKeys(noSubqueries(cond), t, source))
  }
}

/** Shared command tail: a fresh single-use writer token per statement
  * (the `sql-*-<uuid>` class — never replayed by construction, and
  * dropped from checkpoint token absorption by
  * `TxLog.singleUseWriter`, so interactive DML cannot grow the
  * manifest token lists) + one log line. */
private[plans] trait TxDmlCommand extends LeafRunnableCommand {
  def table: String
  def op: String
  def exec(s: SparkSession, writerId: String): TxLog.Rewrite
  override def run(s: SparkSession): Seq[Row] = {
    val r = exec(s, s"sql-$op-${java.util.UUID.randomUUID()}")
    log.info(s"txlog $op on $table: v${r.version}, " +
      s"rewrote ${r.removedFiles} files, added ${r.addedFiles}")
    Seq.empty
  }
}

case class TxDeleteCommand(table: String, condSql: String) extends TxDmlCommand {
  override def op: String = "delete"
  override def exec(s: SparkSession, writerId: String): TxLog.Rewrite =
    TxLog.deleteInternal(s, table, F.expr(condSql), writerId, batchId = 0L)
}

case class TxUpdateCommand(table: String, sets: Seq[(String, String)],
                           condSql: Option[String]) extends TxDmlCommand {
  override def op: String = "update"
  override def exec(s: SparkSession, writerId: String): TxLog.Rewrite =
    TxLog.updateInternal(s, table, condSql.map(F.expr).getOrElse(F.lit(true)),
      sets.map { case (k, v) => k -> F.expr(v) }.toMap, writerId, batchId = 0L)
}

case class TxMergeCommand(table: String, source: LogicalPlan,
                          keys: Seq[String]) extends TxDmlCommand {
  override def op: String = "merge"
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def exec(s: SparkSession, writerId: String): TxLog.Rewrite =
    TxLog.mergeInternal(org.apache.spark.sql.GraftSqlBridge.ofRows(s, source),
      table, keys, writerId, batchId = 0L)
}
