package graft.plans

import org.apache.spark.sql.{functions => F, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression}
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

  /** Equi-key column names from a MERGE ON conjunction of
    * `target.k = source.k` terms; loud on anything else. */
  private def mergeKeys(cond: Expression): Seq[String] = {
    def name(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case u: UnresolvedAttribute => Some(u.nameParts.last)
      case _ => None
    }
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case x => Seq(x)
    }
    split(cond).map {
      case EqualTo(l, r) =>
        (name(l), name(r)) match {
          case (Some(a), Some(b)) if a == b => a
          case _ => unsupported(s"MERGE ON must be target.k = source.k conjunctions, got $cond")
        }
      case other => unsupported(s"MERGE ON must be equality conjunctions, got $other")
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperators {
    case DeleteFromTable(t, cond) if tableOf(t).isDefined && cond.resolved =>
      TxDeleteCommand(tableOf(t).get, unqualifiedSql(cond))

    case UpdateTable(t, assignments, cond)
        if tableOf(t).isDefined && assignments.forall(_.resolved) &&
          cond.forall(_.resolved) =>
      val sets = assignments.map { a =>
        a.key match {
          case k: AttributeReference => k.name -> unqualifiedSql(a.value)
          case other => unsupported(s"UPDATE key must be a plain column, got $other")
        }
      }
      TxUpdateCommand(tableOf(t).get, sets, cond.map(unqualifiedSql))

    case MergeIntoTable(t, source, cond, matched, notMatched, notMatchedBySource, _)
        if tableOf(t).isDefined && source.resolved =>
      val upsertShape =
        matched.forall { case UpdateStarAction(None) => true; case _ => false } &&
          notMatched.forall { case InsertStarAction(None) => true; case _ => false } &&
          matched.size == 1 && notMatched.size == 1 && notMatchedBySource.isEmpty
      if (!upsertShape)
        unsupported("MERGE supports WHEN MATCHED THEN UPDATE SET * / " +
          "WHEN NOT MATCHED THEN INSERT * (no extra conditions)")
      TxMergeCommand(tableOf(t).get, source, mergeKeys(cond))
  }
}

case class TxDeleteCommand(table: String, condSql: String) extends LeafRunnableCommand {
  override def run(s: SparkSession): Seq[Row] = {
    val r = TxLog.delete(s, table, F.expr(condSql),
      writerId = s"sql-delete-${java.util.UUID.randomUUID()}", batchId = 0L)
    log.info(s"txlog DML on $table: v${r.version}, rewrote ${r.removedFiles} files, added ${r.addedFiles}")
    Seq.empty
  }
}

case class TxUpdateCommand(table: String, sets: Seq[(String, String)],
                           condSql: Option[String]) extends LeafRunnableCommand {
  override def run(s: SparkSession): Seq[Row] = {
    val r = TxLog.update(s, table, condSql.map(F.expr).getOrElse(F.lit(true)),
      sets.map { case (k, v) => k -> F.expr(v) }.toMap,
      writerId = s"sql-update-${java.util.UUID.randomUUID()}", batchId = 0L)
    log.info(s"txlog DML on $table: v${r.version}, rewrote ${r.removedFiles} files, added ${r.addedFiles}")
    Seq.empty
  }
}

case class TxMergeCommand(table: String, source: LogicalPlan,
                          keys: Seq[String]) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(s: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.GraftSqlBridge.ofRows(s, source)
    val r = TxLog.merge(src, table, keys,
      writerId = s"sql-merge-${java.util.UUID.randomUUID()}", batchId = 0L)
    log.info(s"txlog DML on $table: v${r.version}, rewrote ${r.removedFiles} files, added ${r.addedFiles}")
    Seq.empty
  }
}
