package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{SchemaBinding, SchemaCompensation, SchemaEvolution, SchemaTypeEvolution, UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, UpCast}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, Command, CreateView, DescribeRelation, DropView, LeafNode, LogicalPlan, SetViewProperties, ShowViews, SubqueryAlias, UnaryNode, UnsetViewProperties}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.V2CommandExec
import org.apache.spark.unsafe.types.UTF8String

import graft.storage.{GraftCatalog, GraftView}

/** SQL VIEW support for [[GraftCatalog]] (r16). OSS Spark parses
  * CREATE/DROP/SHOW VIEW against a V2 catalog but its
  * `ResolveSessionCatalog` throws `MISSING_CATALOG_ABILITY.VIEWS`
  * unconditionally for any non-session catalog — there is no V2 view
  * exec or ViewCatalog relation resolution in vanilla. Three injected
  * pieces close that:
  *
  *  - [[GraftViewCommandRewrite]] (HINT-batch rule — the one injection
  *    point that runs BEFORE the Resolution batch, so the command is
  *    rewritten before `ResolveSessionCatalog` can throw): CreateView/
  *    DropView/ShowViews whose identifier resolves to a
  *    [[GraftCatalog]] become the Graft* logical commands below; the
  *    session catalog's commands pass through untouched.
  *  - [[GraftViewSubstitution]] (resolution rule): an
  *    [[UnresolvedRelation]] naming a stored view substitutes the
  *    view's parsed SQL, with context-relative table references
  *    qualified by the (catalog, namespace) captured at CREATE.
  *    Session temp views keep precedence (SQL standard). Resolution is
  *    LATE-BINDING by design: the text re-analyzes at query time, so
  *    the view tracks schema evolution of the underlying tables; a
  *    pinned `VERSION AS OF` inside the text stays pinned, and the
  *    view itself always reads current state.
  *  - [[GraftViewStrategy]] (planner strategy): executes the Graft*
  *    commands against the catalog's [[graft.storage.GraftViews]]
  *    documents.
  */
object GraftViewCommands {
  /** Resolve `parts` to (GraftCatalog, Identifier) WITHOUT the
    * analyzer: catalog prefix if registered, else the current catalog;
    * None when the target is not a [[GraftCatalog]] (the command then
    * takes Spark's own path). */
  def resolveIdent(spark: SparkSession, parts: Seq[String])
      : Option[(String, GraftCatalog, Identifier)] = {
    val cm = spark.sessionState.catalogManager
    val (catName, cat, rest) =
      if (parts.size > 1 && cm.isCatalogRegistered(parts.head))
        (parts.head, cm.catalog(parts.head), parts.tail)
      else (cm.currentCatalog.name, cm.currentCatalog, parts)
    cat match {
      case g: GraftCatalog if rest.nonEmpty =>
        val ident =
          if (rest.size == 1) Identifier.of(cm.currentNamespace, rest.head)
          else Identifier.of(rest.init.toArray, rest.last)
        Some((catName, g, ident))
      case _ => None
    }
  }

  def resolveNs(spark: SparkSession, parts: Seq[String])
      : Option[(GraftCatalog, Seq[String])] = {
    val cm = spark.sessionState.catalogManager
    val (cat, rest) =
      if (parts.nonEmpty && cm.isCatalogRegistered(parts.head))
        (cm.catalog(parts.head), parts.tail)
      else (cm.currentCatalog, parts)
    cat match {
      case g: GraftCatalog =>
        Some((g, if (rest.isEmpty) cm.currentNamespace.toSeq else rest))
      case _ => None
    }
  }
}

object GraftViewModes {
  /** Stored-property key of the view's SCHEMA MODE (`WITH SCHEMA
    * BINDING | COMPENSATION | TYPE EVOLUTION | EVOLUTION`). Absent =
    * EVOLUTION — the late-binding default every pre-r17 view document
    * already has. BINDING and COMPENSATION pin the CREATE-time schema:
    * the substituted body is re-projected onto the stored query
    * columns and each output CASTS back to its create-time type —
    * UpCast (safe casts only, analysis-time refusal on narrowing) for
    * BINDING, ANSI Cast (any castable type) for COMPENSATION. TYPE
    * EVOLUTION pins the COLUMN SET but lets types track the base. */
  val ModeKey = "view.schema.mode"
  // NOTE: Spark's parser emits COMPENSATION for a clause-less CREATE
  // VIEW (its documented default) — honored verbatim. A DOCUMENT with
  // no stored key (every pre-mode view) keeps the r16 late-binding
  // EVOLUTION it was created under.
  val Binding = "BINDING"
  val Compensation = "COMPENSATION"
  val TypeEvolution = "TYPE EVOLUTION"
  val Evolution = "EVOLUTION"
}

/** CREATE [OR REPLACE] VIEW against a [[GraftCatalog]], post-rewrite:
  * the query stays a CHILD so the analyzer resolves it normally. */
case class GraftCreateView(catalogName: String, cat: GraftCatalog,
                           ident: Identifier,
                           userCols: Seq[(String, Option[String])],
                           props: Map[String, String],
                           originalText: String,
                           query: LogicalPlan,
                           allowExisting: Boolean, replace: Boolean,
                           schemaMode: String = GraftViewModes.Evolution)
    extends UnaryNode with Command {
  override def child: LogicalPlan = query
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildInternal(c: LogicalPlan): GraftCreateView =
    copy(query = c)
}

case class GraftDropView(cat: GraftCatalog, ident: Identifier,
                         ifExists: Boolean) extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** ALTER VIEW ... AS: redefine the query text, KEEPING the view's
  * properties (the V1 semantics); the NEW text captures the ALTER
  * session's (catalog, namespace) context. The view must exist. */
case class GraftAlterViewAs(cat: GraftCatalog, ident: Identifier,
                            originalText: String, query: LogicalPlan)
    extends UnaryNode with Command {
  override def child: LogicalPlan = query
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildInternal(c: LogicalPlan): GraftAlterViewAs =
    copy(query = c)
}

/** ALTER VIEW ... SET/UNSET TBLPROPERTIES. */
case class GraftSetViewProps(cat: GraftCatalog, ident: Identifier,
                             set: Map[String, String], unset: Seq[String],
                             ifExists: Boolean)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** DESCRIBE [EXTENDED] on a stored view. */
case class GraftDescribeView(cat: GraftCatalog, ident: Identifier,
                             isExtended: Boolean,
                             override val output: Seq[Attribute])
    extends LeafNode with Command

case class GraftShowViews(cat: GraftCatalog, ns: Seq[String],
                          pattern: Option[String],
                          override val output: Seq[Attribute])
    extends LeafNode with Command

/** The HINT-batch rewrite (see the file scaladoc for why that batch). */
case class GraftViewCommandRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftViewCommands._

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case cv @ CreateView(UnresolvedIdentifier(parts, _), userCols, _, _,
        props, originalText, query, allowExisting, replace, schemaMode) =>
      resolveIdent(spark, parts) match {
        case Some((catName, cat, ident)) =>
          val mode = schemaMode match {
            case SchemaBinding => GraftViewModes.Binding
            case SchemaCompensation => GraftViewModes.Compensation
            case SchemaTypeEvolution => GraftViewModes.TypeEvolution
            case SchemaEvolution => GraftViewModes.Evolution
            case _ => GraftViewModes.Evolution // parser default sentinel
          }
          GraftCreateView(catName, cat, ident, userCols, props,
            originalText.getOrElse(throw new IllegalArgumentException(
              s"CREATE VIEW ${parts.mkString(".")}: no SQL text to store")),
            query, allowExisting, replace, mode)
        case None => cv
      }
    case dv @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
      resolveIdent(spark, parts) match {
        case Some((_, cat, ident)) => GraftDropView(cat, ident, ifExists)
        case None => dv
      }
    case sv @ ShowViews(UnresolvedNamespace(parts, _), pattern, output) =>
      resolveNs(spark, parts) match {
        case Some((cat, ns)) => GraftShowViews(cat, ns, pattern, output)
        case None => sv
      }
    case av @ AlterViewAs(u: UnresolvedView, originalText, query) =>
      resolveIdent(spark, u.multipartIdentifier) match {
        case Some((_, cat, ident)) =>
          GraftAlterViewAs(cat, ident, originalText, query)
        case None => av
      }
    case sp @ SetViewProperties(u: UnresolvedView, props) =>
      resolveIdent(spark, u.multipartIdentifier) match {
        case Some((_, cat, ident)) =>
          GraftSetViewProps(cat, ident, props, Seq.empty, ifExists = false)
        case None => sp
      }
    case up @ UnsetViewProperties(u: UnresolvedView, keys, ifExists) =>
      resolveIdent(spark, u.multipartIdentifier) match {
        case Some((_, cat, ident)) =>
          GraftSetViewProps(cat, ident, Map.empty, keys, ifExists)
        case None => up
      }
    // DESCRIBE a stored view (tables pass through untouched — the
    // viewExists probe is one metadata read, and only for identifiers
    // that resolve into a Graft catalog)
    case d @ DescribeRelation(u: UnresolvedTableOrView, _, isExtended, output) =>
      resolveIdent(spark, u.multipartIdentifier) match {
        case Some((_, cat, ident)) if cat.viewExists(ident) =>
          GraftDescribeView(cat, ident, isExtended, output)
        case _ => d
      }
    case other => other
  }
}

case class GraftViewSubstitution(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftView(parts: Seq[String])
      : Option[(String, Identifier, GraftView)] = {
    // temp views shadow catalog views (SQL standard; Spark's own rules
    // resolve them)
    if (parts.size == 1 &&
        spark.sessionState.catalog.getRawTempView(parts.head).isDefined)
      return None
    GraftViewCommands.resolveIdent(spark, parts).flatMap {
      case (catName, g, ident) =>
        try {
          if (g.viewExists(ident))
            Some((catName, ident, g.loadView(ident).asInstanceOf[GraftView]))
          else None
        } catch { case _: Exception => None }
    }
  }

  /** Qualify context-relative table references inside the view text
    * with the context captured at CREATE, so the view means the same
    * tables from any session context. 1-part names gain (catalog,
    * namespace); 2-part names gain the catalog. */
  private def qualify(plan: LogicalPlan, cat: String,
                      ns: Seq[String]): LogicalPlan =
    plan.transformUp {
      case u: UnresolvedRelation if u.multipartIdentifier.size == 1 &&
          spark.sessionState.catalog.getRawTempView(
            u.multipartIdentifier.head).isEmpty =>
        u.copy(multipartIdentifier = cat +: ns :+ u.multipartIdentifier.head)
      case u: UnresolvedRelation if u.multipartIdentifier.size == 2 &&
          !spark.sessionState.catalogManager.isCatalogRegistered(
            u.multipartIdentifier.head) =>
        u.copy(multipartIdentifier = cat +: u.multipartIdentifier)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation =>
      graftView(u.multipartIdentifier) match {
        case Some((catName, ident, v)) =>
          val parsed = spark.sessionState.sqlParser.parsePlan(v.query)
          val body = qualify(parsed, v.currentCatalog,
            v.currentNamespace.toSeq)
          val mode = Option(v.properties().get(GraftViewModes.ModeKey))
            .getOrElse(GraftViewModes.Evolution)
          val aliased = mode match {
            case GraftViewModes.Evolution =>
              // late binding: the body's own (evolved) schema serves
              if (v.columnAliases().isEmpty) body
              else org.apache.spark.sql.catalyst.analysis
                .UnresolvedSubqueryColumnAliases(v.columnAliases().toSeq, body)
            case m =>
              // schema pinned at CREATE: re-project onto the stored
              // query columns (a dropped/renamed base column leaves an
              // unresolved attribute — loud at analysis, never a
              // silently different column set) and bind each output to
              // its create-time name and — for BINDING/COMPENSATION —
              // its create-time TYPE: UpCast refuses any narrowing at
              // analysis, Cast compensates wherever ANSI casts can
              val stored = v.schema
              val qcols = v.queryColumnNames().toSeq
              val outs = qcols.zip(stored.fields.toSeq).map { case (qn, f) =>
                val attr = UnresolvedAttribute.quoted(qn)
                val e = m match {
                  case GraftViewModes.Binding => UpCast(attr, f.dataType)
                  case GraftViewModes.Compensation => Cast(attr, f.dataType)
                  case _ => attr // TYPE EVOLUTION: columns pinned, types track
                }
                Alias(e, f.name)()
              }
              Project(outs, body)
          }
          SubqueryAlias(
            (catName +: ident.namespace.toSeq :+ ident.name).mkString("."),
            aliased)
        case None => u
      }
  }
}

/** Physical planning for the Graft view commands. */
case class GraftViewStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case cv: GraftCreateView => CreateGraftViewExec(spark, cv) :: Nil
    case GraftDropView(cat, ident, ifExists) =>
      DropGraftViewExec(cat, ident, ifExists) :: Nil
    case GraftShowViews(cat, ns, pattern, output) =>
      ShowGraftViewsExec(cat, ns, pattern, output) :: Nil
    case av: GraftAlterViewAs => AlterGraftViewAsExec(spark, av) :: Nil
    case GraftSetViewProps(cat, ident, set, unset, ifExists) =>
      SetGraftViewPropsExec(cat, ident, set, unset, ifExists) :: Nil
    case GraftDescribeView(cat, ident, isExtended, output) =>
      DescribeGraftViewExec(cat, ident, isExtended, output) :: Nil
    case _ => Nil
  }
}

case class CreateGraftViewExec(spark: SparkSession, cv: GraftCreateView)
    extends V2CommandExec {
  override def output: Seq[Attribute] = Nil
  override def children: Seq[SparkPlan] = Nil
  override protected def withNewChildrenInternal(
      c: IndexedSeq[SparkPlan]): SparkPlan = this

  override def run(): Seq[InternalRow] = {
    val query = cv.query // analyzed by the time planning runs
    require(cv.userCols.isEmpty || cv.userCols.size == query.schema.size,
      s"CREATE VIEW ${cv.ident}: ${cv.userCols.size} column aliases for " +
        s"${query.schema.size} query columns")
    val schema =
      if (cv.userCols.isEmpty) query.schema
      else org.apache.spark.sql.types.StructType(
        query.schema.fields.zip(cv.userCols).map { case (f, (n, _)) =>
          f.copy(name = n) })
    val cm = spark.sessionState.catalogManager
    // the schema mode rides the stored properties (absent = the
    // late-binding EVOLUTION default, so pre-mode documents read back
    // unchanged); BINDING/COMPENSATION/TYPE EVOLUTION pin against the
    // stored schema/qcols below at every substitution
    val propsOut =
      if (cv.schemaMode == GraftViewModes.Evolution) cv.props
      else cv.props + (GraftViewModes.ModeKey -> cv.schemaMode)
    val info = new ViewInfo(cv.ident, cv.originalText,
      cm.currentCatalog.name, cm.currentNamespace, schema,
      query.schema.fieldNames,
      cv.userCols.map(_._1).toArray,
      cv.userCols.map(_._2.orNull).toArray,
      new java.util.HashMap[String, String](
        scala.jdk.CollectionConverters.MapHasAsJava(propsOut).asJava))
    if (cv.replace) cv.cat.replaceView(info, true)
    else if (cv.allowExisting && cv.cat.viewExists(cv.ident)) ()
    else cv.cat.createView(info)
    Seq.empty
  }
}

case class AlterGraftViewAsExec(spark: SparkSession, av: GraftAlterViewAs)
    extends V2CommandExec {
  override def output: Seq[Attribute] = Nil
  override def children: Seq[SparkPlan] = Nil
  override protected def withNewChildrenInternal(
      c: IndexedSeq[SparkPlan]): SparkPlan = this
  override def run(): Seq[InternalRow] = {
    val cur = av.cat.loadView(av.ident).asInstanceOf[GraftView]
    val cm = spark.sessionState.catalogManager
    val info = new ViewInfo(av.ident, av.originalText,
      cm.currentCatalog.name, cm.currentNamespace, av.query.schema,
      av.query.schema.fieldNames, Array.empty, Array.empty,
      cur.properties()) // redefinition keeps the properties
    av.cat.replaceView(info, false)
    Seq.empty
  }
}

case class SetGraftViewPropsExec(cat: GraftCatalog, ident: Identifier,
                                 set: Map[String, String], unset: Seq[String],
                                 ifExists: Boolean) extends V2CommandExec {
  override def output: Seq[Attribute] = Nil
  override def children: Seq[SparkPlan] = Nil
  override protected def withNewChildrenInternal(
      c: IndexedSeq[SparkPlan]): SparkPlan = this
  override def run(): Seq[InternalRow] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val cur = cat.loadView(ident) // loud when missing (both commands)
    val missing = unset.filterNot(cur.properties().containsKey)
    require(ifExists || missing.isEmpty,
      s"ALTER VIEW $ident UNSET TBLPROPERTIES: missing ${missing.mkString(", ")}")
    val changes: Seq[ViewChange] =
      set.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) } ++
        unset.filter(cur.properties().containsKey)
          .map(k => ViewChange.removeProperty(k))
    if (changes.nonEmpty) cat.alterView(ident, changes: _*)
    Seq.empty
  }
}

case class DropGraftViewExec(cat: GraftCatalog, ident: Identifier,
                             ifExists: Boolean) extends V2CommandExec {
  override def output: Seq[Attribute] = Nil
  override def children: Seq[SparkPlan] = Nil
  override protected def withNewChildrenInternal(
      c: IndexedSeq[SparkPlan]): SparkPlan = this
  override def run(): Seq[InternalRow] = {
    if (!cat.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Seq.empty
  }
}

case class DescribeGraftViewExec(cat: GraftCatalog, ident: Identifier,
                                 isExtended: Boolean,
                                 override val output: Seq[Attribute])
    extends V2CommandExec {
  override def children: Seq[SparkPlan] = Nil
  override protected def withNewChildrenInternal(
      c: IndexedSeq[SparkPlan]): SparkPlan = this
  override def run(): Seq[InternalRow] = {
    val v = cat.loadView(ident).asInstanceOf[GraftView]
    def row(a: String, b: String, c0: String) =
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(a), UTF8String.fromString(b),
          if (c0 == null) null else UTF8String.fromString(c0)))
    val cols = v.schema.fields.toSeq.map(f =>
      row(f.name, f.dataType.simpleString, null))
    if (!isExtended) cols
    else cols ++ Seq(
      row("", "", null),
      row("# Detailed View Information", "", null),
      row("View Text", v.query(), null),
      row("View Catalog and Namespace",
        (v.currentCatalog() +: v.currentNamespace().toSeq).mkString("."), null),
      row("View Query Output Columns",
        v.queryColumnNames().mkString("[", ", ", "]"), null),
      row("View Schema Mode",
        Option(v.properties().get(GraftViewModes.ModeKey))
          .getOrElse(GraftViewModes.Evolution), null))
  }
}

case class ShowGraftViewsExec(cat: GraftCatalog, ns: Seq[String],
                              pattern: Option[String],
                              override val output: Seq[Attribute])
    extends V2CommandExec {
  override def children: Seq[SparkPlan] = Nil
  override protected def withNewChildrenInternal(
      c: IndexedSeq[SparkPlan]): SparkPlan = this
  override def run(): Seq[InternalRow] = {
    val names = cat.listViews(ns: _*).map(_.name).toSeq.sorted
    val kept = pattern match {
      case Some(p) => names.filter(n =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(n), p).nonEmpty)
      case None => names
    }
    kept.map(n => new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(Array[Any](
        UTF8String.fromString(ns.mkString(".")),
        UTF8String.fromString(n), false)))
  }
}
