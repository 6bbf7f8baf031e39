/* Shim-packaged like the rest of the connector: view DDL rides
 * Catalyst's parsed v2 plans (CreateView/DropView/ShowViews/...), which
 * Spark 4.1 PARSES for any catalog but only EXECUTES for the session
 * catalog — `ResolveSessionCatalog` throws MISSING_CATALOG_ABILITY for
 * everything else before injected resolution rules run. The supported
 * seam out (the one Iceberg's own Spark extensions ride) is rewriting
 * the parsed plan BEFORE analysis; this module does that at the parser
 * boundary, then executes through the public
 * [[org.apache.spark.sql.connector.catalog.ViewCatalog]] API that
 * [[GraftCatalog]] implements over the Iceberg VIEW SPEC metadata. */
package org.apache.spark.sql.graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{
  UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedView}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** Shared identifier arithmetic for the view seams. */
private[graft] object GraftViewResolution {
  /** The (catalog, identifier) a multipart name targets, when — and
    * only when — that catalog is a [[GraftCatalog]]: explicit
    * `cat.ns...name` prefix, or an unqualified name under a current
    * graft catalog. Anything else (session catalog, temp views) is
    * left for Spark's own resolution. */
  def target(session: SparkSession, parts: Seq[String]): Option[(GraftCatalog, Identifier)] = {
    val cm = session.sessionState.catalogManager
    def graftCat(name: String): Option[GraftCatalog] =
      try cm.catalog(name) match {
        case g: GraftCatalog => Some(g)
        case _ => None
      } catch { case _: Exception => None }
    def current: Option[GraftCatalog] = cm.currentCatalog match {
      case g: GraftCatalog => Some(g)
      case _ => None
    }
    if (parts.length >= 2)
      graftCat(parts.head).map(g =>
        g -> Identifier.of(parts.tail.init.toArray, parts.last))
        // `USE graft; ... db.v`: a namespace-qualified name under a
        // current graft catalog
        .orElse(current.map(g => g -> Identifier.of(parts.init.toArray, parts.last)))
    else current.filter(_ => parts.nonEmpty)
      .map(g => g -> Identifier.of(cm.currentNamespace, parts.last))
  }

  def viewTarget(session: SparkSession, parts: Seq[String]): Option[(GraftCatalog, Identifier)] =
    target(session, parts).filter { case (c, i) => c.viewExists(i) }

  def fullName(cat: GraftCatalog, ident: Identifier): String =
    (cat.name() +: ident.namespace.toSeq :+ ident.name).mkString(".")
}

/** Parser wrapper ([[GraftSparkExtensions]]' `injectParser`): delegates
  * everything, then rewrites parsed VIEW DDL plans that target a
  * [[GraftCatalog]] into the runnable commands below. Runs before any
  * analyzer rule, so `ResolveSessionCatalog`'s session-catalog-only
  * gate never sees them. */
class GraftViewParser(session: SparkSession, delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))

  /** MUST delegate (not inherit): the interface default parses WITHOUT
    * the [[ParameterContext]], which leaves `?`/`:name` markers in a
    * parameterized statement (EXECUTE IMMEDIATE ... USING, `sql(...,
    * args)`) unbound — the real parser threads the context through the
    * parse. */
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    rewrite(delegate.parsePlanWithParameters(sqlText, ctx))

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case cv @ CreateView(UnresolvedIdentifier(parts, _), userCols, comment, _, props,
        originalText, query, allowExisting, replace, _) =>
      GraftViewResolution.target(session, parts).map { case (cat, ident) =>
        GraftCreateViewCommand(cat, ident, userCols.map(_._1),
          originalText.getOrElse(throw new IllegalArgumentException(
            "GraftCatalog: CREATE VIEW requires the SQL text (AS <query>)")),
          query, comment, props, allowExisting = allowExisting, replace = replace)
      }.getOrElse(cv)
    case dv @ DropView(child, ifExists) =>
      val parts = child match {
        case UnresolvedIdentifier(p, _) => Some(p)
        case u: UnresolvedView => Some(u.multipartIdentifier)
        case _ => None
      }
      parts.flatMap(GraftViewResolution.target(session, _)).map { case (cat, ident) =>
        GraftDropViewCommand(cat, ident, ifExists)
      }.getOrElse(dv)
    case sv @ ShowViews(UnresolvedNamespace(parts, _), pattern, output) =>
      namespaceTarget(parts).map { case (cat, ns) =>
        GraftShowViewsCommand(cat, ns, pattern, output)
      }.getOrElse(sv)
    case sp @ SetViewProperties(child, props) =>
      viewChild(child).map { case (cat, ident) =>
        GraftAlterViewPropsCommand(cat, ident, props, Nil)
      }.getOrElse(sp)
    case up @ UnsetViewProperties(child, keys, _) =>
      viewChild(child).map { case (cat, ident) =>
        GraftAlterViewPropsCommand(cat, ident, Map.empty, keys)
      }.getOrElse(up)
    case rt @ RenameTable(child, newName, true) =>
      viewChild(child).map { case (cat, ident) =>
        GraftRenameViewCommand(cat, ident, newName)
      }.getOrElse(rt)
    case dr @ DescribeRelation(child, _, isExtended, output) =>
      viewChild(child).map { case (cat, ident) =>
        GraftDescribeViewCommand(cat, ident, isExtended, output)
      }.getOrElse(dr)
    case sct @ ShowCreateTable(child, _, output) =>
      viewChild(child).map { case (cat, ident) =>
        GraftShowCreateViewCommand(cat, ident, output)
      }.getOrElse(sct)
    case av @ AlterViewAs(child, originalText, query) =>
      viewChild(child).map { case (cat, ident) =>
        // replace the SQL, keep the properties — a new view-version
        // under the same uuid, like CREATE OR REPLACE
        GraftCreateViewCommand(cat, ident, Nil, originalText, query,
          comment = None,
          props = cat.loadView(ident).properties().asScala.toMap,
          allowExisting = false, replace = true)
      }.getOrElse(av)
    case other => other
  }

  /** `SHOW VIEWS [IN ns]` namespace resolution against graft catalogs:
    * explicit `cat.ns` prefix, bare `ns` under a current graft catalog,
    * or no namespace at all (the current one). */
  private def namespaceTarget(parts: Seq[String]): Option[(GraftCatalog, Seq[String])] = {
    val cm = session.sessionState.catalogManager
    def graftCat(name: String): Option[GraftCatalog] =
      try cm.catalog(name) match {
        case g: GraftCatalog => Some(g)
        case _ => None
      } catch { case _: Exception => None }
    def current: Option[GraftCatalog] = cm.currentCatalog match {
      case g: GraftCatalog => Some(g)
      case _ => None
    }
    if (parts.isEmpty) current.map(_ -> cm.currentNamespace.toSeq)
    else graftCat(parts.head).map(_ -> parts.tail)
      .orElse(current.map(_ -> parts))
  }

  /** ALTER/RENAME arrive with an [[UnresolvedView]] child; rewrite only
    * when the name targets an EXISTING graft-catalog view, so session
    * temp views keep Spark's own resolution. */
  private def viewChild(child: LogicalPlan): Option[(GraftCatalog, Identifier)] = child match {
    case u: UnresolvedView => GraftViewResolution.viewTarget(session, u.multipartIdentifier)
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
      GraftViewResolution.viewTarget(session, u.multipartIdentifier)
    case UnresolvedIdentifier(p, _) => GraftViewResolution.viewTarget(session, p)
    case _ => None
  }

  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) = delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) = delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String) = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String) = delegate.parseRoutineParam(sqlText)
}

/** SELECT over a graft-catalog view: expand the CURRENT view version's
  * SQL in place (the Iceberg view model — late-binding SQL views), with
  * the view's recorded default-catalog/namespace qualifying any
  * relation the definer left unqualified, exactly as they saw it. CTE
  * names defined inside the view SQL are left alone. */
class GraftViewRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    // DML targets first (top-down, before the bottom-up expansion can
    // swallow the target relation): writing into a view is an error a
    // user should read as such, not an analyzer puzzle
    plan.foreachUp {
      case i: InsertIntoStatement => i.table match {
        case UnresolvedRelation(parts, _, _)
            if GraftViewResolution.viewTarget(session, parts).nonEmpty =>
          throw new UnsupportedOperationException(
            s"GraftCatalog: ${parts.mkString(".")} is a VIEW — inserts go to its " +
              "underlying tables")
        case _ => ()
      }
      case _ => ()
    }
    plan.resolveOperators {
      case u @ UnresolvedRelation(parts, _, false) =>
        GraftViewResolution.viewTarget(session, parts).map { case (cat, ident) =>
          expand(cat, ident)
        }.getOrElse(u)
    }
  }

  private def expand(cat: GraftCatalog, ident: Identifier): LogicalPlan = {
    val view = cat.loadView(ident)
    val selfName = GraftViewResolution.fullName(cat, ident)
    val parsed = session.sessionState.sqlParser.parsePlan(view.query)
    val cteNames: Set[String] = parsed.collect {
      case w: UnresolvedWith => w.cteRelations.map(_._1.toLowerCase)
    }.flatten.toSet
    val qualified = parsed transform {
      case r @ UnresolvedRelation(p, _, false)
          if !(p.length == 1 && cteNames(p.head.toLowerCase)) =>
        val full =
          if (p.length == 1) view.currentCatalog +: view.currentNamespace.toSeq :+ p.head
          else if (p.length == 2) view.currentCatalog +: p
          else p
        require(!GraftViewResolution.target(session, full).contains((cat, ident)),
          s"GraftCatalog: view $selfName references itself")
        if (p.length <= 2) r.copy(multipartIdentifier = full) else r
    }
    SubqueryAlias(ident.name, qualified)
  }
}

/** CREATE [OR REPLACE] VIEW — analyzes the defining query for the
  * schema, folds an explicit column list into the stored SQL as
  * aliases, and lands through [[ViewCatalog.createView]]/
  * [[ViewCatalog.replaceView]] (REPLACE appends an Iceberg
  * view-version; history stays time-travel-stable). */
final case class GraftCreateViewCommand(cat: GraftCatalog, ident: Identifier,
    userCols: Seq[String], originalText: String, query: LogicalPlan,
    comment: Option[String], props: Map[String, String],
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (allowExisting && cat.viewExists(ident)) return Nil
    val classic = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val analyzed = classic.sessionState.executePlan(query).analyzed
    val baseSchema = analyzed.schema
    val (sqlText, schema) =
      if (userCols.isEmpty) (originalText, baseSchema)
      else {
        require(userCols.size == baseSchema.size,
          s"GraftCatalog: CREATE VIEW column list has ${userCols.size} names for " +
            s"${baseSchema.size} query columns")
        val proj = baseSchema.fields.zip(userCols).map { case (f, a) =>
          s"`${f.name}` AS `$a`"
        }.mkString(", ")
        (s"SELECT $proj FROM ($originalText) __graft_view_base",
          StructType(baseSchema.fields.zip(userCols).map { case (f, a) => f.copy(name = a) }))
      }
    val cm = session.sessionState.catalogManager
    val info = new ViewInfo(ident, sqlText, cm.currentCatalog.name(), cm.currentNamespace,
      schema, Array.empty, Array.empty, Array.empty,
      (props ++ comment.map(ViewCatalog.PROP_COMMENT -> _)).asJava)
    if (replace) cat.replaceView(info, orCreate = true) else cat.createView(info)
    Nil
  }
}

final case class GraftDropViewCommand(cat: GraftCatalog, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val dropped = cat.dropView(ident)
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Nil
  }
}

final case class GraftShowViewsCommand(cat: GraftCatalog, namespace: Seq[String],
    pattern: Option[String],
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val names = cat.listViews(namespace: _*).map(_.name).toSeq.sorted
    val kept = pattern
      .map(p => org.apache.spark.sql.catalyst.util.StringUtils.filterPattern(names, p))
      .getOrElse(names)
    kept.map(n => Row(namespace.mkString("."), n, false))
  }
}

final case class GraftAlterViewPropsCommand(cat: GraftCatalog, ident: Identifier,
    set: Map[String, String], unset: Seq[String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val changes: Seq[ViewChange] =
      set.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) } ++
        unset.map(ViewChange.removeProperty)
    cat.alterView(ident, changes: _*)
    Nil
  }
}

final case class GraftRenameViewCommand(cat: GraftCatalog, ident: Identifier,
    newName: Seq[String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    cat.renameView(ident, Identifier.of(newName.init.toArray, newName.last))
    Nil
  }
}

/** `SHOW CREATE TABLE <view>` — re-renders the CURRENT view version as
  * its CREATE VIEW statement (column list from the recorded schema,
  * properties as TBLPROPERTIES). */
final case class GraftShowCreateViewCommand(cat: GraftCatalog, ident: Identifier,
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val view = cat.loadView(ident)
    val cols = view.schema().fields.map(f => s"`${f.name}`").mkString(", ")
    val props = view.properties().asScala.toSeq.sortBy(_._1)
    val propsClause =
      if (props.isEmpty) ""
      else props.map { case (k, v) => s"'$k' = '$v'" }
        .mkString("\nTBLPROPERTIES (", ", ", ")")
    Seq(Row(s"CREATE VIEW ${view.name()} ($cols)$propsClause\nAS ${view.query()}"))
  }
}

/** `DESCRIBE [EXTENDED] <view>` — the schema rows, and under EXTENDED
  * the view-catalog metadata section (type, SQL text, the definer's
  * default catalog/namespace, properties). */
final case class GraftDescribeViewCommand(cat: GraftCatalog, ident: Identifier,
    isExtended: Boolean,
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val view = cat.loadView(ident)
    val cols = view.schema().fields.toSeq.map(f =>
      Row(f.name, f.dataType.simpleString, null))
    if (!isExtended) cols
    else cols ++ Seq(
      Row("", "", ""),
      Row("# Detailed View Information", "", ""),
      Row("Type", "VIEW", ""),
      Row("View Text", view.query(), ""),
      Row("View Catalog", view.currentCatalog(), ""),
      Row("View Namespace", view.currentNamespace().mkString("."), "")) ++
      (if (view.properties().isEmpty) Nil
       else Seq(Row("View Properties",
         view.properties().asScala.toSeq.sortBy(_._1)
           .map { case (k, v) => s"$k=$v" }.mkString(", "), "")))
  }
}
