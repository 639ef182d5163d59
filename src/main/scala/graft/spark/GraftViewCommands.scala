package graft.spark

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView, ViewAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}
import scala.jdk.CollectionConverters._

/** SQL wiring for V2 views (reference: datafusion's SQL planner
  * serving CREATE/DROP VIEW through its Catalog —
  * datafusion_iceberg/src/table.rs:1147). Spark 4.1 defines the
  * ViewCatalog SPI but ships no analyzer/planner support: its
  * ResolveSessionCatalog throws missingCatalogViewsAbilityError the
  * moment it sees a view command on a non-session catalog — BEFORE
  * any injected resolution rule can run (injected rules sit after it
  * in the same fixed-point batch). So view DDL is intercepted one
  * level earlier, at the PARSER: GraftSqlParser rewrites view
  * commands whose identifier lands in a GraftTableCatalog into
  * runnable commands against the ViewCatalog SPI, and leaves every
  * other statement to the delegate parser untouched. View READS
  * (`SELECT ... FROM cat.db.v`) are inlined by the GraftViewRead
  * resolution rule — nothing throws on an UnresolvedRelation, so a
  * rule is safe there. */
object GraftViewCommands {

  /** Resolve name parts to (graft catalog, identifier) — None when the
    * target isn't a GraftTableCatalog (leave the plan to Spark). */
  def resolveGraft(session: SparkSession, parts: Seq[String])
      : Option[(GraftTableCatalog, Identifier)] = {
    if (parts.isEmpty) return None
    val cm = session.sessionState.catalogManager
    // Spark's name resolution: a single-part name is relative to the
    // current namespace; a multi-part name is ABSOLUTE within its
    // catalog (explicit head catalog, else the current one)
    val (plugin, ident) = parts match {
      case Seq(single) =>
        (cm.currentCatalog, Identifier.of(cm.currentNamespace, single))
      case head +: rest if cm.isCatalogRegistered(head) =>
        (cm.catalog(head), Identifier.of(rest.init.toArray, rest.last))
      case _ =>
        (cm.currentCatalog, Identifier.of(parts.init.toArray, parts.last))
    }
    plugin match {
      case g: GraftTableCatalog => Some((g, ident))
      case _ => None
    }
  }

  /** True when the name refers to a session temp view — those always
    * win over catalog views, like Spark's own resolution order. */
  def isTempView(session: SparkSession, parts: Seq[String]): Boolean =
    session.sessionState.catalog.isTempView(parts)

  private def q(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Canonical stored SQL: user column aliases fold into the text so
    * the read path replays one self-contained statement. */
  def aliasedSql(queryText: String, outNames: Seq[String],
      aliases: Seq[String]): String = {
    require(outNames.distinct.size == outNames.size,
      "CREATE VIEW with a column list requires distinct query output " +
        s"names; got ${outNames.mkString(", ")}")
    val sel = outNames.zip(aliases)
      .map { case (o, a) => s"${q(o)} AS ${q(a)}" }.mkString(", ")
    s"SELECT $sel FROM ($queryText) AS graft_view_body"
  }
}

/** Delegating parser that rewrites view DDL aimed at graft catalogs.
  * Everything else — including every non-view statement and every
  * view statement on the session catalog or a temp view — parses
  * through the delegate unchanged. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  import GraftViewCommands._

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftMatViewSql.parse(session, delegate, sqlText)
      .getOrElse(rewrite(delegate.parsePlan(sqlText)))

  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext)
      : LogicalPlan =
    GraftMatViewSql.parse(session, delegate, sqlText)
      .getOrElse(rewrite(delegate.parsePlanWithParameters(sqlText, ctx)))

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case c: CreateView => c.child match {
      case UnresolvedIdentifier(parts, _) =>
        resolveGraft(session, parts) match {
          case Some((cat, ident)) =>
            CreateGraftViewCommand(cat, ident,
              c.originalText.getOrElse(throw new IllegalArgumentException(
                "CREATE VIEW without original SQL text")),
              c.userSpecifiedColumns, c.comment, c.properties,
              c.allowExisting, c.replace)
          case None => c
        }
      case _ => c
    }
    case d @ DropView(UnresolvedIdentifier(parts, _), ifExists)
        if !isTempView(session, parts) =>
      resolveGraft(session, parts) match {
        case Some((cat, ident)) => DropGraftViewCommand(cat, ident, ifExists)
        case None => d
      }
    case s @ ShowViews(child, pattern, output) =>
      // bare `SHOW VIEWS` parses to CurrentNamespace, `SHOW VIEWS IN
      // ns` to UnresolvedNamespace — both resolve here so neither
      // shape reaches ResolveSessionCatalog's v2-catalog throw
      val target = child match {
        case UnresolvedNamespace(parts, _) if parts.nonEmpty =>
          resolveGraftNamespace(parts)
        case UnresolvedNamespace(_, _) |
            org.apache.spark.sql.catalyst.analysis.CurrentNamespace =>
          session.sessionState.catalogManager.currentCatalog match {
            case g: GraftTableCatalog =>
              Some((g,
                session.sessionState.catalogManager.currentNamespace.toSeq))
            case _ => None
          }
        case _ => None
      }
      target match {
        case Some((cat, ns)) => ShowGraftViewsCommand(cat, ns, pattern, output)
        case None => s
      }
    case a @ AlterViewAs(UnresolvedView(parts, _, _, _), originalText, _)
        if !isTempView(session, parts) =>
      resolveGraft(session, parts) match {
        case Some((cat, ident)) =>
          AlterGraftViewAsCommand(cat, ident, originalText)
        case None => a
      }
    case p @ SetViewProperties(UnresolvedView(parts, _, _, _), props)
        if !isTempView(session, parts) =>
      resolveGraft(session, parts) match {
        case Some((cat, ident)) =>
          AlterGraftViewPropsCommand(cat, ident, props, Seq.empty)
        case None => p
      }
    case p @ UnsetViewProperties(UnresolvedView(parts, _, _, _), keys, _)
        if !isTempView(session, parts) =>
      resolveGraft(session, parts) match {
        case Some((cat, ident)) =>
          AlterGraftViewPropsCommand(cat, ident, Map.empty, keys)
        case None => p
      }
    case d @ DescribeRelation(UnresolvedTableOrView(parts, _, _),
        partitionSpec, isExtended, output)
        if partitionSpec.isEmpty && !isTempView(session, parts) =>
      resolveGraft(session, parts) match {
        // only rewrite when the identifier IS a view — DESCRIBE on
        // tables keeps Spark's native path
        case Some((cat, ident)) if cat.viewExists(ident) =>
          DescribeGraftViewCommand(cat, ident, isExtended, output)
        case _ => d
      }
    case r @ RenameTable(UnresolvedTableOrView(parts, _, _), newName, true)
        if !isTempView(session, parts) =>
      resolveGraft(session, parts) match {
        case Some((cat, ident)) =>
          val newIdent = resolveGraft(session, newName) match {
            case Some((cat2, ni)) =>
              require(cat2 eq cat,
                "RENAME cannot move a view across catalogs")
              ni
            case None => Identifier.of(ident.namespace(), newName.last)
          }
          RenameGraftViewCommand(cat, ident, newIdent)
        case None => r
      }
    case other => other
  }

  private def resolveGraftNamespace(parts: Seq[String])
      : Option[(GraftTableCatalog, Seq[String])] = {
    val cm = session.sessionState.catalogManager
    val (plugin, ns) =
      if (cm.isCatalogRegistered(parts.head))
        (cm.catalog(parts.head), parts.tail)
      else (cm.currentCatalog, parts)
    plugin match {
      case g: GraftTableCatalog => Some((g, ns))
      case _ => None
    }
  }

  // ---- pure delegation ------------------------------------------------
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

case class CreateGraftViewCommand(catalog: GraftTableCatalog,
    ident: Identifier, queryText: String,
    userColumns: Seq[(String, Option[String])], comment: Option[String],
    properties: Map[String, String], allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {
  import GraftViewCommands._
  import org.apache.spark.sql.connector.catalog.{ViewCatalog, ViewInfo}

  override def run(session: SparkSession): Seq[Row] = {
    val analyzed = session.sessionState
      .executePlan(session.sessionState.sqlParser.parseQuery(queryText))
      .analyzed
    val outNames = analyzed.schema.fieldNames.toSeq
    val (sql, schema, aliases, comments) =
      if (userColumns.isEmpty)
        (queryText, analyzed.schema, Array.empty[String], Array.empty[String])
      else {
        require(userColumns.length == outNames.length,
          s"view column list has ${userColumns.length} names but the " +
            s"query produces ${outNames.length} columns")
        val renamed = StructType(analyzed.schema.fields
          .zip(userColumns).map { case (f, (a, _)) => f.copy(name = a) })
        (aliasedSql(queryText, outNames, userColumns.map(_._1)), renamed,
          userColumns.map(_._1).toArray,
          userColumns.map(_._2.orNull).toArray)
      }
    val cm = session.sessionState.catalogManager
    val props = properties ++
      comment.map(ViewCatalog.PROP_COMMENT -> _) +
      (GraftViewSupport.OriginalTextKey -> queryText)
    val info = new ViewInfo(ident, sql, cm.currentCatalog.name(),
      cm.currentNamespace, schema, outNames.toArray, aliases, comments,
      props.asJava)
    if (replace) catalog.replaceView(info, true)
    else if (catalog.viewExists(ident)) {
      if (!allowExisting) throw new ViewAlreadyExistsException(ident)
    } else catalog.createView(info)
    Seq.empty
  }
}

case class DropGraftViewCommand(catalog: GraftTableCatalog,
    ident: Identifier, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (!catalog.dropView(ident) && !ifExists)
      throw new NoSuchViewException(ident)
    Seq.empty
  }
}

case class ShowGraftViewsCommand(catalog: GraftTableCatalog,
    namespace: Seq[String], pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val names = catalog.listViews(namespace: _*).map(_.name()).toSeq
    val kept = pattern match {
      case Some(p) =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(names, p)
      case None => names
    }
    kept.sorted.map(n => Row(namespace.mkString("."), n, false))
  }
}

case class AlterGraftViewAsCommand(catalog: GraftTableCatalog,
    ident: Identifier, queryText: String) extends LeafRunnableCommand {
  import org.apache.spark.sql.connector.catalog.ViewInfo

  override def run(session: SparkSession): Seq[Row] = {
    val (cur, _, _) = catalog.loadViewState(ident)
      .getOrElse(throw new NoSuchViewException(ident))
    val analyzed = session.sessionState
      .executePlan(session.sessionState.sqlParser.parseQuery(queryText))
      .analyzed
    val cm = session.sessionState.catalogManager
    val userProps = cur.properties -- GraftViewSupport.InternalKeys
    val info = new ViewInfo(ident, queryText, cm.currentCatalog.name(),
      cm.currentNamespace, analyzed.schema,
      analyzed.schema.fieldNames, Array.empty, Array.empty,
      (userProps + (GraftViewSupport.OriginalTextKey -> queryText)).asJava)
    catalog.replaceView(info, false)
    Seq.empty
  }
}

case class AlterGraftViewPropsCommand(catalog: GraftTableCatalog,
    ident: Identifier, set: Map[String, String], remove: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.connector.catalog.ViewChange

  override def run(session: SparkSession): Seq[Row] = {
    val internal = (set.keySet ++ remove)
      .intersect(GraftViewSupport.InternalKeys)
    require(internal.isEmpty,
      s"reserved view properties: ${internal.mkString(", ")}")
    val changes: Seq[ViewChange] =
      set.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) } ++
        remove.map(ViewChange.removeProperty)
    catalog.alterView(ident, changes: _*)
    Seq.empty
  }
}

case class RenameGraftViewCommand(catalog: GraftTableCatalog,
    from: Identifier, to: Identifier) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    catalog.renameView(from, to)
    Seq.empty
  }
}

/** DESCRIBE [EXTENDED] on a catalog view: columns from the stored
  * schema; EXTENDED appends the view text, catalog context, and
  * user properties (the session-catalog DESCRIBE VIEW shape). */
case class DescribeGraftViewCommand(catalog: GraftTableCatalog,
    ident: Identifier, isExtended: Boolean,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val v = catalog.loadView(ident)
    val cols = v.schema().fields.toSeq.map(f =>
      Row(f.name, f.dataType.simpleString, f.getComment().orNull))
    if (!isExtended) cols
    else {
      val props = v.properties()
      cols ++ Seq(
        Row("", "", ""),
        Row("# View Information", "", ""),
        Row("Name", ident.toString, ""),
        Row("Text", v.query(), ""),
        Row("Default Catalog", Option(v.currentCatalog()).getOrElse(""), ""),
        Row("Default Namespace", v.currentNamespace().mkString("."), ""),
        Row("Properties",
          props.asScala.toSeq.sortBy(_._1)
            .map { case (k, x) => s"$k=$x" }.mkString("[", ", ", "]"), ""))
    }
  }
}

/** Inlines reads of graft catalog views: an UnresolvedRelation whose
  * identifier is a (non-materialized) view in a GraftTableCatalog
  * becomes the parsed view SQL, with relations inside the body
  * qualified against the view's stored context (current catalog +
  * namespace at creation) and nested graft views expanded recursively
  * up to a fixed depth. Materialized views are NOT inlined — their
  * identifier falls through to loadTable, which serves the storage
  * table (reads cost O(materialization), the point of an MV). */
case class GraftViewRead(session: SparkSession) extends Rule[LogicalPlan] {
  import GraftViewCommands._

  private val MaxDepth = 10

  // subquery-expression plans need no special casing here: the
  // analyzer's ResolveSubquery re-runs the whole Resolution batch
  // (including this rule) on each inner plan
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u @ UnresolvedRelation(parts, _, false) =>
        expand(parts, 0).getOrElse(u)
    }

  private def expand(parts: Seq[String], depth: Int): Option[LogicalPlan] = {
    if (isTempView(session, parts)) return None
    for {
      (cat, ident) <- resolveGraft(session, parts)
      (d, _, materialized) <- cat.loadViewState(ident) if !materialized
    } yield {
      if (depth >= MaxDepth)
        throw new IllegalStateException(
          s"view nesting deeper than $MaxDepth at ${parts.mkString(".")}" +
            " (recursive view definitions?)")
      val sql = d.sqlFor("spark").getOrElse(d.sql)
      val parsed = session.sessionState.sqlParser.parseQuery(sql)
      val ctxCat = d.properties.get(GraftViewSupport.CurrentCatalogKey)
      val ctxNs = d.properties.get(GraftViewSupport.CurrentNamespaceKey)
        .map(GraftViewSupport.decodeList).getOrElse(Seq.empty)
      // the view body is freshly parsed (not yet analyzed), so the
      // plain transform family applies; WithSubqueries reaches
      // relations inside EXISTS/IN/scalar subquery expressions too
      val qualified = parsed.transformUpWithSubqueries {
        case ur @ UnresolvedRelation(nparts, _, false) =>
          val full = qualify(nparts, ctxCat, ctxNs)
          expand(full, depth + 1)
            .getOrElse(
              if (full == nparts) ur
              else ur.copy(multipartIdentifier = full))
      }
      SubqueryAlias(parts.last, qualified)
    }
  }

  /** Qualify a relation inside a view body against the view's stored
    * creation context, mirroring how Spark resolves the same name in
    * a session-catalog view. Temp views and already-catalog-qualified
    * names stay as written. */
  private def qualify(parts: Seq[String], ctxCat: Option[String],
      ctxNs: Seq[String]): Seq[String] = {
    val cm = session.sessionState.catalogManager
    if (ctxCat.isEmpty) parts
    else if (parts.length > 1 && cm.isCatalogRegistered(parts.head)) parts
    else if (isTempView(session, parts)) parts
    else if (parts.length == 1) ctxCat.get +: ctxNs :+ parts.head
    else ctxCat.get +: parts
  }
}

/** MATERIALIZED VIEW DDL. Spark's grammar has no MATERIALIZED VIEW
  * statement at all (the delegate parser throws before any plan
  * exists), so these are recognized from the raw SQL text ahead of
  * delegation — the same one-level-earlier interception the view DDL
  * uses, one step earlier still. Reference: the SQL layer creating
  * MVs as first-class statements over catalog-object MVs
  * (datafusion_iceberg/src/materialized_view.rs; the catalog's
  * create_materialized_view, catalog.rs:387).
  *
  * Grammar (identifiers resolve against graft catalogs only):
  *   CREATE MATERIALIZED VIEW [IF NOT EXISTS] ident
  *     [TBLPROPERTIES('k'='v', ...)] AS query
  *   DROP MATERIALIZED VIEW [IF EXISTS] ident
  *   REFRESH MATERIALIZED VIEW ident [FULL | AUTO | INCREMENTAL]
  *
  * The refresh-lineage source set is DERIVED from the analyzed query
  * (every same-catalog table it reads) instead of asking the user to
  * list it; TBLPROPERTIES('incremental_fold'='...') opts into
  * incremental refresh exactly as the CALL surface's fourth argument
  * does. The CALL procedures remain for compatibility. */
object GraftMatViewSql {
  import GraftViewCommands.resolveGraft

  private val Create =
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?([^\s(]+)\s+(.*?)\s*;?\s*$""".r
  private val Drop =
    """(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?([^\s(]+)\s*;?\s*$""".r
  private val Refresh =
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([^\s(]+)(\s+\w+)?\s*;?\s*$""".r

  def parse(session: SparkSession, delegate: ParserInterface,
      sqlText: String): Option[LogicalPlan] = sqlText match {
    case Create(ine, identTok, rest) =>
      val (cat, ident) = resolve(session, delegate, identTok,
        "CREATE MATERIALIZED VIEW")
      val (props, query) = splitPropsAndQuery(rest)
      Some(CreateGraftMatViewCommand(cat, ident, query,
        ifNotExists = ine != null, props))
    case Drop(ifex, identTok) =>
      val (cat, ident) = resolve(session, delegate, identTok,
        "DROP MATERIALIZED VIEW")
      Some(DropGraftMatViewCommand(cat, ident, ifExists = ifex != null))
    case Refresh(identTok, mode) =>
      val (cat, ident) = resolve(session, delegate, identTok,
        "REFRESH MATERIALIZED VIEW")
      Some(RefreshGraftMatViewCommand(cat, ident,
        Option(mode).map(_.trim.toLowerCase(java.util.Locale.ROOT))
          .getOrElse("auto")))
    case _ => None
  }

  private def resolve(session: SparkSession, delegate: ParserInterface,
      identTok: String, stmt: String): (GraftTableCatalog, Identifier) =
    resolveGraft(session, delegate.parseMultipartIdentifier(identTok))
      .getOrElse(throw new IllegalArgumentException(
        s"$stmt: '$identTok' does not resolve to a graft catalog " +
          "(materialized views are catalog objects; qualify the name " +
          "with a graft catalog or USE one)"))

  /** Split `[TBLPROPERTIES(<pairs>)] AS <query>` — the pairs scan is
    * balanced-paren and quote-aware, because a property value (an
    * incremental_fold SQL) freely contains parens, commas, and AS. */
  private def splitPropsAndQuery(rest: String): (Map[String, String], String) = {
    val TblProps = """(?is)^\s*TBLPROPERTIES\s*\((.*)$""".r
    val AsQuery = """(?is)^\s*AS\s+(.*)$""".r
    rest match {
      case TblProps(tail) =>
        val (inside, after) = scanBalanced(tail)
        after match {
          case AsQuery(q) => (parsePairs(inside), q)
          case other => throw new IllegalArgumentException(
            "CREATE MATERIALIZED VIEW: expected AS <query> after " +
              s"TBLPROPERTIES, got: ${other.take(40)}")
        }
      case AsQuery(q) => (Map.empty, q)
      case other => throw new IllegalArgumentException(
        "CREATE MATERIALIZED VIEW: expected [TBLPROPERTIES(...)] AS " +
          s"<query>, got: ${other.take(40)}")
    }
  }

  /** Consume up to the ')' balancing an already-open paren, honoring
    * single-quoted strings ('' = escaped quote). Returns (inside,
    * remainder-after-close). */
  private def scanBalanced(s: String): (String, String) = {
    var depth = 1
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) {
        if (c == '\'')
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1
          else inQuote = false
      } else c match {
        case '\'' => inQuote = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return (s.substring(0, i), s.substring(i + 1))
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(
      "CREATE MATERIALIZED VIEW: unbalanced TBLPROPERTIES parentheses")
  }

  private val Pair = """(?s)^\s*'(.*?)'\s*=\s*'(.*)'\s*$""".r

  private def parsePairs(s: String): Map[String, String] =
    GraftProcedures.splitTopLevel(s).map {
      case Pair(k, v) => k -> v.replace("''", "'")
      case other => throw new IllegalArgumentException(
        s"TBLPROPERTIES entry must be 'key'='value'; got: $other")
    }.toMap
}

case class CreateGraftMatViewCommand(catalog: GraftTableCatalog,
    ident: Identifier, queryText: String, ifNotExists: Boolean,
    properties: Map[String, String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (catalog.viewExists(ident)) {
      if (ifNotExists) return Seq.empty
      throw new ViewAlreadyExistsException(ident)
    }
    val parts = ident.namespace().toSeq :+ ident.name()
    val (sources, schema) =
      GraftMatViews.analyzeQuery(session, catalog, queryText)
    require(sources.nonEmpty,
      s"CREATE MATERIALIZED VIEW ${parts.mkString(".")}: the query " +
        "reads no table of this catalog, so refresh lineage cannot " +
        "anchor (materialize a query over at least one catalog table)")
    GraftMatViews.create(session, catalog.warehouse, catalog.restBase,
      parts, queryText, sources, properties.get("incremental_fold"),
      knownSchema = Some(schema))
    Seq.empty
  }
}

case class DropGraftMatViewCommand(catalog: GraftTableCatalog,
    ident: Identifier, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    catalog.loadViewState(ident) match {
      case Some((_, _, materialized)) =>
        require(materialized,
          s"$ident is a plain view; use DROP VIEW")
        catalog.dropView(ident)
      case None if ifExists => ()
      case None => throw new NoSuchViewException(ident)
    }
    Seq.empty
  }
}

case class RefreshGraftMatViewCommand(catalog: GraftTableCatalog,
    ident: Identifier, mode: String) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{LongType, StringType}

  override val output: Seq[Attribute] = Seq(
    AttributeReference("mode", StringType, nullable = false)(),
    AttributeReference("row_count", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val parts = ident.namespace().toSeq :+ ident.name()
    val root = GraftMatViews.mvRoot(catalog.warehouse, catalog.restBase,
      parts)
    val (effective, n) = GraftMatViews.refresh(session,
      catalog.warehouse, catalog.restBase, root, mode)
    Seq(Row(effective, n))
  }
}
