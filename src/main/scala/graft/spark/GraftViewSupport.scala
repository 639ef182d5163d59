package graft.spark

import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, ViewAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewCatalog, ViewChange, ViewInfo}
import org.apache.spark.sql.types.{DataType, StructType}
import graft.table.{Meta, TableIO, Views}
import scala.jdk.CollectionConverters._

/** Spark's V2 ViewCatalog over the graft view machinery — the
  * reference's catalog-served views (iceberg-rust/src/view,
  * datafusion_iceberg/src/table.rs:1147 test_datafusion_view_scan)
  * on Spark's native SPI. Two backends, mirroring tables:
  *
  *  - warehouse mode: a view is a directory at the conventional path
  *    holding versioned view.json files (table/Views.scala), CAS on
  *    the version chain;
  *  - uri mode: every view operation rides the REST view protocol
  *    (create_view / load_view / replace_view / drop_view /
  *    rename_view), CAS on the server.
  *
  * Spark 4.1 ships the ViewCatalog SPI with no analyzer wiring, so
  * the SQL surface (CREATE/SHOW/DROP VIEW, ALTER VIEW) is wired by
  * GraftExtensions (see GraftViewCommands.scala); this trait is the
  * storage contract both modes share.
  *
  * Spark-specific view context (the defaults the stored SQL resolves
  * against, plus the captured schema) is carried in view PROPERTIES
  * under graft.view.* keys — the same trick Iceberg's engine
  * integrations use for spark.query-column-names et al. */
trait GraftViewSupport extends ViewCatalog { self: GraftTableCatalog =>
  import GraftViewSupport._
  import graft.table.iceberg.IcebergRestClient

  private def whRoot(ident: Identifier): String =
    (warehouse +: ident.namespace().toSeq :+ ident.name()).mkString("/")

  /** The view definition, current version, and whether it is
    * materialized — None when no view exists at the identifier. */
  private[spark] def loadViewState(ident: Identifier)
      : Option[(Views.ViewDef, Int, Boolean)] = restBase match {
    case Some(base) =>
      IcebergRestClient.loadViewDef(base, restNs(ident.namespace()),
        ident.name())
    case None =>
      val root = whRoot(ident)
      if (!Views.viewExists(root)) None
      else {
        val (d, v) = Views.loadViewVersioned(root)
        Some((d, v, Views.mvExists(root)))
      }
  }

  override def listViews(namespace: String*): Array[Identifier] =
    restBase match {
      case Some(base) =>
        IcebergRestClient.listViews(base, restNs(namespace.toArray))
          .map(v => Identifier.of(namespace.toArray, v)).toArray
      case None =>
        val dir = TableIO.path((warehouse +: namespace).mkString("/"))
        if (!TableIO.isDirectory(dir)) Array.empty
        else TableIO.listDir(dir).map(_.getPath).iterator
          .filter(p => Views.viewExists(p.toString))
          .map(p => Identifier.of(namespace.toArray, p.getName))
          .toArray
    }

  override def viewExists(ident: Identifier): Boolean = restBase match {
    case Some(base) =>
      IcebergRestClient.viewExists(base, restNs(ident.namespace()),
        ident.name())
    case None => Views.viewExists(whRoot(ident))
  }

  override def loadView(ident: Identifier): View =
    loadViewState(ident)
      .map { case (d, _, _) => GraftV2View(ident.name(), d) }
      .getOrElse(throw new NoSuchViewException(ident))

  override def createView(info: ViewInfo): View = {
    val d = defFromInfo(info,
      uuid = java.util.UUID.randomUUID().toString)
    restBase match {
      case Some(base) =>
        val code = IcebergRestClient.createViewStatus(base,
          restNs(info.ident.namespace()), info.ident.name(),
          d.sql, properties = d.properties)
        if (code == 409) throw new ViewAlreadyExistsException(info.ident)
        require(code == 200, s"createView -> $code")
      case None =>
        val root = whRoot(info.ident)
        // a view must not shadow a table at the same identifier
        if (Meta.exists(root) ||
            graft.table.iceberg.IcebergTable.exists(root))
          throw new ViewAlreadyExistsException(info.ident)
        if (Views.viewExists(root) || !Views.commitViewAt(root, d, 0))
          throw new ViewAlreadyExistsException(info.ident)
    }
    GraftV2View(info.ident.name(), d)
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    loadViewState(info.ident) match {
      case None =>
        if (!orCreate) throw new NoSuchViewException(info.ident)
        createView(info)
      case Some((cur, curVersion, _)) =>
        val d = defFromInfo(info, uuid = cur.viewUuid)
          .copy(location = cur.location)
        restBase match {
          case Some(base) =>
            val code = IcebergRestClient.replaceView(base,
              restNs(info.ident.namespace()), info.ident.name(),
              d.sql, curVersion, properties = Some(d.properties))
            if (code == 409) throw new Meta.CommitConflict(curVersion + 1)
            require(code == 200, s"replaceView -> $code")
          case None =>
            if (!Views.commitViewAt(whRoot(info.ident), d, curVersion))
              throw new Meta.CommitConflict(curVersion + 1)
        }
        GraftV2View(info.ident.name(), d)
    }
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val (cur, curVersion, _) = loadViewState(ident)
      .getOrElse(throw new NoSuchViewException(ident))
    val (sets, removes) = changes.foldLeft(
        (Map.empty[String, String], Seq.empty[String])) {
      case ((s, r), p: ViewChange.SetProperty) =>
        (s + (p.property() -> p.value()), r)
      case ((s, r), p: ViewChange.RemoveProperty) => (s, r :+ p.property())
      case (_, other) =>
        throw new UnsupportedOperationException(s"view change $other")
    }
    restBase match {
      case Some(base) =>
        val code = IcebergRestClient.commitView(base,
          restNs(ident.namespace()), ident.name(),
          assertUuid = Some(cur.viewUuid),
          setProperties = sets, removeProperties = removes)
        require(code == 200, s"alterView -> $code")
      case None =>
        val next = cur.copy(properties = cur.properties ++ sets -- removes)
        if (!Views.commitViewAt(whRoot(ident), next, curVersion))
          throw new Meta.CommitConflict(curVersion + 1)
    }
    loadView(ident)
  }

  override def dropView(ident: Identifier): Boolean = restBase match {
    case Some(base) =>
      val ns = restNs(ident.namespace())
      if (!IcebergRestClient.viewExists(base, ns, ident.name())) false
      else { IcebergRestClient.dropView(base, ns, ident.name()); true }
    case None =>
      val root = whRoot(ident)
      if (!Views.viewExists(root)) false
      else TableIO.delete(TableIO.path(root), recursive = true)
  }

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit =
    restBase match {
      case Some(base) =>
        IcebergRestClient.renameView(base, restNs(oldIdent.namespace()),
          oldIdent.name(), newIdent.name(),
          toNs = restNs(newIdent.namespace()))
      case None =>
        val src = whRoot(oldIdent)
        if (!Views.viewExists(src)) throw new NoSuchViewException(oldIdent)
        val dst = whRoot(newIdent)
        if (Views.viewExists(dst) || Meta.exists(dst) ||
            graft.table.iceberg.IcebergTable.exists(dst))
          throw new ViewAlreadyExistsException(newIdent)
        TableIO.rename(TableIO.path(src), TableIO.path(dst))
    }
}

object GraftViewSupport {
  /** Spark view context parked in view properties (internal keys,
    * stripped from the user-visible property map). */
  val CurrentCatalogKey = "graft.view.current-catalog"
  val CurrentNamespaceKey = "graft.view.current-namespace"
  val SchemaKey = "graft.view.schema"
  val QueryColumnNamesKey = "graft.view.query-column-names"
  val ColumnAliasesKey = "graft.view.column-aliases"
  val ColumnCommentsKey = "graft.view.column-comments"
  val OriginalTextKey = "graft.view.original-text"
  val InternalKeys: Set[String] = Set(CurrentCatalogKey, CurrentNamespaceKey,
    SchemaKey, QueryColumnNamesKey, ColumnAliasesKey, ColumnCommentsKey,
    OriginalTextKey)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** JSON string-array codec for list-valued context properties —
    * names may contain any character, so no ad-hoc separators. */
  def encodeList(xs: Seq[String]): String = {
    val a = mapper.createArrayNode()
    xs.foreach(x => if (x == null) a.addNull() else a.add(x))
    mapper.writeValueAsString(a)
  }

  def decodeList(s: String): Seq[String] =
    mapper.readTree(s).elements().asScala
      .map(n => if (n.isNull) null else n.asText()).toSeq

  def defFromInfo(info: ViewInfo, uuid: String): Views.ViewDef = {
    def arr(a: Array[String]): Seq[String] =
      Option(a).map(_.toSeq).getOrElse(Seq.empty)
    val props = Option(info.properties)
      .map(_.asScala.toMap).getOrElse(Map.empty) ++
      Map(
        CurrentCatalogKey -> info.currentCatalog,
        CurrentNamespaceKey -> encodeList(arr(info.currentNamespace)),
        SchemaKey -> info.schema.json,
        QueryColumnNamesKey -> encodeList(arr(info.queryColumnNames)),
        ColumnAliasesKey -> encodeList(arr(info.columnAliases)),
        ColumnCommentsKey -> encodeList(arr(info.columnComments)))
        .filter(_._2 != null)
    Views.ViewDef(info.ident.name(), info.sql, Map.empty, 1,
      representations = Seq(Views.ViewRepresentation("spark", info.sql)),
      uuid = uuid, properties = props)
  }
}

/** A graft view definition as Spark's connector View. */
case class GraftV2View(viewName: String, d: Views.ViewDef) extends View {
  import GraftViewSupport._
  private def prop(k: String): Option[String] = d.properties.get(k)

  override def name(): String = viewName
  override def query(): String = d.sqlFor("spark").getOrElse(d.sql)
  override def currentCatalog(): String = prop(CurrentCatalogKey).orNull
  override def currentNamespace(): Array[String] =
    prop(CurrentNamespaceKey).map(decodeList(_).toArray)
      .getOrElse(Array.empty)
  override def schema(): StructType =
    prop(SchemaKey).map(DataType.fromJson(_).asInstanceOf[StructType])
      .getOrElse(new StructType())
  override def queryColumnNames(): Array[String] =
    prop(QueryColumnNamesKey).map(decodeList(_).toArray)
      .getOrElse(Array.empty)
  override def columnAliases(): Array[String] =
    prop(ColumnAliasesKey).map(decodeList(_).toArray).getOrElse(Array.empty)
  override def columnComments(): Array[String] =
    prop(ColumnCommentsKey).map(decodeList(_).toArray).getOrElse(Array.empty)
  override def properties(): java.util.Map[String, String] =
    (d.properties -- InternalKeys).asJava
}
