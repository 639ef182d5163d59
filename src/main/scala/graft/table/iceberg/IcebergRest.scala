package graft.table.iceberg

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.table.TableIO
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Minimal Iceberg REST catalog front-end over a warehouse of
  * real-format tables (reference: iceberg-rest-catalog crate; the
  * endpoint shapes follow the public Iceberg REST OpenAPI spec).
  *
  * Serves the metadata plane over HTTP — `GET /v1/config`, namespace
  * and table listing, `LoadTableResult` with the full metadata JSON,
  * table existence and drop. Any REST-capable Iceberg client can
  * discover and read these tables; the data plane stays the shared
  * filesystem/object store, as in every Iceberg REST deployment.
  * Multi-writer commits stay on the metadata-file CAS (a commit
  * endpoint would layer the same CAS behind POST, like the
  * reference's `update_table`).
  */
class IcebergRestServer(val warehouse: String, bindPort: Int = 0) {
  private val mapper = new ObjectMapper()
  private var server: HttpServer = _

  def port: Int = server.getAddress.getPort

  private def json(x: com.fasterxml.jackson.databind.JsonNode): Array[Byte] =
    mapper.writeValueAsBytes(x)

  private def reply(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private def notFound(ex: HttpExchange): Unit = {
    val n = mapper.createObjectNode()
    n.putObject("error").put("message", "not found").put("code", 404)
    reply(ex, 404, json(n))
  }

  private def nsRoot(ns: String) = TableIO.path(s"$warehouse/$ns")
  private def tableRoot(ns: String, t: String) = s"$warehouse/$ns/$t"

  private def handle(ex: HttpExchange): Unit = try {
    val path = ex.getRequestURI.getPath.stripPrefix("/v1").stripSuffix("/")
    val method = ex.getRequestMethod
    val parts = path.stripPrefix("/").split("/").toSeq

    (method, parts) match {
      case ("GET", Seq("config")) =>
        val n = mapper.createObjectNode()
        n.putObject("defaults"); n.putObject("overrides")
        reply(ex, 200, json(n))

      case ("GET", Seq("namespaces")) =>
        val n = mapper.createObjectNode()
        val arr = n.putArray("namespaces")
        TableIO.listDir(TableIO.path(warehouse))
          .filter(st => st.isDirectory &&
            !IcebergTable.exists(st.getPath.toString))
          .foreach(st => arr.addArray().add(st.getPath.getName))
        reply(ex, 200, json(n))

      case ("POST", Seq("namespaces")) =>
        val body = mapper.readTree(ex.getRequestBody)
        val ns = body.get("namespace").elements().next().asText()
        TableIO.mkdirs(nsRoot(ns))
        val n = mapper.createObjectNode()
        n.putArray("namespace").add(ns)
        n.putObject("properties")
        reply(ex, 200, json(n))

      case ("GET", Seq("namespaces", ns, "tables")) =>
        if (!TableIO.isDirectory(nsRoot(ns))) notFound(ex)
        else {
          val n = mapper.createObjectNode()
          val arr = n.putArray("identifiers")
          TableIO.listDir(nsRoot(ns))
            .filter(st => IcebergTable.exists(st.getPath.toString))
            .foreach { st =>
              val id = arr.addObject()
              id.putArray("namespace").add(ns)
              id.put("name", st.getPath.getName)
            }
          reply(ex, 200, json(n))
        }

      case ("GET", Seq("namespaces", ns, "tables", t)) =>
        val root = tableRoot(ns, t)
        if (!IcebergTable.exists(root)) notFound(ex)
        else {
          // LoadTableResult: metadata-location + inline metadata (the
          // hint is optional — foreign writers may not leave one)
          val mLoc = IcebergMetadata.currentMetadataFile(root)
          val n = mapper.createObjectNode()
          n.put("metadata-location", TableIO.qualified(mLoc))
          n.set("metadata", mapper.readTree(TableIO.readString(mLoc)))
          n.putObject("config")
          reply(ex, 200, json(n))
        }

      case ("HEAD", Seq("namespaces", ns, "tables", t)) =>
        reply(ex,
          if (IcebergTable.exists(tableRoot(ns, t))) 204 else 404,
          Array.empty)

      case ("DELETE", Seq("namespaces", ns, "tables", t)) =>
        val root = tableRoot(ns, t)
        if (!IcebergTable.exists(root)) notFound(ex)
        else {
          TableIO.delete(TableIO.path(root), recursive = true)
          reply(ex, 204, Array.empty)
        }

      case _ => notFound(ex)
    }
  } catch {
    case e: Exception =>
      val n = mapper.createObjectNode()
      n.putObject("error").put("message", String.valueOf(e.getMessage))
        .put("code", 500)
      reply(ex, 500, json(n))
  }

  def start(): IcebergRestServer = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", bindPort), 0)
    server.createContext("/v1", handle(_))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    this
  }

  def stop(): Unit = if (server != null) server.stop(0)
}

/** Client side: discover and open tables over the REST protocol. */
object IcebergRestClient {
  private val mapper = new ObjectMapper()
  private val http = java.net.http.HttpClient.newHttpClient()

  private def get(uri: String): com.fasterxml.jackson.databind.JsonNode = {
    val resp = http.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(uri)).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"GET $uri -> ${resp.statusCode()}")
    mapper.readTree(resp.body())
  }

  def listNamespaces(base: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    get(s"$base/v1/namespaces").get("namespaces").elements().asScala
      .map(_.elements().next().asText()).toSeq
  }

  def listTables(base: String, ns: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    get(s"$base/v1/namespaces/$ns/tables").get("identifiers").elements()
      .asScala.map(_.get("name").asText()).toSeq
  }

  def createNamespace(base: String, ns: String): Unit = {
    val body = s"""{"namespace":["$ns"]}"""
    val resp = http.send(
      java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"$base/v1/namespaces"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"createNamespace -> ${resp.statusCode()}")
  }

  def tableExists(base: String, ns: String, table: String): Boolean = {
    val resp = http.send(
      java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"$base/v1/namespaces/$ns/tables/$table"))
        .method("HEAD", java.net.http.HttpRequest.BodyPublishers.noBody()).build(),
      java.net.http.HttpResponse.BodyHandlers.discarding())
    resp.statusCode() == 204
  }

  def dropTable(base: String, ns: String, table: String): Unit = {
    val resp = http.send(
      java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"$base/v1/namespaces/$ns/tables/$table"))
        .DELETE().build(),
      java.net.http.HttpResponse.BodyHandlers.discarding())
    require(resp.statusCode() == 204, s"dropTable -> ${resp.statusCode()}")
  }

  /** Open a table from the REST response's inline metadata: scans plan
    * from the returned tree, no direct metadata-dir reads. */
  def loadTable(spark: org.apache.spark.sql.SparkSession,
      base: String, ns: String, table: String): IcebergTable = {
    val res = get(s"$base/v1/namespaces/$ns/tables/$table")
    val m = IcebergMetadata.fromJson(
      mapper.writeValueAsString(res.get("metadata")))
    IcebergTable.fromMetadata(spark, m)
  }
}
