package graft.tools

/** Round-17 scratch micro-benchmark: raw request latency against the
  * in-process IcebergRestServer (no Spark). Isolates whether the REST
  * keys' driver gap is per-request latency or request count. Not part
  * of the shipped API. */
object RestMicro {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("rest-micro").toString
    val server = new graft.table.iceberg.IcebergRestServer(wh).start()
    val base = s"http://127.0.0.1:${server.port}"
    val http = java.net.http.HttpClient.newHttpClient()
    def get(uri: String): Int = {
      val r = http.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(uri)).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      r.statusCode()
    }
    def post(uri: String, body: String): Int = {
      val r = http.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(uri))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      r.statusCode()
    }
    // create a namespace so GETs have something to list
    post(s"$base/v1/namespaces", """{"namespace":["db"]}""")
    // warm
    (1 to 20).foreach(_ => get(s"$base/v1/namespaces"))
    val n = 200
    val t0 = System.nanoTime()
    (1 to n).foreach(_ => get(s"$base/v1/namespaces"))
    val dtGet = (System.nanoTime() - t0) / 1e6 / n
    val tc = System.nanoTime()
    (1 to n).foreach(_ => get(s"$base/v1/config"))
    val dtCfg = (System.nanoTime() - tc) / 1e6 / n
    val t1 = System.nanoTime()
    (1 to n).foreach(i => post(s"$base/v1/namespaces/db/x$i/y", "{}"))
    val dtPost = (System.nanoTime() - t1) / 1e6 / n
    println(f"[rest-micro] GET /namespaces avg $dtGet%.2f ms, GET /config avg $dtCfg%.2f ms, POST(404-path) avg $dtPost%.2f ms over $n reqs")
    server.stop()
  }
}
