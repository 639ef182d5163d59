package graft.tools

import com.sun.net.httpserver.HttpServer
import java.net.InetSocketAddress

/** Round-17 scratch: isolate WHERE the ~100 ms/request loopback REST
  * latency comes from — server handler vs HTTP client vs TCP layer.
  * Not part of the shipped API. */
object RestMicro2 {
  def main(args: Array[String]): Unit = {
    if (args.contains("nodelay"))
      System.setProperty("sun.net.httpserver.nodelay", "true")
    // 1. trivial echo server + java.net.http client
    val echo = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    echo.createContext("/x", ex => {
      val body = "{\"ok\":true}".getBytes
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    echo.setExecutor(pool)
    echo.start()
    val base = s"http://127.0.0.1:${echo.getAddress.getPort}"
    val http = java.net.http.HttpClient.newHttpClient()
    def get(uri: String): Int =
      http.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(uri)).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
    (1 to 20).foreach(_ => get(s"$base/x"))
    var t0 = System.nanoTime()
    (1 to 200).foreach(_ => get(s"$base/x"))
    println(f"[micro2] echo-server + HttpClient: ${(System.nanoTime() - t0) / 1e6 / 200}%.2f ms/req")

    // 2. same echo server, raw socket HTTP/1.1 with keep-alive
    val sock = new java.net.Socket("127.0.0.1", echo.getAddress.getPort)
    sock.setTcpNoDelay(true)
    val out = sock.getOutputStream
    val in = sock.getInputStream
    def rawGet(): Unit = {
      out.write(("GET /x HTTP/1.1\r\nHost: h\r\n\r\n").getBytes)
      out.flush()
      // read headers + body (Content-Length: 11)
      val buf = new Array[Byte](4096)
      var seen = 0
      while (seen < 50) seen += in.read(buf) // enough for this fixed reply
    }
    (1 to 20).foreach(_ => rawGet())
    t0 = System.nanoTime()
    (1 to 200).foreach(_ => rawGet())
    println(f"[micro2] echo-server + raw socket: ${(System.nanoTime() - t0) / 1e6 / 200}%.2f ms/req")
    sock.close()
    echo.stop(0)
    pool.shutdown()
  }
}
