package graft.tools

/** Round-17 scratch: pure TCP ping-pong on loopback — is the ~20 ms
  * per round trip the kernel/loopback or com.sun.net.httpserver?
  * Not part of the shipped API. */
object RestMicro3 {
  def main(args: Array[String]): Unit = {
    val srv = new java.net.ServerSocket(0, 50,
      java.net.InetAddress.getByName("127.0.0.1"))
    val t = new Thread(() => {
      val s = srv.accept()
      s.setTcpNoDelay(true)
      val in = s.getInputStream
      val out = s.getOutputStream
      val b = new Array[Byte](64)
      while (true) {
        val n = in.read(b)
        if (n < 0) return
        out.write(b, 0, n); out.flush()
      }
    })
    t.setDaemon(true)
    t.start()
    val c = new java.net.Socket("127.0.0.1", srv.getLocalPort)
    c.setTcpNoDelay(true)
    val out = c.getOutputStream
    val in = c.getInputStream
    val b = new Array[Byte](64)
    def pp(): Unit = { out.write(42); out.flush(); in.read(b) }
    (1 to 100).foreach(_ => pp())
    val t0 = System.nanoTime()
    (1 to 2000).foreach(_ => pp())
    println(f"[micro3] raw TCP ping-pong: ${(System.nanoTime() - t0) / 1e6 / 2000}%.3f ms/rt")
    c.close(); srv.close()
  }
}
