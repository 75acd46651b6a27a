package graft.streaming

import graft.operators.WarmupSettings

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

/** R8: the reference's experimental self-warmup
  * (`core/.../Warmup.scala:30-85`), previously declared N/A while the
  * engine had no HTTP tier — now real against [[HttpEdgeServer]].
  *
  * Reference semantics: cycle `c` fires `numRequests * c` GET `/health`
  * requests over `maxConnections * c` client TCP connections; cycles
  * grow until one sees a failure (the saturation point) or `maxCycles`
  * is reached. The point is pre-warming the JVM's accept/handler paths
  * and the listen backlog before the load balancer sends real traffic —
  * "It is expected to see a few failures during warmup"
  * (`Warmup.scala:39`).
  */
object EdgeWarmup {

  final case class CycleResult(
      cycle: Int, connections: Int, requests: Int, failures: Int)

  /** Run all warmup cycles against a bound edge port. Returns per-cycle
    * results (empty when disabled). `log` receives the reference's
    * per-cycle summary lines. */
  def run(
      port: Int,
      cfg: WarmupSettings,
      log: String => Unit = _ => ()): Seq[CycleResult] = {
    if (!cfg.enable) return Nil
    log(s"Starting warm up of 127.0.0.1:$port. " +
      "It is expected to see a few failures during warmup.")
    val out = Seq.newBuilder[CycleResult]
    var c = 1
    var stop = false
    while (!stop) {
      val reqs = cfg.numRequests * c
      val conns = math.max(1, math.min(cfg.maxConnections * c, reqs))
      val failures = new AtomicLong
      val threads = (0 until conns).map { w =>
        val t = new Thread(() => {
          var sock: Socket = null
          try {
            sock = new Socket("127.0.0.1", port)
            sock.setTcpNoDelay(true)
            val os = new BufferedOutputStream(sock.getOutputStream)
            val is = new BufferedInputStream(sock.getInputStream)
            def line(): String = {
              val sb = new java.lang.StringBuilder
              var ch = is.read()
              while (ch != -1 && ch != '\n') {
                if (ch != '\r') sb.append(ch.toChar); ch = is.read()
              }
              sb.toString
            }
            var i = w
            while (i < reqs) {
              os.write(("GET /health HTTP/1.1\r\nHost: warmup\r\n\r\n")
                .getBytes(StandardCharsets.UTF_8))
              os.flush()
              val status = line()
              if (!status.startsWith("HTTP/1.1 ")) failures.incrementAndGet()
              var len = 0
              var l = line()
              while (l.nonEmpty) {
                val kv = l.split(":", 2)
                if (kv(0).equalsIgnoreCase("Content-Length")) len = kv(1).trim.toInt
                l = line()
              }
              var left = len
              while (left > 0) {
                val skipped = is.skip(left.toLong).toInt
                if (skipped <= 0) { if (is.read() == -1) left = 0 else left -= 1 }
                else left -= skipped
              }
              i += conns
            }
          } catch {
            case scala.util.control.NonFatal(_) => failures.incrementAndGet()
          } finally if (sock != null) sock.close()
        }, s"edge-warmup-$w")
        t.setDaemon(true)
        t.start()
        t
      }
      threads.foreach(_.join())
      val f = failures.get.toInt
      out += CycleResult(c, conns, reqs, f)
      log(s"Finished warmup cycle $c of 127.0.0.1:$port with $conns max " +
        s"client TCP connections. Sent $reqs requests with $f failures.")
      stop = f > 0 || c >= cfg.maxCycles
      c += 1
    }
    log(s"Finished all warmup cycles of 127.0.0.1:$port")
    out.result()
  }
}
