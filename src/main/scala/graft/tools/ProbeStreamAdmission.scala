package graft.tools

import graft.net.{FakeRedisServer, RedisCommands, RedisConnection}

/** Dev probe behind SCALE.md's round-13 streams-admission numbers
  * (r12 verdict task 6): with `maxEntriesPerTrigger` set, the driver's
  * admission probe pays one capped XRANGE whose ENTRIES are discarded
  * (Redis has no ids-only XRANGE) — effectively reading each batch
  * twice, once on the driver to learn the end id and once on the
  * executor to emit rows. This measures that documented trade at a
  * production-ish cap against the in-process server (loopback: no
  * network, so the number isolates the protocol+parse cost that lands
  * on the DRIVER — the scarce resource the trade spends).
  *
  * Usage: runMain graft.tools.ProbeStreamAdmission [entries] [cap]
  */
object ProbeStreamAdmission {
  def main(args: Array[String]): Unit = {
    val entries = if (args.length > 0) args(0).toInt else 500000
    val cap = if (args.length > 1) args(1).toInt else 100000
    val server = new FakeRedisServer()
    // realistic entry shape: two short fields, ~40 payload bytes
    (1 to entries).foreach(i =>
      server.putStreamEntry("probe:s", s"$i-1",
        Seq("v" -> s"event-payload-$i", "n" -> i.toString)))
    val port = server.start()
    val conn = new RedisConnection("127.0.0.1", port)
    try {
      def timeMs[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e6)
      }
      // warm both paths once (JIT + server-side buffers)
      RedisCommands.xrange(conn, "probe:s", "(0-0", "+", Some(cap))
      RedisCommands.xlast(conn, "probe:s")

      // (a) uncapped admission: 1-entry XREVRANGE — the cheap path
      val (_, tLast) = timeMs(RedisCommands.xlast(conn, "probe:s"))
      // (b) capped admission probe: capped XRANGE, entries discarded
      val (page, tProbe) = timeMs(
        RedisCommands.xrange(conn, "probe:s", "(0-0", "+", Some(cap)))
      val endId = page.last.id
      // (c) the batch read an executor then pays (paged, like the reader)
      val (_, tRead) = timeMs {
        var cursor = "0-0"
        var n = 0
        var done = false
        while (!done) {
          val p = RedisCommands.xrange(conn, "probe:s", "(" + cursor, endId, Some(2048))
          n += p.length
          if (p.isEmpty || p.length < 2048) done = true
          else cursor = p.last.id
        }
        n
      }
      println(f"entries=$entries cap=$cap")
      println(f"admission, no cap (XREVRANGE COUNT 1):   $tLast%9.2f ms")
      println(f"admission probe (capped XRANGE, waste):  $tProbe%9.2f ms")
      println(f"executor batch read (paged XRANGE):      $tRead%9.2f ms")
      println(f"probe / read ratio:                      ${tProbe / tRead}%9.3f")
    } finally { conn.close(); server.stop() }
  }
}
