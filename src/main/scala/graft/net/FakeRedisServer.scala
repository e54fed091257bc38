package graft.net

import java.net.{ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._
import graft.resp.{RespCodec, RespValue}
import graft.resp.RespValue._

/** Hermetic in-process RESP server (SURVEY §5.1): replaces the reference
  * test suite's live-Redis dependency (test/sql/scan.test:18 "ensure
  * these keys exist before running tests") and exercises our codec from
  * the server side too.
  *
  * Speaks the subset the engine uses: PING, ECHO, SET, GET, MGET, DEL,
  * HSET, HGETALL, SCAN (cursor + MATCH + COUNT). SCAN slices the sorted
  * key list BEFORE applying MATCH — like real Redis walking hash buckets
  * — so clients see partially-empty pages with a non-zero cursor, which
  * exercises the empty-page retry loop the reference depends on
  * (redduck_extension.cpp:219-227).
  */
final class FakeRedisServer(requestedPort: Int = 0,
    tlsKeystore: Option[(String, String)] = None) {
  private val strings = new ConcurrentHashMap[String, String]()
  private val hashes = new ConcurrentHashMap[String, Map[String, String]]()
  @volatile private var server: ServerSocket = _
  @volatile private var running = false
  // SCAN round-trip counter: tests assert pushed limits actually cut pages
  private val scanCallCount = new java.util.concurrent.atomic.AtomicInteger(0)
  def scanCalls: Int = scanCallCount.get()
  def resetScanCalls(): Unit = scanCallCount.set(0)

  // cluster-redirect simulation: single-key commands on keys with this
  // prefix answer `-MOVED <slot> <target>` like a resharded cluster node
  @volatile private var movedRule: Option[(String, String)] = None
  def setMoved(keyPrefix: String, target: String): Unit =
    movedRule = Some((keyPrefix, target))
  def clearMoved(): Unit = movedRule = None
  // slot-migration simulation: source node answers `-ASK <slot> <target>`
  @volatile private var askRule: Option[(String, String)] = None
  def setAsk(keyPrefix: String, target: String): Unit = askRule = Some((keyPrefix, target))
  def clearAsk(): Unit = askRule = None
  // importing side of a migration: keys with this prefix are served ONLY on
  // a connection whose previous command was ASKING (real Redis one-shot
  // semantics); otherwise the node bounces them `-MOVED` back at `owner`
  @volatile private var importingRule: Option[(String, String)] = None
  def setImporting(keyPrefix: String, owner: String): Unit =
    importingRule = Some((keyPrefix, owner))
  def clearImporting(): Unit = importingRule = None
  // cluster topology: (startSlot, endSlot, masterHost, masterPort) ranges
  // answered to `CLUSTER SLOTS`; empty = cluster support disabled (like a
  // standalone Redis)
  @volatile private var clusterSlotsConf: Seq[(Int, Int, String, Int)] = Nil
  def setClusterSlots(entries: Seq[(Int, Int, String, Int)]): Unit =
    clusterSlotsConf = entries

  private def redirect(key: String, asking: Boolean): Option[RespValue] =
    movedRule.collect { case (p, t) if key.startsWith(p) => Err(s"MOVED 1234 $t") }
      .orElse(askRule.collect { case (p, t) if key.startsWith(p) => Err(s"ASK 1234 $t") })
      .orElse(importingRule.collect {
        case (p, owner) if key.startsWith(p) && !asking => Err(s"MOVED 1234 $owner")
      })

  def put(key: String, value: String): Unit = strings.put(key, value)
  def putHash(key: String, fields: Map[String, String]): Unit = hashes.put(key, fields)

  def start(): Int = synchronized {
    if (running) return server.getLocalPort
    server = tlsKeystore match {
      case None => new ServerSocket(requestedPort)
      case Some((ksPath, ksPass)) =>
        // TLS mode (the rediss:// simulation): serve over an
        // SSLServerSocket backed by the given JKS/PKCS12 keystore
        val ks = java.security.KeyStore.getInstance("PKCS12")
        val in = new java.io.FileInputStream(ksPath)
        try ks.load(in, ksPass.toCharArray) finally in.close()
        val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
          javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
        kmf.init(ks, ksPass.toCharArray)
        val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
        ctx.init(kmf.getKeyManagers, null, null)
        ctx.getServerSocketFactory.createServerSocket(requestedPort)
    }
    running = true
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val t = new Thread(() => serve(sock), "fake-redis-conn")
          t.setDaemon(true)
          t.start()
        } catch { case _: Throwable => () /* server closed */ }
      }
    }, "fake-redis-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  def stop(): Unit = synchronized {
    running = false
    if (server != null) server.close()
  }

  // requirepass / ACL simulation: when set, every command except
  // AUTH/QUIT on an unauthenticated connection answers NOAUTH (real
  // Redis 6 behavior); AUTH checks the password (and, when a username
  // is configured, the ACL 2-arg form)
  @volatile private var requirePassConf: Option[(Option[String], String)] = None
  def setRequirePass(password: String, user: Option[String] = None): Unit =
    requirePassConf = Some((user, password))
  def clearRequirePass(): Unit = requirePassConf = None

  /** Per-connection one-shot ASKING flag (real Redis scopes it this way)
    * plus the connection's authentication state.
    */
  private final class ConnState { var asking = false; var authed = false }

  private def serve(sock: Socket): Unit = {
    val in = sock.getInputStream
    val out = sock.getOutputStream
    val st = new ConnState
    var buf = new Array[Byte](16 * 1024)
    var end = 0
    var pos = 0
    try {
      while (true) {
        RespCodec.decode(buf, pos, end) match {
          case RespCodec.Decoded(v, next) =>
            pos = next
            if (pos == end) { pos = 0; end = 0 }
            out.write(RespCodec.encode(handle(v, st)))
            out.flush()
          case RespCodec.Incomplete =>
            if (end == buf.length) {
              if (pos > 0) { System.arraycopy(buf, pos, buf, 0, end - pos); end -= pos; pos = 0 }
              else buf = java.util.Arrays.copyOf(buf, buf.length * 2)
            }
            val n = in.read(buf, end, buf.length - end)
            if (n < 0) return
            end += n
        }
      }
    } catch { case _: Throwable => () } finally sock.close()
  }

  private def handle(req: RespValue, st: ConnState): RespValue = req match {
    case Arr(items) =>
      val args = items.map { case b: Bulk => b.text; case Simple(s) => s; case o => return Err(s"ERR bad arg $o") }
      if (args.isEmpty) return Err("ERR empty command")
      val cmd = args.head.toUpperCase
      val asking = st.asking
      if (cmd != "ASKING") st.asking = false // one-shot: covers only the next command
      requirePassConf match {
        case Some((user, pass)) if cmd == "AUTH" =>
          val ok = (args.length == 2 && user.isEmpty && args(1) == pass) ||
            (args.length == 3 && user.contains(args(1)) && args(2) == pass)
          return if (ok) { st.authed = true; Simple("OK") }
          else Err("WRONGPASS invalid username-password pair or user is disabled.")
        case Some(_) if !st.authed && cmd != "QUIT" =>
          return Err("NOAUTH Authentication required.")
        case None if cmd == "AUTH" =>
          return Err("ERR Client sent AUTH, but no password is set.")
        case _ => ()
      }
      cmd match {
        case "PING" => Simple("PONG")
        case "ECHO" => Bulk(args(1))
        case "ASKING" => st.asking = true; Simple("OK")
        case "SET" => strings.put(args(1), args(2)); Simple("OK")
        case "GET" => redirect(args(1), asking).getOrElse(
          Option(strings.get(args(1))).map(Bulk(_): RespValue).getOrElse(Null))
        case "DEL" =>
          val n = args.tail.count(k => strings.remove(k) != null || hashes.remove(k) != null)
          Int64(n.toLong)
        case "MGET" =>
          // cluster semantics: a batch whose slot is owned elsewhere gets
          // ONE redirect for the whole command (well-formed batches are
          // single-slot; cross-slot would be CROSSSLOT on real Redis)
          args.tail.flatMap(k => redirect(k, asking)).headOption.getOrElse(
            Arr(args.tail.map(k => Option(strings.get(k)).map(Bulk(_): RespValue).getOrElse(Null))))
        case "HSET" =>
          val kv = args.drop(2).grouped(2).collect { case Seq(f, v) => f -> v }.toMap
          hashes.merge(args(1), kv, (a, b) => a ++ b)
          Int64(kv.size.toLong)
        case "HGETALL" => redirect(args(1), asking).getOrElse {
          val m = Option(hashes.get(args(1))).getOrElse(Map.empty)
          Arr(m.toVector.sortBy(_._1).flatMap { case (f, v) => Vector(Bulk(f): RespValue, Bulk(v)) })
        }
        case "SCAN" => scan(args.tail)
        case "CLUSTER" if args.length >= 2 && args(1).toUpperCase == "SLOTS" =>
          if (clusterSlotsConf.isEmpty) Err("ERR This instance has cluster support disabled")
          else Arr(clusterSlotsConf.toVector.map { case (s, e, h, p) =>
            Arr(Vector(Int64(s.toLong), Int64(e.toLong),
              Arr(Vector(Bulk(h): RespValue, Int64(p.toLong)))))
          })
        case "COMMAND" => Arr(Vector.empty)
        case "QUIT" => Simple("OK")
        case other => Err(s"ERR unknown command '$other'")
      }
    case _ => Err("ERR protocol: expected command array")
  }

  private def scan(args: Seq[String]): RespValue = {
    scanCallCount.incrementAndGet()
    var cursor = args.head.toInt
    var pattern = "*"
    var count = 10
    var i = 1
    while (i < args.length) {
      args(i).toUpperCase match {
        case "MATCH" | "COUNT" if i + 1 >= args.length =>
          // dangling option token: real Redis answers an error, it does
          // not kill the connection
          return Err("ERR syntax error")
        case "MATCH" => pattern = args(i + 1); i += 2
        case "COUNT" => count = args(i + 1).toInt; i += 2
        case _ => i += 1
      }
    }
    // real Redis SCAN walks the whole keyspace regardless of value type
    val allKeys = (strings.keySet.asScala ++ hashes.keySet.asScala).toVector.sorted
    if (cursor >= allKeys.length) cursor = allKeys.length
    val page = allKeys.slice(cursor, cursor + count)
    val nextCursor = if (cursor + count >= allKeys.length) 0 else cursor + count
    val re = globToRegex(pattern)
    val matched = page.filter(k => re.matcher(k).matches())
    Arr(Vector(
      Bulk(nextCursor.toString),
      Arr(matched.map(Bulk(_): RespValue))))
  }

  /** Redis glob → java regex: `*` any, `?` one, `[...]` class, `\x` literal. */
  private def globToRegex(glob: String): java.util.regex.Pattern = {
    val sb = new StringBuilder
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          val close = glob.indexOf(']', i + 1)
          if (close < 0) { sb.append("\\["); }
          else { sb.append(glob.substring(i, close + 1)); i = close }
        case '\\' if i + 1 < glob.length =>
          sb.append(java.util.regex.Pattern.quote(glob.charAt(i + 1).toString)); i += 1
        case c => sb.append(java.util.regex.Pattern.quote(c.toString))
      }
      i += 1
    }
    java.util.regex.Pattern.compile(sb.toString)
  }
}
