package graft.resp

import java.nio.charset.StandardCharsets.UTF_8

/** RESP2/RESP3 wire codec.
  *
  * Decoding is **incremental**: `decode` returns `Incomplete` when the
  * buffer ends mid-frame, and the caller re-reads from the socket and
  * retries. This fixes the reference's single-`recv` fragmentation bug
  * (/root/reference/src/transport/redis_client.cpp:127-148, where a
  * fragmented reply aborts with "Parsed 0 objects"). Numeric parse
  * failures are hard errors, not silently swallowed (reference bug at
  * resp_parser.cpp:19-22).
  */
object RespCodec {

  sealed trait DecodeResult
  /** One complete value; `next` = offset just past its final CRLF. */
  final case class Decoded(value: RespValue, next: Int) extends DecodeResult
  /** Buffer ends mid-frame — read more bytes and retry. */
  case object Incomplete extends DecodeResult

  final class ProtocolException(msg: String) extends RuntimeException(msg)

  /** Encode a command as a RESP array of bulk strings
    * (≈ the reference's `BuildScan`/`BuildGet`, resp_parser.cpp:146-174,
    * but generic over any command).
    */
  def encodeCommand(args: Seq[String]): Array[Byte] = {
    val sb = new java.io.ByteArrayOutputStream(64)
    sb.write(s"*${args.length}\r\n".getBytes(UTF_8))
    args.foreach { a =>
      val bytes = a.getBytes(UTF_8)
      sb.write(s"$$${bytes.length}\r\n".getBytes(UTF_8))
      sb.write(bytes)
      sb.write('\r'); sb.write('\n')
    }
    sb.toByteArray
  }

  /** Encode any RespValue back to wire bytes (used by the hermetic test
    * server and the ScalaCheck round-trip property).
    */
  def encode(v: RespValue): Array[Byte] = {
    import RespValue._
    val out = new java.io.ByteArrayOutputStream(64)
    def w(s: String): Unit = out.write(s.getBytes(UTF_8))
    def go(v: RespValue): Unit = v match {
      case Simple(s) => w(s"+$s\r\n")
      case Err(m) => w(s"-$m\r\n")
      case Int64(n) => w(s":$n\r\n")
      case Dbl(d) => w(s",$d\r\n")
      case Bool(b) => w(if (b) "#t\r\n" else "#f\r\n")
      case BigNumber(d) => w(s"($d\r\n")
      case b: Bulk =>
        w(s"$$${b.bytes.length}\r\n"); out.write(b.bytes); w("\r\n")
      case Verbatim(f, s) =>
        val payload = s"$f:$s"
        w(s"=${payload.getBytes(UTF_8).length}\r\n$payload\r\n")
      case Null => w("$-1\r\n")
      case Arr(items) => w(s"*${items.length}\r\n"); items.foreach(go)
      case Mp(es) => w(s"%${es.length}\r\n"); es.foreach { case (k, vv) => go(k); go(vv) }
      case St(items) => w(s"~${items.length}\r\n"); items.foreach(go)
      case Push(items) => w(s">${items.length}\r\n"); items.foreach(go)
    }
    go(v)
    out.toByteArray
  }

  /** Decode one value from `buf[start, end)`. */
  def decode(buf: Array[Byte], start: Int, end: Int): DecodeResult = {
    import RespValue._

    // returns end index of the CRLF-terminated line starting at `from`,
    // or -1 if the line is incomplete
    def findLine(from: Int): Int = {
      var i = from
      while (i + 1 < end) {
        if (buf(i) == '\r' && buf(i + 1) == '\n') return i
        i += 1
      }
      -1
    }
    def lineStr(from: Int, to: Int): String = new String(buf, from, to - from, UTF_8)
    def parseLong(s: String): Long =
      try java.lang.Long.parseLong(s)
      catch { case _: NumberFormatException =>
        throw new ProtocolException(s"invalid RESP integer: '$s'") }

    def go(pos: Int): DecodeResult = {
      if (pos >= end) return Incomplete
      val t = buf(pos).toChar
      val eol = findLine(pos + 1)
      if (eol < 0) return Incomplete
      val line = lineStr(pos + 1, eol)
      val after = eol + 2
      t match {
        case '+' => Decoded(Simple(line), after)
        case '-' => Decoded(Err(line), after)
        case ':' => Decoded(Int64(parseLong(line)), after)
        case ',' =>
          val d = line match {
            case "inf" => Double.PositiveInfinity
            case "-inf" => Double.NegativeInfinity
            case "nan" => Double.NaN
            case s => try s.toDouble catch { case _: NumberFormatException =>
              throw new ProtocolException(s"invalid RESP double: '$s'") }
          }
          Decoded(Dbl(d), after)
        case '#' => line match {
          case "t" => Decoded(Bool(true), after)
          case "f" => Decoded(Bool(false), after)
          case s => throw new ProtocolException(s"invalid RESP boolean: '$s'")
        }
        case '(' => Decoded(BigNumber(line), after)
        case '_' => Decoded(Null, after)
        case '$' | '=' =>
          val n = parseLong(line).toInt
          if (n == -1) Decoded(Null, after)
          else if (n < 0) throw new ProtocolException(s"negative bulk length $n")
          else if (after + n + 2 > end) Incomplete
          else {
            val bytes = java.util.Arrays.copyOfRange(buf, after, after + n)
            if (buf(after + n) != '\r' || buf(after + n + 1) != '\n')
              throw new ProtocolException("bulk string not CRLF-terminated")
            val nxt = after + n + 2
            if (t == '$') Decoded(Bulk(bytes), nxt)
            else {
              val s = new String(bytes, UTF_8)
              val idx = s.indexOf(':')
              if (idx < 0) throw new ProtocolException("verbatim string missing format prefix")
              Decoded(Verbatim(s.substring(0, idx), s.substring(idx + 1)), nxt)
            }
          }
        case '*' | '~' | '>' =>
          val n = parseLong(line).toInt
          if (n == -1) Decoded(Null, after)
          else if (n < 0) throw new ProtocolException(s"negative aggregate length $n")
          else {
            var pos2 = after
            val items = Vector.newBuilder[RespValue]
            var i = 0
            while (i < n) {
              go(pos2) match {
                case Decoded(v, nx) => items += v; pos2 = nx; i += 1
                case Incomplete => return Incomplete
              }
            }
            val vec = items.result()
            t match {
              case '*' => Decoded(Arr(vec), pos2)
              case '~' => Decoded(St(vec), pos2)
              case _ => Decoded(Push(vec), pos2)
            }
          }
        case '%' =>
          val n = parseLong(line).toInt
          if (n < 0) throw new ProtocolException(s"negative map length $n")
          var pos2 = after
          val entries = Vector.newBuilder[(RespValue, RespValue)]
          var i = 0
          while (i < n) {
            go(pos2) match {
              case Decoded(k, nx1) => go(nx1) match {
                case Decoded(v, nx2) => entries += (k -> v); pos2 = nx2; i += 1
                case Incomplete => return Incomplete
              }
              case Incomplete => return Incomplete
            }
          }
          Decoded(Mp(entries.result()), pos2)
        case '|' =>
          // RESP3 attribute: decode as a map and DISCARD, then return the
          // value that follows (attributes annotate the next reply).
          val n = parseLong(line).toInt
          var pos2 = after
          var i = 0
          while (i < n * 2) {
            go(pos2) match {
              case Decoded(_, nx) => pos2 = nx; i += 1
              case Incomplete => return Incomplete
            }
          }
          go(pos2)
        case other =>
          throw new ProtocolException(f"unknown RESP type byte '$other' (0x${other.toInt}%02x)")
      }
    }
    go(start)
  }
}
