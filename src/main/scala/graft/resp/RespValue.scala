package graft.resp

/** RESP (Redis Serialization Protocol) value ADT — codec-internal, never a
  * public SQL-facing type (mirrors the reference's `RespObject` tagged
  * union, /root/reference/src/include/transport/resp_parser.hpp:10-45).
  *
  * Unlike the reference — which declares RESP3 types MAP/SET/PUSH/VERBATIM
  * in its enum but silently falls through on them in `ParseNext`
  * (resp_parser.cpp:49-127) — this codec models and parses the full RESP2
  * + RESP3 surface explicitly; unknown type bytes raise a decode error
  * instead of producing a default-constructed value.
  */
sealed trait RespValue extends Product with Serializable

object RespValue {
  /** `+OK\r\n` */
  final case class Simple(value: String) extends RespValue
  /** `-ERR msg\r\n` */
  final case class Err(message: String) extends RespValue
  /** `:42\r\n` */
  final case class Int64(value: Long) extends RespValue
  /** `,3.14\r\n` (RESP3) */
  final case class Dbl(value: Double) extends RespValue
  /** `#t\r\n` / `#f\r\n` (RESP3) */
  final case class Bool(value: Boolean) extends RespValue
  /** `(3492...\r\n` (RESP3) — kept as digits, like the reference's string view */
  final case class BigNumber(digits: String) extends RespValue
  /** `$5\r\nhello\r\n`; binary-safe payload kept as bytes */
  final case class Bulk(bytes: Array[Byte]) extends RespValue {
    def text: String = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    override def equals(o: Any): Boolean = o match {
      case b: Bulk => java.util.Arrays.equals(bytes, b.bytes)
      case _ => false
    }
    override def hashCode(): Int = java.util.Arrays.hashCode(bytes)
    override def toString: String = s"Bulk($text)"
  }
  object Bulk {
    def apply(s: String): Bulk = Bulk(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
  /** `=15\r\ntxt:Some string\r\n` (RESP3) */
  final case class Verbatim(format: String, value: String) extends RespValue
  /** `$-1\r\n`, `*-1\r\n`, `_\r\n` */
  case object Null extends RespValue
  /** `*2\r\n...` */
  final case class Arr(items: Vector[RespValue]) extends RespValue
  /** `%2\r\nk1 v1 k2 v2` (RESP3) */
  final case class Mp(entries: Vector[(RespValue, RespValue)]) extends RespValue
  /** `~3\r\n...` (RESP3) */
  final case class St(items: Vector[RespValue]) extends RespValue
  /** `>2\r\n...` (RESP3 out-of-band push) */
  final case class Push(items: Vector[RespValue]) extends RespValue

  /** Indented debug rendering (≈ the reference's `PrintResp`,
    * resp_parser.cpp:178-234) — test diagnostics only.
    */
  def render(v: RespValue, indent: Int = 0): String = {
    val pad = "  " * indent
    v match {
      case Simple(s) => s"${pad}Simple($s)"
      case Err(m) => s"${pad}Err($m)"
      case Int64(n) => s"${pad}Int64($n)"
      case Dbl(d) => s"${pad}Dbl($d)"
      case Bool(b) => s"${pad}Bool($b)"
      case BigNumber(d) => s"${pad}BigNumber($d)"
      case b: Bulk => s"${pad}Bulk(${b.text})"
      case Verbatim(f, s) => s"${pad}Verbatim($f, $s)"
      case Null => s"${pad}Null"
      case Arr(items) => s"${pad}Arr(\n${items.map(render(_, indent + 1)).mkString("\n")}\n$pad)"
      case Mp(es) => s"${pad}Mp(\n${es.map { case (k, vv) =>
        render(k, indent + 1) + " ->\n" + render(vv, indent + 2) }.mkString("\n")}\n$pad)"
      case St(items) => s"${pad}St(\n${items.map(render(_, indent + 1)).mkString("\n")}\n$pad)"
      case Push(items) => s"${pad}Push(\n${items.map(render(_, indent + 1)).mkString("\n")}\n$pad)"
    }
  }
}
