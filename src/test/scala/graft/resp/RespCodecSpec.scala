package graft.resp

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import java.nio.charset.StandardCharsets.UTF_8

import RespValue._

/** Codec unit + property tests (SURVEY §5.3): golden wire fixtures from
  * FIXTURES.md §2, ScalaCheck round-trip, and per-byte fragmentation —
  * the bug class the reference's single-recv read breaks on
  * (/root/reference/src/transport/redis_client.cpp:127-148).
  */
class RespCodecSpec extends AnyFunSuite {

  /** Deterministic property driver (no scalatest-scalacheck bridge in the
    * offline dependency set): samples `n` values from the generator.
    */
  private def forAllSampled[T](gen: Gen[T], n: Int = 300)(check: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private def decodeAll(bytes: Array[Byte]): RespValue =
    RespCodec.decode(bytes, 0, bytes.length) match {
      case RespCodec.Decoded(v, next) =>
        assert(next == bytes.length, "decode must consume the whole frame")
        v
      case RespCodec.Incomplete => fail("unexpected Incomplete")
    }

  // ---- golden wire fixtures (FIXTURES.md §2) ----
  val golden: Seq[(String, RespValue)] = Seq(
    "+PONG\r\n" -> Simple("PONG"),
    ":42\r\n" -> Int64(42),
    ",3.14\r\n" -> Dbl(3.14),
    "#t\r\n" -> Bool(true),
    "#f\r\n" -> Bool(false),
    "-ERR unknown\r\n" -> Err("ERR unknown"),
    "(3492890328409238509324850943850\r\n" -> BigNumber("3492890328409238509324850943850"),
    "$5\r\nhello\r\n" -> Bulk("hello"),
    "$-1\r\n" -> Null,
    "*2\r\n$1\r\n0\r\n*1\r\n$12\r\ntestkey:0001\r\n" ->
      Arr(Vector(Bulk("0"), Arr(Vector(Bulk("testkey:0001"))))))

  golden.foreach { case (wire, expected) =>
    test(s"golden decode: ${wire.replace("\r\n", "\\r\\n")}") {
      assert(decodeAll(wire.getBytes(UTF_8)) == expected)
    }
  }

  test("command encoder golden: GET k (reference BuildGet, resp_parser.cpp:165-174)") {
    assert(new String(RespCodec.encodeCommand(Seq("GET", "k")), UTF_8) ==
      "*2\r\n$3\r\nGET\r\n$1\r\nk\r\n")
  }

  test("command encoder golden: SCAN 0 MATCH p COUNT 2048 (BuildScan, resp_parser.cpp:146-163)") {
    assert(new String(RespCodec.encodeCommand(Seq("SCAN", "0", "MATCH", "p", "COUNT", "2048")), UTF_8) ==
      "*6\r\n$4\r\nSCAN\r\n$1\r\n0\r\n$5\r\nMATCH\r\n$1\r\np\r\n$5\r\nCOUNT\r\n$4\r\n2048\r\n")
  }

  test("RESP3 types decode explicitly (reference leaves them unparsed — SURVEY §7.5f)") {
    assert(decodeAll("%1\r\n$1\r\nk\r\n$1\r\nv\r\n".getBytes(UTF_8)) ==
      Mp(Vector(Bulk("k") -> Bulk("v"))))
    assert(decodeAll("~2\r\n:1\r\n:2\r\n".getBytes(UTF_8)) == St(Vector(Int64(1), Int64(2))))
    assert(decodeAll(">1\r\n+hi\r\n".getBytes(UTF_8)) == Push(Vector(Simple("hi"))))
    assert(decodeAll("=11\r\ntxt:Some tx\r\n".getBytes(UTF_8)) == Verbatim("txt", "Some tx"))
    assert(decodeAll("_\r\n".getBytes(UTF_8)) == Null)
  }

  test("attributes are decoded and discarded, returning the annotated reply") {
    assert(decodeAll("|1\r\n+k\r\n:1\r\n$2\r\nok\r\n".getBytes(UTF_8)) == Bulk("ok"))
  }

  test("unknown type byte raises, never a default value (SURVEY §1.2)") {
    intercept[RespCodec.ProtocolException] {
      RespCodec.decode("^oops\r\n".getBytes(UTF_8), 0, 7)
    }
  }

  test("invalid integer raises (reference swallows from_chars errors — §7.5c)") {
    intercept[RespCodec.ProtocolException] {
      RespCodec.decode(":12x\r\n".getBytes(UTF_8), 0, 6)
    }
  }

  // ---- fragmentation: every strict prefix must be Incomplete ----
  test("every byte-level fragmentation point resumes correctly") {
    golden.foreach { case (wire, expected) =>
      val bytes = wire.getBytes(UTF_8)
      (0 until bytes.length).foreach { cut =>
        RespCodec.decode(bytes, 0, cut) match {
          case RespCodec.Incomplete => // expected: must wait for more bytes
          case RespCodec.Decoded(v, next) =>
            // a shorter frame may legitimately complete early only if it
            // consumed exactly the bytes of a full value — never happens
            // for our golden frames which are single complete values
            fail(s"decoded $v at cut=$cut/${bytes.length} (next=$next) for ${wire.take(12)}")
        }
      }
      assert(decodeAll(bytes) == expected)
    }
  }

  // ---- ScalaCheck round-trip over the full ADT ----
  private val genLeaf: Gen[RespValue] = Gen.oneOf(
    Gen.alphaNumStr.map(Simple(_)),
    Gen.alphaNumStr.map(s => Err(s"ERR $s")),
    Arbitrary.arbitrary[Long].map(Int64(_)),
    Gen.chooseNum(-1e9, 1e9).map(Dbl(_)),
    Arbitrary.arbitrary[Boolean].map(Bool(_)),
    Gen.listOf(Gen.numChar).map(ds => BigNumber(if (ds.isEmpty) "0" else ds.mkString)),
    Arbitrary.arbitrary[Array[Byte]].map(Bulk(_)),
    Gen.const(Null))

  private def genValue(depth: Int): Gen[RespValue] =
    if (depth == 0) genLeaf
    else Gen.frequency(
      6 -> genLeaf,
      2 -> Gen.listOfN(3, genValue(depth - 1)).map(l => Arr(l.toVector)),
      1 -> Gen.listOfN(2, Gen.zip(genValue(depth - 1), genValue(depth - 1)))
        .map(l => Mp(l.toVector)),
      1 -> Gen.listOfN(2, genValue(depth - 1)).map(l => St(l.toVector)))

  test("property: decode(encode(v)) == v") {
    forAllSampled(genValue(3)) { v =>
      val bytes = RespCodec.encode(v)
      assert(decodeAll(bytes) == v)
    }
  }

  test("property: pipelined frames decode back-to-back") {
    forAllSampled(Gen.listOfN(5, genValue(2)), n = 100) { vs =>
      val bytes = vs.flatMap(v => RespCodec.encode(v).toSeq).toArray
      var pos = 0
      val out = Vector.newBuilder[RespValue]
      while (pos < bytes.length) {
        RespCodec.decode(bytes, pos, bytes.length) match {
          case RespCodec.Decoded(v, next) => out += v; pos = next
          case RespCodec.Incomplete => fail("incomplete in complete stream")
        }
      }
      assert(out.result() == vs.toVector)
    }
  }
}
