package graft.net

import graft.resp.RespValue
import graft.resp.RespValue._

/** Typed wrappers for the Redis commands the engine speaks
  * (SCAN/GET/MGET/HGETALL — the reference's surface plus its documented-
  * but-unimplemented `redis_kv`/`redis_hgetall`, README.md:29-38).
  */
object RedisCommands {

  /** One SCAN page: `SCAN cursor MATCH pattern COUNT n`
    * (reference command builder: resp_parser.cpp:146-163; reply-shape
    * validation mirrors redduck_extension.cpp:191-217).
    *
    * @return (nextCursor, keys); cursor "0" = exhausted
    */
  def scanPage(c: RedisConnection, cursor: String, pattern: String, count: Int): (String, Seq[String]) =
    c.command("SCAN", cursor, "MATCH", pattern, "COUNT", count.toString) match {
      case Arr(Vector(cur, keys)) =>
        val next = cur match {
          case b: Bulk => b.text
          case Simple(s) => s
          case other => fail("SCAN cursor", other)
        }
        val ks = keys match {
          case Arr(items) => items.map {
            case b: Bulk => b.text
            case Simple(s) => s
            case other => fail("SCAN key", other)
          }
          case other => fail("SCAN key array", other)
        }
        (next, ks)
      case Err(m) => throw new java.io.IOException(s"SCAN error: $m")
      case other => fail("SCAN reply", other)
    }

  /** GET: missing key → None (SQL NULL downstream — deliberate divergence
    * from the reference's empty-string, redis_client.cpp:232-236).
    */
  def get(c: RedisConnection, key: String): Option[String] =
    c.command("GET", key) match {
      case b: Bulk => Some(b.text)
      case Null => None
      case Err(m) => throw new java.io.IOException(s"GET error: $m")
      case other => fail("GET reply", other)
    }

  /** Batched point lookups — one round trip for the whole batch. */
  def mget(c: RedisConnection, keys: Seq[String]): Seq[Option[String]] =
    if (keys.isEmpty) Nil
    else c.command("MGET" +: keys: _*) match {
      case Arr(items) => items.map {
        case b: Bulk => Some(b.text)
        case Null => None
        case other => fail("MGET element", other)
      }
      case Err(m) => throw new java.io.IOException(s"MGET error: $m")
      case other => fail("MGET reply", other)
    }

  /** HGETALL → field map (RESP2 flat array or RESP3 map reply). */
  def hgetall(c: RedisConnection, key: String): Map[String, String] =
    c.command("HGETALL", key) match {
      case Arr(items) =>
        items.grouped(2).collect {
          case Vector(k: Bulk, v: Bulk) => k.text -> v.text
        }.toMap
      case Mp(entries) =>
        entries.collect { case (k: Bulk, v: Bulk) => k.text -> v.text }.toMap
      case Err(m) => throw new java.io.IOException(s"HGETALL error: $m")
      case other => fail("HGETALL reply", other)
    }

  /** Batched HGETALL — one pipelined round trip for a whole SCAN page. */
  def hgetallPipelined(c: RedisConnection, keys: Seq[String]): Seq[Map[String, String]] =
    if (keys.isEmpty) Nil
    else c.pipeline(keys.map(k => Seq("HGETALL", k))).map {
      case Arr(items) =>
        items.grouped(2).collect {
          case Vector(k: Bulk, v: Bulk) => k.text -> v.text
        }.toMap
      case Mp(entries) =>
        entries.collect { case (k: Bulk, v: Bulk) => k.text -> v.text }.toMap
      case Err(m) => throw new java.io.IOException(s"HGETALL error: $m")
      case other => fail("HGETALL reply", other)
    }

  def set(c: RedisConnection, key: String, value: String): Unit =
    c.command("SET", key, value) match {
      case Simple("OK") => ()
      case other => fail("SET reply", other)
    }

  private def fail(what: String, got: RespValue): Nothing =
    throw new java.io.IOException(s"unexpected $what: ${RespValue.render(got)}")
}
