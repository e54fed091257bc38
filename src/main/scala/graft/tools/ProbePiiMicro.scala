package graft.tools
/** Dev probe: pure-JVM PII kernel vs java.util.regex throughput (the
  * SCALE.md d84 row's per-row numbers; no Spark in the loop).
  */
object ProbePiiMicro {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.PiiUtil
    import graft.operators.TextOps
    val base = "the quick brown fox " * 15 +
      " contact user123@example.com or 10.5.0.35 tel +1 555-1234"
    val u = UTF8String.fromString(base)
    val e = "<EMAIL>".getBytes; val i = "<IP>".getBytes; val p = "<PHONE>".getBytes
    val pats = Seq(TextOps.PiiEmailPattern, TextOps.PiiIpv4Pattern,
      TextOps.PiiPhonePattern).map(java.util.regex.Pattern.compile)
    val toks = Seq("<EMAIL>", "<IP>", "<PHONE>")
    (1 to 4).foreach { pass =>
      var t0 = System.nanoTime()
      var k = 0
      while (k < 5000) { PiiUtil.counts(u); PiiUtil.scrub(u, e, i, p); k += 1 }
      val kMs = (System.nanoTime() - t0) / 1e6
      t0 = System.nanoTime()
      k = 0
      while (k < 5000) {
        val s = u.toString
        pats.foreach { pt => val m = pt.matcher(s); var c = 0; while (m.find()) c += 1 }
        pats.zip(toks).foldLeft(s) { case (t, (pt, tok)) => pt.matcher(t).replaceAll(tok) }
        k += 1
      }
      val rMs = (System.nanoTime() - t0) / 1e6
      println(f"pass$pass: kernel ${kMs}%.1f ms, regex ${rMs}%.1f ms for 5000 rows of ${base.length} chars")
    }
  }
}
