package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

/** Unit gates for the shared bloom membership kernel
  * ([[BloomMightContain]]) — the one definition behind the d24b
  * decontamination prefilter and the d119/d120 bloom-ledger probe.
  */
class BloomExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def filterOf(items: Seq[Long]): BloomFilter = {
    val f = BloomFilter.create(1000, 0.01)
    items.foreach(f.putLong)
    f
  }

  test("no false negatives; NULL digest yields NULL verdict; non-long input rejected") {
    val f = filterOf(1L to 50L)
    val df = ((1L to 50L).map(Option(_)) ++ Seq(None) ++ (100000L to 100019L).map(Option(_)))
      .toDF("h")
      .select(col("h"), BloomExpressions.mightContain(col("h"), f).as("m"))
      .collect()
    df.foreach { r =>
      val h = if (r.isNullAt(0)) None else Some(r.getLong(0))
      h match {
        case None => assert(r.isNullAt(1), "NULL digest must yield NULL verdict")
        case Some(v) if v <= 50 => assert(r.getBoolean(1), s"false negative at $v")
        case Some(_) => () // FPs allowed, bounded by fpp — not asserted per-row
      }
    }
    // a 1% filter over 50 items must not flag all 20 out-of-set probes
    val fp = df.filter(r => !r.isNullAt(0) && r.getLong(0) >= 100000L && r.getBoolean(1))
    assert(fp.length < 20, s"${fp.length}/20 out-of-set probes flagged — filter broken")
    val e = intercept[Exception](
      Seq("x").toDF("h")
        .select(BloomExpressions.mightContain(col("h"), f)).collect())
    assert(e.getMessage.contains("digest must be long"), e.getMessage)
  }

  test("codegen and interpreted evaluation agree row-for-row") {
    val f = filterOf(Seq(3L, 7L, 11L))
    def run(): Seq[(Long, Boolean)] = (1L to 200L).toDF("h")
      .select(col("h"), BloomExpressions.mightContain(col("h"), f).as("m"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(withCodegen == interpreted)
    assert(Seq(3L, 7L, 11L).forall(v => withCodegen.find(_._1 == v).exists(_._2)))
  }
}
