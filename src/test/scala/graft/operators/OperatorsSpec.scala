package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct library-API tests for the pipeline operators (the oracle
  * conformance gate covers them end-to-end; these pin semantics with
  * hand-checkable fixtures).
  */
class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("AsOfJoin.backward picks latest right row at or before left ts") {
    val left = Seq((1, 10L, "l1"), (1, 20L, "l2"), (2, 5L, "l3"))
      .toDF("k", "ts", "lv")
    val right = Seq((1, 10L, "r10"), (1, 15L, "r15"), (2, 9L, "r9"))
      .toDF("k", "rts", "rv")
    val out = AsOfJoin.backward(left, right, "k", "ts", "rts", Seq("rv"))
      .select("k", "ts", "lv", "rv").as[(Int, Long, String, Option[String])]
      .collect().toSet
    assert(out == Set(
      (1, 10L, "l1", Some("r10")), // equal ts is visible
      (1, 20L, "l2", Some("r15")), // latest ≤ 20
      (2, 5L, "l3", None)))        // nothing at or before 5
  }

  test("exactDedup keeps lowest id per duplicate content") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("id", "text")
    val out = DedupOps.exactDedup(df, "id", Seq("text"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L))
  }

  test("tokenJaccard on known token sets") {
    val df = Seq(("a b c", "b c d")).toDF("x", "y")
      .select(DedupOps.tokenJaccard(col("x"), col("y")).as("j"))
    assert(df.as[Double].head() == 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("minhash is permutation-stable: identical text ⇒ identical signature") {
    val df = Seq((1L, "the quick brown fox jumps"), (2L, "the quick brown fox jumps"),
      (3L, "a completely different document"))
      .toDF("id", "text")
    val sig = DedupOps.minHashSignatures(df, "id", "text", 4, 5)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("simHash16 of near-identical docs is close, different docs far") {
    def ham(a: Int, b: Int): Int = Integer.bitCount(a ^ b)
    val df = Seq(
      (1L, "spark query engine for large scale data processing pipelines"),
      (2L, "spark query engine for large scale data processing pipeline"),
      (3L, "completely unrelated words about cooking pasta tonight"))
      .toDF("id", "text")
    val m = df.select(col("id"), DedupOps.simHash16(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ham(m(1L), m(2L)) < ham(m(1L), m(3L)))
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b")
      .select(SimilarityOps.cosine(col("a"), col("b")).as("c"))
    assert(df.as[Double].collect().toSeq == Seq(1.0, 0.0))
  }

  test("decodePartitioned flows binary through mapPartitions and emits metadata") {
    val df = Seq((1L, "abcd"), (2L, "abcde")).toDF("id", "text")
      .withColumn("payload", col("text").cast("binary"))
      .drop("text")
    val out = MultimodalOps.decodePartitioned(df, "payload")
    assert(out.columns.toSeq == Seq("id", "meta"))
    val metas = out.select("id", "meta.width", "meta.format")
      .as[(Long, Int, String)].collect().map { case (k, v, f) => k -> ((v, f)) }.toMap
    assert(metas(1L) == ((4, "png")))
    assert(metas(2L) == ((5, "jpeg")))
  }

  test("IVF: assignment matches brute-force nearest centroid; ANN finds self-cluster neighbors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = IvfIndex.train(emb, "embedding", k = 4, iters = 2)
    assert(model.k == 4)
    assert(model.centroids.forall(_.length == 64))
    // assignment sanity: every vector gets a cluster in range, all clusters used
    val clusters = emb.select(IvfIndex.assignCluster(col("embedding"), model).as("c"))
      .groupBy("c").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(clusters.keys.forall(c => c >= 0 && c < 4))
    assert(clusters.size >= 2, s"degenerate clustering: $clusters")
    // probing all clusters == brute force top-k
    val ivfAll = IvfIndex.annTopK(emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      emb, "vec_id", "embedding", model, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    val brute = SimilarityOps.bruteForceTopK(emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    assert(ivfAll == brute)
  }

  test("sampleFrames explodes byte chunks deterministically") {
    val df = Seq((1L, "0123456789abcdef")).toDF("id", "text")
      .withColumn("payload", col("text").cast("binary"))
    val frames = MultimodalOps.sampleFrames(df, "id", "payload", frameBytes = 4, everyK = 2)
      .select(col("id"), col("frame_no"), col("frame_bytes").cast("string"))
      .as[(Long, Int, String)].collect().sortBy(_._2).toSeq
    assert(frames == Seq((1L, 0, "0123"), (1L, 1, "89ab")))
  }
}
