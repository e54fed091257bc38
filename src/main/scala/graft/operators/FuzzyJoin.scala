package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join via pigeonhole segment blocking
  * (the PassJoin family: Li, Deng, Wang, Feng — "PASS-JOIN: a
  * partition-based method for similarity joins", PVLDB 5(3), 2011):
  * strings within Levenshtein distance k are paired WITHOUT the
  * all-pairs sweep.
  *
  * Principle: split each string into k+1 contiguous segments. k edits
  * touch at most k of them, so for any pair with lev ≤ k at least one
  * segment survives untouched — and appears in the other string as an
  * EXACT substring (possibly shifted by earlier insertions/deletions).
  * `segments(a) ∩ substrings(b) ≠ ∅` is therefore a SOUND candidate
  * filter: the equi-join on segment text yields a superset of the true
  * pairs, and the exact `levenshtein` rescore keeps precision at 1
  * (an sbt test pins the result against the brute-force all-pairs).
  *
  * Scale shape: each string emits k+1 segments and O(len·k) substrings
  * — per-row explodes, no window, no driver state. Candidates meet in
  * an equi-join on the segment text (shuffle co-partitioned on that
  * key); total work is Σ per-segment-text (probe × build) — the
  * inverted-index regime, never n². A length band inside the join
  * (|len(a)−len(b)| ≤ k) kills impossible pairs before the rescore.
  * Hot segment texts (a token shared by many strings) are the skew
  * axis — AQE splits them at runtime.
  */
object FuzzyJoin {

  /** The k+1 deterministic segments of `s`: segment i spans
    * (⌊L·i/(k+1)⌋, ⌊L·(i+1)/(k+1)⌋] in 1-based substring terms —
    * integer arithmetic, so both sides of a join (and an external
    * oracle) can reproduce the split exactly.
    */
  def segments(s: Column, k: Int): Column = {
    val L = length(s)
    array((0 to k).map { i =>
      val start = floor(L * lit(i) / lit(k + 1)).cast("int")
      val end = floor(L * lit(i + 1) / lit(k + 1)).cast("int")
      s.substr(start + 1, end - start)
    }: _*)
  }

  /** All distinct substrings of `s` with the widths a peer's segment can
    * take: a candidate peer has length within ±k of this string, so its
    * k+1-way segments have widths in
    * [max(1, ⌊(L−k)/(k+1)⌋), ⌈(L+k)/(k+1)⌉].
    */
  def peerSegmentSubstrings(s: Column, k: Int): Column = {
    val L = length(s)
    val wMin = greatest(floor((L - lit(k)) / lit(k + 1)).cast("int"), lit(1))
    val wMax = ceil((L + lit(k)) / lit(k + 1)).cast("int")
    array_distinct(flatten(transform(
      sequence(wMin, greatest(wMax, wMin)),
      w => filter(
        transform(sequence(lit(1), greatest(L - w + 1, lit(1))),
          p => s.substr(p, w)),
        x => length(x) === w))))
  }

  /** Candidate pairs (`__sa`, `__sb`) — a SOUND superset of every pair
    * with lev ≤ k between `sa.__sa` and `sb.__sb` (both assumed distinct,
    * non-null). Two disjoint regimes, split on length(__sa):
    *
    *  - len(__sa) > k: pigeonhole segment blocking — all k+1 segments
    *    are non-empty, so ≤ k edits leave one intact as an exact
    *    substring of the peer. Equi-join on segment text.
    *  - len(__sa) ≤ k: the pigeonhole argument FAILS (a length-L string
    *    has only L non-empty segments; when L ≤ k every one of them can
    *    be touched by edits — e.g. k=2, "ab" vs "cd": lev=2 but no
    *    shared substring). Block on the PEER'S LENGTH instead: __sa
    *    emits every admissible peer length in [max(la−k,0), la+k] and
    *    __sb emits its own length — an equi-join on the length key, not
    *    a cross join. Sound because |len(a)−len(b)| ≤ k is necessary for
    *    lev ≤ k. The short side is bounded (strings of ≤ k chars, k ≤ 6)
    *    and each emits ≤ 2k+1 keys; peers are capped at len ≤ 2k.
    *
    * May contain duplicates within each regime (several shared segments)
    * — callers dedup before the exact rescore. Both regimes carry the
    * length-band filter.
    */
  def candidatePairs(sa: DataFrame, sb: DataFrame, k: Int): DataFrame = {
    val segs = sa.filter(length(col("__sa")) > k)
      .select(col("__sa"), explode(segments(col("__sa"), k)).as("__seg"))
      .filter(length(col("__seg")) > 0)
    val subs = sb.select(col("__sb"),
      explode(peerSegmentSubstrings(col("__sb"), k)).as("__seg"))
    val blocked = segs.join(subs, Seq("__seg"))
      .filter(abs(length(col("__sa")) - length(col("__sb"))) <= k)
      .select(col("__sa"), col("__sb"))

    val shortA = sa.filter(length(col("__sa")) <= k)
      .select(col("__sa"), explode(sequence(
        greatest(length(col("__sa")) - k, lit(0)),
        length(col("__sa")) + k)).as("__lb"))
    val peersB = sb.filter(length(col("__sb")) <= 2 * k)
      .select(col("__sb"), length(col("__sb")).as("__lb"))
    val short = shortA.join(peersB, Seq("__lb")).select(col("__sa"), col("__sb"))

    blocked.unionByName(short)
  }

  /** Self-join on Levenshtein distance ≤ k over the distinct values of
    * `strCol`. Output: (a, b, dist), a < b, one row per pair. Exact —
    * blocking is a superset (pigeonhole + short-string length blocking),
    * the rescore is edit distance.
    */
  def editDistanceSelfJoin(df: DataFrame, strCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val names = df.select(col(strCol).as("__s"))
      .filter(col("__s").isNotNull).distinct()
    val cands = candidatePairs(
        names.select(col("__s").as("__sa")),
        names.select(col("__s").as("__sb")), k)
      .filter(col("__sa") < col("__sb"))
      .distinct()
    cands
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= k)
      .select(col("__sa").as("a"), col("__sb").as("b"), col("dist").cast("int").as("dist"))
  }
}
