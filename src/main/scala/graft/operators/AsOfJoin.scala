package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (backward) join — an operator Spark lacks natively (DuckDB ships
  * `ASOF JOIN`; the reference's host engine exposes it).
  *
  * Implemented Spark-first as ONE hash shuffle + window pass via the
  * union-sort-carry technique, instead of an O(n·m) inequality join:
  * tag both inputs, union, sort (key, ts, side) within partitions, and
  * carry the most recent right payload forward with
  * `last(_, ignoreNulls).over(unboundedPreceding..current)`. At 100 TB
  * both sides shuffle once on the key (AQE handles skewed keys); no
  * broadcast or nested loop is involved.
  */
object AsOfJoin {

  /** For each left row, attach the latest right row whose `rightTs` ≤
    * `leftTs` for the same `key`. Right rows must be unique per
    * (key, ts) — pre-aggregate ties upstream or the carried row is
    * unspecified (same caveat as DuckDB ASOF).
    *
    * @param rightPayload right columns to carry (must not collide with
    *                     left column names)
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val lAligned = l.select(
      (Seq(col(key), col("__ts"), col("__side")) ++
        leftCols.filterNot(_ == key).map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
    val rAligned = r.select(
      (Seq(col(key), col("__ts"), col("__side")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col)): _*)

    // side 0 sorts before side 1 at equal ts ⇒ a right row at exactly
    // leftTs is visible to the left row (ASOF's `>=` semantics).
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(lAligned.unionByName(rAligned)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__ts", "__side")
  }
}
