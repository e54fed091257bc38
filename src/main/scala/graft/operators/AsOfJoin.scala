package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of joins — an operator Spark lacks natively (DuckDB ships
  * `ASOF JOIN`; the reference's host engine exposes it).
  *
  * Implemented Spark-first as ONE hash shuffle + window pass via the
  * union-sort-carry technique, instead of an O(n·m) inequality join:
  * tag both inputs, union, sort (key, ts, side) within partitions, and
  * carry the nearest right payload across with
  * `last(_, ignoreNulls).over(unboundedPreceding..current)` (ordered
  * ascending for backward, descending for forward). At 100 TB both sides
  * shuffle once on the key (AQE handles skewed keys); no broadcast or
  * nested loop is involved.
  */
object AsOfJoin {

  /** For each left row, attach the LATEST right row with `rightTs` ≤
    * `leftTs` for the same `key` (DuckDB `ASOF ... ON l.ts >= r.ts`).
    * Right rows must be unique per (key, ts) — pre-aggregate ties
    * upstream or the carried row is unspecified (same caveat as DuckDB).
    *
    * @param rightPayload right columns to carry (must not collide with
    *                     left column names)
    * @param tolerance    optional maximum |leftTs − rightTs| in the ts
    *                     column's own comparable units (seconds for
    *                     timestamps via double cast); matches farther
    *                     away than this carry NULL payloads instead
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      tolerance: Option[Double] = None): DataFrame =
    asof(left, right, key, leftTs, rightTs, rightPayload, forwardDir = false, tolerance)

  /** For each left row, attach the EARLIEST right row with `rightTs` ≥
    * `leftTs` (DuckDB `ASOF ... ON l.ts <= r.ts`). Same contracts as
    * [[backward]].
    */
  def forward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      tolerance: Option[Double] = None): DataFrame =
    asof(left, right, key, leftTs, rightTs, rightPayload, forwardDir = true, tolerance)

  private def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      forwardDir: Boolean, tolerance: Option[Double]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rtsType = right.schema(rightTs).dataType
    val lAligned = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(
        (Seq(col(key), col("__ts"), col("__side")) ++
          leftCols.filterNot(_ == key).map(col) ++
          (rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
            lit(null).cast(rtsType).as("__rts"))): _*)
    val rAligned = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(
        (Seq(col(key), col("__ts"), col("__side")) ++
          leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          (rightPayload.map(col) :+ col(rightTs).as("__rts"))): _*)

    // side 0 sorts before side 1 at equal ts in traversal order ⇒ a right
    // row at exactly leftTs is visible to the left row (ASOF's inclusive
    // bound). Backward walks ascending ts; forward walks descending.
    val ord = if (forwardDir) Seq(col("__ts").desc, col("__side").asc)
      else Seq(col("__ts").asc, col("__side").asc)
    val w = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (rightPayload :+ "__rts").foldLeft(lAligned.unionByName(rAligned)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val masked = tolerance match {
      case None => carried
      case Some(tol) =>
        val delta = if (forwardDir) col("__rts").cast("double") - col("__ts").cast("double")
          else col("__ts").cast("double") - col("__rts").cast("double")
        val inTol = col("__rts").isNotNull && delta <= tol
        rightPayload.foldLeft(carried) { (df, c) =>
          df.withColumn(c, when(inTol, col(c)))
        }
    }
    masked.filter(col("__side") === 1).drop("__ts", "__side", "__rts")
  }
}
