package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math — the hot inner loop of
  * brute-force/ANN similarity (SURVEY §7.3 "custom, only if benchmarks
  * demand": the `zip_with` + `aggregate` composition allocates an
  * intermediate array per pair; these run a fused primitive loop inside
  * whole-stage codegen instead).
  *
  * Semantics are pinned to the composable form (and to the DuckDB
  * oracle): FLOAT multiply per element, DOUBLE accumulate left-to-right —
  * results are bit-identical to `aggregate(zip_with(a,b,(x,y)=>x*y),0d,+)`.
  */
final case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(FloatType, containsNull = false)
      || left.dataType == ArrayType(FloatType, containsNull = true)) {
      if (right.dataType.isInstanceOf[ArrayType]
        && right.dataType.asInstanceOf[ArrayType].elementType == FloatType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"right must be array<float>, got ${right.dataType}")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"left must be array<float>, got ${left.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i) * b.getFloat(i) // float multiply, double add
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getFloat($i) * $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import org.apache.spark.sql.GraftSqlShims

  /** Fused float-array dot product (codegen'd). */
  def dotF(a: Column, b: Column): Column =
    GraftSqlShims.column(DotProductF(GraftSqlShims.expression(a), GraftSqlShims.expression(b)))

  /** Register SQL form: `SELECT dot_f(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f", exprs => DotProductF(exprs(0), exprs(1)), "built-in")
}
