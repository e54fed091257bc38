package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(digest)` — THE membership-probe kernel, shared
  * by every bloom consumer (the d24b decontamination prefilter in
  * [[graft.operators.CurationOps.ngramOverlapBloom]] and the at-rest
  * bloom ledger's probe in
  * [[graft.operators.DedupOps.probeBloomLedger]], d119/d120): one
  * definition of the no-false-negative contract instead of two
  * call-site lambdas.
  *
  * A native codegen expression, not a Scala UDF: the probe stays
  * INSIDE whole-stage codegen (no per-row encoder boundary, no
  * interpreted projection seam), and the filter rides as a codegen
  * reference object — shipped once per stage inside the broadcast task
  * binary, exactly the distribution cost of the explicit
  * `sparkContext.broadcast` the UDF form paid, without the UDF.
  *
  * NULL digest → NULL verdict (UnaryExpression's null-safe contract):
  * the filter can prove nothing about a row it never hashed. Callers
  * that must keep the conservative route-to-exact-path semantics
  * coalesce the verdict to TRUE (probeBloomLedger documents why).
  */
final case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {
  require(filter != null, "bloom filter must be non-null")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"digest must be long, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter,
      "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  import org.apache.spark.sql.GraftSqlShims

  /** `might_contain(digest)` over a driver-built filter; `digest` must
    * be LONG (cast upstream — the digest family's 32-bit md5 fits).
    */
  def mightContain(digest: Column, filter: BloomFilter): Column =
    GraftSqlShims.column(BloomMightContain(GraftSqlShims.expression(digest), filter))
}
