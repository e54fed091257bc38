package graft.functions

import org.apache.spark.broadcast.Broadcast
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
  * interpreted projection seam). The filter travels as a BROADCAST —
  * the expression holds only the small `Broadcast` handle, so a
  * multi-GB filter ships via chunked TorrentBroadcast once per
  * executor (the too-wide-to-broadcast-exactly regime these probes
  * exist for), never inside the per-stage task binary whose single
  * serialization buffer caps at ~2 GB. Codegen resolves
  * `broadcast.value()` ONCE per generated instance into a field; the
  * per-row call is a plain virtual `mightContainLong`.
  *
  * NULL digest → NULL verdict (UnaryExpression's null-safe contract):
  * the filter can prove nothing about a row it never hashed. Callers
  * that must keep the conservative route-to-exact-path semantics
  * coalesce the verdict to TRUE (probeBloomLedger documents why).
  */
final case class BloomMightContain(child: Expression,
    bc: Broadcast[BloomFilter]) extends UnaryExpression {
  require(bc != null, "bloom filter broadcast must be non-null")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"digest must be long, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    bc.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    val filter = ctx.addMutableState(
      "org.apache.spark.util.sketch.BloomFilter", "bloomFilter",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $bcRef.value();")
    defineCodeGen(ctx, ev, c => s"$filter.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  import org.apache.spark.sql.GraftSqlShims

  /** `might_contain(digest)` over a driver-built filter; `digest` must
    * be LONG (cast upstream — the digest family's 32-bit md5 fits).
    * Broadcasts the filter once per CALL — build the Column once and
    * reuse it. Lifecycle: ContextCleaner reclaims the broadcast when
    * the returned plan is garbage-collected (the handle lives only in
    * the expression — the hnswTopK contract), so a long-lived service
    * probing per batch does not accrete blocks as long as it drops the
    * result frames; a service that wants deterministic reclamation
    * should broadcast the filter itself and use the [[Broadcast]]
    * overload, destroying the handle when done.
    */
  def mightContain(digest: Column, filter: BloomFilter): Column =
    mightContain(digest,
      org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(filter))

  /** [[mightContain]] over a caller-owned broadcast handle: reuse ONE
    * broadcast across many probe plans (e.g. a standing service probing
    * every microbatch against the same ledger filter) and
    * `bc.destroy()` it deterministically when retiring the filter,
    * instead of waiting for the plans to be GC'd.
    */
  def mightContain(digest: Column, bc: Broadcast[BloomFilter]): Column =
    GraftSqlShims.column(BloomMightContain(GraftSqlShims.expression(digest), bc))
}
