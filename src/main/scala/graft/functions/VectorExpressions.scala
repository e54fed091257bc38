package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}

/** Native Catalyst expressions for the hot inner loops of similarity and
  * dedup operators (SURVEY §7.3 "custom, only if benchmarks demand"): the
  * composable `zip_with`/`aggregate`/`array_intersect` forms either
  * allocate an intermediate array per pair or run interpreted (higher-
  * order functions have no codegen and no common-subexpression
  * elimination). These run a fused primitive loop inside whole-stage
  * codegen instead.
  *
  * Semantics are pinned to the composable forms (and to the DuckDB
  * oracle) on well-formed inputs — see each expression's contract.
  */

private[functions] object VecTypeChecks {
  def arrayOf(dt: DataType, elem: DataType): Boolean = dt match {
    case ArrayType(e, _) => e == elem
    case _ => false
  }
  def check(left: Expression, right: Expression, lElem: DataType, rElem: DataType): TypeCheckResult =
    if (!arrayOf(left.dataType, lElem))
      TypeCheckResult.TypeCheckFailure(s"left must be array<$lElem>, got ${left.dataType}")
    else if (!arrayOf(right.dataType, rElem))
      TypeCheckResult.TypeCheckFailure(s"right must be array<$rElem>, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess
}

/** Fused float×float dot product: FLOAT multiply per element, DOUBLE
  * accumulate left-to-right — bit-identical to
  * `aggregate(zip_with(a,b,(x,y)=>x*y),0d,(acc,v)=>acc+v)` on equal-length
  * arrays with no null elements.
  *
  * Contract (divergence from the composable form, by design — callers are
  * the similarity operators, which always pass equal-length non-null
  * embeddings): length-mismatched inputs dot the common prefix (the
  * composable form yields NULL via zip_with's null padding), and null
  * elements read as 0 rather than nulling the result.
  */
final case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeChecks.check(left, right, FloatType, FloatType)

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

/** Fused float×double dot product — the hyperplane-projection kernel
  * (embedding `array<float>` · plane-literal `array<double>`). Each float
  * element is promoted to double before the multiply, matching
  * `zip_with(vec, planes, (x,y) => x*y)` exactly (Catalyst inserts the
  * same float→double cast on x). Same prefix/null contract as
  * [[DotProductF]].
  */
final case class DotProductFD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeChecks.check(left, right, FloatType, DoubleType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getDouble(i)
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
         |  $acc += ((double) $a.getFloat($i)) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused float×double squared-L2 distance — the k-means assignment kernel
  * (IVF). Per element: promote the float to double, subtract, square,
  * accumulate — bit-identical to
  * `aggregate(zip_with(v, c, (x,y) => (x-y)*(x-y)), 0d, (a,v) => a+v)`
  * on equal-length non-null inputs. Same prefix/null contract as
  * [[DotProductF]].
  */
final case class SqDistFD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeChecks.check(left, right, FloatType, DoubleType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ((double) $a.getFloat($i)) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused float×float squared-L2 distance — the exact-L2-top-k kernel
  * between two stored embeddings. Per element: FLOAT subtract, FLOAT
  * multiply, then widen to double for the accumulate — bit-identical to
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0d, (acc,v) => acc+v)`
  * on float arrays AND to DuckDB's
  * `list_sum(list_transform(..., i -> (a[i]-b[i]) * (a[i]-b[i])))`
  * (both do the subtract/multiply in float precision and sum in double).
  * Same prefix/null contract as [[DotProductF]].
  */
final case class SqDistFF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeChecks.check(left, right, FloatType, FloatType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i) - b.getFloat(i) // float subtract
      acc += d * d                          // float multiply, double add
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  float $d = $a.getFloat($i) - $b.getFloat($i);
         |  $acc += (double) ($d * $d);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Merge-count of common elements between two SORTED string arrays — the
  * set-intersection kernel of pairwise Jaccard rescoring. Replaces
  * `size(array_intersect(a, b))`, which builds a fresh hash set and an
  * output array PER PAIR (the measured d10 hotspot: two set builds ×
  * 131k pairs); this is a zero-allocation two-pointer merge inside
  * whole-stage codegen.
  *
  * Contract: both inputs must be sorted ascending (Spark `array_sort`
  * order, i.e. UTF8String binary order), duplicate-free, with no null
  * elements — exactly what `array_sort(array_distinct(split(...)))`
  * produces. On such inputs the count equals
  * `size(array_intersect(a, b))`; unsorted input silently undercounts.
  */
final case class IntersectCountS(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeChecks.check(left, right, StringType, StringType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var c = 0L
    var i = 0
    var j = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp < 0) i += 1
      else if (cmp > 0) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |long $c = 0L;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $na && $j < $nb) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp < 0) { $i++; }
         |  else if ($cmp > 0) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Bucketed byte histogram of a binary payload — the deterministic
  * feature-extraction kernel for multimodal columns (a real pipeline
  * computes channel/spectral histograms the same way: one fused pass over
  * the bytes, small fixed-width vector out, the payload itself never
  * leaves the scan). Bucket of byte b (unsigned) = b·buckets/256; output
  * is the count per bucket as `array<int>` — integer-exact, so results
  * are oracle-checkable cross-engine.
  */
final case class ByteHistogram(child: Expression, buckets: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(buckets > 0 && buckets <= 256 && 256 % buckets == 0,
    s"buckets must divide 256, got $buckets")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val shift = Integer.numberOfTrailingZeros(256 / buckets)
    val counts = new Array[Int](buckets)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) & 0xff) >>> shift) += 1
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val shift = Integer.numberOfTrailingZeros(256 / buckets)
    nullSafeCodeGen(ctx, ev, b => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      s"""
         |int[] $counts = new int[$buckets];
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $counts[($b[$i] & 0xff) >>> $shift]++;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($counts);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared runtime for the int8 scalar-quantization kernels — a named
  * object so codegen can call it by a stable JVM path.
  */
object VecQuantUtil {
  /** Symmetric per-vector int8 quantization of `array<float>`:
    * `scale = maxAbs / 127` (0 for the all-zero vector), `q_i =
    * round(x_i / scale)` — every code is in [-127, 127], so `-q` never
    * overflows and the codebook is sign-symmetric (the faiss `SQ8`
    * convention). Returns `struct<q: binary, scale: double>`; the
    * original value is `q_i * scale` to within half a step, and
    * `dot(a, b) ≈ dotI8(qa, qb) * scale_a * scale_b`.
    */
  def quantizeI8(v: ArrayData): InternalRow = {
    val n = v.numElements()
    var maxAbs = 0f
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    val q = new Array[Byte](n)
    if (scale > 0) {
      i = 0
      while (i < n) {
        q(i) = math.round(v.getFloat(i) / scale).toByte // |x|<=maxAbs ⇒ code in [-127,127]
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](q, scale))
  }

  /** Integer dot product of two int8 code vectors (common prefix). */
  def dotI8(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a(i).toLong * b(i).toLong
      i += 1
    }
    acc
  }
}

/** `quantize_i8(vec)` → `struct<q: binary, scale: double>` — see
  * [[VecQuantUtil.quantizeI8]]. The 4×-smaller at-rest form of an
  * embedding column: 64 code bytes + one double per vector instead of
  * 256 float bytes.
  */
final case class QuantizeI8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("q", org.apache.spark.sql.types.BinaryType, nullable = false),
    org.apache.spark.sql.types.StructField("scale", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecTypeChecks.arrayOf(child.dataType, FloatType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be array<float>, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    VecQuantUtil.quantizeI8(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecQuantUtil.quantizeI8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `dot_i8(a, b)` → BIGINT — fused integer dot product of two int8 code
  * vectors (binary columns). Exact integer arithmetic: 64-dim worst case
  * is 64·127² ≈ 2^20, nowhere near overflow. Same common-prefix contract
  * as [[DotProductF]].
  */
final case class DotI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = {
    val bt = org.apache.spark.sql.types.BinaryType
    if (left.dataType != bt)
      TypeCheckResult.TypeCheckFailure(s"left must be binary, got ${left.dataType}")
    else if (right.dataType != bt)
      TypeCheckResult.TypeCheckFailure(s"right must be binary, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    VecQuantUtil.dotI8(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.length, $b.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a[$i] * (long) $b[$i];
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

  /** Fused float×double dot product (codegen'd) — embedding · plane literal. */
  def dotFD(a: Column, b: Column): Column =
    GraftSqlShims.column(DotProductFD(GraftSqlShims.expression(a), GraftSqlShims.expression(b)))

  /** Fused float×double squared-L2 distance (codegen'd) — k-means kernel. */
  def sqDistFD(a: Column, b: Column): Column =
    GraftSqlShims.column(SqDistFD(GraftSqlShims.expression(a), GraftSqlShims.expression(b)))

  /** Fused float×float squared-L2 distance (codegen'd) — exact L2 top-k. */
  def sqDistFF(a: Column, b: Column): Column =
    GraftSqlShims.column(SqDistFF(GraftSqlShims.expression(a), GraftSqlShims.expression(b)))

  /** Merge-count of common elements of two sorted distinct string arrays. */
  def intersectCountSorted(a: Column, b: Column): Column =
    GraftSqlShims.column(IntersectCountS(GraftSqlShims.expression(a), GraftSqlShims.expression(b)))

  /** Bucketed byte histogram of a binary column (codegen'd, one pass). */
  def byteHistogram(bin: Column, buckets: Int): Column =
    GraftSqlShims.column(ByteHistogram(GraftSqlShims.expression(bin), buckets))

  /** Symmetric int8 scalar quantization → `struct<q binary, scale double>`. */
  def quantizeI8(vec: Column): Column =
    GraftSqlShims.column(QuantizeI8(GraftSqlShims.expression(vec)))

  /** Fused integer dot product of two int8 code vectors (codegen'd). */
  def dotI8(a: Column, b: Column): Column =
    GraftSqlShims.column(DotI8(GraftSqlShims.expression(a), GraftSqlShims.expression(b)))

  /** Register SQL forms: `dot_f(a,b)`, `dot_fd(a,b)`, `intersect_count_s(a,b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_f", exprs => DotProductF(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_fd", exprs => DotProductFD(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("intersect_count_s", exprs => IntersectCountS(exprs(0), exprs(1)), "built-in")
  }
}
