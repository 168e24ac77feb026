package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PRODUCT-QUANTIZATION encoder: the [[graft.operators.Similarity.qSim13]]
  * hot loop — per input vector, the argmin-L2 code in each of `subspaces`
  * equal slices against a fixed codebook — as ONE codegen'd expression.
  *
  * The higher-order-function formulation (`transform(sequence(...),
  * array_min(transform(...)))`) is semantically identical but runs
  * INTERPRETED: Spark's lambda functions don't participate in whole-stage
  * codegen, so a 16-code × 64-dim encode costs ~1024 boxed lambda
  * evaluations per row — measured as the dominant stage of the suite's
  * most expensive similarity query. Here the codebook rides
  * `addReferenceObj` as a flat `long[]` (plan text stays O(1), the
  * [[BloomMightContain]] discipline) and the three nested loops compile
  * into the fused scan loop.
  *
  * Semantics pinned to the HOF form and the DuckDB oracle: exact BIGINT
  * squared-L2 per (subspace, code), argmin with ties to the LOWEST code
  * (strict `<` over ascending code order). Null input → null; input
  * length must equal the codebook's vector length. Constructed directly
  * via [[org.apache.spark.sql.GraftColumn.of]] — the codebook is bound
  * state, not SQL text. */
case class PqEncode(child: Expression, codebook: Array[Array[Long]],
                    subspaces: Int) extends UnaryExpression {

  // non-emptiness FIRST (ADVICE r10): `codebook.head` on an empty codebook
  // would die with NoSuchElementException instead of the contract message
  require(codebook.nonEmpty, "pq_encode: codebook must be non-empty")
  private val dims = codebook.head.length
  require(subspaces > 0 && dims % subspaces == 0 &&
    codebook.forall(_.length == dims),
    s"codebook must be rectangular with dims divisible by $subspaces")
  private val sub = dims / subspaces

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // BIGINT (the qSim13 quantized frame) or TINYINT (the durable
    // `assignment_int8` serving lane, qSim14) — values are identical by
    // the quantizer's range contract, so both encode to the same codes
    case ArrayType(LongType, _) | ArrayType(ByteType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects ARRAY<BIGINT> or ARRAY<TINYINT>, got ${t.sql}")
  }

  @transient private lazy val isByte: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == ByteType

  /** Flat row-major codebook (code × dim) — one JVM object per generated
    * class, indexed arithmetic in the fused loop. */
  @transient private lazy val flat: Array[Long] = codebook.flatten

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    // eval-time contract check (ADVICE r10): a short input must surface as
    // the documented error, not a raw ArrayIndexOutOfBounds from the loop
    if (arr.numElements() != dims)
      throw new IllegalArgumentException(
        s"pq_encode: input length ${arr.numElements()} != codebook " +
          s"vector length $dims")
    val k = codebook.length
    val out = new Array[Int](subspaces)
    var m = 0
    while (m < subspaces) {
      var bestC = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < k) {
        var d = 0L
        var j = 0
        while (j < sub) {
          val x = if (isByte) arr.getByte(m * sub + j).toLong
                  else arr.getLong(m * sub + j)
          val diff = x - flat(c * dims + m * sub + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      out(m) = bestC
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", flat, "long[]")
    val k = codebook.length
    val get = if (isByte) "getByte" else "getLong"
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("pqOut")
      val m = ctx.freshName("m"); val c = ctx.freshName("c")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val bestC = ctx.freshName("bestC"); val bestD = ctx.freshName("bestD")
      s"""
         |if ($v.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: input length " + $v.numElements() +
         |    " != codebook vector length " + $dims);
         |}
         |int[] $out = new int[$subspaces];
         |for (int $m = 0; $m < $subspaces; $m++) {
         |  int $bestC = 0; long $bestD = Long.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    long $d = 0L;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      long $diff = (long) $v.$get($m * $sub + $j) - $cb[$c * $dims + $m * $sub + $j];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $bestC = $c; }
         |  }
         |  $out[$m] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native integer dot product over two ARRAY<BIGINT> columns — the int8
  * exact-rescoring kernel ([[graft.operators.Similarity.qSim13]]'s truth
  * lane; the same shape qSim9/qSim11 rescore with). Identical to
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, v) -> s + v)` on
  * equal-length inputs, but codegen'd: 64 multiplies in the fused loop
  * instead of 64 interpreted lambda calls per joined row. Null if either
  * side is null; lengths must match (the fixed-dim vector contract). */
case class IntDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int_dot expects two ARRAY<BIGINT>, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    require(x.numElements() == y.numElements(),
      s"int_dot: length mismatch ${x.numElements()} vs ${y.numElements()}")
    var s = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""
         |long $s = 0L;
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException("int_dot: length mismatch");
         |}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
