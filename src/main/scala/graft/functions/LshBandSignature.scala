package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: sign-LSH band signature of an embedding.
  *
  * Bit `j` (0-based) of the result is set iff the dot product of the vector
  * with deterministic ±1 hyperplane `firstPlane + j` is >= 0. The planes are
  * the md5-seeded family shared with the DuckDB oracle
  * ([[LshBandSignature.planeSign]] — `graft.operators.Similarity` delegates
  * here), and dots accumulate in index order with double precision, so for
  * vectors of exactly [[LshBandSignature.MaxDim]] elements the result is
  * bit-identical to the `zip_with`+`aggregate` HOF formulation it replaces.
  * Other lengths get zero-padding/truncation semantics: the dot covers the
  * first `min(dim, MaxDim)` elements (a real partial dot), where the HOF
  * form's `zip_with` null-padding would have nulled the whole dot and forced
  * every bit to 0 — the kernel's behavior is the meaningful one, but it is
  * NOT bit-parity with the HOF form off the MaxDim width.
  *
  * Why an expression: Spark's higher-order functions evaluate their lambdas
  * INTERPRETED, once per element per plane — for a b-bit band over a d-dim
  * vector that is b×d lambda invocations and b intermediate arrays per row,
  * outside whole-stage codegen. At 100 TB the signature pass is a full-corpus
  * map; this expression is one fused primitive loop with a precomputed sign
  * table, codegen'd into the scan's stage via [[doGenCode]].
  *
  * Null vector → null. Planes cover the first [[LshBandSignature.MaxDim]]
  * dimensions (the corpus dimensionality), matching the HOF form's
  * fixed-width plane arrays.
  */
case class LshBandSignature(child: Expression, firstPlane: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
      if bits >= 1 && bits <= 63 && firstPlane >= 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"lsh_band_sig expects (array<float>|array<double>, firstPlane >= 0, 1 <= bits <= 63), " +
        s"got ${child.dataType.sql}, $firstPlane, $bits")
  }

  /** bits × MaxDim sign table, computed once on the driver and shipped as a
    * codegen reference object. */
  @transient private lazy val signs: Array[Array[Double]] =
    Array.tabulate(bits, LshBandSignature.MaxDim)((j, i) =>
      LshBandSignature.planeSign(firstPlane + j, i + 1))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), LshBandSignature.MaxDim)
    val isF = elemFloat
    var sig = 0L
    var j = 0
    while (j < bits) {
      val row = signs(j)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * row(i)
        i += 1
      }
      if (dot >= 0.0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "double[][]")
    val get =
      if (elemFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      val row = ctx.freshName("row"); val sig = ctx.freshName("sig")
      s"""
         |final int $n = java.lang.Math.min($v.numElements(), ${LshBandSignature.MaxDim});
         |long $sig = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  final double[] $row = $signsRef[$j];
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ${get(v, i)} * $row[$i];
         |  }
         |  if ($dot >= 0.0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBandSignature {
  /** Plane width — the embedding dimensionality of the corpus (TESTDATA.md);
    * the HOF form builds its plane literals at exactly this width. */
  val MaxDim = 64

  /** Deterministic ±1 hyperplane entries, seeded from md5 of "p_i" — the
    * exact value the DuckDB oracle recomputes, so both engines build the
    * same planes without sharing state. The canonical definition of the
    * family (operators delegate here). */
  def planeSign(p: Int, i: Int): Double = {
    val b = s"${p}_$i".getBytes("UTF-8")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(b, 0, b.length)
    val d = md.digest()
    val fp = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    if (fp % 2 == 0) 1.0 else -1.0
  }
}
