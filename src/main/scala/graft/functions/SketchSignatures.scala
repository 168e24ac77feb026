package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document sketch kernels for the dedup family.
  *
  * The composable formulations explode a token/shingle stream (one row per
  * token) and aggregate it back per document — correct, but the explode
  * generator plus the 33-column partial aggregate dominate the signature
  * pass, and at 100 TB that pass is a full-corpus map. These expressions
  * compute the identical signatures in ONE pass per row, no generator, no
  * aggregation state, one virtual call per ROW from the generated code (the
  * [[WordShingles]] pattern), so the whole signature stage collapses into
  * the scan's codegen span.
  *
  * Both reproduce their composable forms bit-for-bit (spec-checked), so the
  * DuckDB oracles — which recompute md5-prefix hashes per token — still
  * match exactly:
  *  - hash = first 8 md5 hex digits as an unsigned 32-bit value
  *    ([[Hashing.md5h32]]);
  *  - tokenization matches `split(lower(text), ' ')` (limit -1, empties
  *    kept) / [[WordShingles]] shingling.
  */
object SketchSignatures {
  /** md5-prefix hash of a string's UTF-8 bytes — [[Hashing.md5h32]] in JVM
    * form (first 4 digest bytes, big-endian, unsigned). */
  def md5h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** `minhash_sig(text, n)` → struct<m1..m4: bigint>: the 4-permutation
  * MinHash signature over distinct word n-gram shingles — the fused form of
  * explode([[WordShingles]]) → md5h32 → groupBy(min per permutation).
  * Null text, or a document with fewer than `n` words (zero shingles —
  * which the explode+groupBy form silently drops), returns null: callers
  * filter nulls to keep the historical row set. */
case class MinhashSig(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(
    (1 to Hashing.MinhashParams.size).map(i =>
      StructField(s"m$i", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType && child.dataType != NullType)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects a string column, got ${child.dataType.sql}")
    else if (n < 1) TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val shingler = WordShingles(child, n)

  /** One fused pass: shingle, hash, fold the permutation minimums. */
  def compute(text: UTF8String): InternalRow = {
    val grams = shingler.shingle(text)
    val m = grams.numElements()
    if (m == 0) return null
    val params = Hashing.MinhashParams
    val p = Hashing.MinhashPrime
    val mins = Array.fill(params.size)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = SketchSignatures.md5h32(grams.getUTF8String(i).toString)
      var k = 0
      while (k < params.size) {
        val (a, b) = params(k)
        val v = (a * h + b) % p
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericInternalRow(mins.map(Long.box).toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashSig", this, classOf[MinhashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = $self.compute($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash32(text)` → bigint: 32-bit SimHash by per-bit majority vote over
  * the md5h32 hashes of the whitespace token stream (duplicates count,
  * empty tokens kept — exactly `explode(split(lower(text), ' '))`). The
  * fused form of the explode → 32-bit-sum aggregate → majority projection. */
case class Simhash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects a string column, got ${child.dataType.sql}")

  def compute(text: UTF8String): Long = {
    // split(lower(text), ' ') semantics: limit -1, empties kept — a split
    // always yields >= 1 token, so every document gets a signature
    val words = text.toString.toLowerCase.split(" ", -1)
    val counts = new Array[Int](32)
    var i = 0
    while (i < words.length) {
      val h = SketchSignatures.md5h32(words(i))
      var b = 0
      while (b < 32) {
        counts(b) += ((h >> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    val nTok = words.length
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) * 2 > nTok) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhash32", this, classOf[Simhash32].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
