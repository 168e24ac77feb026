package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text[, n])` — distinct word n-gram shingle set of a
  * document, the input signature for MinHash/Jaccard dedup (SURVEY.md §2
  * Part B dedup family; generalizes the reference's content-identity diff,
  * /root/reference/src/migration.py:124-130, from exact to near-duplicate).
  *
  * Semantics are defined to be EXACTLY what the composable built-in form
  * computes — `array_distinct` of space-joined n-grams over
  * `split(lower(text), ' ')` (single-space regex split, trailing empties
  * kept) — so the DuckDB oracle can reproduce the shingle set. It exists
  * because that built-in form needs n-1 nested `zip_with` lambdas, which
  * evaluate interpreted per element: measured at sf0.1 this expression is
  * ~2× faster steady-state and ~4× faster on first run (the nested-HOF
  * codegen alone costs multiple seconds to compile). One virtual call per
  * ROW (not per element) from the generated code keeps the surrounding
  * whole-stage-codegen span intact.
  *
  * Documents with fewer than `n` words yield an empty array. Null in →
  * null out.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // NullType admitted: a NULL literal input always evaluates to null via the
  // UnaryExpression null short-circuit, matching the built-ins' behavior.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType && child.dataType != NullType)
      TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects a string column, got ${child.dataType.sql}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"word_shingles n must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  /** One-pass shingler; called once per row from both eval paths. */
  def shingle(text: UTF8String): ArrayData = {
    // Match Spark's split(lower(text), ' ') exactly: regex single-space,
    // limit -1 (trailing empty tokens preserved); lowering via
    // [[SparkLower]], the byte-exact mirror of the engine's lower().
    val words = SparkLower(text.toString).split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](words.length * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    val last = words.length - n
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    shingle(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $self.shingle($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_bigrams(text)` — adjacent word pairs of a document WITH
  * MULTIPLICITY, as space-joined "w1 w2" strings over the ""-FILTERED
  * token sequence of `split(lower(text), ' ')`. The input signature for
  * the bigram language model ([[graft.operators.TextAnalysis.qT29]]):
  * unlike [[WordShingles]] (distinct shingles over the unfiltered
  * sequence — MinHash's set semantics) a language model needs every
  * occurrence and natural adjacency across collapsed whitespace, so the
  * two kernels are deliberately different functions.
  *
  * Exists for the same reason as [[WordShingles]]: the composable form is
  * a `transform(sequence(...), i -> struct(...))` lambda that evaluates
  * INTERPRETED per element and drags its Project out of whole-stage
  * codegen; this is one virtual call per row inside the generated code
  * (spec-pinned bit-equal to the HOF form, and asserted in-codegen).
  * Tokens contain no spaces, so `substring_index(gram, ' ', 1)` recovers
  * w1 exactly — consumers never need to re-split.
  *
  * Documents with fewer than 2 non-empty tokens yield an empty array.
  * Null in → null out. */
case class WordBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType && child.dataType != NullType)
      TypeCheckResult.TypeCheckFailure(
        s"word_bigrams expects a string column, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  /** One-pass pairing; called once per row from both eval paths. */
  def bigrams(text: UTF8String): ArrayData = {
    val raw = SparkLower(text.toString).split(" ", -1)
    val words = new Array[String](raw.length)
    var n = 0
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) { words(n) = raw(i); n += 1 }
      i += 1
    }
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < n - 1) {
      sb.setLength(0)
      sb.append(words(j)).append(' ').append(words(j + 1))
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    bigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordBigrams", this, classOf[WordBigrams].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $self.bigrams($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Byte-exact mirror of the engine's `lower()` (UTF8String.toLowerCase,
  * Spark 4.1): a full-ASCII string lowers A–Z only (locale-independent);
  * anything else takes `String.toLowerCase()` with the JVM DEFAULT locale
  * — Spark's actual slow path. Kernels claiming "bit-equal to
  * split(lower(text), ' ')" must reproduce BOTH branches: plain
  * default-locale lowering diverges on ASCII 'I' under Turkish locales,
  * and plain Locale.ROOT lowering diverges from Spark's slow path on
  * non-ASCII input under those same locales. */
private[graft] object SparkLower {
  def apply(s: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) s.toLowerCase(java.util.Locale.ROOT) // A–Z only on ASCII
    else s.toLowerCase // Spark's toLowerCaseSlow: JVM default locale
  }
}
