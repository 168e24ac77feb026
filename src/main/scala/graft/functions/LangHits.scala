package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `lang_hits(text)` → struct<n, en, es, de, fr: bigint>: the whitespace
  * token count plus per-language function-word hit counts (duplicates count
  * — frequency weights the language vote) in ONE pass per document.
  *
  * The fused form of `size(split(lower(text), ' '))` plus four
  * `size(filter(toks, w -> w IN (...)))` HOFs — whose lambdas evaluate
  * interpreted once per token per language. Tokenization matches
  * `split(lower(text), ' ')` (limit -1, empties kept; "" hits no list), so
  * the counts are identical to the composable form and the DuckDB oracles,
  * which recompute them with `list_filter`, still match bit-for-bit.
  * Null in → null out.
  */
case class LangHits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(
    ("n" +: LangHits.StopWords.map(_._1)).map(f =>
      StructField(f, LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_hits expects a string column, got ${child.dataType.sql}")

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    LangHits.StopWords.map { case (_, ws) =>
      val s = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(s.add); s
    }.toArray

  def compute(text: UTF8String): InternalRow = {
    val words = text.toString.toLowerCase.split(" ", -1)
    val counts = new Array[Long](sets.length)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var k = 0
      while (k < sets.length) {
        if (sets(k).contains(w)) counts(k) += 1
        k += 1
      }
      i += 1
    }
    new GenericInternalRow(
      (words.length.toLong +: counts.toSeq).map(Long.box).toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("langHits", this, classOf[LangHits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangHits {
  /** Function-word lists for the n-gram/stopword language-ID heuristic —
    * tiny high-frequency sets, deterministic and oracle-matchable (the same
    * lists are inlined in the DuckDB SQL). Canonical definition; the
    * operators layer delegates here. */
  val StopWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est"))
}
