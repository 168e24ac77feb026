package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two numeric arrays.
  *
  * This is the hot inner loop of the similarity-search operators (SURVEY.md
  * Q-X2 / the ANN queries). A `zip_with`+`aggregate` HOF pipeline allocates an
  * intermediate array per row and evaluates three lambda passes; this
  * expression does one fused pass over both arrays with primitive doubles and
  * participates in whole-stage codegen via [[doGenCode]] — on a brute-force
  * k×N candidate join that loop IS the query, so it must not fall out of
  * codegen.
  *
  * Accumulation is in index order with double precision, which is exactly what
  * the DuckDB oracle's explicit `sum(a[i]*b[i])` computes — bit-identical
  * results, so ROUND(.,4) comparisons are stable.
  *
  * Returns null when either input is null or either norm is zero.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case _                => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall { e =>
      val et = elemType(e); et == FloatType || et == DoubleType
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float>/array<double>, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(v: String, e: Expression, i: String): String =
      if (elemType(e) == FloatType) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xv = ${get(a, left, i)};
         |  final double $yv = ${get(b, right, i)};
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session-level registration of graft's custom Catalyst expressions, so they
  * are usable from `expr(...)` / `selectExpr` / `spark.sql` alongside
  * built-ins. Idempotent — query builders call it defensively. */
object GraftFunctions {
  // once per session: query builders call register() defensively on every
  // invocation, and re-registering 12 functions per query both wastes work
  // and spams a "function X replaced" warning per function per call
  private val registered =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def register(spark: SparkSession): Unit = {
    if (!registered.add(spark)) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_band_sig", exprs => LshBandSignature(exprs.head,
        litInt(exprs(1)), litInt(exprs(2))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinhashSig(exprs.head, shingleN(exprs)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash32", exprs => Simhash32(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lang_hits", exprs => LangHits(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "flatten_doc", exprs => DocFlatten(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs.head, shingleN(exprs)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_bigrams", exprs => WordBigrams(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "canonical_json", exprs => CanonicalJson(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_pk", exprs => JsonPk(exprs.head, litString(exprs(1))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_inject_pk",
      exprs => JsonInjectPk(exprs.head, litString(exprs(1)).split(",").toSeq), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mask_json", exprs => MaskJson(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int_dot", exprs => IntDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => BloomMightContain(exprs(1),
        java.util.HexFormat.of().parseHex(litString(exprs(0)))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_doc_keys",
      exprs => JsonDocKeys(exprs.head, litString(exprs(1)).split(",").toSeq,
        litString(exprs(2)).toBoolean), "built-in")
  }

  /** Literal string argument evaluated at registration time (pk paths are
    * plan constants, like word_shingles' n). */
  private[functions] def litString(
      e: org.apache.spark.sql.catalyst.expressions.Expression): String =
    e.eval(null).toString

  /** Literal int argument evaluated at registration time. */
  private[functions] def litInt(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  /** Optional literal-int second arg of word_shingles; default 3-grams. */
  private[functions] def shingleN(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Int =
    if (exprs.lengthCompare(1) > 0)
      exprs(1).eval(null).asInstanceOf[Number].intValue()
    else 3
}
