package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Spark-native extension entry point: registers graft's custom Catalyst
  * expressions through `SparkSessionExtensions`, so any session created with
  *
  *   `spark.sql.extensions=graft.functions.GraftExtensions`
  *
  * (or `.withExtensions(new GraftExtensions)`) has `cosine_sim` and
  * `flatten_doc` available in SQL — the idiomatic deployment path on a real
  * cluster, where per-session `functionRegistry` calls
  * ([[GraftFunctions.register]], kept for tests/tools) don't reach every
  * context. The query inventory stays Catalyst-plannable with no custom
  * rules (SURVEY.md §4.2); the ONE injected rule is
  * [[graft.core.MergeMetaRepair]], a post-hoc analysis repair that makes
  * `MERGE INTO ... ON t._id = s.id` legal on containers (Spark 4.1's
  * group-filter construction drops metadata-column references — see that
  * object's scaladoc).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPostHocResolutionRule(_ => graft.core.MergeMetaRepair)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("flatten_doc"),
      new ExpressionInfo(classOf[DocFlatten].getName, "flatten_doc"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DocFlatten(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("lsh_band_sig"),
      new ExpressionInfo(classOf[LshBandSignature].getName, "lsh_band_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LshBandSignature(exprs.head,
          GraftFunctions.litInt(exprs(1)), GraftFunctions.litInt(exprs(2)))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinhashSig(exprs.head, GraftFunctions.shingleN(exprs))))
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[Simhash32].getName, "simhash32"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Simhash32(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordShingles(exprs.head, GraftFunctions.shingleN(exprs))))
    ext.injectFunction((
      FunctionIdentifier("lang_hits"),
      new ExpressionInfo(classOf[LangHits].getName, "lang_hits"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LangHits(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("canonical_json"),
      new ExpressionInfo(classOf[CanonicalJson].getName, "canonical_json"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CanonicalJson(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("json_pk"),
      new ExpressionInfo(classOf[JsonPk].getName, "json_pk"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        JsonPk(exprs.head, GraftFunctions.litString(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("json_inject_pk"),
      new ExpressionInfo(classOf[JsonInjectPk].getName, "json_inject_pk"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        JsonInjectPk(exprs.head, GraftFunctions.litString(exprs(1)).split(",").toSeq)))
    ext.injectFunction((
      FunctionIdentifier("mask_json"),
      new ExpressionInfo(classOf[MaskJson].getName, "mask_json"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MaskJson(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("int_dot"),
      new ExpressionInfo(classOf[IntDot].getName, "int_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        IntDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomMightContain(exprs(1),
          java.util.HexFormat.of().parseHex(GraftFunctions.litString(exprs(0))))))
    ext.injectFunction((
      FunctionIdentifier("json_doc_keys"),
      new ExpressionInfo(classOf[JsonDocKeys].getName, "json_doc_keys"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        JsonDocKeys(exprs.head, GraftFunctions.litString(exprs(1)).split(",").toSeq,
          GraftFunctions.litString(exprs(2)).toBoolean)))
  }
}
