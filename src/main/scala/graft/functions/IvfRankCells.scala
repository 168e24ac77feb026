package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: rank the IVF coarse-quantizer cells for one
  * embedding — returns the `nprobe` nearest cell ids by cosine similarity,
  * descending, ties toward the lower cell id (the assignment is
  * `element_at(..., 1)`).
  *
  * Why an expression with DRIVER-BOUND centroids: the previous formulation
  * inlined the K×dim centroid matrix as SQL literal text
  * (`array(named_struct('s', cosine_sim(embedding, array(...)), ...))`),
  * re-parsed into every assignment/probe plan — at the documented 100 TB
  * posture (K ≈ √N) that is megabytes of literal SQL per plan and a separate
  * codegen'd cosine loop PER CENTROID (a Janino method-size bomb). Here the
  * centroid matrix is a constructor field shipped to codegen as ONE
  * reference object ([[CodegenContext.addReferenceObj]]); the generated code
  * is a single virtual call into [[IvfRankCells.rank]] regardless of K, so
  * plan size and generated-code size are O(1) in K.
  *
  * Oracle parity: sims accumulate exactly like [[CosineSimilarity]] (index
  * order, doubles, `dot / (sqrt(na) * sqrt(nb))`), so rankings are
  * bit-identical to the literal-SQL formulation they replace — float seed
  * centroids are widened to double at construction (exact), trained
  * centroids carry the ROUND(·,6) contract from the build.
  *
  * Null embedding → null. A zero-norm vector or centroid ranks that cell at
  * -∞ (last, id tiebreak) instead of cosine's null — the corpus contract
  * (TESTDATA embeddings) has no zero vectors.
  */
case class IvfRankCells(child: Expression, nprobe: Int,
                        cellIds: Array[Long], cents: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
      if nprobe >= 1 && cellIds.length == cents.length && cents.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"ivf_rank_cells expects (array<float>|array<double>) with nprobe >= 1 " +
        s"and a non-empty centroid set, got ${child.dataType.sql}, nprobe=$nprobe")
  }

  /** Centroid self-norms, accumulated in index order exactly as
    * [[CosineSimilarity]] would per pair — precomputing changes nothing
    * bit-wise because each accumulator is independent. */
  @transient private lazy val centNorms: Array[Double] = cents.map { c =>
    var nb = 0.0; var i = 0
    while (i < c.length) { nb += c(i) * c(i); i += 1 }
    nb
  }

  /** The whole ranking for one vector — called from both interpreted eval
    * and the generated code (one virtual call per row; the K×dim loop runs
    * as plain JVM-compiled code either way). Returns null for a vector
    * with null ELEMENTS (the schema allows them): silently reading one as
    * 0.0 would produce a wrong-but-plausible assignment, and the HOF
    * formulation this replaces also nulled out. */
  def rank(v: ArrayData): ArrayData = {
    val isF = elemFloat
    val k = cents.length
    val nv = v.numElements()
    var j = 0
    while (j < nv) {
      if (v.isNullAt(j)) return null
      j += 1
    }
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val n = math.min(nv, cent.length)
      var dot = 0.0; var na = 0.0
      var i = 0
      while (i < n) {
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * cent(i); na += x * x
        i += 1
      }
      sims(c) = if (na == 0.0 || centNorms(c) == 0.0) Double.NegativeInfinity
      else dot / (math.sqrt(na) * math.sqrt(centNorms(c)))
      c += 1
    }
    // top-nprobe selection by (sim desc, cellId asc): nprobe is small (probe
    // width), so selection over K beats a full sort
    val m = math.min(nprobe, k)
    val out = new Array[Any](m)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < m) {
      var best = -1
      var c2 = 0
      while (c2 < k) {
        if (!taken(c2) && (best < 0 ||
          sims(c2) > sims(best) ||
          (sims(c2) == sims(best) && cellIds(c2) < cellIds(best)))) best = c2
        c2 += 1
      }
      taken(best) = true
      out(r) = cellIds(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = rank(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selfRef = ctx.addReferenceObj("ivfRank", this, classOf[IvfRankCells].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = $selfRef.rank($v);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfRankCells {
  /** Session-scoped registration of a ranking function bound to one index's
    * centroids. The name carries the index identity, so several indexes
    * (different corpora / cell counts) coexist in a session, and the plan
    * shows `name(embedding, nprobe)` — no centroid text. */
  def register(s: SparkSession, name: String,
               cellIds: Array[Long], cents: Array[Array[Double]]): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => IvfRankCells(exprs.head, GraftFunctions.litInt(exprs(1)),
        cellIds, cents),
      "built-in")
}
