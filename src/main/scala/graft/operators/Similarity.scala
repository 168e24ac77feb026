package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.GraftFunctions

/** Similarity search over the `embeddings` table (SURVEY.md Q-X2 + ANN
  * extensions). The scalar kernel is the codegen'd
  * [[graft.functions.CosineSimilarity]] expression — one fused pass per pair,
  * inside whole-stage codegen.
  *
  * Scale design: brute force is the oracle-checked exact baseline with a
  * bounded query side (broadcast the queries, stream the corpus — a map-only
  * plan at any corpus size); the per-query top-k uses a window over the
  * candidate rows, which AQE partitions by query id. The sub-quadratic path
  * is random-hyperplane LSH bucketing (see [[Dedup.qD4]] for the same shape
  * on MinHash).
  */
object Similarity {

  /** Q-X2: brute-force cosine top-50 over a bounded id range. */
  def qX2(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val a = e.selectExpr("vec_id AS a_id", "embedding AS ea").where(col("a_id") <= 20)
    val b = e.selectExpr("vec_id AS b_id", "embedding AS eb")
    a.join(b, col("a_id") < col("b_id"))
      .selectExpr("a_id", "b_id", "ROUND(cosine_sim(ea, eb), 4) AS sim")
      .orderBy(desc("sim"), col("a_id"), col("b_id"))
      .limit(50)
  }

  /** Brute-force k-NN: for each query vector (vec_id < 10), the top-3
    * neighbors over the whole corpus by cosine. The query side is tiny and
    * broadcast; the corpus side streams — scan-bound at any corpus size.
    * Ranking tiebreaks on neighbor id for determinism. */
  def qSim1(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val q = e.selectExpr("vec_id AS q_id", "embedding AS eq").where(col("q_id") < 10)
    val c = e.selectExpr("vec_id AS n_id", "embedding AS en")
    val w = Window.partitionBy("q_id").orderBy(desc("sim_raw"), col("n_id"))
    broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("sim_raw", expr("cosine_sim(eq, en)"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .selectExpr("q_id", "n_id", "ROUND(sim_raw, 4) AS sim", "rank")
      .orderBy("q_id", "rank")
  }
}
