package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.GraftFunctions

/** Document-model operators over the flattener Generator (U-3). */
object Documents {

  /** Q-U3: flatten each document's non-key fields to (path, value) rows via
    * the custom [[graft.functions.DocFlatten]] Generator — executor-side
    * fan-out, same plan shape as `explode`. */
  def qU4(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("flatten_doc(struct(lang, n_chars, source, text))"))
      .orderBy("doc_id", "path")
  }
}
