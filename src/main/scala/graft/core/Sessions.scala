package graft.core

import org.apache.spark.sql.SparkSession

/** Central SparkSession configuration. Every entry point (Verify, Bench,
  * tests) builds through here so oracle-affecting settings are identical:
  *  - UTC session timezone (timestamp parity with the DuckDB oracle),
  *  - `nanosAsLong`: the testdata `events.ts` column is parquet
  *    TIMESTAMP(NANOS), which Spark 4 refuses to read natively; with this
  *    flag it surfaces as a nanos-since-epoch long and [[Tables.events]]
  *    truncates to a microsecond timestamp (same truncation DuckDB applies),
  *  - AQE on: runtime re-planning (skew-join split, partition coalescing) is
  *    the 100 TB posture, so small-SF runs should execute the same way.
  */
object Sessions {
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    // the extension registers graft's Catalyst functions AND the
    // MergeMetaRepair analysis rule (MERGE on _id/_key metadata columns)
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    // managed tables (the bucketed-join path) land under target/, not the cwd
    .config("spark.sql.warehouse.dir",
      new java.io.File("target/spark-warehouse").getAbsolutePath)

  /** Local session for tests/tools: `cores` threads, shuffle partitions
    * matched to cores (not the 200 default, wrong for local mode). */
  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val spark = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", cores.toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
