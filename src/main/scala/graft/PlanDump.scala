package graft

import org.apache.spark.sql.SparkSession

/** Round-19 measurement tool: dump `.explain("formatted")` for the named
  * queries to `plans/<tag>/<query>_<suffix>.txt` — the committed evidence
  * the optimization rounds pair with bench numbers (guide §1).
  *
  * Usage: runMain graft.PlanDump <suffix> <q_name>[,<q_name>...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_PLANS_DIR (default plans/r19). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r19")
    val spark = graft.core.Sessions.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"planned $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
