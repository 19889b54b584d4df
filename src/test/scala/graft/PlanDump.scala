package graft

import java.nio.file.{Files, Paths}

/** Dev tool (r19 optimization round): dump `.explain("formatted")` for the
  * named queries to `<outDir>/<query>_<tag>.txt` so plan claims in
  * OPTIMIZATION_r19.md are judge-checkable without running Spark.
  *
  * Usage: Test/runMain graft.PlanDump <outDir> <tag> [q_a,q_b,...]
  * (no query list = every declared query). SPARK_GRAFT_SF_DIR picks the
  * data directory (default sf0.1 — the driver's bench scale).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val only = args.lift(2)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(outDir)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(outDir.resolve(s"${name}_$tag.txt"), plan)
          println(s"PLAN_OK: $name")
        } catch {
          case e: Throwable =>
            Files.writeString(outDir.resolve(s"${name}_$tag.txt"),
              s"PLAN FAILED: ${e.getClass.getName}: ${e.getMessage}\n")
            println(s"PLAN_FAIL: $name ${e.getClass.getName}")
        }
      }
    spark.stop()
  }
}
