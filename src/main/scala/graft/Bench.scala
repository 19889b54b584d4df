package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main.
  *
  * Timing: each query runs `SPARK_GRAFT_REPS` times (default 3) and reports
  * the per-query MEDIAN — round 2's single-shot timings moved ~2× with
  * machine-wide noise on untouched queries, making regressions
  * unattributable. "value" is the sum of medians.
  *
  * Output: the JSON line is printed three ways so no log-capture scheme can
  * lose it (rounds 1 AND 2 both ended with `"parsed": null`):
  *   1. a grep-able sentinel line `BENCH_JSON: {...}` before spark.stop(),
  *   2. the bare JSON as the very last stdout line after spark.stop(),
  *   3. written to bench_out.json (authoritative — see README).
  *
  * A query that throws is recorded with a NEGATIVE duration (its wall time
  * until failure, negated, remaining reps skipped) and listed in "failed" —
  * never as a normal-looking success.
  *
  * Dev loop: SPARK_GRAFT_ONLY=q_a,q_b restricts the run to named queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen path once so the first timed query doesn't absorb
    // one-time session setup costs.
    SparkEntry.queries.get("q_scan_count")
      .foreach(fn => try fn(spark, sfDir).count() catch { case _: Throwable => () })
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var failed = false
      var rep = 0
      while (rep < reps && !failed) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => failed = true }
        times += (System.nanoTime() - t0) / 1e9
        rep += 1
      }
      val sorted = times.sorted
      val median = sorted(sorted.size / 2)
      (name, if (failed) -times.last else median, !failed)
    }
    def r3(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val json =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"failed":$failed,"reps":$reps,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    println(s"BENCH_JSON: $json")
    spark.stop()
    // Final line of output: the one a tail-parsing driver reads.
    println(json)
  }
}
