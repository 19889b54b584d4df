package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main.
  *
  * Timing: each query runs ONE discarded warmup rep (codegen + shuffle-file
  * cache effects) and then `SPARK_GRAFT_REPS` timed reps (default 5)
  * BACK-TO-BACK, reporting the per-query MEDIAN — round 2's single-shot
  * timings moved ~2× with machine-wide noise on untouched queries, and
  * round 5 showed median-of-3 still cannot resolve sub-2× movement.
  * "value" is the sum of medians. The residual noise band is documented in
  * BASELINE.md: treat per-query deltas within ±30% (and single-query spikes
  * on untouched code) as machine noise.
  *
  * A round-9 A/B rejected the whole-suite-pass alternative (each pass runs
  * every query once, medians across passes): interleaving 133 queries
  * between a query's executions cools every cache tier the back-to-back
  * protocol keeps hot (JIT'd generated code, OS page cache, memoized file
  * listings) and measured reps ~3× slower (≈1.03 s/q vs ≈0.35 s/q at
  * sf0.1), which would have tripled "value" against every prior round and
  * BASELINE.md with no engine change. Back-to-back medians stay the one
  * protocol all rounds share.
  *
  * Each query is evaluated through the `noop` write sink, not `count()`:
  * Catalyst prunes projected columns a count never reads, which under-bills
  * projection-heavy queries (the r3 verdict's column-pruning hole). The noop
  * sink materializes every output column at full cost, discards the rows.
  *
  * A query that throws is recorded with a NEGATIVE duration (its wall time
  * until failure, negated, remaining reps skipped) and listed in "failed" —
  * never as a normal-looking success.
  *
  * Driver-budget safety (round 6's BENCH artifact was rc:124 — the driver
  * killed the run and got NO numbers): two defenses, both on by default.
  * (1) Incremental emission — each query prints a short `BENCH_Q:` JSON line
  * the moment it finishes, and bench_out.json is rewritten (always-valid
  * JSON) after every query, so a killed run still yields per-query numbers
  * in the tail and a parseable partial file. (2) A wall-clock budget
  * (`SPARK_GRAFT_BUDGET_S`, default 240 s of post-startup query time)
  * degrades reps 5→3→1 as elapsed time crosses 50%/80% of the budget, so
  * the suite lands inside a bounded window; `degraded:true` marks any run
  * where the budget fired (per-query medians are then position-dependent —
  * compare only against runs with the same budget settings, BASELINE.md).
  *
  * Output protocol (round 9 — fixes every prior round's `parsed: null`):
  * the driver parses the LAST stdout line of a bounded (~4 KB,
  * front-truncated) tail, so (1) build.sbt sets
  * `Global / showSuccess := false` — sbt's `[success] Total time` footer
  * kept shadowing the JSON — plus `outputStrategy := StdoutOutput` so the
  * forked JVM's lines reach stdout without an `[info] ` prefix, and (2)
  * the final bare-JSON line is emitted from a JVM shutdown hook so it is
  * the last write on both normal and SIGTERM'd exits: the full per-query
  * JSON when short enough to survive the tail window, otherwise a short
  * total-only JSON (the full map then lives in the mid-run `BENCH_JSON:`
  * sentinel and in bench_out.json).
  *
  * Dev loop: SPARK_GRAFT_ONLY=q_a,q_b restricts the run to named queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen path once so the first timed query doesn't absorb
    // one-time session setup costs.
    def evaluate(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    SparkEntry.queries.get("q_scan_count")
      .foreach(fn => try evaluate(fn(spark, sfDir)) catch { case _: Throwable => () })
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BUDGET_S", "240").toDouble
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    def r3(v: Double): String = f"$v%.3f"
    val benchStart = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - benchStart) / 1e9

    // (name, medianOrNegFailTime, ok, repsUsed)
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Boolean, Int)]
    @volatile var latestJson: String = null
    def writeSnapshot(): String = {
      val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
      val failed = results.collect { case (k, _, false, _) => "\"" + k + "\"" }
        .mkString("[", ",", "]")
      val total = results.collect { case (_, v, true, _) => v }.sum
      // degraded=true when ANY query ran below full reps (the budget fired):
      // medians from such a run are position-dependent (alphabetically-late
      // queries got fewer reps) and must only be compared against runs with
      // the same budget settings (ADVICE r7; protocol in BASELINE.md)
      val degraded = results.exists(_._4 < reps)
      val json =
        s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"failed":$failed,"reps":$reps,"degraded":$degraded,"budget_s":${r3(budgetS)},"done":${results.size},"of":${selected.size},"sf":"$sfDir"}"""
      // Rewritten after EVERY query: a killed run leaves a valid partial.
      Files.writeString(Paths.get("bench_out.json"), json + "\n")
      latestJson = json
      json
    }
    def shortJson(json: String): String =
      // A >3 KB line can be front-truncated by the driver's tail window into
      // unparseable JSON; fall back to a total-only line that always fits.
      if (json.length <= 3000) json
      else {
        val failed = results.collect { case (k, _, false, _) => "\"" + k + "\"" }
          .mkString("[", ",", "]")
        val total = results.collect { case (_, v, true, _) => v }.sum
        s"""{"metric":"total","value":${r3(total)},"unit":"sec","failed":$failed,"reps":$reps,"degraded":${results.exists(_._4 < reps)},"done":${results.size},"of":${selected.size},"sf":"$sfDir","queries_in":"bench_out.json"}"""
      }
    // The shutdown hook is the ONLY emitter of the final bare-JSON line: it
    // runs after all in-band prints on a normal exit and still fires on
    // SIGTERM, so the driver's last-line parse sees valid JSON either way.
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (latestJson != null) {
        System.out.println(shortJson(latestJson))
        System.out.flush()
      }
    }))

    selected.foreach { case (name, fn) =>
      // Budget-aware rep degradation: full precision while under half the
      // budget, median-of-3 to 80%, single-rep beyond — completion of the
      // whole suite beats precision on the tail queries.
      val repsThis = {
        val frac = elapsedS / budgetS
        if (frac < 0.5) reps else if (frac < 0.8) reps.min(3) else 1
      }
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var failed = false
      // one warmup rep per query, EXCLUDED from the median: first executions
      // pay codegen compilation and cold file listing that no steady-state
      // rep pays, and they land unpredictably — dropping the rep removes a
      // noise source instead of averaging over it (it still counts as the
      // failure witness if the query throws)
      val w0 = System.nanoTime()
      try evaluate(fn(spark, sfDir)) catch { case _: Throwable => failed = true }
      val warmup = (System.nanoTime() - w0) / 1e9
      var rep = 0
      while (rep < repsThis && !failed) {
        val t0 = System.nanoTime()
        try { evaluate(fn(spark, sfDir)) }
        catch { case _: Throwable => failed = true }
        times += (System.nanoTime() - t0) / 1e9
        rep += 1
      }
      val sorted = times.sorted
      val median = if (sorted.isEmpty) warmup else sorted(sorted.size / 2)
      results += ((name, if (failed) -times.lastOption.getOrElse(warmup) else median, !failed, repsThis))
      // Per-query line the instant it completes — a killed run's tail still
      // carries every finished query.
      println(s"""BENCH_Q: {"name":"$name","sec":${r3(median)},"reps":$repsThis,"ok":${!failed}}""")
      writeSnapshot()
    }
    val json = writeSnapshot()
    // Human-readable full-map sentinel (prefixed, so never the parse target).
    println(s"BENCH_JSON: $json")
    spark.stop()
  }
}
