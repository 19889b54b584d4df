package graft

/** Measurement-only harness (r20, VERDICT r19 #4): dissect the per-execution
  * floor of a declared query into its serial phases —
  *   build   fn(spark, sfDir): DataFrame construction (connector snapshot
  *           resolution, schema memo hits, plan assembly)
  *   plan    analysis + optimization + physical planning (executedPlan)
  *   exec    the noop write (job scheduling + AQE re-planning + compute)
  * Methodology is the bench's (1 discarded warmup, then N timed reps,
  * median), but phases are timed separately per rep: build and plan happen
  * on fresh DataFrames exactly as the bench's evaluate() does, so the split
  * adds up to what the bench sees. Prints one line per query. Never part of
  * the driver contract — a dev tool like ScaleBench.
  *
  * Usage: SPARK_GRAFT_ONLY=q_a,q_b sbt "runMain graft.FloorProbe"
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.install(
      GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    // A/B experiments on runtime-settable SQL confs, e.g.
    // SPARK_GRAFT_PROBE_CONF="spark.sql.adaptive.enabled=false;..."
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
        println(s"FLOOR_CONF: $k=$v")
      })
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    // Scheduler-vs-compute split: per-execution job/stage/task counts and
    // summed task wall time. wall >> taskTime/cores ⇒ scheduler/stage-
    // latency bound; wall ≈ taskTime/cores ⇒ compute bound.
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null)
            taskNs.addAndGet(t.taskInfo.duration * 1000000L)
      })
    selected.foreach { case (name, fn) =>
      try {
        // warmup (codegen, cold listings)
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val b = Array.fill(reps)(0.0); val p = Array.fill(reps)(0.0)
        val e = Array.fill(reps)(0.0)
        var i = 0
        jobs.set(0); stages.set(0); tasks.set(0); taskNs.set(0)
        while (i < reps) {
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan // force analyze+optimize+plan
          val t2 = System.nanoTime()
          df.write.mode("overwrite").format("noop").save()
          val t3 = System.nanoTime()
          b(i) = (t1 - t0) / 1e9; p(i) = (t2 - t1) / 1e9; e(i) = (t3 - t2) / 1e9
          i += 1
        }
        // listener events are async; give the bus a moment to drain
        Thread.sleep(150)
        val r = reps.toDouble
        println(f"FLOOR: $name%-32s build=${med(b.toSeq)}%.3f plan=${med(p.toSeq)}%.3f exec=${med(e.toSeq)}%.3f " +
          f"jobs=${jobs.get / r}%.1f stages=${stages.get / r}%.1f tasks=${tasks.get / r}%.1f taskSec=${taskNs.get / r / 1e9}%.3f")
      } catch { case t: Throwable =>
        println(s"FLOOR: $name FAILED ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
