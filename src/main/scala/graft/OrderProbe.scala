package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only A/B (r20): final-sort physical shape. A declared query's
  * trailing `.orderBy(keys)` plans as [sample child for range bounds] +
  * [range exchange] + [sort] — two extra jobs per execution under AQE.
  * For the SMALL outputs most declared queries end with (3..10k rows after
  * aggregation), `coalesce(1).sortWithinPartitions(keys)` produces the
  * identical row sequence (same comparator, total keys, one partition =
  * global order) with no sampling pass and no range exchange. This probe
  * times both shapes back-to-back in one JVM and asserts the outputs are
  * row-identical. */
object OrderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.install(
      GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String, mk: () => DataFrame, reps: Int = 5): Double = {
      mk().write.mode("overwrite").format("noop").save() // warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val m = ts(ts.size / 2)
      println(f"ORDER: $label%-40s $m%.3f s")
      m
    }
    // shape 1: grouped agg, tiny output (q_agg_distinct-like)
    def aggBase() = Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("nc"), count(lit(1)).as("cnt"))
    time("agg orderBy", () => aggBase().orderBy("o_orderstatus"))
    time("agg coalesce1+sortWithin", () =>
      aggBase().coalesce(1).sortWithinPartitions("o_orderstatus"))
    // shape 2: window + mid-size output (q_window_rank-like, ~4.5k rows)
    def winBase() = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"))
      Tables.events(spark, sfDir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    }
    time("window orderBy", () => winBase().orderBy("user_id", "rn", "event_id"))
    time("window coalesce1+sortWithin", () =>
      winBase().coalesce(1).sortWithinPartitions("user_id", "rn", "event_id"))
    // row-identity check, positional
    val a = winBase().orderBy("user_id", "rn", "event_id").collect().toSeq
    val b = winBase().coalesce(1).sortWithinPartitions("user_id", "rn", "event_id")
      .collect().toSeq
    println(s"ORDER: identical=${a == b} n=${a.size}")
    spark.stop()
  }
}
