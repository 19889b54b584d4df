package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** SCALE.md measurement tool (round 10, VERDICT r9 #3): empirical
  * linear-vs-quadratic crossover evidence on a synthesized ×m corpus —
  * the declared-pair scale claims ([analysis] in SCALE.md) converted to
  * [measured] numbers on this machine. Run with
  * `sbt "Test/runMain graft.ScaleCrossover"`; prints one `SCALEX:` line
  * per measurement, transcribed into SCALE.md.
  *
  * Three pairs, each synthesized deterministically (no rand(); every
  * value derives from ids, so reruns measure the same corpus):
  *
  *  1. documents ×m with planted structure: every base doc spawns m
  *     copies with every 3rd token mutated per copy (zero shingle overlap
  *     between copies), bases ≡ 0 (mod 50) spawn NEAR-DUP copies (shared
  *     text + one tail token, J ≈ 0.94), base 42 spawns a byte-identical
  *     mega-group (the collapse pre-pass food), and every doc carries a
  *     5-token boilerplate "campaign" footer shared by ~25·m docs (under
  *     the df-1000 cap, so the exact path must generate and discard the
  *     junk pairs — the MMDS stop-shingle story at sub-cap df). Exact
  *     Jaccard pair volume grows ∝ m·campSize ≈ m², MinHash+LSH stays
  *     ∝ m (footers never band-collide at J ≈ 0.06).
  *  2. embeddings ×m with per-copy jitter (clusters stay tight): exact
  *     all-pairs cosine top-20 (n²·d) vs the SemDeDup blocked path with
  *     k ∝ n cells (Σ|cell|² ≈ n·cellSize — the "k scales with n" knob
  *     SCALE.md claims makes the blocked path linear).
  *  3. a 90%-hot-key fact-dim join at ×m lineitem: naive shuffled-hash
  *     join vs the two-phase targeted salting of q_join_salted_hot.
  *     AQE's automatic skew split is DISABLED in this session — the
  *     explicit form exists precisely for paths AQE can't reach (see
  *     q_join_salted's Scaladoc), and measuring it requires AQE not to
  *     rescue the naive side.
  *
  * Timing: one discarded warmup + 2 timed reps, min reported (Bench's
  * median-of-5 is for cross-round artifacts; here both sides of each A/B
  * run back-to-back in one session, so relative times are what matter).
  */
object ScaleCrossover {
  private def evaluate(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  private def time(df: => DataFrame): Double = {
    evaluate(df) // warmup: codegen + file listing
    val reps = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      evaluate(df)
      (System.nanoTime() - t0) / 1e9
    }
    reps.min
  }

  /** ×m documents with mutated copies, planted near-dups, one identical
    * mega-group, and campaign boilerplate footers. */
  def synthDocs(spark: SparkSession, sfDir: String, m: Int): DataFrame = {
    val campSize = math.min(600, 25 * m)
    val nCamps = math.max(1, (5000L * m / campSize).toInt)
    val copies = spark.range(0, m).select(col("id").as("copy"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id").as("base_id"), col("text"))
      .crossJoin(copies)
      .withColumn("doc_id", col("base_id") + col("copy") * 10000000L)
      .withColumn("camp", pmod(xxhash64(col("base_id")), lit(nCamps)))
      .withColumn("body",
        when(col("base_id") === 42, col("text"))
          .when(col("base_id") % 50 === 0,
            concat(col("text"), lit(" nd"), col("copy")))
          .otherwise(array_join(expr(
            "transform(filter(split(text, ' '), w -> w <> ''), (w, i) -> " +
              "CASE WHEN (i + copy) % 3 = 0 THEN concat(w, '_', copy) ELSE w END)"),
            " ")))
      .withColumn("footer", concat_ws(" ",
        (0 until 5).map(k => concat(lit("bp"), col("camp"), lit(s"w$k"))): _*))
      .select(col("doc_id"),
        concat(col("body"), lit(" "), col("footer")).as("text"))
  }

  /** ×m embeddings with deterministic per-copy jitter (keeps clusters). */
  def synthEmb(spark: SparkSession, sfDir: String, m: Int): DataFrame = {
    val copies = spark.range(0, m).select(col("id").as("copy"))
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("base_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v0"))
      .crossJoin(copies)
      .withColumn("vec_id", col("base_id") + col("copy") * 10000000L)
      .withColumn("v", expr(
        "transform(v0, (x, i) -> x + (pmod(copy * 31 + i, 7) - 3) * 0.001)"))
      .select("vec_id", "v")
  }

  /** ×m lineitem with a 90%-hot synthetic join key. */
  def synthSkewFact(spark: SparkSession, sfDir: String, m: Int): DataFrame = {
    val copies = spark.range(0, m).select(col("id").as("copy"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .crossJoin(copies)
      .withColumn("uid",
        when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber"), col("copy")),
          lit(10)) < 9, lit(1L))
          .otherwise(pmod(xxhash64(col("l_orderkey")), lit(10000))))
      .select(col("uid"), col("l_extendedprice").as("value"))
  }

  private def naiveSkewJoin(fact: DataFrame, dim: DataFrame): DataFrame =
    fact.join(dim.hint("shuffle_hash"), col("uid") === col("du"))
      .groupBy(pmod(col("du"), lit(100)).as("g"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))

  /** The q_join_salted_hot shape on the synthetic fact/dim. */
  private def saltedSkewJoin(fact: DataFrame, dim: DataFrame): DataFrame = {
    val salts = 8
    val hot = graft.functions.SkewOps.hotKeys(fact, "uid", 50)
    val f2 = fact.join(broadcast(hot), col("uid") === col("hk"), "left")
      // full-row deterministic salt (SkewOps doctrine): spreads the hot
      // key as long as any column varies across its rows
      .withColumn("salt", when(col("hk").isNull, lit(0L))
        .otherwise(pmod(xxhash64(col("uid"), col("value")), lit(salts))))
      .drop("hk")
    val d2 = dim.join(broadcast(hot), col("du") === col("hk"), "left")
      .withColumn("salt", explode(when(col("hk").isNull, array(lit(0L)))
        .otherwise(array((0 until salts).map(i => lit(i.toLong)): _*))))
      .drop("hk")
    f2.join(d2.hint("shuffle_hash"),
        f2("uid") === d2("du") && f2("salt") === d2("salt"))
      .groupBy(pmod(col("du"), lit(100)).as("g"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.install(GraftSession.builder("local[32]", 32)
      // measure the EXPLICIT skew fallback: AQE's automatic split must not
      // rescue the naive side (the declared pair exists for paths AQE
      // can't reach — custom sinks, non-SMJ/SHJ operators)
      .config("spark.sql.adaptive.skewJoin.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    def report(probe: String, m: Int, rows: Long, quad: Double, lin: Double): Unit =
      println(f"SCALEX: {" +
        f""""probe":"$probe","m":$m,"rows":$rows,""" +
        f""""quadratic_s":$quad%.2f,"linear_s":$lin%.2f,""" +
        f""""ratio":${quad / lin}%.2f}""")

    // SCALEX_PROBES=2,3 re-runs a subset without repeating the others
    val probes = sys.env.getOrElse("SCALEX_PROBES", "1,2,3")
      .split(",").map(_.trim).toSet

    // 1. text dedup: exact Jaccard pairs vs MinHash+LSH verified pairs
    for (m <- Seq(2, 6, 12) if probes("1")) {
      val docs = synthDocs(spark, sfDir, m).localCheckpoint()
      val n = docs.count()
      val tExact = time(Dedup.jaccardPairs(Dedup.shingles(docs), 0.8))
      val tMh = time(Dedup.minhashNearDupPairs(docs))
      report("dedup_pairs", m, n, tExact, tMh)
      docs.unpersist()
    }

    // 2. embedding dedup: all-pairs cosine vs blocked with k ∝ n cells.
    // Quantizer balance is THE lever: a first run with iters=2 measured
    // ratio ≈ 1.0 at every m (2-iteration k-means on 64-d Gaussian data
    // leaves a few whale cells, and Σ|cell|² of a skewed partition is
    // quadratic again — recorded in SCALE.md as the negative result).
    // iters=10 is the balanced-quantizer variant.
    for (m <- Seq(2, 4, 8) if probes("2")) {
      val e = synthEmb(spark, sfDir, m).localCheckpoint()
      val n = e.count()
      val tExact = time {
        val a = e.select(col("vec_id").as("da"), col("v").as("va"))
        val b = e.select(col("vec_id").as("db"), col("v").as("vb"))
        a.crossJoin(b).filter(col("da") < col("db"))
          .select(col("da"), col("db"),
            (round(expr("cosine_similarity(va, vb)"), 6) + lit(0.0)).as("cosine"))
          .orderBy(col("cosine").desc, col("da"), col("db")).limit(20)
      }
      val cents = Similarity.kmeansCentroids(e, 32 * m, 10)
      val tBlocked = time(
        Similarity.embedDedupBlocked(e, cents, nprobe = 2, topn = 20))
      report("embed_dedup", m, n, tExact, tBlocked)
      e.unpersist()
    }

    // 3. skewed join: naive shuffled-hash vs two-phase targeted salting
    for (m <- Seq(1, 4, 10) if probes("3")) {
      val fact = synthSkewFact(spark, sfDir, m).localCheckpoint()
      val n = fact.count()
      val dim = spark.range(0, 10000)
        .select(col("id").as("du"), (col("id") * 2).as("payload"))
      val tNaive = time(naiveSkewJoin(fact, dim))
      val tSalted = time(saltedSkewJoin(fact, dim))
      report("skew_join", m, n, tNaive, tSalted)
      fact.unpersist()
    }
    spark.stop()
  }
}
