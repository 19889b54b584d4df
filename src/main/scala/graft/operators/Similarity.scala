package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ColumnOps._

/** SURVEY.md §2.10 — similarity search over the `embeddings` table.
  *
  * Scale design (billions of vectors):
  *  - Brute-force top-k: broadcast the query vector(s), one codegen'd pass
  *    over the corpus, TakeOrderedAndProject for the k-row result. Linear,
  *    embarrassingly parallel — the correct baseline at any scale.
  *  - Sign-LSH (random hyperplanes, Charikar 2002): each vector gets a small
  *    signature from deterministic pseudo-random hyperplanes; candidates are
  *    generated only within equal-signature buckets, turning the quadratic
  *    pair space into bucket-local work. IVF would follow the same shape with
  *    learned centroids instead of hyperplanes.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic ±1 hyperplane weights (seeded LCG — no RNG at plan time,
    * so plans are reproducible across runs/executors). */
  private[graft] def planeWeights(planes: Int, dims: Int): Array[Array[Double]] = {
    var state = 42L
    def nextBit(): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      if ((state >>> 40 & 1L) == 1L) 1 else -1
    }
    Array.fill(planes)(Array.fill(dims)(nextBit().toDouble))
  }

  /** Sign-LSH signature (an int in [0, 2^planes)) of a double-array column. */
  def lshSignature(v: Column, planes: Int, dims: Int): Column = {
    val w = planeWeights(planes, dims)
    val bits = (0 until planes).map { p =>
      val proj = dot(v, typedlit(w(p).toSeq))
      when(proj > 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  private def corpus(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))

  /** Assign each vector to its nearest centroid (0-based `cid`); argmin ties
    * break to the lowest index via array_position. Map-only: centroids ride
    * along as a broadcast literal. */
  def assignToCentroid(e: DataFrame, centroids: Seq[Seq[Double]]): DataFrame =
    e.withColumn("cs", array(centroids.map(c => typedlit(c)): _*))
      .withColumn("dists", expr(
        "transform(cs, c -> aggregate(zip_with(v, c, (x, y) -> (x-y)*(x-y)), 0D, (a, x) -> a + x))"))
      .withColumn("cid",
        (expr("array_position(dists, array_min(dists))") - 1).cast("int"))
      .drop("cs", "dists")

  /** Multi-probe query-side assignment: explode each row to its `nprobe`
    * nearest centroid cells (ties break to the lowest cell index via the
    * (dist, idx) struct sort). Single-probe recall collapses as corpus
    * density grows — production IVF probes several cells per query; the
    * CORPUS side still indexes each vector into exactly one cell, so probing
    * more cells only grows the candidate set (recall is monotone in nprobe,
    * spec-asserted). Map-only: centroids ride along as a broadcast literal.
    */
  def probeCells(e: DataFrame, centroids: Seq[Seq[Double]], nprobe: Int): DataFrame =
    e.withColumn("cs", array(centroids.map(c => typedlit(c)): _*))
      .withColumn("dists", expr(
        "transform(cs, c -> aggregate(zip_with(v, c, (x, y) -> (x-y)*(x-y)), 0D, (a, x) -> a + x))"))
      // the generator must sit at the top level of the projection (no outer
      // cast), so the int cast happens inside the transform lambda
      .withColumn("cid", explode(expr(
        s"transform(slice(array_sort(zip_with(dists, sequence(0, size(dists) - 1), " +
          s"(d, i) -> struct(d AS d, i AS i))), 1, $nprobe), p -> CAST(p.i AS INT))")))
      .drop("cs", "dists")

  /** IVF top-k search: corpus indexed into one cell each, queries probe their
    * `nprobe` nearest cells, cosine ranked within the candidate union. */
  def ivfTopK(e: DataFrame, centroids: Seq[Seq[Double]], nQueries: Int,
      nprobe: Int, k: Int): DataFrame = {
    val assigned = assignToCentroid(e, centroids)
    val q = probeCells(e.filter(col("vec_id") < nQueries), centroids, nprobe)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("cid"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
    assigned.join(broadcast(q), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cosine(col("v"), col("qv")).as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("qid", "rn")
  }

  /** Probe signatures for LSH multi-probe: the exact signature plus every
    * signature within `flips` bit flips (Lv et al.'s multi-probe insight:
    * near neighbors most often land in buckets differing by few bits —
    * probing those recovers them without extra hash tables). flips=0 is
    * classic single-bucket LSH; flips=1 probes 1+planes buckets. */
  def lshProbeSigs(sig: Column, planes: Int, flips: Int): Column = {
    require(flips >= 0 && flips <= 2, s"flips must be 0..2, got $flips")
    val one = (0 until planes).map(p => sig.bitwiseXOR(lit(1 << p)))
    val two = for { a <- 0 until planes; b <- a + 1 until planes }
      yield sig.bitwiseXOR(lit((1 << a) | (1 << b)))
    val variants = flips match {
      case 0 => Seq(sig)
      case 1 => sig +: one
      case 2 => (sig +: one) ++ two
    }
    array(variants: _*)
  }

  /** Sign-LSH top-k search with bit-flip multi-probe on the query side; the
    * corpus keeps one signature per vector, so candidates stay linear in
    * (corpus ∩ probed buckets) — never all-pairs. */
  def lshTopK(e: DataFrame, planes: Int, dims: Int, nQueries: Int,
      flips: Int, k: Int): DataFrame = {
    val sigged = e.withColumn("sig", lshSignature(col("v"), planes, dims))
    val q = sigged.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        explode(lshProbeSigs(col("sig"), planes, flips)).as("sig"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
    sigged.join(broadcast(q), Seq("sig"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cosine(col("v"), col("qv")).as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("qid", "rn")
  }

  /** Distributed Lloyd iterations for IVF coarse quantization: init = first
    * k vectors by id; each iteration is one grouped-average job (k × dims
    * result collected to the driver — tiny). Centroid coordinates are
    * rounded to 9 decimals each iteration: float avg() merges are
    * partition-order dependent at the last ulp, and rounding absorbs that so
    * cell assignments are stable across layouts. At 100 TB: run on a
    * sample, then assignment stays a map-only pass over the corpus. */
  def kmeansCentroids(e: DataFrame, k: Int, iters: Int): Seq[Seq[Double]] = {
    var centroids: Seq[Seq[Double]] =
      e.orderBy("vec_id").limit(k).collect().map(_.getSeq[Double](1).toSeq).toSeq
    val dims = centroids.head.size
    val corpus = e.persist()
    try {
      for (_ <- 1 to iters) {
        val avgs = (0 until dims).map(i =>
          round(avg(element_at(col("v"), i + 1)), 9).as(s"d$i"))
        val updated = assignToCentroid(corpus, centroids)
          .groupBy("cid").agg(avgs.head, avgs.tail: _*)
          .collect()
          .map(r => r.getInt(0) -> (0 until dims).map(i => r.getDouble(i + 1)))
          .toMap
        // empty clusters keep their previous centroid
        centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i)))
      }
      centroids
    } finally corpus.unpersist()
  }

  val queries: Map[String, Q] = Map(
    // Brute-force cosine top-5 for query vector vec_id=0 (oracle-checked).
    "q_sim_topk" -> ((s, d) => {
      val e = corpus(s, d)
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), cosine(col("v"), col("qv")).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(5)
    }),

    // Same query through the native codegen'd Expression (registered by
    // GraftExtensions): one fused loop instead of three HOF folds. Identical
    // fold order => identical doubles => same oracle as q_sim_topk.
    "q_sim_topk_native" -> ((s, d) => {
      val e = corpus(s, d)
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(expr("cosine_similarity(v, qv)"), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(5)
    }),

    // Batched brute-force: top-3 neighbors for EACH of the first 5 vectors —
    // the "many queries" shape. Broadcast the query block; window top-k.
    "q_sim_topk_batch" -> ((s, d) => {
      val e = corpus(s, d)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), cosine(col("v"), col("qv")).as("cosine"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("qid", "rn")
    }),

    // Embedding-cosine near-dup: ground-truth all-pairs ranking (quadratic —
    // the LSH variant below is the scale path; this validates it). Top-20
    // pairs because the synthetic embeddings have no planted near-dups to
    // threshold on (max pairwise cosine ≈ 0.51, measured).
    "q_dedup_embed" -> ((s, d) => {
      val e = corpus(s, d)
      val a = e.select(col("vec_id").as("da"), col("v").as("va"))
      val b = e.select(col("vec_id").as("db"), col("v").as("vb"))
      a.crossJoin(b).filter(col("da") < col("db"))
        .select(col("da"), col("db"),
          round(expr("cosine_similarity(va, vb)"), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("da"), col("db"))
        .limit(20)
    }),

    // ANN, IVF-style: k-means coarse quantizer (8 cells, 3 Lloyd iters),
    // queries probe their 2 nearest cells (multi-probe — round 1 was
    // single-probe, whose recall collapses as corpus density grows). Same
    // two-stage shape as production IVF; centroid-dependent result set =>
    // no DuckDB oracle (exactness asserted against a driver-side
    // recomputation, and recall@3 monotonicity in nprobe, in
    // DedupSimilaritySpec).
    "q_sim_ann_ivf" -> ((s, d) => {
      val e = corpus(s, d)
      ivfTopK(e, kmeansCentroids(e, 8, 3), nQueries = 5, nprobe = 2, k = 3)
    }),

    // ANN: sign-LSH bucketing (8 planes -> 256 buckets), queries probe their
    // own bucket plus all 1-bit-flip neighbors (multi-probe LSH). Hash/
    // plane-dependent recall => no DuckDB oracle; DedupSimilaritySpec checks
    // probed results carry true cosines and recall grows with flips.
    "q_sim_ann_lsh" -> ((s, d) =>
      lshTopK(corpus(s, d), planes = 8, dims = 64, nQueries = 5,
        flips = 1, k = 3)))

  private val CosineSql =
    "round(list_aggregate(list_transform(range(1, len(v) + 1), i -> v[i] * qv[i]), 'sum') / " +
      "(sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) * " +
      "sqrt(list_aggregate(list_transform(qv, x -> x * x), 'sum'))), 6)"

  val oracles: Map[String, String] = Map(
    "q_sim_topk" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "q AS (SELECT v AS qv FROM e WHERE vec_id = 0) " +
        s"SELECT vec_id, $CosineSql AS cosine FROM e, q WHERE vec_id <> 0 " +
        "ORDER BY cosine DESC, vec_id LIMIT 5"),
    "q_sim_topk_native" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "q AS (SELECT v AS qv FROM e WHERE vec_id = 0) " +
        s"SELECT vec_id, $CosineSql AS cosine FROM e, q WHERE vec_id <> 0 " +
        "ORDER BY cosine DESC, vec_id LIMIT 5"),
    "q_dedup_embed" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings) " +
        "SELECT a.vec_id AS da, b.vec_id AS db, " +
        "round(list_aggregate(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]), 'sum') / " +
        "(sqrt(list_aggregate(list_transform(a.v, x -> x * x), 'sum')) * " +
        "sqrt(list_aggregate(list_transform(b.v, x -> x * x), 'sum'))), 6) AS cosine " +
        "FROM e a, e b WHERE a.vec_id < b.vec_id " +
        "ORDER BY cosine DESC, da, db LIMIT 20"),
    "q_sim_topk_batch" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5), " +
        s"c AS (SELECT qid, vec_id, $CosineSql AS cosine FROM e, q WHERE vec_id <> qid), " +
        "r AS (SELECT qid, vec_id, cosine, CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS INTEGER) AS rn FROM c) " +
        "SELECT qid, vec_id, cosine, rn FROM r WHERE rn <= 3 ORDER BY qid, rn"))
}
