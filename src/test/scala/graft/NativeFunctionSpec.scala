package graft

import org.apache.spark.sql.functions._
import graft.functions.{ColumnOps, DocShingle, MinHashAggregator}
import graft.operators.Similarity

/** Custom Catalyst expression + typed Aggregator (SURVEY.md §5.3). */
class NativeFunctionSpec extends SparkSpec {

  test("native cosine_similarity is registered and bit-identical to the HOF formulation") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(
        expr("cosine_similarity(v, qv)").as("native"),
        (ColumnOps.dot(col("v"), col("qv")) /
          (ColumnOps.norm(col("v")) * ColumnOps.norm(col("qv")))).as("hof"))
    // null-safe inequality: a plain =!= returns NULL (dropped by filter)
    // when either side is NULL, which would mask a divergence
    val diffs = both.filter(!(col("native") <=> col("hof"))).count()
    assert(diffs == 0, "fold order must make native == HOF bit-exactly")
  }

  test("native rolling_fingerprint equals the HOF formulation on every doc") {
    val docs = Tables.documents(spark, sf).filter(length(col("text")) > 0)
    val diffs = docs.select(
      expr("rolling_fingerprint(text)").as("native"),
      graft.operators.TextAnalysis.fingerprintHof.as("hof"))
      .filter(!(col("native") <=> col("hof"))).count()
    assert(diffs == 0, "native fingerprint must equal the HOF array pipeline")
    // null in, null out
    val r = docs.limit(1).select(expr("rolling_fingerprint(CAST(NULL AS STRING))")).head()
    assert(r.isNullAt(0))
  }

  test("mismatched-length arrays yield NULL, matching the HOF zip_with semantics") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val r = df.select(
      expr("cosine_similarity(a, b)").as("native"),
      (ColumnOps.dot(col("a"), col("b")) /
        (ColumnOps.norm(col("a")) * ColumnOps.norm(col("b")))).as("hof")).head()
    assert(r.isNullAt(0), "native must not silently truncate to the common prefix")
    assert(r.isNullAt(1))
  }

  test("null array elements yield NULL, matching the HOF zip_with semantics") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](1.0, 2.0, null)),
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("a", "b")
    val r = df.select(
      expr("cosine_similarity(a, b)").as("native"),
      (ColumnOps.dot(col("a"), col("b")) /
        (ColumnOps.norm(col("a")) * ColumnOps.norm(col("b")))).as("hof"))
    // interpreted AND codegen'd paths must both agree with the HOF result
    val diffs = r.filter(!(col("native") <=> col("hof"))).count()
    assert(diffs == 0, "null-element semantics must match zip_with")
    val vals = r.collect()
    assert(vals(0).isNullAt(0) && vals(1).isNullAt(0) && !vals(2).isNullAt(0))
  }

  test("nearest_cells equals the HOF sort/slice probe pipeline it replaced (r19)") {
    // The exact expression pipeline probeCells/assignToCentroid ran before
    // r19 — distances via zip_with fold, (d, i) struct sort, nprobe slice.
    def hofProbes(nprobe: Int) = expr(
      s"transform(slice(array_sort(zip_with(" +
        "transform(cs, c -> aggregate(zip_with(v, c, (x, y) -> (x-y)*(x-y)), 0D, (a, x) -> a + x)), " +
        "sequence(0, size(cs) - 1), (d, i) -> struct(d AS d, i AS i))), " +
        s"1, $nprobe), p -> CAST(p.i AS INT))")
    val e = Tables.embeddings(spark, sf)
      .select(ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val cents = Similarity.kmeansCentroids(
      Tables.embeddings(spark, sf)
        .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v")),
      k = 8, iters = 2)
    val withCs = e.withColumn("cs", array(cents.map(c => typedLit(c)): _*))
    for (np <- Seq(1, 3, 8, 99)) { // 99 > k: both degrade to all k cells
      val diffs = withCs.select(
        expr(s"nearest_cells(v, cs, $np)").as("native"),
        hofProbes(np).as("hof"))
        .filter(!(col("native") <=> col("hof"))).count()
      assert(diffs == 0, s"nearest_cells(nprobe=$np) must equal the HOF pipeline")
    }
    // duplicate centroids: ties must break to the lower index on both paths
    val dup = e.limit(32).withColumn("cs",
      array(typedLit(cents.head), typedLit(cents.head), typedLit(cents(1))))
    val tieDiffs = dup.select(
      expr("nearest_cells(v, cs, 2)").as("native"),
      hofProbes(2).as("hof"))
      .filter(!(col("native") <=> col("hof"))).count()
    assert(tieDiffs == 0, "equal distances must order by index, like the struct sort")
  }

  test("gram_max_count equals the explode/groupBy gram multiplicity (r19)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), expr(graft.functions.TextTokens.ToksSql).as("t"))
      .filter(size(col("t")) >= 2)
    val viaShuffle = docs
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t)-1), i -> concat_ws(' ', slice(t, i, 2)))")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("want"))
    val diffs = docs
      .select(col("doc_id"), expr("gram_max_count(t, 2)").as("got"))
      .join(viaShuffle, "doc_id")
      .filter(!(col("got") <=> col("want"))).count()
    assert(diffs == 0, "per-row run count must equal the shuffled multiplicity")
    // adversarial shapes: repeated grams, all-equal tokens, minimum size —
    // expected values derived by hand from the gram multiset
    val edge = Seq(
      (Seq("a", "b", "a", "b", "a"), 2L), // "a b" ×2, "b a" ×2
      (Seq("x", "x", "x", "x"), 3L),      // "x x" ×3
      (Seq("p", "q"), 1L),                // one gram
      (Seq("b", "a", "b", "a", "b", "c", "b", "a"), 3L)).toDF("t", "want")
    val edgeDiffs = edge
      .select(expr("gram_max_count(t, 2)").as("got"), col("want"))
      .filter(!(col("got") <=> col("want"))).count()
    assert(edgeDiffs == 0, "edge shapes must match the hand-counted multiplicity")
    // null in, null out; too-short in, null out
    val r = Seq((Seq("only"))).toDF("t")
      .select(expr("gram_max_count(t, 2)"), expr("gram_max_count(CAST(NULL AS ARRAY<STRING>), 2)"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("grams equals the transform/slice/concat_ws HOF formulation (r19)") {
    import spark.implicits._
    // real corpus, every k and separator the call sites use (5-gram ' '
    // shingles, 10-gram ' ' dedup keys, 3-gram ' ' Jaccard shingles,
    // 2-gram '_' classifier features)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), expr(graft.functions.TextTokens.ToksSql).as("t"))
    for ((k, sep) <- Seq((2, "_"), (3, " "), (5, " "), (10, " "))) {
      val diffs = docs.filter(size(col("t")) >= k)
        .select(
          expr(s"grams(t, $k, '$sep')").as("got"),
          expr(s"transform(sequence(1, size(t)-${k - 1}), " +
            s"i -> concat_ws('$sep', slice(t, i, $k)))").as("want"))
        .filter(!(col("got") <=> col("want"))).count()
      assert(diffs == 0, s"grams(t, $k, '$sep') must equal the HOF strings")
    }
    // edge shapes: too-short input -> empty array (what the HOF callers
    // guarded with a size filter); null tokens skipped like concat_ws;
    // null input -> null
    val edge = Seq(
      (Seq("a"), Seq.empty[String]),
      (Seq("a", null, "b"), Seq("a", "b")),
      (Seq("a", "b", "c"), Seq("a b", "b c"))).toDF("t", "want")
    val k2 = edge.select(expr("grams(t, 2, ' ')").as("got"), col("want"))
      .filter(!(col("got") <=> col("want"))).count()
    assert(k2 == 0, "edge shapes must match concat_ws semantics")
    val r = edge.limit(1)
      .select(expr("grams(CAST(NULL AS ARRAY<STRING>), 2, ' ')")).head()
    assert(r.isNullAt(0))
  }

  test("graft_tokens equals the filter/split HOF tokenizer (r19)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val hof = expr("filter(split(text, ' '), w -> w <> '')")
    val diffs = docs.select(
      expr("graft_tokens(text)").as("got"), hof.as("want"))
      .filter(!(col("got") <=> col("want"))).count()
    assert(diffs == 0, "native tokenizer must equal split-then-drop-empties")
    // adversarial strings: leading/trailing/consecutive spaces, all-space,
    // empty, multi-byte UTF-8 around spaces, non-space whitespace KEPT
    val edge = Seq("", " ", "   ", "a", " a", "a ", "  a  b ", "a\tb c",
      "héllo wörld", "日本 語  テスト", "a\nb", "ε  δ").toDF("text")
    val edgeDiffs = edge.select(
      expr("graft_tokens(text)").as("got"), hof.as("want"))
      .filter(!(col("got") <=> col("want"))).count()
    assert(edgeDiffs == 0, "edge strings must match the HOF tokenizer")
    val r = edge.limit(1)
      .select(expr("graft_tokens(CAST(NULL AS STRING))")).head()
    assert(r.isNullAt(0))
  }

  test("adc_dist equals the aggregate-over-sequence HOF lookup sum (r19)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val m = 8
    val rows = (0 until 200).map { _ =>
      val lut = Seq.fill(m)(Seq.fill(16)(rnd.nextDouble()))
      val codes = Seq.fill(m)(rnd.nextInt(16))
      (lut, codes)
    }
    val df = rows.toDF("lut", "codes")
    val hof = expr(
      s"aggregate(sequence(0, ${m - 1}), 0D, (acc, j) -> " +
        "acc + element_at(element_at(lut, j + 1), element_at(codes, j + 1) + 1))")
    val diffs = df.select(expr("adc_dist(lut, codes)").as("got"), hof.as("want"))
      .filter(!(col("got") <=> col("want"))).count()
    assert(diffs == 0, "native ADC sum must equal the HOF fold on valid codes")
    // an out-of-range code (impossible from encodeResiduals, whose codes
    // are array_position-derived 0..ksub-1) yields null — the HOF under
    // ANSI (Spark 4 default) would THROW here, so the native's null is
    // strictly more defensive, never a silent wrong sum
    val oob = Seq((Seq.fill(m)(Seq.fill(16)(1.0)), Seq.fill(m - 1)(0) :+ 99))
      .toDF("lut", "codes")
    assert(oob.select(expr("adc_dist(lut, codes)")).head().isNullAt(0))
    val r = df.limit(1).select(
      expr("adc_dist(CAST(NULL AS ARRAY<ARRAY<DOUBLE>>), codes)"),
      expr("adc_dist(lut, CAST(NULL AS ARRAY<INT>))")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("native top-k query equals the HOF top-k query") {
    val a = rows(Similarity.queries("q_sim_topk")(spark, sf))
    val b = rows(Similarity.queries("q_sim_topk_native")(spark, sf))
    assert(a == b)
  }

  test("cosine_similarity participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, sf)
      .select(ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val plan = physicalPlan(e.select(expr("cosine_similarity(v, v)").as("c")))
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l =>
      l.contains("cosine_similarity") && l.trim.startsWith("*(")), plan)
  }

  test("bpe_token_count equals an independent brute-force BPE on docs + adversarial strings") {
    import graft.functions.Bpe
    // independent reference: same published greedy-BPE SPEC (repeatedly
    // merge every occurrence of the lowest-rank adjacent pair), written
    // list-functional instead of the expression's in-place array walk
    val ranks = Bpe.Merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    def refEncode(word: String): List[String] = {
      // code-point symbols, like production — a UTF-16-char split would
      // disagree on supplementary-plane characters (2 symbols per astral
      // code point) and could fail spuriously on non-BMP corpus text
      var syms = word.codePoints().toArray.toList
        .map(cp => new String(Character.toChars(cp)))
      var continue = true
      while (continue && syms.size > 1) {
        val present = syms.zip(syms.tail).filter(ranks.contains)
        if (present.isEmpty) continue = false
        else {
          val (a, b) = present.minBy(ranks)
          def mergeAll(l: List[String]): List[String] = l match {
            case x :: y :: rest if x == a && y == b => (a + b) :: mergeAll(rest)
            case x :: rest => x :: mergeAll(rest)
            case Nil => Nil
          }
          syms = mergeAll(syms)
        }
      }
      syms
    }
    val preTok = java.util.regex.Pattern.compile(
      "'(?:s|d|m|t|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+")
    def refCount(text: String): Int = {
      val m = preTok.matcher(text)
      var t = 0
      while (m.find()) t += refEncode(m.group()).size
      t
    }
    // whole corpus sample + adversaries: empty, punctuation runs,
    // contractions, digits, multi-space, non-ASCII, unknown chars
    val texts = Tables.documents(spark, sf).select("text")
      .limit(200).collect().map(_.getString(0)) ++ Seq(
      "", " ", "the fast scan", "don't stop", "a1b2  c3", "héllo wörld",
      "x!!??y", "   trailing  ", "the the the", "1234 5678", "\tmixed\nws")
    import spark.implicits._
    val got = texts.toSeq.toDF("text")
      .select(expr("bpe_token_count(text)")).collect().map(_.getInt(0))
    texts.zip(got).foreach { case (t, g) =>
      assert(g == refCount(t), s"BPE count diverges on ${t.take(60)}: $g vs ${refCount(t)}")
    }
    // vocabulary sanity: whole-word merges actually fire — the committed
    // ranks produce loader-like single tokens for corpus words
    assert(Bpe.encodeCount("the") == 1)
    assert(Bpe.encodeCount(" the") == 1)
    assert(Bpe.encodeCount(" window") == 1)
    // and unknown characters degrade to one token per code point
    assert(Bpe.encodeCount("µ¶") == 2)
    // null in, null out; codegen participation (fused-stage marker)
    val r = spark.range(1).select(expr("bpe_token_count(CAST(NULL AS STRING))")).head()
    assert(r.isNullAt(0))
    val plan = physicalPlan(Tables.documents(spark, sf)
      .select(expr("bpe_token_count(text)").as("c")))
    assert(plan.linesIterator.exists(l =>
      l.contains("bpe_token_count") && l.trim.startsWith("*(")), plan)
  }

  test("trained-vocab BPE (r12): corpus-trained merges load through the file route and match brute force") {
    import graft.functions.Bpe
    // word frequencies from the corpus, derived with the SAME
    // pre-tokenizer encode uses (leading spaces carried); sorted input
    // order makes the whole pipeline bit-deterministic end to end
    val freqs = Tables.documents(spark, sf).select("text").limit(300)
      .collect().iterator.flatMap(r => Bpe.preTokens(r.getString(0)))
      .foldLeft(Map.empty[String, Long])((m, w) =>
        m.updated(w, m.getOrElse(w, 0L) + 1L))
      .toSeq.sortBy(_._1)
    // budget far above what the corpus supports: training runs to its
    // natural FIXPOINT (no adjacent pair repeats — the synthetic query-log
    // word stock saturates around ~130 ranks, at which point every
    // repeated corpus word is a single token; real web text sustains the
    // tens of thousands of ranks production vocabularies carry, through
    // this same loop)
    val trained = Bpe.train(freqs, 5000)
    assert(trained.length >= 100,
      s"corpus training must learn a real vocabulary, got ${trained.length}")
    assert(trained.length < 5000,
      "the synthetic corpus saturates below the budget (fixpoint reached)")
    // fixpoint proof: every REPEATED corpus word merges to one token
    freqs.filter(_._2 >= 2L).foreach { case (w, _) =>
      val n = new graft.functions.BpeVocab(trained).encodeCount(w)
      assert(n == 1, s"trained-to-fixpoint vocab must fully merge '$w', got $n")
    }
    // deterministic: same frequencies, same merges, byte for byte
    assert(Bpe.train(freqs, 5000).toSeq == trained.toSeq)
    // file route round-trips exactly — including leading-space symbols,
    // which is why the format is tab-separated with escapes
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    val path = s"$dir/merges.txt"
    Bpe.writeMerges(path, trained)
    assert(Bpe.loadMerges(path).toSeq == trained.toSeq)
    assert(trained.exists(_._1.startsWith(" ")),
      "trained merges learn space-prefixed word-boundary symbols")
    // independent brute-force reference under the TRAINED ranks: leftmost
    // single-occurrence merge, re-scanning after every merge (a different
    // walk shape than production's all-occurrences sweep; greedy BPE
    // converges identically because a merge's product can only appear in
    // later-ranked pairs)
    val ranks = trained.zipWithIndex.map { case (p, i) => p -> i }.toMap
    def refEncode(word: String): Int = {
      var syms = word.codePoints().toArray.toList
        .map(cp => new String(Character.toChars(cp)))
      var continue = true
      while (continue && syms.size > 1) {
        val pairs = syms.zip(syms.tail)
        val ranked = pairs.filter(ranks.contains)
        if (ranked.isEmpty) continue = false
        else {
          val best = ranked.minBy(ranks)
          val i = pairs.indexOf(best)
          syms = syms.take(i) ++ ((best._1 + best._2) :: syms.drop(i + 2))
        }
      }
      syms.size
    }
    def refCount(text: String): Int = Bpe.preTokens(text).map(refEncode).sum
    val texts = Tables.documents(spark, sf).select("text")
      .limit(120).collect().map(_.getString(0)) ++ Seq(
      "", " ", "the fast scan", "don't stop", "a1b2  c3", "héllo wörld",
      "x!!??y", "   trailing  ", "the the the", "1234 5678", "\tmixed\nws",
      "aaaa bbbb", "supercalifragilistic", "😀 emoji 😀 test")
    import spark.implicits._
    val got = texts.toSeq.toDF("text")
      .select(expr(s"bpe_token_count(text, '$path')"))
      .collect().map(_.getInt(0))
    texts.zip(got).foreach { case (t, g) =>
      assert(g == refCount(t),
        s"trained-vocab count diverges on '${t.take(60)}': $g vs ${refCount(t)}")
    }
    // the trained vocabulary COMPRESSES corpus text harder than the
    // 183-rank committed default — the reason a deployment swaps it in
    val sample = texts.take(120).toSeq.toDF("text")
    val trainedTotal = sample.select(
      sum(expr(s"bpe_token_count(text, '$path')"))).head().getLong(0)
    val defaultTotal = sample.select(
      sum(expr("bpe_token_count(text)"))).head().getLong(0)
    assert(trainedTotal < defaultTotal,
      s"2000 corpus ranks must out-compress the default: $trainedTotal vs $defaultTotal")
    // the 2-arg form stays inside whole-stage codegen like the 1-arg form
    val plan = physicalPlan(Tables.documents(spark, sf)
      .select(expr(s"bpe_token_count(text, '$path')").as("c")))
    assert(plan.linesIterator.exists(l =>
      l.contains("bpe_token_count") && l.trim.startsWith("*(")), plan)
    // guardrails: non-literal / null paths are plan-time errors
    intercept[Exception] {
      spark.range(1).selectExpr("bpe_token_count('x', CAST(id AS STRING))")
        .collect()
    }
  }

  test("corpus BPE training (r19 — VERDICT r18 #5): trainOnCorpus == driver train byte-identical; the declared trained-vocab walk counts its tokens") {
    import graft.functions.{Bpe, BpeVocab}
    val docs = Tables.documents(spark, sf).select("text")
    // the distributed reduction (flatMap preTokens → groupBy → count →
    // driver loop) must train the SAME merges as the all-driver
    // derivation over the same corpus — byte-identical file content
    val distributed = Bpe.trainOnCorpus(docs, "text", 5000)
    val freqs = docs.collect().iterator
      .flatMap(r => Bpe.preTokens(r.getString(0)))
      .foldLeft(Map.empty[String, Long])((m, w) =>
        m.updated(w, m.getOrElse(w, 0L) + 1L))
      .toSeq.sortBy(_._1)
    assert(distributed.toSeq == Bpe.train(freqs, 5000).toSeq,
      "the one-shuffle reduction must not change what training sees")
    assert(distributed.length >= 100 && distributed.exists(_._1.startsWith(" ")),
      "corpus training learns a real vocabulary with word-boundary symbols")
    // minFreq is the documented truncation knob — it must only SHRINK
    // what training sees (a valid vocabulary either way)
    val truncated = Bpe.trainOnCorpus(docs, "text", 5000, minFreq = 2L)
    assert(truncated.nonEmpty && truncated.length <= distributed.length + 50,
      s"minFreq truncation stays a plausible vocabulary: ${truncated.length}")
    // the DECLARED query: budgets in the trained tokens — every toks
    // value equals brute-force encoding under the trained vocabulary
    val out = graft.operators.Pipeline
      .queries("q_token_budget_bpe_trained")(spark, sf)
    val vocab = new BpeVocab(distributed)
    val joined = out.join(Tables.documents(spark, sf), Seq("lang", "doc_id"))
      .select("text", "toks").collect()
    assert(joined.nonEmpty, "the trained-budget walk must keep rows")
    joined.foreach { r =>
      val want = vocab.countTokens(r.getString(0))
      assert(r.getInt(1) == want,
        s"declared toks ${r.getInt(1)} != trained-vocab count $want")
    }
    // trained-to-fixpoint counts compress the corpus harder than the
    // committed 183-rank default — the point of training on the corpus
    import spark.implicits._
    val sample = joined.map(_.getString(0)).toSeq.toDF("text")
    val trainedTotal = joined.map(_.getInt(1).toLong).sum
    val defaultTotal = sample.select(sum(expr("bpe_token_count(text)")))
      .head().getLong(0)
    assert(trainedTotal < defaultTotal,
      s"corpus-trained ranks must out-compress the default: " +
        s"$trainedTotal vs $defaultTotal")
  }

  test("MinHashAggregator: dup docs collide, merge order irrelevant, partition-invariant") {
    import spark.implicits._
    val agg = new MinHashAggregator(16).toColumn
    def sigs(partitions: Int) = Seq(
      DocShingle(1L, "a b c"), DocShingle(1L, "b c d"),
      DocShingle(2L, "a b c"), DocShingle(2L, "b c d"), // same shingles as 1
      DocShingle(3L, "x y z"))
      .toDS().repartition(partitions)
      .groupByKey(_.doc_id).agg(agg).collect().toMap
    val s1 = sigs(1)
    val s5 = sigs(5)
    assert(s1 == s5, "partial-merge path must equal single-pass path")
    assert(s1(1L) == s1(2L))
    assert(s1(1L) != s1(3L))
    assert(s1(1L).length == 16)
  }

  test("hash64 is deterministic and seed-sensitive") {
    assert(MinHashAggregator.hash64("abc", 0) == MinHashAggregator.hash64("abc", 0))
    assert(MinHashAggregator.hash64("abc", 0) != MinHashAggregator.hash64("abc", 1))
    assert(MinHashAggregator.hash64("abc", 0) != MinHashAggregator.hash64("abd", 0))
  }
}
