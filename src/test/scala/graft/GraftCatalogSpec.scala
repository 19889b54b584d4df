package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import graft.functions.ColumnOps
import graft.operators.Similarity

/** GraftCatalog (VERDICT r6 #8): the indexes as NAMED tables — register
  * once, then `spark.table("graft.x")` / `saveAsTable` instead of path
  * options — with every pushdown behavior identical to the path route. */
class GraftCatalogSpec extends SparkSpec {

  private lazy val root = java.nio.file.Files
    .createTempDirectory("graft-catalog").toString

  // every test needs the catalog registered BEFORE its first SQL — a lazy
  // val touched only by some tests leaves the rest resolving `graft` as a
  // session-catalog database
  private def ensureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.dir", root)
  }

  private def indexScanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.sparkPlan.collect {
      case b: BatchScanExec if b.scan.isInstanceOf[graft.sources.IndexScan] =>
        b.scan.asInstanceOf[graft.sources.IndexScan]
    }.head

  test("an existing index registered via LOCATION reads with pruning intact") {
    ensureCatalog()
    val idxDir = java.nio.file.Files.createTempDirectory("graft-cat-idx").toString
    graft.sources.InvertedIndex.build(Tables.documents(spark, sf), idxDir)
    spark.sql(s"CREATE TABLE graft.docs_idx (term STRING, doc_id BIGINT) " +
      s"USING `graft.index` LOCATION '$idxDir'")
    try {
      val t = spark.table("graft.docs_idx")
        .filter(col("term") === "vector").select("doc_id").orderBy("doc_id")
      assert(rows(t) ==
        rows(graft.sources.InvertedIndex.lookup(spark, idxDir, "vector")),
        "named-table read must equal the path-option lookup")
      // the SAME IndexTable under the name: pushdown + bucket pruning intact
      val scan = indexScanOf(t)
      assert(scan.pushedTerms.contains(Seq("vector")),
        s"pushdown must survive the catalog route: ${scan.pushedTerms}")
      assert(scan.description().contains("bucketsScanned=1/64"), scan.description())
      assert(spark.catalog.tableExists("graft.docs_idx"))
    } finally spark.sql("DROP TABLE graft.docs_idx")
    // external drop removes the NAME, not the data
    assert(new java.io.File(idxDir).exists(),
      "dropping an external table must keep the index data")
  }

  test("saveAsTable CTAS builds a managed index; a seg append lands through the name") {
    val docs = Tables.documents(spark, sf)
    val pairs = docs.select(col("doc_id"),
      explode(expr(graft.functions.TextTokens.ToksSql)).as("term"))
      .select("term", "doc_id")
    ensureCatalog()
    pairs.filter(col("doc_id") % 2 === 0)
      .write.format("graft.index").saveAsTable("graft.built_idx")
    try {
      pairs.filter(col("doc_id") % 2 =!= 0)
        .write.format("graft.index").option("seg", "1")
        .mode("append").saveAsTable("graft.built_idx")
      // equals a from-scratch helper build over all docs
      val fullDir = java.nio.file.Files.createTempDirectory("graft-cat-full").toString
      graft.sources.InvertedIndex.build(docs, fullDir)
      for (term <- Seq("vector", "join", "no-such-term-anywhere")) {
        val viaName = rows(spark.table("graft.built_idx")
          .filter(col("term") === term).select("doc_id").orderBy("doc_id"))
        val viaBuild = rows(
          graft.sources.InvertedIndex.lookup(spark, fullDir, term))
        assert(viaName == viaBuild,
          s"catalog-built index must equal the helper build for '$term'")
      }
      // managed table: data lives under the catalog root
      assert(new java.io.File(s"$root/built_idx").listFiles()
        .exists(_.getName.startsWith("bucket=")),
        "CTAS data must land in the managed table directory")
    } finally spark.sql("DROP TABLE graft.built_idx")
    assert(!new java.io.File(s"$root/built_idx").exists(),
      "dropping a managed table must remove its data")
  }

  test("an IVF index registered via LOCATION reads with cid pushdown intact") {
    ensureCatalog()
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    val idx = Similarity.IvfIndex.build(e, 8, 3)
    val ivfDir = java.nio.file.Files.createTempDirectory("graft-cat-ivf").toString
    Similarity.IvfIndex.write(idx, ivfDir)
    idx.drop()
    spark.sql("CREATE TABLE graft.vecs (vec_id BIGINT, v ARRAY<DOUBLE>, cid INT) " +
      s"USING `graft.ivf` LOCATION '$ivfDir'")
    try {
      val t = spark.table("graft.vecs").filter(col("cid").isin(0, 3))
      val scan = t.queryExecution.sparkPlan.collect {
        case b: BatchScanExec if b.scan.isInstanceOf[graft.sources.IvfScan] =>
          b.scan.asInstanceOf[graft.sources.IvfScan]
      }.head
      assert(scan.pushedCids.exists(_.toSet == Set(0, 3)),
        s"cid pushdown must survive the catalog route: ${scan.pushedCids}")
      assert(rows(t.orderBy("vec_id")) == rows(
        spark.read.parquet(s"$ivfDir/assigned")
          .filter(col("cid").isin(0, 3))
          .select(col("vec_id"), col("v"), col("cid")).orderBy("vec_id")))
    } finally spark.sql("DROP TABLE graft.vecs")
  }

  test("bucket transform resolves through the catalog: groupBy(term) and a term-keyed join plan zero shuffle Exchange") {
    // VERDICT r7 #1, index side: the bucket=B layout is a bucket(64, term)
    // clustering. The transform only resolves against a FunctionCatalog —
    // this catalog exposes the matching `bucket` function — so the
    // catalog-routed read is the one that consumes it shuffle-free.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def shuffles(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.sparkPlan.collect { case e: ShuffleExchangeExec => e }
    ensureCatalog()
    val idxDir = java.nio.file.Files.createTempDirectory("graft-cat-spj").toString
    graft.sources.InvertedIndex.build(Tables.documents(spark, sf), idxDir)
    spark.sql(s"CREATE TABLE graft.spj_idx (term STRING, doc_id BIGINT) " +
      s"USING `graft.index` LOCATION '$idxDir'")
    try {
      // document frequency: the index's groupBy(term) — equal terms are
      // co-located by the writer's bucketing, so zero Exchange
      val df = spark.table("graft.spj_idx").groupBy("term").count()
      assert(shuffles(df).isEmpty,
        s"groupBy(term) must consume the bucket clustering, zero Exchange:\n${df.queryExecution.sparkPlan}")
      assert(rows(df.orderBy("term")) == rows(
        spark.read.format("graft.index").option("dir", idxDir).load()
          .groupBy("term").count().orderBy("term")),
        "shuffle-free term counts must equal the path-route read")

      // term-keyed self-join of two catalog reads: both sides report the
      // same canonical bucket function over 64 buckets -> storage-
      // partitioned join, zero Exchange
      val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val l = spark.table("graft.spj_idx")
        val r = spark.table("graft.spj_idx")
          .filter(col("doc_id") % 5 === 0) // residual: stays in Spark, keeps partitioning
          .select(col("term"), col("doc_id").as("other"))
        val j = l.join(r, "term")
        assert(shuffles(j).isEmpty,
          s"term-keyed index join must be storage-partitioned, zero Exchange:\n${j.queryExecution.sparkPlan}")
        val p = spark.read.format("graft.index").option("dir", idxDir).load()
        assert(j.count() ==
          p.join(p.filter(col("doc_id") % 5 === 0)
            .select(col("term"), col("doc_id").as("other")), "term").count(),
          "the storage-partitioned join must produce exactly the shuffled join's rows")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    } finally spark.sql("DROP TABLE graft.spj_idx")
  }

  test("ivf CTAS and seg append through the catalog take the writer's (vec_id, v) schema") {
    // ADVICE r7: catalog-named ivf tables were effectively read-only — the
    // full-schema table demanded the quantizer-assigned cid from writers
    ensureCatalog()
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), ColumnOps.toDoubleArray(col("embedding")).as("v"))
    e.filter(col("vec_id") % 2 === 0)
      .write.format("graft.ivf").option("k", "8").option("iters", "3")
      .saveAsTable("graft.vec_tbl") // first write into the empty managed dir TRAINS
    try {
      e.filter(col("vec_id") % 2 =!= 0)
        .write.format("graft.ivf").option("seg", "1")
        .mode("append").saveAsTable("graft.vec_tbl") // assigns with stored centroids
      val t = spark.table("graft.vec_tbl")
      assert(t.columns.toSeq == Seq("vec_id", "v", "cid"),
        "reads still surface the full (vec_id, v, cid) schema")
      assert(t.count() == e.count(), "both writes' rows must be visible")
      // the append assigned with the CTAS-trained centroids: every row's
      // cid matches a driver-side reassignment with the stored centroids
      val cents = rows(spark.read.parquet(s"$root/vec_tbl/centroids").orderBy("cid"))
        .map(_(1).asInstanceOf[scala.collection.Seq[Double]].toSeq)
      val mismatch = t.collect().count { row =>
        val v = row.getSeq[Double](1)
        val best = cents.zipWithIndex.minBy { case (c, _) =>
          var s = 0.0; var i = 0
          while (i < v.length) { val d = v(i) - c(i); s += d * d; i += 1 }
          s
        }._2
        best != row.getInt(2)
      }
      assert(mismatch == 0, s"$mismatch rows have a cid that is not the nearest stored centroid")
    } finally spark.sql("DROP TABLE graft.vec_tbl")
    assert(!new java.io.File(s"$root/vec_tbl").exists(),
      "dropping the managed ivf table must remove its data")
  }

  test("descriptor round-trips locations with quotes and backslashes") {
    // ADVICE r7: writeMeta interpolated raw strings into JSON; a location
    // with a quote wrote a descriptor readMeta then rejected, bricking the
    // table name
    import scala.jdk.CollectionConverters._
    val root2 = java.nio.file.Files.createTempDirectory("graft-cat-esc").toString
    val cat = new graft.sources.GraftCatalog
    cat.initialize("gesc", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      Map("dir" -> root2).asJava))
    val weird = """/tmp/we"ird\loc"""
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "weird")
    cat.createTable(ident, graft.sources.IndexSource.Schema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      Map(org.apache.spark.sql.connector.catalog.TableCatalog.PROP_PROVIDER -> "graft.index",
        org.apache.spark.sql.connector.catalog.TableCatalog.PROP_LOCATION -> weird).asJava)
    val loaded = cat.loadTable(ident)
    assert(loaded.name().contains(weird),
      s"the exact location must round-trip through the descriptor: ${loaded.name()}")
    assert(cat.dropTable(ident))
  }

  test("r15 CREATE surface: commitlog CTAS, PARTITIONED BY transforms, one-commit constraint declaration") {
    import spark.implicits._
    ensureCatalog()
    // ---- CTAS (VERDICT r14 #3b): CREATE TABLE … USING graft.commitlog
    // AS SELECT routes through createTable + the V1-write append — the
    // non-staging V2 path (create, then write; Spark drops the table on
    // a failed write). The result must read back through BOTH faces.
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "v", "p")
      .createOrReplaceTempView("gcat_ctas_src")
    spark.sql("CREATE TABLE graft.ctas_t USING `graft.commitlog` " +
      "AS SELECT * FROM gcat_ctas_src")
    try {
      assert(rows(spark.table("graft.ctas_t").orderBy("id")) ==
        Seq(Seq(1L, "a", 1.0), Seq(2L, "b", 2.0)),
        "CTAS must land the SELECT through the commit protocol")
      // the write went THROUGH the log: one auditable creating commit,
      // never a raw parquet write (a managed table's location is its
      // catalog directory)
      val loc = s"$root/ctas_t"
      val hist = graft.sources.CommitLog.history(spark, loc)
        .orderBy("version").collect().map(r => r.getString(3)).toSeq
      assert(hist.nonEmpty && hist.head == "create",
        s"CTAS must commit through the protocol (got history $hist)")
    } finally spark.sql("DROP TABLE IF EXISTS graft.ctas_t")
    // ---- PARTITIONED BY: identity transforms are SUPPORTED since r19
    // (VERDICT r18 #1 — the spec records through the audited verb;
    // PartitionSpec covers the split staging/pruning/overwrite
    // machinery); non-identity transforms still refuse loudly — the
    // engine records exact column identity, not transformed values
    spark.sql("CREATE TABLE graft.part_t (id BIGINT, day STRING) " +
      "USING `graft.commitlog` PARTITIONED BY (day)")
    try {
      assert(graft.sources.CommitLog.latest(spark, s"$root/part_t").get
        .partitionBy == Seq("day"),
        "identity PARTITIONED BY must record the spec at CREATE")
    } finally spark.sql("DROP TABLE graft.part_t")
    val part = intercept[Exception] {
      spark.sql("CREATE TABLE graft.part_b (id BIGINT, day STRING) " +
        "USING `graft.commitlog` PARTITIONED BY (bucket(4, id))")
    }
    assert(part.getMessage.contains("PARTITIONED BY"), part.getMessage)
    assert(!spark.catalog.tableExists("graft.part_b"),
      "a refused CREATE must not leave a descriptor")
    // ---- multi-constraint CREATE is ONE metadata commit (ADVICE r14):
    // a later constraint the LOCATION's data violates must leave a
    // pre-existing external table's enforcement UNTOUCHED, and the
    // corrected retry must start clean (no 'already exists')
    val extRoot = java.nio.file.Files.createTempDirectory("graft-cat-ext").toString
    graft.sources.CommitLog.commit(spark, extRoot, "w", "create") { _ =>
      Seq((1L, 5.0), (2L, -3.0)).toDF("id", "q") }
    val bad = intercept[Exception] {
      spark.sql("CREATE TABLE graft.cons_t (id BIGINT, q DOUBLE, " +
        "CONSTRAINT id_pos CHECK (id > 0), CONSTRAINT q_pos CHECK (q > 0)) " +
        s"USING `graft.commitlog` LOCATION '$extRoot'")
    }
    assert(bad.getMessage.contains("q_pos"), bad.getMessage)
    assert(!spark.catalog.tableExists("graft.cons_t"),
      "the failed CREATE must not leave a descriptor")
    assert(graft.sources.CommitLog.latest(spark, extRoot).get.constraints.isEmpty,
      "the failed CREATE must not leave ANY constraint on the external " +
        "table — id_pos was declared before the violated q_pos (ADVICE r14)")
    // corrected retry: drops the violated constraint, keeps the valid one
    spark.sql("CREATE TABLE graft.cons_t (id BIGINT, q DOUBLE, " +
      "CONSTRAINT id_pos CHECK (id > 0)) " +
      s"USING `graft.commitlog` LOCATION '$extRoot'")
    try {
      val cs = graft.sources.CommitLog.latest(spark, extRoot).get.constraints
      assert(cs.map(_._1) == Seq("id_pos"), cs.toString)
      // both declared constraints land in ONE commit when valid
      val extRoot2 = java.nio.file.Files.createTempDirectory("graft-cat-ex2").toString
      graft.sources.CommitLog.commit(spark, extRoot2, "w", "create") { _ =>
        Seq((1L, 5.0)).toDF("id", "q") }
      val vBefore = graft.sources.CommitLog.latest(spark, extRoot2).get.version
      spark.sql("CREATE TABLE graft.cons2_t (id BIGINT, q DOUBLE, " +
        "CONSTRAINT id_pos CHECK (id > 0), CONSTRAINT q_pos CHECK (q > 0)) " +
        s"USING `graft.commitlog` LOCATION '$extRoot2'")
      try {
        val head2 = graft.sources.CommitLog.latest(spark, extRoot2).get
        assert(head2.version == vBefore + 1,
          s"two declared constraints must land in ONE commit " +
            s"(v$vBefore -> v${head2.version})")
        assert(head2.constraints.map(_._1).toSet == Set("id_pos", "q_pos"))
      } finally spark.sql("DROP TABLE IF EXISTS graft.cons2_t")
    } finally spark.sql("DROP TABLE IF EXISTS graft.cons_t")
  }

  test("catalog inventory: list, rename, recreate after drop") {
    ensureCatalog()
    val idxDir = java.nio.file.Files.createTempDirectory("graft-cat-ls").toString
    graft.sources.InvertedIndex.build(
      Tables.documents(spark, sf).limit(50), idxDir)
    spark.sql(s"CREATE TABLE graft.ls_a (term STRING, doc_id BIGINT) " +
      s"USING `graft.index` LOCATION '$idxDir'")
    try {
      assert(rows(spark.sql("SHOW TABLES IN graft"))
        .exists(_.contains("ls_a")), "SHOW TABLES must list the table")
      spark.sql("ALTER TABLE graft.ls_a RENAME TO ls_b")
      assert(spark.catalog.tableExists("graft.ls_b"))
      assert(!spark.catalog.tableExists("graft.ls_a"))
      assert(spark.table("graft.ls_b").count() > 0,
        "renamed external table must still read its location")
    } finally spark.sql("DROP TABLE IF EXISTS graft.ls_b")
  }
}
