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
