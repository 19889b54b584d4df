package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.{RankedValue, TopKAggregator}
import graft.operators.Windows
import graft.sources.{Sinks, Sources}

/** Sources/sinks roundtrips + bounded top-k aggregator + distributed ntile. */
class SinksTopKSpec extends SparkSpec {

  test("jsonl sink roundtrip, composed to a single file") {
    val df = Tables.nation(spark, sf)
    val out = Files.createTempDirectory("graft-sink").toString + "/jsonl"
    Sinks.writeJsonl(df, out, compose = true)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".json"))
    assert(files.length == 1, "compose => one data file")
    val back = Sources.jsonl(spark, out, df.schema)
    assert(rows(back.orderBy("n_nationkey")) == rows(df.orderBy("n_nationkey")))
  }

  test("loadAs: CSV and JSONL routes into the table contract match parquet; corrupt lines tolerated") {
    // VERDICT r9 missing #3: the non-parquet first mile. CSV round-trip of
    // nation through Tables.loadAs with the parquet schema pinned must be
    // row-identical to the parquet route (q_source_jsonl's oracle proves
    // the JSONL route at the driver gate; this covers CSV + tolerance).
    val nation = Tables.nation(spark, sf)
    val base = Files.createTempDirectory("graft-loadas").toString
    val csvPath = s"$base/nation.csv"
    graft.sources.Sinks.writeCsv(nation, csvPath)
    val viaCsv = Tables.loadAs(spark, csvPath, nation.schema)
    assert(rows(viaCsv.orderBy("n_nationkey")) == rows(nation.orderBy("n_nationkey")),
      "CSV route must reproduce the parquet rows under the pinned schema")

    // corrupt-record tolerance: a malformed JSONL line must yield a
    // null-columned row, not fail the scan — and the well-formed rows
    // survive untouched
    val jsonlPath = s"$base/docs.jsonl"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(jsonlPath))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$jsonlPath/part-00000.json"),
      ("""{"doc_id": 1, "lang": "en"}""" + "\n" +
        """this line is not json{{{""" + "\n" +
        """{"doc_id": 2, "lang": "de"}""" + "\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType)))
    val tolerant = Tables.loadAs(spark, jsonlPath, schema)
    assert(tolerant.count() == 3, "the corrupt line must survive as a row")
    assert(tolerant.filter(col("doc_id").isNull).count() == 1,
      "exactly the corrupt line nulls out")
    assert(rows(tolerant.filter(col("doc_id").isNotNull).orderBy("doc_id"))
      .map(_.head) == Seq(1L, 2L), "well-formed rows parse under the pinned schema")
  }

  test("CSV documents round trip preserves text byte-identically (incl. trailing spaces)") {
    // q_source_csv's gate check compares length(text); this is the stronger
    // full-equality claim on the same route — quoteAll on write keeps the
    // fixture's trailing-space text intact through the quoted round trip.
    val docs = Tables.documents(spark, sf)
    val out = Files.createTempDirectory("graft-csvdocs").toString + "/docs.csv"
    docs.write.option("header", "true").option("quoteAll", "true").csv(out)
    val back = Tables.loadAs(spark, out, docs.schema)
    assert(rows(back.orderBy("doc_id")) == rows(docs.orderBy("doc_id")))
  }

  test("warehouse sink partitions by column and prunes on read") {
    val df = Tables.documents(spark, sf)
    val out = Files.createTempDirectory("graft-sink").toString + "/wh"
    Sinks.writeWarehouse(df, out, Seq("lang"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("lang=")) >= 2, dirs.toSeq)
    val pruned = Sources.parquet(spark, out).filter(col("lang") === "en")
    val plan = physicalPlan(pruned)
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    assert(pruned.count() == df.filter(col("lang") === "en").count())
  }

  test("date-partitioned fact: pruning provably never reads non-matching partitions") {
    val out = Files.createTempDirectory("graft-sink").toString + "/fact"
    val fact = Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
    Sinks.writeWarehouse(fact, out, Seq("o_year"))
    val dirs = new java.io.File(out).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("o_year="))
    assert(dirs.length >= 2, s"need multiple year partitions, got ${dirs.toSeq}")
    val expected = fact.filter(col("o_year") === 1995).count()
    assert(expected > 0)
    val schema = spark.read.parquet(out).schema
    // plan-level: the year predicate lands in PartitionFilters
    val plan = physicalPlan(
      spark.read.schema(schema).parquet(out).filter(col("o_year") === 1995))
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"), plan)
    // behavior-level: corrupt every OTHER partition's data files. If pruning
    // truly skips those directories the filtered read still succeeds — and
    // the unfiltered control read must fail because it does open them.
    dirs.filter(_.getName != "o_year=1995").foreach(d =>
      d.listFiles().filter(_.getName.endsWith(".parquet")).foreach(f =>
        Files.write(f.toPath, "not a parquet file".getBytes)))
    val pruned = spark.read.schema(schema).parquet(out)
      .filter(col("o_year") === 1995)
    assert(pruned.count() == expected)
    intercept[Exception] {
      spark.read.schema(schema).parquet(out).count()
    }
  }

  test("orc sink roundtrip with predicate pushdown") {
    val df = Tables.orders(spark, sf)
    val out = Files.createTempDirectory("graft-sink").toString + "/orc"
    Sinks.writeOrc(df, out)
    val back = Sources.orc(spark, out).filter(col("o_totalprice") > 200000)
    val plan = physicalPlan(back)
    assert(plan.contains("PushedFilters: [") && plan.contains("o_totalprice"),
      s"ORC scan must receive the pushed predicate:\n$plan")
    assert(back.count() == df.filter(col("o_totalprice") > 200000).count())
  }

  test("compaction rewrites many small files into few, preserving rows") {
    val out = Files.createTempDirectory("graft-sink").toString + "/frag"
    val df = Tables.orders(spark, sf)
    df.repartition(16).write.parquet(out)
    def files() = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = files()
    assert(before >= 16, s"fixture should be fragmented, got $before files")
    val rowsBefore = spark.read.parquet(out).count()
    Sinks.compactParquet(spark, out, targetFiles = 2)
    assert(files() <= 2, s"expected <=2 files after compaction, got ${files()}")
    assert(spark.read.parquet(out).count() == rowsBefore)
    assert(!new java.io.File(s"$out-compact-tmp").exists())
    assert(!new java.io.File(s"$out-compact-old").exists())
  }

  test("scans expose _metadata provenance columns") {
    // row-level provenance (which file produced this row) without a custom
    // source — what a curation pipeline logs when tracing bad documents
    val md = Tables.documents(spark, sf)
      .select(col("doc_id"), col("_metadata.file_path").as("fp"))
    val got = md.limit(10).collect()
    assert(got.nonEmpty && got.forall(_.getString(1).contains("documents.parquet")))
  }

  test("csv sink roundtrip with schema") {
    val df = Tables.region(spark, sf)
    val out = Files.createTempDirectory("graft-sink").toString + "/csv"
    Sinks.writeCsv(df, out)
    val back = Sources.csv(spark, out, df.schema)
    assert(rows(back.orderBy("r_regionkey")) == rows(df.orderBy("r_regionkey")))
  }

  test("co-bucketed tables join without an exchange") {
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // dir persists; clear orphaned locations or saveAsTable refuses them
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Sinks.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", 8)
    Sinks.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", 8)
    val joined = spark.table("b_lineitem")
      .hint("merge") // force sort-merge so bucketing (not broadcast) is exercised
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
    val plan = physicalPlan(joined)
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(joined.count() == Tables.lineitem(spark, sf).count())
  }

  test("jsonl source: corrupt lines are captured, clean rows survive (PERMISSIVE)") {
    // Dirty data is a certainty at pipeline scale; the engine must degrade
    // row-wise, not job-wise. PERMISSIVE + columnNameOfCorruptRecord is the
    // contract: bad lines land in the corrupt column with data columns null.
    val dir = Files.createTempDirectory("graft-dirty").toString
    val lines = Seq(
      """{"id": 1, "name": "ok-one"}""",
      """{"id": 2, "name": "ok-two"}""",
      """{"id": 3, "name": BROKEN""", // not valid JSON
      """{"id": 4, "name": "ok-three"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_bad", org.apache.spark.sql.types.StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(dir)
      .cache() // corrupt-column access requires the full row to be materialized
    assert(df.filter(col("_bad").isNull).count() == 3, "clean rows survive")
    val bad = df.filter(col("_bad").isNotNull)
    assert(bad.count() == 1)
    assert(bad.head().getAs[String]("_bad").contains("BROKEN"))
    df.unpersist()
  }

  test("parquet schema evolution: mergeSchema unions columns across batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    // batch 1: v1 schema; batch 2 adds a column (the additive-evolution path)
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$dir/b=1")
    Seq((3L, "c", 9.5), (4L, "d", 7.25)).toDF("id", "name", "score")
      .write.parquet(s"$dir/b=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("b", "id", "name", "score"))
    val out = merged.orderBy("id").collect()
    assert(out.length == 4)
    assert(out.take(2).forall(_.isNullAt(merged.columns.indexOf("score"))),
      "old-batch rows read the new column as null")
    assert(out.drop(2).map(_.getAs[Double]("score")).toSeq == Seq(9.5, 7.25))
  }

  test("AQE splits a skewed join partition: skew=true in the executed plan") {
    // The automatic complement to q_join_salted's explicit salting: one key
    // holds ~90% of the left side, thresholds are lowered so local data
    // trips them, and AQE must rewrite the sort-merge join with a split
    // skewed partition at runtime. Proves the engine's default config path
    // handles skew without manual intervention.
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try {
      val left = spark.range(0, 60000).select(
        when(col("id") < 55000, lit(0L)).otherwise(col("id")).as("k"),
        concat(lit("pad-pad-pad-pad-pad-"), col("id")).as("pad"))
      val right = spark.range(0, 3000).select(col("id").as("k"), lit("r").as("v"))
      val j = left.join(right, "k")
      // execute j ITSELF (count() would plan a separate query and leave
      // j's adaptive plan unexecuted at isFinalPlan=false)
      // key 0: 55000 left rows x 1 right row; left keys >= 55000 miss right
      assert(j.collect().length == 55000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed sort-merge join:\n$plan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("identical shuffle subtrees are computed once (ReusedExchange)") {
    // Self-join of one aggregated subquery: Spark must plan the shuffle
    // subtree once and reference it (ReusedExchange), not scan+aggregate
    // twice. At 100 TB this is a 2x scan/shuffle saving on every
    // "compare a table to its own aggregate" query (q_agg_unpivot's pivot
    // reuse has the same shape).
    val keep = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = Tables.orders(spark, sf)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
      val joined = agg.as("a")
        .join(agg.as("b"), col("a.cnt") <= col("b.cnt"))
        .select(col("a.o_orderstatus"), col("b.o_orderstatus"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"),
        s"expected the aggregate's exchange to be planned once:\n$plan")
    } finally keep match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // Catalyst's runtime row-level filtering: a bloom filter built from the
    // selective (filtered) side is pushed into the large side's scan as
    // might_contain, dropping non-joining rows BEFORE the shuffle — at
    // 100 TB this is the difference between shuffling the fact table and
    // shuffling the ~matching slice. Thresholds lowered so local sizes
    // qualify (the application side must normally scan >10 GB).
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = Tables.lineitem(spark, sf)
      val sel = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000)
      val j = li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a runtime bloom filter on the probe side:\n$optimized")
      // and the filtered result is still exact
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf).filter(col("o_totalprice") > 400000),
          col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(j.agg(sum("cnt")).head().getLong(0) == expected)
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("TopKAggregator: bounded buffer, merge == single pass, exact order") {
    val agg = new TopKAggregator(3)
    def rv(v: Double, id: Long) = RankedValue(BigDecimal(v), id)
    val items = Seq(rv(5, 1), rv(9, 2), rv(1, 3), rv(9, 4), rv(7, 5), rv(3, 6))
    val single = items.foldLeft(agg.zero)(agg.reduce)
    assert(single == List(rv(9, 2), rv(9, 4), rv(7, 5)), single)
    val (l, r) = items.splitAt(3)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == single, "merge of partials must equal single pass")
    assert(single.length <= 3)
  }

  test("aggregator top-k query equals window top-k query") {
    val a = rows(Windows.queries("q_topk_per_group")(spark, sf))
    val b = rows(Windows.queries("q_topk_per_group_agg")(spark, sf))
    assert(a == b)
  }

  test("distributed ntile/percent_rank equals the global-window version") {
    val a = rows(Windows.queries("q_window_ntile_pct")(spark, sf))
    val b = rows(Windows.queries("q_window_ntile_dist")(spark, sf))
    assert(a == b)
  }

  test("dynamic partition overwrite rewrites only the restated partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dpo-spec").toString
    val base = Seq(("a", 1), ("a", 2), ("b", 3), ("c", 4)).toDF("p", "v")
    Sinks.overwritePartitions(base, dir, Seq("p"))
    // file NAMES are write-unique (task UUIDs), so identical listings prove
    // the partition was not rewritten — stronger than mtime comparison
    def files(p: String): Seq[String] =
      new java.io.File(s"$dir/p=$p").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq.sorted
    val before = (files("b"), files("c"))
    Sinks.overwritePartitions(Seq(("a", 9)).toDF("p", "v"), dir, Seq("p"))
    assert((files("b"), files("c")) == before,
      "partitions absent from the restatement must keep their exact files")
    val got = spark.read.parquet(dir).select(col("p"), col("v"))
      .as[(String, Int)].collect().toSet
    assert(got == Set(("a", 9), ("b", 3), ("c", 4)),
      "only partition a is replaced; a STATIC overwrite would drop b and c")
    // and the conf flip is scoped: session default is back to static
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .forall(_ != "dynamic"))
  }
}
