package graft

import org.apache.spark.sql.functions._
import graft.functions.{GeoOps, KeyOps}
import graft.operators.DataModel

/** SURVEY.md §2.12 — hierarchical-key and GeoPoint data-model mappings. */
class DataModelSpec extends SparkSpec {

  test("maintainAggFromChanges: algebraic fold equals recompute; emptied groups drop, new groups appear") {
    import spark.implicits._
    val base = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("c", 5L)).toDF("g", "v")
    val state = base.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum("v").as("total"))
    // delete BOTH 'a' rows (a key stored twice yields two pre-images),
    // update b (pre 10 → post 12), insert into brand-new group d
    val changes = Seq(
      ("a", 1L, "delete"), ("a", 2L, "delete"),
      ("b", 10L, "update_preimage"), ("b", 12L, "update_postimage"),
      ("d", 7L, "insert")).toDF("g", "v", "_change_type")
    val maintained = DataModel.maintainAggFromChanges(state, changes, "g", "v")
    val after = Seq(("b", 12L), ("c", 5L), ("d", 7L)).toDF("g", "v")
      .groupBy("g").agg(count(lit(1)).as("cnt"), sum("v").as("total"))
    assert(rows(maintained.orderBy("g")) == rows(after.orderBy("g")),
      "maintained state equals recomputing over the post-change table; " +
        "'a' nets to zero and drops, 'd' appears from the delta alone")
    // the NULL group must merge through the null-safe join, not split
    // into separate state and delta rows
    val nBase = Seq((Option.empty[String], 30L), (Some("e"), 1L)).toDF("g", "v")
    val nState = nBase.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum("v").as("total"))
    val nChanges = Seq((Option.empty[String], 5L, "insert"))
      .toDF("g", "v", "_change_type")
    val nGot = DataModel.maintainAggFromChanges(nState, nChanges, "g", "v")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .toSet
    assert(nGot == Set((None, 2L, 35L), (Some("e"), 1L, 1L)),
      "null-group state and delta merge into one row")
  }

  test("key path build/split roundtrip") {
    import spark.implicits._
    val df = Seq((42L, 7L)).toDF("oid", "line")
      .withColumn("key", KeyOps.keyPath("orders" -> col("oid"), "lineitem" -> col("line")))
    val r = df.select(
      col("key"),
      KeyOps.parentPath(col("key")).as("parent"),
      KeyOps.kindAt(col("key"), 0).as("k0"),
      KeyOps.idAt(col("key"), 0).as("i0"),
      KeyOps.kindAt(col("key"), 1).as("k1"),
      KeyOps.idAt(col("key"), 1).as("i1")).head()
    assert(r.getString(0) == "orders/42/lineitem/7")
    assert(r.getString(1) == "orders/42")
    assert(r.getString(2) == "orders" && r.getLong(3) == 42L)
    assert(r.getString(4) == "lineitem" && r.getLong(5) == 7L)
    // a root key's parent is empty
    val root = Seq(Tuple1(1L)).toDF("id")
      .withColumn("key", KeyOps.keyPath("orders" -> col("id")))
      .select(KeyOps.parentPath(col("key"))).head().getString(0)
    assert(root == "")
  }

  test("q_key_hierarchy children counts equal per-order lineitem counts") {
    val got = rows(DataModel.queries("q_key_hierarchy")(spark, sf))
      .map(r => r(2).asInstanceOf[Long] -> r(3).asInstanceOf[Long]).toMap
    val expected = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").count().orderBy("l_orderkey").limit(200)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("haversine: identity, symmetry, known meridian distance") {
    import spark.implicits._
    val df = Seq((0.0, 0.0, 0.0, 1.0)).toDF("la1", "lo1", "la2", "lo2")
    val r = df.select(
      GeoOps.haversineKm(col("la1"), col("lo1"), col("la1"), col("lo1")).as("zero"),
      GeoOps.haversineKm(col("la1"), col("lo1"), col("la2"), col("lo2")).as("ab"),
      GeoOps.haversineKm(col("la2"), col("lo2"), col("la1"), col("lo1")).as("ba")).head()
    assert(r.getDouble(0) == 0.0)
    // one degree of longitude at the equator ≈ 111.195 km (2πR/360)
    assert(math.abs(r.getDouble(1) - 111.195) < 0.01, r.getDouble(1))
    assert(r.getDouble(1) == r.getDouble(2), "haversine must be symmetric")
  }

  test("grid cells: distinct for far points, stable at 5-degree resolution") {
    import spark.implicits._
    val df = Seq((0.0, 0.0), (0.0, 10.0), (10.0, 0.0), (1.0, 1.0))
      .toDF("lat", "lon")
      .select(GeoOps.cellId(col("lat"), col("lon"), 5.0).as("cell"))
    val cells = df.collect().map(_.getLong(0))
    assert(cells(0) != cells(1) && cells(0) != cells(2))
    assert(cells(0) == cells(3), "points within one 5-degree cell share an id")
    assert(cells.forall(c => c >= 0 && c < 36L * 72L))
  }

  test("q_table_diff class counts match independently-derived mutation counts") {
    val orders = Tables.orders(spark, sf)
    val total = orders.count()
    // the planted mutation, recomputed here WITHOUT the diff machinery
    val deleted = orders.filter(col("o_orderkey") % 97 === 0).count()
    val inserted = orders.filter(col("o_orderkey") % 1000 === 0).count()
    val updated = orders.filter(col("o_orderkey") % 97 =!= 0 &&
      col("o_orderkey") % 50 === 0).count()
    val got = rows(DataModel.queries("q_table_diff")(spark, sf))
      .map(r => r(0).asInstanceOf[String] -> r(1).asInstanceOf[Long]).toMap
    assert(got.getOrElse("deleted", 0L) == deleted)
    assert(got.getOrElse("inserted", 0L) == inserted)
    assert(got.getOrElse("updated", 0L) == updated)
    assert(got.getOrElse("unchanged", 0L) == total - deleted - updated)
    // every class present at test scale, so the oracle compares all four
    assert(got.keySet == Set("deleted", "inserted", "updated", "unchanged"))
  }

  test("snapshotDiff: identical snapshots are all-unchanged; key-only view detects value edits") {
    import spark.implicits._
    val a = Seq((1L, "x", 10.0), (2L, "y", 20.0)).toDF("k", "s", "v")
    val same = rows(DataModel.snapshotDiff(a, a, "k", Seq("s", "v")))
    assert(same == Seq(Seq("unchanged", 2L)))
    // one value edit, one delete, one insert — classified independently
    val b = Seq((1L, "x", 11.0), (3L, "z", 30.0)).toDF("k", "s", "v")
    val got = rows(DataModel.snapshotDiff(a, b, "k", Seq("s", "v")))
      .map(r => r(0).asInstanceOf[String] -> r(1).asInstanceOf[Long]).toMap
    assert(got == Map("updated" -> 1L, "deleted" -> 1L, "inserted" -> 1L))
    // null-safe compare: null == null is unchanged, null vs value is updated
    val c1 = Seq((1L, Option.empty[String]), (2L, Option("w"))).toDF("k", "s")
    val c2 = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "s")
    val nu = rows(DataModel.snapshotDiff(c1, c2, "k", Seq("s")))
      .map(r => r(0).asInstanceOf[String] -> r(1).asInstanceOf[Long]).toMap
    assert(nu == Map("unchanged" -> 1L, "updated" -> 1L))
  }

  test("q_cdc_apply: last writer wins, tombstones remove, inserts land, untouched keys identical") {
    val got = rows(DataModel.queries("q_cdc_apply")(spark, sf))
      .map(r => r(0).asInstanceOf[Long] -> r(1).asInstanceOf[Double]).toMap
    val base = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val del = base.keys.filter(_ % 97 == 0)
    assert(del.nonEmpty && del.forall(k => !got.contains(k)),
      "every tombstoned key must vanish")
    // keys hit by BOTH update waves end at the seq-2 value (+7), never the
    // seq-1 value (+5) or a compounded +12 — last-writer-wins on real
    // collisions (%62 ⊂ %31)
    val competing = base.keys.filter(k => k % 62 == 0 && k % 97 != 0)
    assert(competing.nonEmpty, "test scale must exercise competing updates")
    competing.foreach(k => assert(got(k) == base(k) + 7.0, s"key $k"))
    base.keys.filter(k => k % 31 == 0 && k % 62 != 0 && k % 97 != 0)
      .foreach(k => assert(got(k) == base(k) + 5.0, s"key $k"))
    val ins = base.keys.filter(_ % 1000 == 0)
    assert(ins.nonEmpty && ins.forall(k => got(k + 20000000L) == 1.0),
      "inserted fresh keys must land at their log payload")
    base.keys.filter(k => k % 31 != 0 && k % 97 != 0)
      .foreach(k => assert(got(k) == base(k), s"untouched key $k must not move"))
  }

  test("triangleCount: K4 has 4, a chordless square 0; dup/reversed edges canonicalized") {
    import spark.implicits._
    val k4 = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (3L, 4L),
      (2L, 4L), (4L, 2L), (3L, 3L)).toDF("src", "dst") // + dup, reverse, self-loop
    assert(DataModel.triangleCount(k4).agg(sum("tri")).head().getLong(0) == 4L)
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    assert(DataModel.triangleCount(c4).count() == 0, "a chordless cycle has no triangles")
  }

  test("q_graph_triangles: each nation's chain+skip graph closes exactly n-2 triangles") {
    val got = rows(DataModel.queries("q_graph_triangles")(spark, sf))
      .map(r => r(0) -> r(1).asInstanceOf[Long]).toMap
    val expected = Tables.customer(spark, sf).groupBy("c_nationkey").count()
      .collect().map(r => r.get(0) -> (r.getLong(1) - 2))
      .filter(_._2 > 0).toMap
    assert(got == expected)
  }

  test("q_geo_distance covers every customer with bounded coordinates") {
    val got = rows(DataModel.queries("q_geo_distance")(spark, sf))
    assert(got.size == Tables.customer(spark, sf).count())
    got.foreach { r =>
      val (lat, lon, d) = (r(1).asInstanceOf[Double], r(2).asInstanceOf[Double],
        r(3).asInstanceOf[Double])
      assert(lat >= -90 && lat < 90 && lon >= -180 && lon < 180)
      assert(d >= 0 && d <= 20016, s"distance $d outside half circumference")
    }
  }
}
