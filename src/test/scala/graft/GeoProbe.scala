package graft

import org.apache.spark.sql.functions._

/** Dev scratch (r19): stage-level timing for q_geo_neighbors — NOT a
  * declared surface. Times the full pipeline vs truncated prefixes to
  * locate the dominant stage. */
object GeoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    def latOf(k: org.apache.spark.sql.Column) =
      ((k * lit(7919L)) % lit(18000L)).cast("double") / lit(100.0) - lit(90.0)
    def lonOf(k: org.apache.spark.sql.Column) =
      ((k * lit(104729L)) % lit(36000L)).cast("double") / lit(100.0) - lit(180.0)
    val pts = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("k"))
      .withColumn("lat", latOf(col("k")))
      .withColumn("lon", lonOf(col("k")))
    val full = graft.functions.GeoOps.radiusSelfJoinKm(pts, 500.0)
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"GEOPROBE $tag%-28s median=${ts.sorted.apply(1)}%.3f  n=${df.count()}")
    }
    time("full+orderBy")(full.orderBy("da", "db"))
    time("full_no_sort")(full)
    // pre-distinct: same pipeline minus the final distinct
    val preDistinct = {
      // re-derive by dropping .distinct(): call the helper's internals via
      // a copy — cheapest: distinct-of-distinct is idempotent, so time
      // distinct separately by diffing; instead time the candidate join
      // with only the chord2 filter (no haversine/round/distinct)
      full // placeholder
    }
    val keyed = pts
      .withColumn("band",
        least(floor((col("lat") + lit(90.0)) / lit(5.0)), lit(35)).cast("int"))
      .withColumn("cellRaw",
        pmod(floor((col("lon") + lit(180.0)) / lit(15.0)), lit(24)).cast("int"))
      .withColumn("cell",
        when(col("band") <= 3 || col("band") >= 32, lit(0))
          .otherwise(col("cellRaw")))
      .withColumn("px", cos(radians(col("lat"))) * cos(radians(col("lon"))))
      .withColumn("py", cos(radians(col("lat"))) * sin(radians(col("lon"))))
      .withColumn("pz", sin(radians(col("lat"))))
    val homes = keyed.select(col("k").as("db"), col("lat").as("latb"),
      col("lon").as("lonb"), col("px").as("xb"), col("py").as("yb"),
      col("pz").as("zb"), col("band"), col("cell"))
    val probeKeys = {
      val home = struct(col("band").as("band"), col("cell").as("cell"))
      val ks = for (db <- -1 to 1; dc <- -1 to 1) yield {
        val bandP = col("band") + lit(db)
        when(bandP < 0 || bandP > 35, home).otherwise(
          struct(bandP.as("band"),
            when(bandP <= 3 || bandP >= 32, lit(0))
              .otherwise(pmod(col("cellRaw") + lit(dc), lit(24)))
              .cast("int").as("cell")))
      }
      array_distinct(array(ks.toSeq: _*))
    }
    val probes = keyed.select(col("k").as("da"), col("lat").as("lata"),
      col("lon").as("lona"), col("px").as("xa"), col("py").as("ya"),
      col("pz").as("za"), explode(probeKeys).as("bk"))
      .select(col("da"), col("lata"), col("lona"),
        col("xa"), col("ya"), col("za"),
        col("bk.band").as("band"), col("bk.cell").as("cell"))
    time("probes_only")(probes)
    val chord2 =
      (col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")) +
        (col("za") - col("zb")) * (col("za") - col("zb"))
    val joined = probes.join(homes, Seq("band", "cell"))
      .filter(col("da") =!= col("db"))
    val chorded = joined.filter(chord2 <= lit(0.006168341187147936))
    time("join_chord2_only")(chorded.select("da", "db"))
    val withHav = chorded
      .select(least(col("da"), col("db")).as("pa"),
        greatest(col("da"), col("db")).as("pb"),
        round(graft.functions.GeoOps.haversineKm(
          col("lata"), col("lona"), col("latb"), col("lonb")), 4).as("dist_km"))
      .filter(col("dist_km") <= 500.0)
    time("plus_haversine")(withHav)
    time("plus_distinct")(withHav.select(col("pa").as("da"),
      col("pb").as("db"), col("dist_km")).distinct())
    // NEW canonical probe scheme stages (mirror of GeoOps r19)
    val probeKeys2 = {
      val home = struct(col("band").as("band"), col("cell").as("cell"))
      def up(dc: Int) = {
        val b1 = col("band") + lit(1)
        when(b1 > 35, home).otherwise(
          struct(b1.as("band"),
            when(b1 <= 3 || b1 >= 32, lit(0))
              .otherwise(pmod(col("cellRaw") + lit(dc), lit(24)))
              .cast("int").as("cell")))
      }
      val right = struct(col("band").as("band"),
        when(col("band") <= 3 || col("band") >= 32, lit(0))
          .otherwise(pmod(col("cellRaw") + lit(1), lit(24)))
          .cast("int").as("cell"))
      val downCatch = when(col("band") === 4,
        struct(lit(3).cast("int").as("band"), lit(0).cast("int").as("cell")))
        .otherwise(home)
      array_distinct(array(home, right, up(-1), up(0), up(1), downCatch))
    }
    val probes2 = keyed.select(col("k").as("da"), col("lat").as("lata"),
      col("lon").as("lona"), col("px").as("xa"), col("py").as("ya"),
      col("pz").as("za"), col("band").as("hb"), col("cell").as("hc"),
      explode(probeKeys2).as("bk"))
      .select(col("da"), col("lata"), col("lona"),
        col("xa"), col("ya"), col("za"),
        (col("bk.band") === col("hb") && col("bk.cell") === col("hc")).as("selfp"),
        col("bk.band").as("band"), col("bk.cell").as("cell"))
    time("NEW_probes")(probes2)
    val joined2 = probes2.join(homes, Seq("band", "cell"))
      .filter(col("da") =!= col("db"))
      .filter(!col("selfp") || col("da") < col("db"))
    val chorded2 = joined2.filter(chord2 <= lit(0.006168341187147936))
    time("NEW_join_chord2")(chorded2.select("da", "db"))
    val withHav2 = chorded2
      .select(least(col("da"), col("db")).as("pa"),
        greatest(col("da"), col("db")).as("pb"),
        round(graft.functions.GeoOps.haversineKm(
          col("lata"), col("lona"), col("latb"), col("lonb")), 4).as("dist_km"))
      .filter(col("dist_km") <= 500.0)
    time("NEW_plus_haversine")(withHav2)
    time("NEW_plus_distinct")(withHav2.select(col("pa").as("da"),
      col("pb").as("db"), col("dist_km")).distinct())
    spark.stop()
  }
}
