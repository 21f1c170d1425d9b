package graft

import org.apache.spark.sql.functions._
import graft.geo.Geo
import graft.sources.{Export, Feather}

/** Geo layer: point construction/validation, lat-lon detection, WKT
  * round-trip, bbox semantics, haversine, and the geo-suffixed
  * export/reload paths (data.py:516/:532/:2051/:2100). */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  private val incidents = Seq(
    (1L, 40.73, -73.99, "NYC"),
    (2L, 34.05, -118.24, "LA"),
    (3L, 91.0, 10.0, "bad-lat"),     // out of range → null point
    (4L, Double.NaN, 5.0, "nan"),    // NaN → null point
    (5L, 51.5, -0.12, "London")
  ).toDF("id", "lat", "lon", "name")

  test("point: builds struct, nulls invalid coordinates; bbox filters") {
    val pts = Geo.withPoint(incidents, "lat", "lon")
    assert(Geo.isPointType(pts.schema("geometry").dataType))
    assert(pts.filter(col("geometry").isNull).select("id")
      .as[Long].collect().toSet == Set(3L, 4L))
    // continental-US-ish box keeps NYC + LA only
    val inBox = pts.filter(Geo.bboxContains(col("geometry"), -125, 24, -66, 50))
      .select("id").as[Long].collect().toSet
    assert(inBox == Set(1L, 2L))
  }

  test("findLatLonColumns: canonical names win over suffix noise") {
    val df1 = Seq((1.0, 2.0)).toDF("Latitude", "Longitude")
    assert(Geo.findLatLonColumns(df1).contains(("Latitude", "Longitude")))
    val df2 = Seq((1.0, 2.0, 3.0)).toDF("lat_err", "lat", "lng")
    assert(Geo.findLatLonColumns(df2).contains(("lat", "lng")))
    val df3 = Seq((1, "x")).toDF("id", "name")
    assert(Geo.findLatLonColumns(df3).isEmpty)
  }

  test("wkt: render + parse round-trips points, nulls pass through") {
    val pts = Geo.withPoint(incidents, "lat", "lon")
      .withColumn("wkt", Geo.toWkt(col("geometry")))
      .withColumn("back", Geo.parseWkt(col("wkt")))
    val r = pts.filter(col("id") === 1L).head()
    assert(r.getAs[String]("wkt") == "POINT (-73.990000 40.730000)")
    val good = pts.filter(col("geometry").isNotNull)
    assert(good.filter(col("back").isNull).count() == 0)
    assert(good.filter(
      abs(col("back.lon") - col("geometry.lon")) > 1e-9 ||
      abs(col("back.lat") - col("geometry.lat")) > 1e-9).count() == 0)
    assert(pts.select(Geo.parseWkt(lit("LINESTRING (0 0, 1 1)")).as("g"))
      .head().isNullAt(0))
    assert(pts.select(Geo.parseWkt(lit("garbage")).as("g")).head().isNullAt(0))
    // malformed numerics must yield a NULL STRUCT, never a non-null
    // struct with null fields (which passes isNotNull validity checks)
    assert(pts.select(Geo.parseWkt(lit("POINT (1.2.3 45)")).as("g")).head().isNullAt(0))
    assert(pts.select(Geo.parseWkt(lit("POINT (7 1.2.3)")).as("g")).head().isNullAt(0))
    // scientific notation still parses
    val sci = pts.select(Geo.parseWkt(lit("POINT (1.5e1 -4E-1)")).as("g")).head()
    assert(!sci.isNullAt(0) && sci.getStruct(0).getDouble(0) == 15.0)
  }

  test("radiusJoin fails loud on out-of-range longitude and reserved columns") {
    import spark.implicits._
    def geoDf(rows: (Long, Double, Double)*) = rows.toSeq.toDF("id", "lat", "lon")
      .select(col("id"), struct(col("lon"), col("lat")).as("geometry"))
    val pts = geoDf((1L, 40.0, 200.0)) // lon > 180: would silently miss pairs
    val ctr = geoDf((2L, 40.0, -160.0))
      .withColumnRenamed("geometry", "center_geometry").withColumnRenamed("id", "cid")
    val e = intercept[Exception](
      Geo.radiusJoin(pts, ctr, 50.0).count())
    assert(e.getMessage.contains("longitude beyond"), e.getMessage)
    // a user column named km (or __cx) is rejected, not silently replaced
    val withKm = geoDf((1L, 40.0, 10.0)).withColumn("km", lit(99))
    val e2 = intercept[IllegalArgumentException](
      Geo.radiusJoin(withKm, ctr, 50.0))
    assert(e2.getMessage.contains("collide"))
  }

  test("haversine: zero to self, known NYC-LA distance, symmetric") {
    val pts = Geo.withPoint(incidents.filter(col("id") <= 2), "lat", "lon")
    val two = pts.agg(
      first(when(col("id") === 1, col("geometry")), ignoreNulls = true).as("a"),
      first(when(col("id") === 2, col("geometry")), ignoreNulls = true).as("b"))
    val d = two.select(
      Geo.haversineKm(col("a"), col("a")).as("self"),
      Geo.haversineKm(col("a"), col("b")).as("ab"),
      Geo.haversineKm(col("b"), col("a")).as("ba")).head()
    assert(d.getDouble(0) == 0.0)
    assert(math.abs(d.getDouble(1) - 3936.0) < 15.0) // published ~3936 km
    assert(d.getDouble(1) == d.getDouble(2))
  }

  test("geoparquet export: canonical name, struct round-trip, fail-loud without geometry") {
    val dir = java.nio.file.Files.createTempDirectory("graft_geo").toString
    val pts = Geo.withPoint(incidents, "lat", "lon")
    val path = Export.toGeoParquet(pts, dir, "NY", "New York", "New York",
      "OFFICER-INVOLVED SHOOTINGS", Left("2021"))
    assert(path.endsWith(
      "NY_New York_OFFICER-INVOLVED SHOOTINGS_2021.geoparquet"))
    val back = Export.loadGeoParquet(spark, dir, "NY", "New York", "New York",
      "OFFICER-INVOLVED SHOOTINGS", Left("2021"))
    assert(Geo.isPointType(back.schema("geometry").dataType))
    assert(back.count() == 5)
    assert(back.filter(col("id") === 1)
      .select("geometry.lat").as[Double].head() == 40.73)
    val ex = intercept[IllegalArgumentException] {
      Export.toGeoParquet(incidents, dir, "NY", "New York", "New York",
        "TRAFFIC STOPS", Left("2021"))
    }
    assert(ex.getMessage.contains("point column"))
  }

  test("geofeather export: WKT serialization round-trips through Arrow IPC") {
    val dir = java.nio.file.Files.createTempDirectory("graft_geof").toString
    val pts = Geo.withPoint(incidents, "lat", "lon")
    val path = Feather.toGeoFeather(pts, dir, "CA", "Los Angeles",
      "Los Angeles", "STOPS", Left("2020"))
    assert(path.endsWith("CA_Los Angeles_STOPS_2020.geofeather"))
    val back = Feather.loadGeoFeather(spark, dir, "CA", "Los Angeles",
      "Los Angeles", "STOPS", Left("2020"))
    assert(Geo.isPointType(back.schema("geometry").dataType))
    // valid points round-trip; invalid ones were nulled pre-export
    assert(back.filter(col("geometry").isNotNull).count() == 3)
    assert(back.filter(col("id") === 5)
      .select("geometry.lon").as[Double].head() == -0.12)
  }

  test("radiusJoin equals the brute-force cross join, incl. antimeridian and high latitudes") {
    import org.apache.spark.sql.DataFrame
    // deterministic pseudo-random points spread across the globe, plus
    // seam and high-latitude clusters that stress the blocking
    val pts = spark.range(0, 400)
      .select(col("id").as("pid"),
        Geo.point(
          (col("id") * 79 % 3600).cast("double") / 10 - 180,
          (col("id") * 37 % 1500).cast("double") / 10 - 75).as("geometry"))
      // explicit seam points: ~30 km from each antimeridian center,
      // across the ±180 line from it
      .unionByName(Seq((9001L, 10.0, -179.9), (9002L, 10.0, 179.7))
        .toDF("pid", "plat", "plon")
        .select(col("pid"), Geo.point(col("plon"), col("plat")).as("geometry")))
    val ctrs = Seq(
      (100L, 0.0, 0.0), (101L, 45.0, 90.0), (102L, -60.0, -120.0),
      (103L, 10.0, 179.8), (104L, 10.0, -179.9), // antimeridian pair
      (105L, 74.5, 30.0)                         // high latitude
    ).toDF("cid", "clat", "clon")
      .select(col("cid"), Geo.point(col("clon"), col("clat")).as("center_geometry"))
    def pairs(df: DataFrame) = df.select("pid", "cid").as[(Long, Long)].collect().toSet
    val blocked = Geo.radiusJoin(pts, ctrs, radiusKm = 800.0)
    val brute = pts.crossJoin(ctrs)
      .withColumn("km", Geo.haversineKm(col("geometry"), col("center_geometry")))
      .filter(col("km") <= 800.0)
    assert(pairs(blocked) == pairs(brute))
    assert(blocked.count() == blocked.select("pid", "cid").distinct().count()) // no dup pairs
    assert(brute.count() > 0) // the comparison is non-vacuous
    // the two antimeridian centers catch the explicit far-side points
    // (center 103 at lon 179.8 ↔ point 9001 at -179.9; center 104 at
    // -179.9 ↔ point 9002 at 179.7 — pairs that exist only if the
    // seam-shifted blocking copies work)
    assert(pairs(blocked).contains((9001L, 103L)))
    assert(pairs(blocked).contains((9002L, 104L)))
    // a polar-cap center fails loud rather than silently missing pairs
    val polar = Seq((1L, 89.0, 0.0)).toDF("cid", "clat", "clon")
      .select(col("cid"), Geo.point(col("clon"), col("clat")).as("center_geometry"))
    val ex = intercept[Exception](
      Geo.radiusJoin(pts, polar, radiusKm = 100.0).collect())
    def msg(t: Throwable): String =
      (Option(t.getMessage) ++ Option(t.getCause).map(msg)).mkString(" ")
    assert(msg(ex).contains("polar"))
  }

  test("radiusJoin high-latitude reach and full-circle replication (review regressions)") {
    // Reach must use the exact haversine inversion: at lat 85 a 600 km
    // pair spans 65.3° of longitude where the flat-earth bound says
    // 62.3° — the flat bound silently dropped this pair.
    val hiPts = Seq((1L, 85.0, 70.75)).toDF("pid", "plat", "plon")
      .select(col("pid"), Geo.point(col("plon"), col("plat")).as("geometry"))
    val hiCtr = Seq((10L, 85.0, 5.4)).toDF("cid", "clat", "clon")
      .select(col("cid"), Geo.point(col("clon"), col("clat")).as("center_geometry"))
    val hi = Geo.radiusJoin(hiPts, hiCtr, radiusKm = 600.0, maxAbsLat = 85.0)
      .select("pid", "cid", "km").collect()
    assert(hi.length == 1 && hi.head.getDouble(2) <= 600.0)
    // Very large radius at high latitude wraps every longitude: the
    // replicas must cover the globe WITHOUT base/seam overlap — each
    // qualifying pair appears exactly once.
    val farPts = Seq((2L, 80.0, -150.0), (3L, 80.0, 179.9)).toDF("pid", "plat", "plon")
      .select(col("pid"), Geo.point(col("plon"), col("plat")).as("geometry"))
    val farCtr = Seq((20L, 80.0, 0.0)).toDF("cid", "clat", "clon")
      .select(col("cid"), Geo.point(col("clon"), col("clat")).as("center_geometry"))
    val far = Geo.radiusJoin(farPts, farCtr, radiusKm = 5000.0)
      .select("pid", "cid").as[(Long, Long)].collect().toSeq
    assert(far.sorted == Seq((2L, 20L), (3L, 20L)), s"got $far")
    // and the result still equals brute force on a dense global sweep
    val sweep = spark.range(0, 500)
      .select(col("id").as("pid"),
        Geo.point((col("id") * 97 % 3600).cast("double") / 10 - 180,
          (col("id") * 31 % 1580).cast("double") / 10 - 79).as("geometry"))
    val blocked = Geo.radiusJoin(sweep, farCtr, radiusKm = 5000.0)
      .select("pid", "cid").as[(Long, Long)].collect().toSeq
    val brute = sweep.crossJoin(farCtr)
      .filter(Geo.haversineKm(col("geometry"), col("center_geometry")) <= 5000.0)
      .select("pid", "cid").as[(Long, Long)].collect().toSeq
    assert(blocked.sorted == brute.sorted) // set-equal AND no duplicates
  }

  test("bbox predicate pushes down to the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_geo_push").toString
    Geo.withPoint(incidents, "lat", "lon").write.parquet(s"$dir/pts")
    val scan = spark.read.parquet(s"$dir/pts")
      .filter(Geo.bboxContains(col("geometry"), -125, 24, -66, 50))
    val explained = scan.queryExecution.executedPlan.toString
    // struct-field range predicates reach the scan as PushedFilters
    assert(explained.contains("PushedFilters") &&
      explained.contains("geometry.lon"),
      s"expected pushed struct-field filters in:\n$explained")
  }
}
