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
