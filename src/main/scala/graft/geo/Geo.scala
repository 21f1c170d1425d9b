package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Geo column support — the Spark-first restatement of the reference's
  * optional geopandas layer (openpolicedata/data.py:36 `import
  * geopandas`, data_loaders/arcgis_class.py:540 / carto.py:318 point
  * geometry construction from per-record x/y, data.py:516/:532
  * geo-suffixed export filenames, data.py:624 geo explode handling).
  *
  * Representation: a plain `struct<lon double, lat double>` column
  * (EPSG:4326 order matches the reference's `Point(x=lon, y=lat)`).
  * Deliberately NOT an opaque geometry blob: a struct of two doubles is
  * codegen-friendly, survives parquet pushdown on its fields
  * (`geometry.lat > …` prunes row groups), groups/joins like any other
  * column, and — unlike the geopandas explode bug the reference warns
  * about at data.py:624-630 — behaves identically under explode/expand,
  * because Spark structs are value types in the row. WKT/geofeather
  * renderings are provided for interchange.
  *
  * Scale shape: every function here is a scan-stage expression — no
  * shuffle, no UDF, no driver participation. A bounding-box filter
  * compiles to two range predicates on struct fields, which Spark
  * pushes to the parquet reader.
  */
object Geo {

  val PointType: StructType = StructType(Seq(
    StructField("lon", DoubleType), StructField("lat", DoubleType)))

  /** WGS84 mean Earth radius (km). ONE definition: the radiusJoin
    * lon-reach bound is an exact inversion of [[haversineKm]] only
    * while both use the same R — editing either constant alone would
    * silently under-cover the blocking at high latitude. */
  val MeanRadiusKm: Double = 6371.0088

  /** Point-struct check ignoring nullability (expression-built structs
    * carry non-nullable fields, parquet reloads nullable ones). */
  def isPointType(dt: DataType): Boolean = dt match {
    case st: StructType =>
      st.fields.length == 2 &&
        st.fields(0).name == "lon" && st.fields(0).dataType == DoubleType &&
        st.fields(1).name == "lat" && st.fields(1).dataType == DoubleType
    case _ => false
  }

  /** Point struct from lon/lat, nulled when either coordinate is null,
    * NaN, or outside WGS84 bounds (the reference appends
    * `Point(nan, nan)` for ArcGIS "NaN" markers — arcgis_class.py:535 —
    * which pandas drops on any coordinate math; a null struct is the
    * Spark-native equivalent that aggregates and filters correctly). */
  def point(lon: Column, lat: Column): Column = {
    val lo = lon.cast("double")
    val la = lat.cast("double")
    when(lo.isNotNull && la.isNotNull && !isnan(lo) && !isnan(la) &&
        la >= -90d && la <= 90d && lo >= -180d && lo <= 180d,
      struct(lo.as("lon"), la.as("lat")))
  }

  /** Attach a `geometry` point column built from existing lat/lon
    * columns — the loader-side plumbing of arcgis_class.py:540. */
  def withPoint(df: DataFrame, latCol: String, lonCol: String,
                outCol: String = "geometry"): DataFrame =
    df.withColumn(outCol, point(col(lonCol), col(latCol)))

  /** Name-based lat/lon column detection (the reference identifies
    * special columns by name pattern throughout preproc.py; geo columns
    * arrive named latitude/longitude or x/y from the portals). Returns
    * (latCol, lonCol): exact canonical names win over suffix matches so
    * `lat_err` never shadows `latitude`. */
  def findLatLonColumns(df: DataFrame): Option[(String, String)] = {
    def norm(s: String) = s.toLowerCase.replaceAll("[^a-z]", "")
    val cols = df.columns
    def pick(exact: Seq[String], loose: Seq[String]): Option[String] =
      cols.find(c => exact.contains(norm(c)))
        .orElse(cols.find(c => loose.exists(norm(c).endsWith)))
    for {
      lat <- pick(Seq("latitude", "lat", "pointy", "y"), Seq("latitude"))
      lon <- pick(Seq("longitude", "long", "lon", "lng", "pointx", "x"),
        Seq("longitude"))
    } yield (lat, lon)
  }

  /** WKT rendering (`POINT (lon lat)`), fixed decimals so the string is
    * deterministic across engines; null point → null. */
  def toWkt(p: Column, decimals: Int = 6): Column =
    when(p.isNotNull,
      format_string(s"POINT (%.${decimals}f %.${decimals}f)",
        p.getField("lon"), p.getField("lat")))

  /** Parse `POINT (x y)` back to the point struct (geofeather reload
    * path). Non-point / malformed text → null. */
  def parseWkt(s: Column): Column = {
    // STRICT numeric grammar: the lenient [-0-9.eE+]+ class matched
    // garbage like "1.2.3", which then cast to a null FIELD inside a
    // non-null struct (breaking every isNotNull validity check) — or
    // threw an opaque cast error under ANSI mode. A non-matching line
    // yields the documented null struct instead.
    val num = "([-+]?[0-9]+(?:\\.[0-9]+)?(?:[eE][-+]?[0-9]+)?)"
    val re = s"^POINT \\($num $num\\)$$"
    val lon = regexp_extract(s, re, 1)
    val lat = regexp_extract(s, re, 2)
    when(lon =!= "" && lat =!= "",
      struct(lon.cast("double").as("lon"), lat.cast("double").as("lat")))
  }

  /** Bounding-box predicate: point inside [minLon,maxLon]×[minLat,
    * maxLat] (inclusive). Null point → false. Compiles to four range
    * compares on struct fields — parquet-pushable. */
  def bboxContains(p: Column, minLon: Double, minLat: Double,
                   maxLon: Double, maxLat: Double): Column =
    p.isNotNull &&
      p.getField("lon") >= minLon && p.getField("lon") <= maxLon &&
      p.getField("lat") >= minLat && p.getField("lat") <= maxLat

  /** Radius (distance) join: every (point, center) pair within
    * `radiusKm` great-circle km — the "incidents near a station"
    * shape — WITHOUT a cross join. Grid-cell blocking: both sides land
    * on a fixed lat/lon grid whose cell side is the radius expressed in
    * latitude degrees (conservatively 110.574 km/deg, the minimum), the
    * CENTER side is replicated to its ±1 latitude cells and to however
    * many longitude cells the radius spans at its latitude (longitude
    * degrees shrink by cos φ — the replication count is computed per
    * center with a 2-cell latitude margin), and the pair join is a pure
    * equi-join on (cellX, cellY) followed by the exact haversine
    * filter. Blocking guarantees: a qualifying pair differs by ≤ 1
    * lat cell and ≤ the replicated lon span, so recall is exact; each
    * replica owns a distinct cell, so no pair is emitted twice.
    *
    * Antimeridian: centers within reach of ±180° get a ±360°-shifted
    * BLOCKING copy (the haversine itself is periodic in Δλ, so the
    * exact filter needs no correction). Latitudes beyond `maxAbsLat`
    * fail loud — polar caps need polar blocking, and silently missing
    * pairs there would be worse.
    *
    * Scale shape: centers replicate ×(3·lonSpan) — a dim-sized cost —
    * while the point side shuffles once on its cell key; AQE broadcasts
    * the replicated center table while it fits. Returns all point and
    * center columns (geometry columns under `pointGeom`/`centerGeom`)
    * plus `km`. */
  def radiusJoin(points: DataFrame, centers: DataFrame, radiusKm: Double,
                 pointGeom: String = "geometry",
                 centerGeom: String = "center_geometry",
                 maxAbsLat: Double = 80.0): DataFrame = {
    require(radiusKm > 0 && radiusKm <= 5000,
      s"radiusJoin: radiusKm must be in (0, 5000], got $radiusKm")
    require(maxAbsLat > 0 && maxAbsLat <= 85,
      s"radiusJoin: maxAbsLat must be in (0, 85], got $maxAbsLat")
    val kmPerDeg = 110.574 // minimum km per degree of latitude — conservative
    val cellDeg = radiusKm / kmPerDeg
    // The guard is a standalone FILTER predicate, deliberately NOT a
    // wrapper around the geometry column: a when/raise_error wrapper
    // would be inlined by CollapseProject into every downstream
    // getField (cell floors, the haversine's six field reads) and
    // block SimplifyExtractValueOps — measured as a 30x per-row
    // slowdown of the probe stage at sf1. As a filter it is evaluated
    // once per row and the geometry references stay simplifiable.
    def latGuard(geom: Column, side: String): Column =
      when(geom.isNull || (abs(geom.getField("lat")) <= maxAbsLat &&
          abs(geom.getField("lon")) <= 180.0), lit(true))
        .otherwise(raise_error(
          when(abs(geom.getField("lat")) > maxAbsLat, lit(
            s"radiusJoin: $side latitude beyond ±$maxAbsLat deg — grid " +
              "blocking does not cover the polar caps"))
            .otherwise(lit(
              s"radiusJoin: $side longitude beyond ±180 deg — normalize " +
                "to WGS84 first (out-of-range lon would silently miss " +
                "every pair)"))))
    // reserved working/output names must not collide with user columns
    // (withColumn would silently REPLACE them; __cx would then be
    // dropped from the user's data at the end)
    val norm: String => String =
      if (points.sparkSession.sessionState.conf.caseSensitiveAnalysis) identity
      else _.toLowerCase(java.util.Locale.ROOT)
    val reserved = Seq("__cx", "__cy", "__nx", "__reach", "__dy", "km").map(norm)
    val clash = (points.columns ++ centers.columns).map(norm).intersect(reserved)
    require(clash.isEmpty,
      s"radiusJoin: columns ${clash.mkString(", ")} collide with the " +
        "operator's working/output columns")
    val p = points
      .filter(latGuard(col(pointGeom), "point"))
      .filter(col(pointGeom).isNotNull)
      .withColumn("__cx", floor(col(pointGeom).getField("lon") / cellDeg).cast("long"))
      .withColumn("__cy", floor(col(pointGeom).getField("lat") / cellDeg).cast("long"))
    val c0 = centers
      .filter(latGuard(col(centerGeom), "center"))
      .filter(col(centerGeom).isNotNull)
    // Longitude reach of the radius at this center's worst-case
    // latitude (own cell ± a 2-cell margin, capped at maxAbsLat which
    // also bounds every point's latitude). EXACT haversine inversion —
    // delta-lon for a distance r at fixed latitude phi is
    // 2·asin(sin(r/2R)/cos φ), NOT the flat-earth r/(kmPerDeg·cos φ),
    // whose error exceeds the conservative-kmPerDeg margin at high
    // latitude (a 600 km pair at lat 85 spans 65.3°, the flat bound
    // said 62.3° — silently dropped). An asin argument ≥ 1 means the
    // radius wraps every longitude at that latitude.
    val sinHalf = math.sin(radiusKm / (2.0 * MeanRadiusKm))
    val asinArg = lit(sinHalf) / cos(radians(least(lit(maxAbsLat),
      abs(col(centerGeom).getField("lat")) + lit(cellDeg * 2))))
    val lonReachDeg = when(asinArg >= 1.0, lit(180.0))
      .otherwise(lit(2.0) * asin(asinArg) * lit(180.0 / math.Pi))
    val withReach = c0
      .withColumn("__reach", lonReachDeg)
      .withColumn("__nx", greatest(ceil(col("__reach") / lit(cellDeg)).cast("long"), lit(1L)))
    // Replica cell list built as ONE array column and exploded once —
    // the earlier filter/union form scanned the centers subtree four
    // times (full + partial base + two seam copies), which recomputes
    // any expensive upstream and can drop/duplicate rows if that
    // upstream is non-deterministic.
    //
    // FULL-CIRCLE rows: when the replica span would wrap the globe
    // (2·nx ≥ the lon cell count), base-and-seam ranges overlap and a
    // pair would join twice — replicate instead to every lon cell of
    // [-180°, 180°] exactly once and skip the seam copies entirely.
    //
    // PARTIAL rows: base longitude plus ±360° copies when the reach
    // crosses the antimeridian. 2·nx < floor(360°/cellDeg) there, so a
    // shifted copy's cell range can never intersect the base range —
    // a pair meets exactly once.
    val lonCellsFloor = math.max(math.floor(360.0 / cellDeg).toLong, 1L)
    val loCell = math.floor(-180.0 / cellDeg).toLong
    val hiCell = math.floor(180.0 / cellDeg).toLong
    val isFull = col("__nx") * 2 >= lit(lonCellsFloor)
    val blon = col(centerGeom).getField("lon")
    def cellsAround(b: Column) = sequence(
      floor(b / cellDeg).cast("long") - col("__nx"),
      floor(b / cellDeg).cast("long") + col("__nx"))
    val noCells = array().cast("array<long>")
    val allCells = when(isFull, sequence(lit(loCell), lit(hiCell)))
      .otherwise(concat(
        cellsAround(blon),
        when(blon > lit(180.0) - col("__reach") - lit(cellDeg),
          cellsAround(blon - 360.0)).otherwise(noCells),
        when(blon < lit(-180.0) + col("__reach") + lit(cellDeg),
          cellsAround(blon + 360.0)).otherwise(noCells)))
    val cRep = withReach
      .withColumn("__cx", explode(allCells))
      .withColumn("__dy", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("__cy",
        floor(col(centerGeom).getField("lat") / cellDeg).cast("long") + col("__dy"))
      .drop("__reach", "__nx", "__dy")
    p.join(cRep, Seq("__cx", "__cy"))
      // compute the haversine ONCE per joined row: filtering on the
      // raw expression and re-projecting it evaluates the 6-field trig
      // tree twice on the probe-stage hot path
      .withColumn("km", haversineKm(col(pointGeom), col(centerGeom)))
      .filter(col("km") <= lit(radiusKm))
      .drop("__cx", "__cy")
  }

  /** Great-circle distance in km (haversine, WGS84 mean radius). The
    * double arithmetic is the same IEEE sequence in any engine that
    * evaluates this formula, so an oracle reproduces it bit-for-bit. */
  def haversineKm(a: Column, b: Column): Column = {
    def rad(c: Column) = c * lit(math.Pi / 180.0)
    val dLat = rad(b.getField("lat") - a.getField("lat"))
    val dLon = rad(b.getField("lon") - a.getField("lon"))
    // squares via multiplication, not pow(x, 2): * is IEEE-exact in
    // every engine while pow implementations may differ by an ulp
    val sLat = sin(dLat / 2)
    val sLon = sin(dLon / 2)
    val h = sLat * sLat +
      cos(rad(a.getField("lat"))) * cos(rad(b.getField("lat"))) *
        (sLon * sLon)
    lit(2.0 * MeanRadiusKm) * asin(sqrt(h))
  }
}
