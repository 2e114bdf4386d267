package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Geo-grid bucketing (A2/U2 proper): geohash cells over a lat/lon
  * domain, aggregated per cell — the Kibana map-tile aggregation
  * (reference: mapping.py:12 geo_point; README.md:22-28 world maps).
  *
  * The Spark side runs the native [[graft.functions.GeohashEncode]]
  * codegen expression; the DuckDB oracle computes the same cells through
  * an INDEPENDENT closed-form bit-quantization formula (quantize lat/lon
  * to 10 bits each, interleave lon-first, base32-map each 5-bit group) —
  * so the expression's interval-halving algorithm is cross-checked
  * against a second implementation, not a mirror of itself.
  *
  * lat/lon are synthesized deterministically from `customer` keys (the
  * testdata has no geo columns); values stay ≥ 1/1280° away from any
  * cell boundary, so double rounding cannot flip a cell.
  */
object Geo {

  /** Geohash length-4 cells: groupBy on a native-codegen expression. */
  def geoCellAgg(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val cust = Tables.load(spark, dir, "customer")
    val lat = (col("c_custkey") * 37 % 1700) / lit(10.0) - 85.0
    val lon = (col("c_custkey") * 73 % 3500) / lit(10.0) - 175.0
    cust
      .withColumn("lat", lat).withColumn("lon", lon)
      .withColumn("cell", call_function("geohash_encode", col("lat"), col("lon"), lit(4)))
      .groupBy(col("cell"))
      .agg(
        count(lit(1)).as("n"),
        min(col("c_custkey")).as("min_key"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
  }

  val geoCellAggSql: String = {
    // Interleave lon-first: bit (19-2k) <- lon bit (9-k), bit (18-2k) <-
    // lat bit (9-k). Written as multiply/add (NOT <</|) because
    // Postgres-style bitwise operators are flat-precedence left-assoc.
    val interleave = (0 until 10).flatMap { k =>
      Seq(
        s"((lonq >> ${9 - k}) & 1) * ${1L << (19 - 2 * k)}",
        s"((latq >> ${9 - k}) & 1) * ${1L << (18 - 2 * k)}")
    }.mkString(" + ")
    val chars = Seq(15, 10, 5, 0).map(s =>
      s"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((g >> $s) & 31 AS INT) + 1, 1)")
      .mkString(" || ")
    s"""WITH pts AS (SELECT c_custkey, c_acctbal,
       |    (c_custkey * 37 % 1700) / 10.0 - 85.0 AS lat,
       |    (c_custkey * 73 % 3500) / 10.0 - 175.0 AS lon
       |  FROM customer),
       |q AS (SELECT *,
       |    CAST(FLOOR((lon + 180) / 360 * 1024) AS BIGINT) AS lonq,
       |    CAST(FLOOR((lat + 90) / 180 * 1024) AS BIGINT) AS latq
       |  FROM pts),
       |code AS (SELECT *, $interleave AS g FROM q),
       |cells AS (SELECT *, $chars AS cell FROM code)
       |SELECT cell, COUNT(*) AS n, MIN(c_custkey) AS min_key,
       |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
       |FROM cells GROUP BY cell""".stripMargin
  }

  /** Haversine radius join — the Kibana live-map-around-a-point shape
    * (README.md:22-28 "France 3-weeks live map": the dashboard slices
    * facts to a geographic neighborhood): for each of 20 query centers,
    * the customers within 800 km, aggregated per center.
    *
    * The naive form is a cross join (centers × points) with a
    * great-circle filter — a nested loop at scale. The scale-safe shape
    * is the 1-D banding member of the bucket-explode family
    * (rel_range_join's trick in geo space): points key on
    * `floor(lat/8°)`; each center explodes to the ≤3 latitude bands
    * that can contain a point within range (800 km = 7.195° of
    * latitude < 7.3 margin < 8° band), the join is a keyed equi-join
    * on the band (centers broadcast — constant-size dim), and the
    * haversine is a residual filter on ~3/22 of the cross product.
    * Complete by construction: |Δlat| ≤ radius bounds the band delta.
    * The DuckDB oracle runs the naive cross join, proving the banded
    * plan equivalent.
    *
    * Cross-engine float care: the formula is mirrored OPERATION-ORDER
    * exact (e.g. `radians(Δ)/2`, never `radians(Δ/2)` — algebraically
    * equal, different rounding), and no transcendental value reaches
    * the output (counts and keys only), so the only divergence surface
    * is a point landing within ~1 ulp of the 800 km cutoff — measured
    * margins are 2.24 km at sf0.01 and 11.6 m at sf0.1, ~10^8 x above
    * any trig-library ulp difference. */
  def geoRadiusJoin(spark: SparkSession, dir: String): DataFrame = {
    val lat = (col("c_custkey") * 37 % 1700) / lit(10.0) - 85.0
    val lon = (col("c_custkey") * 73 % 3500) / lit(10.0) - 175.0
    val pts = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), lat.as("lat"), lon.as("lon"))
      .withColumn("band", floor(col("lat") / 8.0).cast("long"))
    val centers = spark.range(20).select(
      col("id").as("center_id"),
      ((col("id") * 137 % 120) - 60 + 0.5).cast("double").as("clat"),
      ((col("id") * 241 % 340) - 170 + 0.5).cast("double").as("clon"))
    val cb = centers.withColumn("band",
      explode(sequence(
        floor((col("clat") - 7.3) / 8.0).cast("long"),
        floor((col("clat") + 7.3) / 8.0).cast("long"))))
    val dist = lit(2.0) * 6371.0 * asin(sqrt(
      pow(sin(radians(col("clat") - col("lat")) / 2), 2) +
        cos(radians(col("lat"))) * cos(radians(col("clat"))) *
          pow(sin(radians(col("clon") - col("lon")) / 2), 2)))
    pts.join(broadcast(cb), "band")
      .filter(dist <= 800.0)
      .groupBy(col("center_id"))
      .agg(count(lit(1)).as("n"), min(col("c_custkey")).as("min_key"))
  }

  val geoRadiusJoinSql: String =
    """WITH pts AS (SELECT c_custkey,
      |    (c_custkey * 37 % 1700) / 10.0 - 85.0 AS lat,
      |    (c_custkey * 73 % 3500) / 10.0 - 175.0 AS lon
      |  FROM customer),
      |c AS (SELECT i AS center_id,
      |    CAST((i * 137 % 120) - 60 + 0.5 AS DOUBLE) AS clat,
      |    CAST((i * 241 % 340) - 170 + 0.5 AS DOUBLE) AS clon
      |  FROM range(20) t(i)),
      |d AS (SELECT center_id, c_custkey,
      |    2.0 * 6371.0 * asin(sqrt(
      |      power(sin(radians(clat - lat) / 2), 2) +
      |      cos(radians(lat)) * cos(radians(clat)) *
      |      power(sin(radians(clon - lon) / 2), 2))) AS dist
      |  FROM pts CROSS JOIN c)
      |SELECT center_id, COUNT(*) AS n, MIN(c_custkey) AS min_key
      |FROM d WHERE dist <= 800.0 GROUP BY 1""".stripMargin

  /** Convex-polygon vertices for [[geoPolygonFilter]], in integer
    * TENTHS of a degree (x = lon, y = lat), counter-clockwise. Corner
    * cross-products all positive (verified), so the containment test
    * is "left of every edge". */
  val Pentagon: Seq[(Long, Long)] =
    Seq((-300L, -200L), (300L, -250L), (500L, 200L), (0L, 500L), (-450L, 150L))

  /** ES `geo_polygon` query (the geo_shape member of the map-filter
    * family next to the radius join and cell agg): customers inside a
    * fixed convex pentagon, counted per nation. Containment for a
    * CONVEX CCW polygon is "non-negative cross-product against every
    * edge" — five integer multiply-compares over the tenth-of-degree
    * coordinates, all EXACT in long arithmetic (|cross| ≤ ~3.5e6), so
    * no epsilon and no cross-engine float surface at all. Scale:
    * map-only scan work (the five predicates are one codegen
    * conjunction); with a stored geo table the polygon's bounding box
    * is the scan-pushable prefilter — here the coordinates are
    * synthesized from the key, so the conjunction evaluates in the
    * same codegen stage instead. */
  def geoPolygonFilter(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val x = col("c_custkey") * 73 % 3500 - 1750 // lon tenths
    val y = col("c_custkey") * 37 % 1700 - 850  // lat tenths
    val inside = Pentagon.indices.map { i =>
      val (x1, y1) = Pentagon(i)
      val (x2, y2) = Pentagon((i + 1) % Pentagon.size)
      (lit(x2 - x1) * (y - lit(y1)) - lit(y2 - y1) * (x - lit(x1))) >= 0
    }.reduce(_ && _)
    cust.filter(inside)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), min(col("c_custkey")).as("min_key"))
  }

  val geoPolygonFilterSql: String = {
    val conds = Pentagon.indices.map { i =>
      val (x1, y1) = Pentagon(i)
      val (x2, y2) = Pentagon((i + 1) % Pentagon.size)
      s"(${x2 - x1}) * (y - (${y1})) - (${y2 - y1}) * (x - (${x1})) >= 0"
    }.mkString("\n  AND ")
    s"""WITH p AS (SELECT c_custkey, c_nationkey,
       |    c_custkey * 73 % 3500 - 1750 AS x,
       |    c_custkey * 37 % 1700 - 850 AS y
       |  FROM customer)
       |SELECT c_nationkey, COUNT(*) AS n, MIN(c_custkey) AS min_key
       |FROM p
       |WHERE $conds
       |GROUP BY 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo_cell_agg" -> (geoCellAgg _),
    "geo_radius_join" -> (geoRadiusJoin _),
    "geo_polygon_filter" -> (geoPolygonFilter _))

  val oracles: Map[String, String] = Map(
    "geo_cell_agg" -> geoCellAggSql,
    "geo_radius_join" -> geoRadiusJoinSql,
    "geo_polygon_filter" -> geoPolygonFilterSql)
}
