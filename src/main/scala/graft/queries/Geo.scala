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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo_cell_agg" -> (geoCellAgg _))

  val oracles: Map[String, String] = Map(
    "geo_cell_agg" -> geoCellAggSql)
}
