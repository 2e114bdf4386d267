package graft

import org.apache.spark.sql.functions._

import graft.queries.Geo

/** Banded-kNN gate: the latitude-band candidate generation must be
  * COMPLETE (a brute-force cross-join kNN at sf0.001 yields the
  * identical row set — the DuckDB oracle re-proves this per gate run,
  * but here it's pinned engine-side where a band-margin regression
  * would first appear) plus the structural kNN invariants. */
class GeoKnnSpec extends SparkSpec {

  private lazy val rows = Geo.geoKnnJoin(spark, sf0001).collect()

  test("per-customer groups are dense rank prefixes with bounded, ordered distances") {
    val byCust = rows.groupBy(_.getAs[Long]("c_custkey"))
    assert(byCust.nonEmpty)
    byCust.foreach { case (c, rs) =>
      val ranks = rs.map(_.getAs[Long]("knn_rank")).sorted
      assert(ranks.length <= 3, s"customer $c got ${ranks.length} > K neighbors")
      assert(ranks.toSeq === (1L to ranks.length).toSeq,
        s"customer $c ranks not a dense prefix: ${ranks.toSeq}")
      val byRank = rs.sortBy(_.getAs[Long]("knn_rank")).map(_.getAs[Double]("dist_km"))
      assert(byRank.forall(d => d >= 0 && d <= 800.0),
        s"customer $c has a neighbor outside the radius: ${byRank.toSeq}")
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        s"customer $c distances not monotone in rank: ${byRank.toSeq}")
    }
  }

  test("banded candidate generation is complete: brute-force cross join agrees") {
    val lat = (col("c_custkey") * 37 % 1700) / lit(10.0) - 85.0
    val lon = (col("c_custkey") * 73 % 3500) / lit(10.0) - 175.0
    val slat = (col("s_suppkey") * 41 % 1700) / lit(10.0) - 85.0
    val slon = (col("s_suppkey") * 79 % 3500) / lit(10.0) - 175.0
    val cp = Tables.load(spark, sf0001, "customer")
      .select(col("c_custkey"), lat.as("lat"), lon.as("lon"))
    val sp = Tables.load(spark, sf0001, "supplier")
      .select(col("s_suppkey"), slat.as("slat"), slon.as("slon"))
    val dist = lit(2.0) * 6371.0 * asin(sqrt(
      pow(sin(radians(col("slat") - col("lat")) / 2), 2) +
        cos(radians(col("lat"))) * cos(radians(col("slat"))) *
          pow(sin(radians(col("slon") - col("lon")) / 2), 2)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_custkey"))
      .orderBy(col("dist").asc, col("s_suppkey").asc)
    val brute = cp.crossJoin(sp).withColumn("dist", dist)
      .filter(col("dist") <= 800.0)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("c_custkey"), col("rn").cast("long").as("knn_rank"),
        col("s_suppkey"), round(col("dist"), 3).as("dist_km"))
      .collect()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("c_custkey"), r.getAs[Long]("knn_rank"),
        r.getAs[Long]("s_suppkey"), r.getAs[Double]("dist_km"))
    assert(rows.map(key).toSet === brute.map(key).toSet,
      "banded kNN diverged from the brute-force cross join")
  }
}
