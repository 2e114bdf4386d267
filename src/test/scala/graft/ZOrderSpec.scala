package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order clustering: exact interleave on known bit patterns, and the
  * layout effect the operator exists for — files written in Z-order
  * cover narrow rectangles of BOTH dimensions, where a single-dimension
  * sort leaves the other dimension's per-file span at full width. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits exactly (x even positions, y odd)") {
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      (0 until ZOrder.Bits).foreach { i =>
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L),
      (65535L, 0L), (0L, 65535L), (65535L, 65535L), (12345L, 54321L),
      (65536L, 1L)) // x overflows Bits: masked, not wrapped into y's bits
    val got = cases.toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"))).as[Long].collect()
    cases.zip(got).foreach { case ((x, y), z) =>
      assert(z === ref(x & 65535L, y & 65535L), s"($x,$y)")
    }
    // interleave ordering sanity: close (x,y) pairs get close z
    assert(ref(2, 2) < ref(100, 100))
  }

  test("z-order prunes point filters on BOTH dims; date-sort only on date") {
    val orders = Tables.load(spark, sf0001, "orders")
      .select(col("o_custkey"), col("o_orderdate"))
    val y = datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
    val numFiles = 8
    val base = Fixtures.scratchDir("zorder")

    ZOrder.cluster(orders, col("o_custkey"), y, numFiles)
      .write.mode("overwrite").parquet(s"$base/zorder")
    orders.repartitionByRange(numFiles, col("o_orderdate"))
      .sortWithinPartitions(col("o_orderdate"))
      .write.mode("overwrite").parquet(s"$base/datesort")

    // footer-stats pruning model: a point filter v scans exactly the
    // files whose [min, max] contains v. Average that file fraction
    // over every distinct value of the dimension — the expected scan
    // fraction for a random point lookup.
    def scanFractions(path: String): (Double, Double) = {
      val day = datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(
          min(col("o_custkey")).as("cmin"), max(col("o_custkey")).as("cmax"),
          min(day).as("dmin"), max(day).as("dmax"))
        .collect()
      assert(stats.length === numFiles, s"$path wrote ${stats.length} files")
      val custs = orders.select("o_custkey").distinct().as[Long].collect()
      val dates = orders.select(day).distinct().as[Int].collect()
      val cFrac = custs.map(c => stats.count(r =>
        r.getLong(1) <= c && c <= r.getLong(2)).toDouble / numFiles).sum / custs.length
      val dFrac = dates.map(d => stats.count(r =>
        r.getInt(3) <= d && d <= r.getInt(4)).toDouble / numFiles).sum / dates.length
      (cFrac, dFrac)
    }
    val (zc, zd) = scanFractions(s"$base/zorder")
    val (dc, dd) = scanFractions(s"$base/datesort")
    info(f"mean scan fraction (custkey, date): zorder ($zc%.2f, $zd%.2f) " +
      f"vs datesort ($dc%.2f, $dd%.2f)")
    // date-sort cannot prune custkey lookups at all...
    assert(dc > 0.95, s"datesort custkey fraction $dc unexpectedly prunable")
    // ...z-order prunes BOTH: custkey lookups touch ~the matching x-half
    // of the tiles, date lookups ~one y-band (8 files → halves/quarters)
    assert(zc < 0.7, s"z-order custkey scan fraction $zc")
    assert(zd < 0.45, s"z-order date scan fraction $zd")
    // and z-order's date pruning costs something vs a pure date sort —
    // that's the documented trade (dd ≈ 1/numFiles)
    assert(dd < zd)
  }
}
