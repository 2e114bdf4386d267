package graft

import org.apache.spark.sql.functions._

import graft.queries.EsAggs

/** Semantics + plan invariants for the ES aggregation-parity family
  * (geo_centroid, rel_histogram_dense, rel_composite_after,
  * evt_percentile_ranks). Oracles hash-check values at the gate; these
  * specs pin the properties a hash can't see — empty-bucket fill
  * non-vacuity, keyset-pagination pushdown, bounds envelope laws. */
class EsAggsSpec extends SparkSpec {

  test("geo_centroid: centroid lies inside the bounds envelope, n sums to table size") {
    val out = EsAggs.geoCentroid(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (clat, clon) = (r.getAs[Double]("centroid_lat"), r.getAs[Double]("centroid_lon"))
      assert(clat >= r.getAs[Double]("min_lat") && clat <= r.getAs[Double]("max_lat"))
      assert(clon >= r.getAs[Double]("min_lon") && clon <= r.getAs[Double]("max_lon"))
      assert(math.abs(clat) <= 90 && math.abs(clon) <= 180)
    }
    val total = out.map(_.getAs[Long]("n")).sum
    assert(total == Tables.load(spark, sf0001, "customer").count())
  }

  test("rel_histogram_dense: grid is complete AND the zero-fill is non-vacuous") {
    val out = EsAggs.histogramDense(spark, sf0001).collect()
    val sts = out.map(_.getAs[String]("st")).distinct
    val mons = out.map(_.getAs[String]("mon")).distinct
    // Dense = exactly the cross product of the two key sets.
    assert(out.length == sts.length * mons.length)
    // Status 'P' exists for ~1 of 7 order years, so filled-in zero
    // buckets must exist at every SF — if this fails the histogram
    // degenerated to a plain groupBy.
    val zeros = out.filter(_.getAs[Long]("n") == 0L)
    assert(zeros.nonEmpty, "no empty buckets were filled")
    zeros.foreach(r => assert(r.getAs[Double]("rev") == 0.0))
    // Non-empty cells agree with an independent plain aggregation.
    val plain = Tables.load(spark, sf0001, "orders")
      .groupBy(col("o_orderstatus"), date_format(col("o_orderdate"), "yyyy-MM"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out.foreach { r =>
      val k = (r.getAs[String]("st"), r.getAs[String]("mon"))
      assert(r.getAs[Long]("n") == plain.getOrElse(k, 0L))
    }
  }

  test("rel_histogram_dense: a calendar month with zero orders in EVERY status is still emitted") {
    // TPC-H populates every month, so the catalog fixture can't tell a
    // min..max spine from a distinct-months spine (the r15 advisor
    // finding). A synthetic orders table with a 2-month hole can.
    import spark.implicits._
    val dir = Fixtures.scratchDir("dense_gap")
    Seq(("O", "2024-01-15", 10.0), ("F", "2024-04-02", 20.0))
      .toDF("o_orderstatus", "d", "o_totalprice")
      .select(col("o_orderstatus"), col("d").cast("date").as("o_orderdate"),
        col("o_totalprice"))
      .write.parquet(s"$dir/orders.parquet")
    val out = EsAggs.histogramDense(spark, dir).collect()
    val mons = out.map(_.getAs[String]("mon")).distinct.sorted
    // Feb and Mar have zero orders ACROSS ALL statuses — a
    // distinct-months spine would drop them; ES min_doc_count:0 emits
    // the full continuous range.
    assert(mons === Array("2024-01", "2024-02", "2024-03", "2024-04"))
    assert(out.length === 2 * 4)
    assert(out.count(_.getAs[Long]("n") == 0L) === 6)
  }

  test("rel_composite_after: page picks exactly the first 10 groups past the after-key") {
    val out = EsAggs.compositeAfter(spark, sf0001).collect()
    assert(out.length == 10)
    val keys = out.map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Long]("o_custkey")))
    // Strictly past the after-key, in composite order.
    keys.foreach { case (p, c) =>
      assert(p > "3-MEDIUM" || (p == "3-MEDIUM" && c > 750L))
    }
    assert(keys.sorted.sameElements(keys.sorted.distinct.sorted))
    // The page equals the same slice of the FULL (unpaged) composite agg
    // — i.e. pagination changed cost, not results.
    val full = Tables.load(spark, sf0001, "orders")
      .groupBy(col("o_orderpriority"), col("o_custkey")).count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sorted.dropWhile { case (p, c) => p < "3-MEDIUM" || (p == "3-MEDIUM" && c <= 750L) }
      .take(10)
    assert(keys.sorted.sameElements(full))
  }

  test("rel_composite_after: the keyset predicate reaches the parquet scan") {
    // The composite-agg scale property: page N must filter BELOW the
    // aggregate. A pushed priority bound proves the predicate passed
    // through the groupBy to the scan.
    val df = EsAggs.compositeAfter(spark, sf0001)
    val scans = PlanTestUtil.deepCollect(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val pushed = scans.flatMap(_.metadata.get("PushedFilters"))
    assert(pushed.exists(_.contains("o_orderpriority")),
      s"keyset predicate not pushed: $pushed")
  }

  test("ranged rel_histogram_dense: bounds reach the parquet scan and slice the months") {
    val from = Some(java.time.LocalDate.parse("1995-01-01"))
    val to = Some(java.time.LocalDate.parse("1996-12-31"))
    val df = EsAggs.histogramDense(spark, sf0001, from, to)
    // the Kibana-range predicate must land BELOW the aggregate+spine:
    // pushed o_orderdate bounds on the scan, not a filter on rendered rows
    val scans = PlanTestUtil.deepCollect(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val pushed = scans.flatMap(_.metadata.get("PushedFilters"))
    assert(pushed.exists(p => p.contains("o_orderdate")
        && p.contains("GreaterThanOrEqual") && p.contains("LessThanOrEqual")),
      s"range not pushed to scan: $pushed")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, mon, _) => mon >= "1995-01" && mon <= "1996-12" })
    // in-window cells equal the unranged histogram's same cells — the
    // slice changed cost and extent, never the per-cell numbers
    val full = EsAggs.histogramDense(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    rows.foreach { case (st, mon, n) =>
      assert(full((st, mon)) === n, s"cell ($st,$mon) diverges from unranged") }
  }

  test("evt_percentile_ranks: ranks are monotone in the threshold and bounded") {
    val out = EsAggs.percentileRanks(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (r10, r50, r200) =
        (r.getAs[Double]("rank_10"), r.getAs[Double]("rank_50"), r.getAs[Double]("rank_200"))
      assert(r10 >= 0 && r200 <= 100)
      assert(r10 <= r50 && r50 <= r200)
    }
    // Spot-check one type against a direct filter count.
    val ev = Tables.load(spark, sf0001, "events")
    val t = out.head.getAs[String]("event_type")
    val n = ev.filter(col("event_type") === t).count()
    val c50 = ev.filter(col("event_type") === t && col("value") <= 50.0).count()
    val got = out.find(_.getAs[String]("event_type") == t).get.getAs[Double]("rank_50")
    assert(got == c50.toDouble / n.toDouble * 100.0)
  }
}
