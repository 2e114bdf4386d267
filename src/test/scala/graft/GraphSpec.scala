package graft

import graft.queries.Graph

/** PageRank gate: plain-Scala integer power iteration re-derived from
  * the raw fixture (independent of both engines' SQL), plus planted
  * star/pair/isolate topology laws on a synthetic lineitem. */
class GraphSpec extends SparkSpec {

  private val Scale = 1000000000000L

  /** Reference implementation: same integer arithmetic, naive loops. */
  private def refPagerank(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val byOrder = pairs.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val edges = byOrder.values
      .flatMap(s => for (a <- s; b <- s if a != b) yield (a, b)).toSet
    val nodes = pairs.map(_._2).distinct.sorted
    val n = nodes.length.toLong
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val base = (15L * (Scale / n)) / 100L
    var r = nodes.map(_ -> Scale / n).toMap
    (1 to 5).foreach { _ =>
      val inc = edges.toSeq
        .map { case (src, dst) => dst -> r(src) / outdeg(src) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      r = nodes.map(v => v -> (base + (85L * inc.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  test("operator equals plain-Scala integer power iteration on the fixture") {
    val pairs = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSeq
    val expected = refPagerank(pairs)
    val got = Graph.pagerank(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("planted topology: hub outranks leaves, symmetric leaves tie, isolate keeps base mass") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pr_li").toString
    // orders 1..5 pair hub 1 with leaves 2..6; order 6 pairs 7 with 8;
    // order 7 holds 9 alone (a node with no edges at all).
    val rows = (1L to 5L).flatMap(o => Seq((o, 1L), (o, o + 1L))) ++
      Seq((6L, 7L), (6L, 8L), (7L, 9L))
    rows.toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = Graph.pagerank(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val pr = got.map(t => t._1 -> t._2).toMap
    val n = 9L
    val base = (15L * (Scale / n)) / 100L
    assert(got.find(_._3 == 1L).map(_._1) === Some(1L), s"hub not rank 1: $got")
    val leaves = (2L to 6L).map(pr)
    assert(leaves.distinct.size === 1, s"symmetric leaves differ: $leaves")
    assert(pr(1L) > leaves.head, "hub must outrank leaves")
    assert(pr(9L) === base, s"isolate must keep exactly the damped base, got ${pr(9L)}")
    assert(pr(7L) === pr(8L), "symmetric pair must tie")
    // integer division only ever leaks mass — never creates it
    assert(got.map(_._2).sum <= Scale)
    // equality with the reference implementation on the planted graph too
    assert(pr === refPagerank(rows))
  }
}
