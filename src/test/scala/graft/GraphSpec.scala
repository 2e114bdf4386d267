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

  /** Brute-force triangle reference: no orientation, no SQL — count
    * closed node triples directly over the co-supply edge set. */
  private def refTriangles(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val edges = pairs.groupBy(_._1).values
      .flatMap { s =>
        val ss = s.map(_._2).distinct
        for (a <- ss; b <- ss if a < b) yield (a, b)
      }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def adj(a: Long, b: Long) = edges((math.min(a, b), math.max(a, b)))
    val triples = for {
      i <- nodes.indices; j <- i + 1 until nodes.length; k <- j + 1 until nodes.length
      if adj(nodes(i), nodes(j)) && adj(nodes(j), nodes(k)) && adj(nodes(i), nodes(k))
    } yield (nodes(i), nodes(j), nodes(k))
    nodes.map { n =>
      val deg = edges.count(e => e._1 == n || e._2 == n).toLong
      val tri = triples.count(t => t._1 == n || t._2 == n || t._3 == n).toLong
      n -> ((deg, tri))
    }.toMap
  }

  test("triangles equal a brute-force closed-triple count on the fixture") {
    val pairs = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSeq
    val expected = refTriangles(pairs)
    val got = Graph.triangles(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty && got === expected)
    // the fixture's co-supply graph must actually close triangles, or
    // this test is vacuous
    assert(got.values.map(_._2).sum > 0, "fixture has no triangles")
  }

  test("planted topology: clique closes fully, star and path close nothing") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tri_li").toString
    // One 2-supplier order per planted EDGE: K4 on 1..4 (6 edges), star
    // center 10 with leaves 11..14, path 20-21-22.
    val k4 = for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)
    val star = (11L to 14L).map(l => (10L, l))
    val path = Seq((20L, 21L), (21L, 22L))
    val rows = (k4 ++ star ++ path).zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong + 1, a), (i.toLong + 1, b))
    }
    rows.toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = Graph.triangles(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    // K4: every node deg 3, 3 triangles, clustering exactly 1.0
    (1L to 4L).foreach(n => assert(got(n) === ((3L, 3L, Some(1.0))), s"$n: ${got(n)}"))
    // star center: high degree, zero closure — the link-farm signature
    assert(got(10L) === ((4L, 0L, Some(0.0))))
    // star leaves / path ends: deg 1 → clustering undefined (null)
    Seq(11L, 14L, 20L, 22L).foreach(n => assert(got(n) === ((1L, 0L, None))))
    // path middle: deg 2, no closure
    assert(got(21L) === ((2L, 0L, Some(0.0))))
    // brute-force agreement on the planted graph too
    assert(got.map { case (n, (d, t, _)) => n -> ((d, t)) } === refTriangles(rows))
  }

  test("wedge-volume guard refuses blind exact enumeration past the bound") {
    // The K4+star fixture's oriented wedge volume is small but nonzero,
    // so a bound of 1 must trip the guard with the routing message and
    // the default bound must not (the gate SFs run the exact form).
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tri_guard").toString
    val k4 = for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)
    k4.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong + 1, a), (i.toLong + 1, b)) }
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    spark.conf.set(Graph.WedgeGuardConf, "1")
    try {
      val e = intercept[IllegalStateException] {
        Graph.triangles(spark, tmp)
      }
      assert(e.getMessage.contains("rel_triangle_sample"),
        s"guard must route to the DOULION path: ${e.getMessage}")
      assert(e.getMessage.contains(Graph.WedgeGuardConf))
    } finally spark.conf.unset(Graph.WedgeGuardConf)
    // default bound: construction succeeds (and counts, per the tests
    // above, which all run with the guard active)
    Graph.triangles(spark, tmp)
  }

  test("broadcast-adjacency and keyed wedge-join routes agree cell-for-cell") {
    // r18 optimization: below spark.graft.triangle.broadcastEdges the
    // enumeration is a broadcast-adjacency array_intersect; above it,
    // the keyed wedge join. Same fixture, both routes, full-row compare
    // (suppkey, deg, triangles, clustering).
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    val bcast = rows(Graph.triangles(spark, sf0001))
    spark.conf.set(Graph.BcastEdgesConf, "0")
    try {
      val keyed = rows(Graph.triangles(spark, sf0001))
      assert(bcast === keyed)
      assert(bcast.exists(_._3 > 0), "route-compare fixture closed no triangle")
    } finally spark.conf.unset(Graph.BcastEdgesConf)
  }

  test("pagerank broadcast-rank and keyed round routes agree cell-for-cell") {
    // r19 optimization: below spark.graft.pagerank.broadcastNodes each
    // unrolled round broadcasts the rank table and folds map-side over
    // dst-partitioned edges; above it, the keyed round shape (the r17
    // form). Same fixture, both routes, full-row compare.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bcast = rows(Graph.pagerank(spark, sf0001))
    spark.conf.set(Graph.BcastNodesConf, "0")
    try {
      val keyed = rows(Graph.pagerank(spark, sf0001))
      assert(bcast === keyed)
      assert(bcast.nonEmpty, "route-compare fixture ranked no node")
    } finally spark.conf.unset(Graph.BcastNodesConf)
  }

  /** Plain-Scala replica of the DOULION md5 edge coin. */
  private def edgeKept(u: Long, v: Long): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${u}_$v".getBytes("UTF-8"))
    val h = java.lang.Long.parseLong(
      md.take(8).map("%02x".format(_)).mkString.take(15), 16)
    h % 16 == 0
  }

  test("sampled triangles = exact count on the hash-sparsified graph, scaled 4096x") {
    val pairs = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSeq
    // Independent reference: full edge set in plain Scala, coin applied,
    // brute-force closed-triple count on the survivors.
    val fullEdges = pairs.groupBy(_._1).values.flatMap { s =>
      val ss = s.map(_._2).distinct
      for (a <- ss; b <- ss if a < b) yield (a, b)
    }.toSet
    val kept = fullEdges.filter(e => edgeKept(e._1, e._2))
    val nodes = fullEdges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val triples = for {
      i <- nodes.indices; j <- i + 1 until nodes.length; k <- j + 1 until nodes.length
      if kept((nodes(i), nodes(j))) && kept((nodes(j), nodes(k))) &&
        kept((nodes(i), nodes(k)))
    } yield (nodes(i), nodes(j), nodes(k))
    val expected = nodes.map { n =>
      val deg = fullEdges.count(e => e._1 == n || e._2 == n).toLong
      val tri = triples.count(t => t._1 == n || t._2 == n || t._3 == n).toLong
      n -> ((deg, tri, tri * 4096L))
    }.toMap
    val got = Graph.trianglesSampled(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    // the coin must actually drop edges here, or the sampling path is
    // vacuously the exact path
    assert(kept.size < fullEdges.size, "fixture sample dropped no edge")
  }
}
