package graft

import graft.queries.UrlDedup

/** URL canonicalizer gate: a planted-URL matrix pins every rule
  * INDIVIDUALLY (including the ones that must NOT fire), and the group
  * structure on the live fixture proves the synthesis collapses exactly
  * the engineered families. */
class UrlDedupSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    UrlDedup.canonicalize(urls.toDF("url"))
      .collect().map(_.getString(1)).toSeq
  }

  test("planted matrix: each rule fires exactly where it should") {
    // scheme dropped, http ≡ https
    assert(canon("https://a.example/x", "http://a.example/x").distinct.size === 1)
    // host case-folded, PATH case preserved
    assert(canon("HTTPS://A.EXAMPLE/Path") === Seq("a.example/Path"))
    // leading www. stripped; www2. is a real subdomain and survives
    assert(canon("https://www.a.example/x") === Seq("a.example/x"))
    assert(canon("https://www2.a.example/x") === Seq("www2.a.example/x"))
    // default ports stripped, non-default ports preserved
    assert(canon("https://a.example:443/x", "http://a.example:80/x")
      === Seq("a.example/x", "a.example/x"))
    assert(canon("https://a.example:8080/x") === Seq("a.example:8080/x"))
    // fragment dropped, trailing slashes stripped
    assert(canon("https://a.example/x#frag", "https://a.example/x///")
      .distinct === Seq("a.example/x"))
    // tracking params dropped (even when they are the whole query);
    // real params survive SORTED; refx= is not ref= and survives
    assert(canon("https://a.example/x?utm_source=f&utm_medium=m")
      === Seq("a.example/x"))
    assert(canon("https://a.example/x?z=2&a=1&utm_source=f&ref=t")
      === Seq("a.example/x?a=1&z=2"))
    assert(canon("https://a.example/x?refx=1") === Seq("a.example/x?refx=1"))
    // bare host, no path
    assert(canon("https://www.a.example") === Seq("a.example"))
  }

  test("fixture group structure: engineered 4-member families + param-surviving singletons") {
    val rows = UrlDedup.urlDedup(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (quads, singles) = rows.partition(_._2 == 4L)
    assert(rows.forall(r => r._2 == 4L || r._2 == 1L),
      s"unexpected group size: ${rows.filter(r => r._2 != 4L && r._2 != 1L).take(3).toList}")
    assert(quads.nonEmpty && singles.nonEmpty)
    assert(quads.size === singles.size, "one singleton (the ?a=1&z=9 variant) per family")
    // a 4-group's keeper is the family's variant-0 doc; a singleton's is variant 4
    quads.foreach { case (c, _, nRaw, keep) =>
      assert(keep % 5 === 0L, s"quad keeper not variant 0: $keep ($c)")
      assert(nRaw === 4L, s"quad raw variants collapsed too early: $nRaw ($c)")
      assert(!c.contains("?"), s"quad canon kept a query: $c")
    }
    singles.foreach { case (c, _, _, keep) =>
      assert(keep % 5 === 4L, s"singleton not variant 4: $keep ($c)")
      assert(c.endsWith("?a=1&z=9"), s"singleton params not sorted/stripped: $c")
    }
  }
}
