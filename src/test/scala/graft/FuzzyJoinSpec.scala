package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Relational

/** Exactness gate for [[Relational.fuzzyJoin]]'s deletion-neighborhood
  * rewrite on a HOSTILE name set: transpositions ("ab"/"ba" — edit
  * distance 2, but naive untagged deletion-key joins match them),
  * repeated characters, unicode, and prefix/suffix inserts. The DuckDB
  * oracle proves equivalence on the fixture names; this proves it on
  * the name shapes engineered to break the rewrite. */
class FuzzyJoinSpec extends SparkSpec {

  test("keyed rewrite equals brute-force levenshtein<=1 on adversarial names") {
    // key 1 and 41 are the probe slice (custkey % 40 == 1)
    val names = Seq(
      1L -> "ab", 41L -> "café", 2L -> "ba", 3L -> "abc", 4L -> "aab",
      5L -> "aba", 6L -> "abcd", 7L -> "xab", 8L -> "b", 9L -> "a",
      10L -> "cafe", 11L -> "caffé", 12L -> "ab ", 13L -> "AB")
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType)))
    val dir = Fixtures.scratchDir("fuzzy_join")
    spark.createDataFrame(
        spark.sparkContext.parallelize(names.map { case (k, n) => Row(k, n) }, 2),
        schema)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val keyed = Relational.fuzzyJoin(spark, dir)
      .select(col("a_key"), col("b_key")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val brute = (for {
      (ak, an) <- names if ak % 40 == 1
      (bk, bn) <- names if bk != ak
      if levenshteinRef(an, bn) <= 1
    } yield (ak, bk)).toSet

    assert(keyed === brute,
      s"rewrite != brute force: extra=${keyed -- brute} missing=${brute -- keyed}")
    // the trap cases specifically: "ab" (1) vs "ba" (2) is distance 2
    assert(!keyed.contains((1L, 2L)), "transposition matched — untagged-key bug")
    // and genuine hits exist so the equality above is non-vacuous
    assert(keyed.contains((1L, 9L)) && keyed.contains((1L, 3L)) &&
      keyed.contains((41L, 10L)), s"expected hits missing from $keyed")
  }

  /** Reference implementation, independent of both engines. */
  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
