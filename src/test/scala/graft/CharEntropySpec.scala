package graft

import org.apache.spark.sql.functions._

import graft.queries.TextAnalysis

/** Character-entropy gate: plain-Scala re-derivation on the live fixture
  * (independent of both engines' SQL), the mathematical bounds the score
  * must respect, and planted low/high-entropy gibberish detection. */
class CharEntropySpec extends SparkSpec {

  private def entropy(norm: String): Double = {
    val counts = norm.groupBy(identity).map(_._2.length.toDouble)
    val n = norm.length.toDouble
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    log2(n) - counts.map(c => c * log2(c)).sum / n
  }

  test("operator equals plain-Scala entropy on the live fixture") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.replaceAll("\\s+", " "))
      .toMap
    val got = TextAnalysis.charEntropy(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === docs.keySet)
    got.foreach { case (id, (n, d, e)) =>
      val norm = docs(id)
      assert(n === norm.length.toLong, s"doc $id n_chars")
      assert(d === norm.distinct.length.toLong, s"doc $id distinct")
      assert(math.abs(e - entropy(norm)) < 1e-6, s"doc $id entropy $e vs ${entropy(norm)}")
      // bounds: 0 <= H <= log2(distinct alphabet)
      assert(e >= -1e-9 && e <= math.log(d.toDouble) / math.log(2.0) + 1e-9)
    }
  }

  test("planted repeated-char and random-junk docs trip the gate; prose does not") {
    import spark.implicits._
    val junk = new scala.util.Random(42)
    val randomSoup = (1 to 400).map(_ => (33 + junk.nextInt(94)).toChar).mkString
    val tmp = java.nio.file.Files.createTempDirectory("entropy_docs").toString
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps on running through the field", "en", "s", 0L),
      (2L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaab", "en", "s", 0L),
      (3L, randomSoup, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.charEntropy(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(!got(1L)._2, s"prose flagged gibberish: ${got(1L)}")
    assert(got(2L)._2 && got(2L)._1 < 2.5, s"repeated-char junk not flagged low: ${got(2L)}")
    assert(got(3L)._2 && got(3L)._1 > 5.3, s"random soup not flagged high: ${got(3L)}")
  }
}
