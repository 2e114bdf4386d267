package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.TrainingMix

/** Behavioral gate for [[TrainingMix.nbQuality]]: the oracle proves the
  * NB arithmetic; this proves the classifier CLASSIFIES when the
  * classes are actually separable (the fixture's noise text can't show
  * that). Planted corpus: curated docs mix class-specific words
  * ("citation", "verified", …) with shared filler; crawl docs mix a
  * disjoint low-quality vocabulary ("clickbait", "spam", …) with the
  * same filler. Seeded generator ⇒ the accuracy is a constant of the
  * code. NB on disjoint class vocabularies separates almost perfectly;
  * the gate is ≥ 0.95 to leave room for filler-only short docs. */
class NbQualitySpec extends SparkSpec {

  test("planted separable classes are recovered by the NB quality score") {
    val rnd = new scala.util.Random(11)
    val hiWords = Vector("citation", "verified", "methodology", "abstract",
      "peer", "reviewed", "institute", "journal")
    val loWords = Vector("clickbait", "spam", "winner", "casino",
      "free", "pills", "lottery", "subscribe")
    val filler = Vector("the", "of", "and", "data", "report", "week")
    def doc(words: Vector[String]): String =
      Seq.fill(30)(if (rnd.nextDouble() < 0.5) words(rnd.nextInt(words.size))
        else filler(rnd.nextInt(filler.size))).mkString(" ")
    val rows = (0 until 200).map { i =>
      val hi = i % 2 == 0
      val text = doc(if (hi) hiWords else loWords)
      Row(i.toLong, text, "en", if (hi) s"src${i % 10}" else s"src${10 + i % 10}",
        text.length.toLong)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val dir = Fixtures.scratchDir("nb_quality")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = TrainingMix.nbQuality(spark, dir).collect()
    assert(out.length === 200)
    val correct = out.count { r =>
      r.getAs[Boolean]("quality_pass") == r.getAs[Boolean]("is_curated_source") }
    assert(correct >= 190, s"NB separated only $correct/200 on disjoint vocabularies")
  }
}
