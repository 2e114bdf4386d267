package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.Relational

/** Detection gate for the join-key skew profiler: the TPC-H-ish fixture
  * keys are near-uniform by construction, so the oracle there pins only
  * the mechanism — this spec plants a 60%-hot-key corpus and checks the
  * profiler actually SEES the skew and suggests a salt factor that would
  * spread the hot key over ~share×32 tasks. */
class SkewProfileSpec extends SparkSpec {

  private lazy val plantedDir: String = {
    // 60 docs from "hot", 5 each from cold0..cold7: 100 rows, 9 keys
    val docs = (0 until 60).map(i => (i.toLong, "hot")) ++
      (0 until 40).map(i => ((60 + i).toLong, s"cold${i % 8}"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (id, src) =>
        Row(id, s"doc $id", "en", src, 6L)
      }, 2), schema)
    val dir = Fixtures.scratchDir("skew_profile")
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted 60% hot key: detected at rank 1 with share, ratio, salt") {
    val rows = Relational.skewProfile(spark, plantedDir).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(rows.length === 9, "9 keys, all within topK=10")
    assert(rows.map(_.getAs[Long]("rank")).toSeq === (1L to 9L))
    val hot = rows.head
    assert(hot.getAs[String]("key") === "hot")
    assert(hot.getAs[Long]("n_rows") === 60L)
    assert(hot.getAs[Double]("share") === 0.6)
    // 60 rows × 9 keys / 100 total = 5.4× the average key
    assert(hot.getAs[Double]("skew_vs_avg") === 5.4)
    // ceil(0.6 × 32) = 20 tasks for the hot key
    assert(hot.getAs[Long]("suggested_salt") === 20L)
    assert(hot.getAs[Long]("total_rows") === 100L)
    assert(hot.getAs[Long]("n_keys") === 9L)
    // cold keys: 5 rows each, salt collapses to the minimum 1… ceil(5*32/100)=2
    rows.tail.foreach { r =>
      assert(r.getAs[Long]("n_rows") === 5L)
      assert(r.getAs[Long]("suggested_salt") === 2L)
    }
    // shares add to 1 over the full key set
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9)
  }

  test("uniform fixture: no key suggests more than a trivial salt") {
    val rows = Relational.skewProfile(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("skew_vs_avg") < 2.0,
        s"fixture key ${r.getAs[String]("key")} unexpectedly skewed")
      assert(r.getAs[Long]("suggested_salt") <= 2L)
    }
  }
}
