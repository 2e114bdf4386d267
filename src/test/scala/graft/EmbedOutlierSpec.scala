package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.VectorSearch

/** Behavioral gate for [[VectorSearch.embedOutliers]]: the oracle proves
  * the z-score arithmetic is what the definition says, but only a
  * planted corpus proves the definition DETECTS — corrupted vectors
  * (noise where an encoder output should be) must be flagged, their
  * clean cluster siblings must not.
  *
  * Geometry: per label, 30 members tight around a unit center
  * (sim-to-centroid ≈ 1) plus ONE corrupted row replaced by an
  * independent unit noise vector (sim ≈ 0 ± 0.13 in 64-dim). With the
  * corrupted row included in its own label's centroid and moments
  * (1/31 weight), the clean mean ≈ 0.97, std ≈ 0.17, so the corrupted
  * z ≈ −5.5 and clean z ≈ +0.2 — the ±2 gate separates them by >3σ,
  * and the fixed seed makes the margin a constant, not a flake. */
class EmbedOutlierSpec extends SparkSpec {

  private val Dim = 64
  private val Labels = 4
  private val PerLabel = 30

  test("planted corrupted vectors are flagged; clean cluster members are not") {
    val rnd = new scala.util.Random(7)
    def gaussian(n: Int): Array[Double] = Array.fill(n)(rnd.nextGaussian())
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(Labels)(unit(gaussian(Dim)))
    val eps = 0.02
    val clean = Seq.tabulate(Labels * PerLabel) { i =>
      val c = i % Labels
      val v = unit(centers(c).zip(gaussian(Dim)).map { case (a, b) => a + eps * b })
      (i.toLong, v, c)
    }
    // one corrupted row per label: pure noise, unrelated to the center
    val corrupted = Seq.tabulate(Labels) { c =>
      ((1000 + c).toLong, unit(gaussian(Dim)), c)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((clean ++ corrupted).map { case (id, v, c) =>
        Row(id, v.map(_.toFloat).toSeq, c)
      }, 2), schema)
    val dir = Fixtures.scratchDir("embed_outlier")
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = VectorSearch.embedOutliers(spark, dir).collect()
    val flagged = out.filter(_.getAs[Boolean]("is_outlier"))
      .map(_.getAs[Long]("vec_id")).toSet
    assert(flagged === corrupted.map(_._1).toSet,
      s"expected exactly the planted corruptions flagged, got $flagged")
    // and the margin is wide, not marginal: corrupted z < -3, clean z > -1
    val zById = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("z")).toMap
    corrupted.foreach { case (id, _, _) =>
      assert(zById(id) < -3.0, s"corrupted $id z=${zById(id)} not clearly separated") }
    clean.foreach { case (id, _, _) =>
      assert(zById(id) > -1.0, s"clean $id z=${zById(id)} suspiciously low") }
  }
}
