package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.VectorSearch

/** ANN quality gate: recall@5 of the bucketed searchers (LSH, IVF)
  * against the exact cosine top-5, on a corpus where ground-truth
  * neighbors EXIST. The engine-agreement oracle proves both searchers
  * return exactly what their bucketed definitions specify — it cannot
  * see a definition change that silently halves recall; this spec can.
  *
  * Why a planted corpus and not the fixture: the synthetic fixture
  * embeddings are i.i.d. noise — near-uniform pairwise cosines, the
  * documented worst case for ANY bucketed ANN (measured recall ~0.0-0.4
  * there). Asserting a floor on noise would gate nothing. The planted
  * corpus is the case ANN methods are FOR: 16 well-separated clusters,
  * tight in-cluster cosines, with the cluster centers at vec_id 0..15 —
  * the exact rows [[VectorSearch.lshBucketTopk]] takes as hyperplanes
  * (0..7) and [[VectorSearch.ivfTopk]] takes as centroids (0..15), so
  * the catalog functions run UNMODIFIED on the planted table.
  *
  * Determinism: fixed-seed generator, so measured recall is a constant
  * of the code, not a distribution — the floor cannot flake. */
class AnnRecallSpec extends SparkSpec {

  private val Dim = 64
  private val Clusters = 16
  private val PerCluster = 30

  /** Planted corpus written as `<dir>/embeddings.parquet`: centers are
    * seeded Gaussian unit vectors; members are `center + eps·noise`
    * (eps small enough that every member's nearest neighbors are its
    * cluster siblings). vec_id 16.. cycle through clusters, so the
    * searchers' fixed query ranges (100..104, 200..204) are ordinary
    * cluster members. */
  private lazy val plantedDir: String = {
    val rnd = new scala.util.Random(42)
    def gaussian(n: Int): Array[Double] = Array.fill(n)(rnd.nextGaussian())
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(Clusters)(unit(gaussian(Dim)))
    // eps bounds the sign-flip probability against the LSH hyperplanes:
    // a member's projection onto plane j is dot(center_c, plane_j) ±
    // eps/8, and the former is ~N(0, 1/64) for random unit centers — at
    // eps=0.002 a flip needs a plane-dot within ~2.5e-4 of zero (~0.2%
    // per plane), so bucket membership is stable without making the
    // clusters degenerate points.
    val eps = 0.002
    val rows = Seq.tabulate(Clusters)(c => (c.toLong, centers(c), c)) ++
      Seq.tabulate(Clusters * PerCluster) { i =>
        val c = i % Clusters
        val noise = gaussian(Dim)
        val v = unit(centers(c).zip(noise).map { case (a, b) => a + eps * b })
        ((16 + i).toLong, v, c)
      }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v, c) =>
        Row(id, v.map(_.toFloat).toSeq, c)
      }, 2), schema)
    val dir = Fixtures.scratchDir("ann_recall")
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }

  private def recallAt(ann: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Map[Long, Double] =
    exact.map { case (q, ex) =>
      q -> ann.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }

  /** The planted corpus under the ScaleSynth 10× embeddings treatment
    * (same construction as tools/ScaleSynth.scala: every vector cloned
    * 10× as EXACT copies with distinct ids, originals preserved) — the
    * adversarial density case for bucketed ANN: every LSH bucket, IVF
    * cell, and PQ code bucket gets 10× density, and distance ties are
    * maximal (a query's 9 exact clones all sit at cosine 1). Recall
    * here gates tie-break determinism under stress, which the 1× spec
    * cannot see. */
  private lazy val planted10xDir: String = {
    import org.apache.spark.sql.functions.{col, explode, expr}
    val src = spark.read.parquet(s"$plantedDir/embeddings.parquet")
    val n = src.count()
    val out = Fixtures.scratchDir("ann_recall_10x")
    src.select(col("*"), explode(expr("sequence(0, 9)")).as("copy"))
      .select((col("vec_id") + col("copy") * n).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(4)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    out
  }

  private def gate10x(mode: String, ids: Seq[Long],
      ann: (Seq[Long], Int) => org.apache.spark.sql.DataFrame): Unit =
    for (k <- Seq(5, 10)) {
      val exact = topSets(VectorSearch.annSearch(spark, planted10xDir, ids, k))
      val got = topSets(ann(ids, k))
      val rec = recallAt(got, exact)
      val mean = rec.values.sum / rec.size
      info(s"10x $mode recall@$k per query: ${rec.toSeq.sortBy(_._1)}; mean $mean")
      assert(rec.size === ids.size)
      assert(mean >= 0.9, s"10x $mode mean recall@$k $mean < 0.9: $rec")
    }

  test("10x cloned corpus: LSH recall@5/@10 hold under maximal density and ties") {
    gate10x("LSH", 100L until 105L,
      (ids, k) => VectorSearch.lshBucketTopk(spark, planted10xDir, ids, k))
  }

  test("10x cloned corpus: IVF recall@5/@10 hold under maximal density and ties") {
    gate10x("IVF", 200L until 205L,
      (ids, k) => VectorSearch.ivfTopk(spark, planted10xDir, ids, k))
  }

  test("10x cloned corpus: PQ recall@5/@10 hold under maximal density and ties") {
    gate10x("PQ", 200L until 205L,
      (ids, k) => VectorSearch.pqTopk(spark, planted10xDir, ids, k))
  }

  test("planted clusters separate: exact top-5 of each query is all in-cluster") {
    val exact = topSets(VectorSearch.annSearch(spark, plantedDir, 100L until 105L, 5))
    exact.foreach { case (q, ns) =>
      assert(ns.size === 5)
      ns.foreach(n => assert(n % 16 === q % 16,
        s"query $q: exact neighbor $n crosses clusters — the plant is broken"))
    }
  }

  test("LSH bucketed search holds recall@5 >= 0.9 on clustered data") {
    val exact = topSets(VectorSearch.annSearch(spark, plantedDir, 100L until 105L, 5))
    val ann = topSets(VectorSearch.lshBucketTopk(spark, plantedDir))
    val rec = recallAt(ann, exact)
    val mean = rec.values.sum / rec.size
    info(s"LSH recall@5 per query: ${rec.toSeq.sortBy(_._1)}; mean $mean")
    assert(rec.size === 5)
    assert(mean >= 0.9, s"mean LSH recall $mean < 0.9: $rec")
  }

  test("PQ encode+ADC+rerank holds recall@5 >= 0.9 on clustered data") {
    // The planted vectors are unit-norm, so cosine and L2 rankings
    // coincide (d2 = 2 - 2cos) and the cosine exact set is the right
    // ground truth for the L2-based PQ searcher.
    val exact = topSets(VectorSearch.annSearch(spark, plantedDir, 200L until 205L, 5))
    val ann = topSets(VectorSearch.pqTopk(spark, plantedDir))
    val rec = recallAt(ann, exact)
    val mean = rec.values.sum / rec.size
    info(s"PQ recall@5 per query: ${rec.toSeq.sortBy(_._1)}; mean $mean")
    assert(rec.size === 5)
    assert(mean >= 0.9, s"mean PQ recall $mean < 0.9: $rec")
  }

  test("IVF-PQ residual-coded search holds recall@5 >= 0.9 on clustered data") {
    // Unit-norm plant: cosine and L2 rankings coincide (see the PQ test),
    // so the cosine exact set is the right ground truth for IVFADC too.
    val exact = topSets(VectorSearch.annSearch(spark, plantedDir, 300L until 305L, 5))
    val ann = topSets(VectorSearch.ivfPqTopk(spark, plantedDir, 300L until 305L, 5))
    val rec = recallAt(ann, exact)
    val mean = rec.values.sum / rec.size
    info(s"IVF-PQ recall@5 per query: ${rec.toSeq.sortBy(_._1)}; mean $mean")
    assert(rec.size === 5)
    assert(mean >= 0.9, s"mean IVF-PQ recall $mean < 0.9: $rec")
  }

  test("10x cloned corpus: IVF-PQ recall@5/@10 hold under maximal density and ties") {
    gate10x("IVFPQ", 300L until 305L,
      (ids, k) => VectorSearch.ivfPqTopk(spark, planted10xDir, ids, k))
  }

  test("centroid classifier reaches accuracy >= 0.95 on planted clusters") {
    // Planted labels ARE the cluster ids, so nearest-centroid should
    // recover them almost perfectly; on the noise fixture the same
    // mechanism is chance-level by construction (oracle covers the
    // mechanism there, this covers the quality).
    val conf = VectorSearch.centroidClassify(spark, plantedDir).collect()
    val total = conf.map(_.getAs[Long]("n")).sum
    val correct = conf.filter(r => r.getAs[Int]("label") == r.getAs[Int]("pred"))
      .map(_.getAs[Long]("n")).sum
    val acc = correct.toDouble / total.toDouble
    info(s"centroid-classifier accuracy on planted clusters: $acc ($correct/$total)")
    assert(total > 0)
    assert(acc >= 0.95, s"accuracy $acc < 0.95; confusion: ${conf.mkString(", ")}")
  }

  test("IVF probed search holds recall@5 >= 0.9 on clustered data") {
    val exact = topSets(VectorSearch.annSearch(spark, plantedDir, 200L until 205L, 5))
    val ann = topSets(VectorSearch.ivfTopk(spark, plantedDir))
    val rec = recallAt(ann, exact)
    val mean = rec.values.sum / rec.size
    info(s"IVF recall@5 per query: ${rec.toSeq.sortBy(_._1)}; mean $mean")
    assert(rec.size === 5)
    assert(mean >= 0.9, s"mean IVF recall $mean < 0.9: $rec")
  }
}
