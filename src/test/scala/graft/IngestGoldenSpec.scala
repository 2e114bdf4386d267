package graft

import org.apache.spark.sql.functions._
import graft.ingest.CasesIngest

/** Golden end-to-end ingestion test (SURVEY §5.2 item 2): the fixture
  * CSVs through the full EP1 chain, asserting the reference-quirk
  * semantics row by row. */
class IngestGoldenSpec extends SparkSpec {

  private lazy val canon = CasesIngest.canonicalCases(spark).cache()

  test("dialect sniffing picks the right delimiter per file") {
    assert(CasesIngest.sniffDelimiter(s"${CasesIngest.FixtureDir}/contamination_a.csv") === ",")
    assert(CasesIngest.sniffDelimiter(s"${CasesIngest.FixtureDir}/vaccination_b.csv") === ";")
  }

  test("S1: ingestion accepts FS URIs and globs, not just bare local paths") {
    // Same source through a file:// URI — sniff (Hadoop FS read), scan,
    // and the full normalize chain must all resolve the URI form.
    val uriSpec = CasesIngest.specs.head.copy(
      paths = CasesIngest.specs.head.paths.map("file://" + _))
    assert(CasesIngest.sniffDelimiter(uriSpec.paths.head) === ",")
    val viaUri = ingest.SourceSpec.ingest(spark, uriSpec, CasesIngest.geoDim(spark))
    assert(viaUri.count() ===
      canon.filter(col("source_index") === "contamination").count())
    // Glob: sniff reads the first match (the reference sniffs one object
    // per bucket listing the same way).
    assert(CasesIngest.sniffDelimiter(s"${CasesIngest.FixtureDir}/contamination_*.csv") === ",")
  }

  test("S1 off file://: the full ingest chain reads an object-store scheme") {
    // The reference's primary source is MinIO buckets; ingestion here is
    // Hadoop-FS-URI-generic, proven by running the SAME golden source
    // through an in-JVM object store (flat keys, synthesized prefixes,
    // no rename — the s3a shape) and matching the file:// result.
    spark.sparkContext.hadoopConfiguration.set(
      "fs.s3mock.impl", classOf[S3MockFileSystem].getName)
    S3MockFileSystem.clear()
    for (path <- CasesIngest.specs.head.paths) {
      val name = path.split('/').last
      S3MockFileSystem.put(s"pandemic/cases/$name",
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    }
    val s3Spec = CasesIngest.specs.head.copy(
      paths = CasesIngest.specs.head.paths.map(p =>
        s"s3mock://pandemic/cases/${p.split('/').last}"))
    // dialect sniff opens the object through the scheme (bounded read)
    assert(CasesIngest.sniffDelimiter(s3Spec.paths.head) === ",")
    // glob listing resolves bucket-prefix wildcards like a bucket scan
    assert(CasesIngest.sniffDelimiter("s3mock://pandemic/cases/contamination_*.csv") === ",")
    val viaS3 = ingest.SourceSpec.ingest(spark, s3Spec, CasesIngest.geoDim(spark))
      .drop("filename") // provenance keeps the (scheme-specific) file name
    val viaFile = ingest.SourceSpec.ingest(spark, CasesIngest.specs.head,
      CasesIngest.geoDim(spark)).drop("filename")
    assert(viaS3.count() === viaFile.count() && viaS3.count() > 0)
    assert(viaS3.exceptAll(viaFile).isEmpty && viaFile.exceptAll(viaS3).isEmpty)
  }

  test("row counts: invalid rows dropped, valid rows survive") {
    // 10 contamination rows: -World -Atlantis -empty-date = 7; 4 vaccination.
    assert(canon.count() === 11)
    assert(canon.filter(col("source_index") === "vaccination").count() === 4)
  }

  test("EL alias resolves to Greece; World is poisoned away") {
    val greece = canon.filter(col("iso_code2") === "GR" &&
      col("source_index") === "contamination").collect()
    assert(greece.length === 1)
    assert(greece(0).getAs[String]("location_name") === "Greece")
    assert(canon.filter(col("location_name") === "World").count() === 0)
  }

  test("P7: empty numeric defaults to 0, not null/drop") {
    val spain = canon.filter(col("iso_code2") === "ES" &&
      col("source_index") === "contamination").collect()
    assert(spain.length === 1 && spain(0).getAs[Long]("confirmed") === 0L)
  }

  test("P8: percentage is null (not 0) when population is 0") {
    val gr = canon.filter(col("iso_code2") === "GR" &&
      col("source_index") === "vaccination").collect()
    assert(gr.length === 1 && gr(0).isNullAt(gr(0).fieldIndex("percentage")))
  }

  test("P9: value lands in vaccinated for vaccination sources only") {
    assert(canon.filter(col("source_index") === "vaccination" &&
      col("confirmed").isNotNull).count() === 0)
    assert(canon.filter(col("source_index") === "contamination" &&
      col("vaccinated").isNotNull).count() === 0)
  }

  test("geo dim melt: Province_State key resolves; first-wins on name clash") {
    val cal = canon.filter(col("location_name") === "California").collect()
    assert(cal.length === 1 && cal(0).getAs[String]("iso_code2") === "US")
    val us = canon.filter(col("location_name") === "United States").collect()
    // first-wins by UID: the country row (UID 840, lat 37.0902), not the
    // state-level row (UID 84006).
    assert(us.length === 1)
    assert(us(0).getAs[org.apache.spark.sql.Row]("location")
      .getAs[Double]("lat") === 37.0902)
  }

  test("F3: files with unresolvable headers are rejected whole") {
    val (ok, bad) = CasesIngest.rejectMalformed(spark,
      CasesIngest.CasesPaths :+ s"${CasesIngest.FixtureDir}/bad_header.csv")
    assert(ok.toSet === CasesIngest.CasesPaths.toSet)
    assert(bad.map(_.split('/').last) === Seq("bad_header.csv"))
  }

  test("K2 lake: partition filter prunes to the vaccination directory only") {
    val lake = java.nio.file.Files.createTempDirectory("graft_prune").toString
    CasesIngest.writeLake(canon, lake)
    val all = LakeCommit.read(spark, lake)
    val pruned = all
      .filter(org.apache.spark.sql.functions.col("source_index") === "vaccination")
    pruned.collect() // run THIS plan (count() would execute a different one)
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
    val prunedFiles = filesRead(pruned)
    all.collect()
    val totalFiles = filesRead(all)
    assert(prunedFiles >= 1 && prunedFiles < totalFiles,
      s"no pruning: read $prunedFiles of $totalFiles files")
  }

  test("P13: provenance filename attached") {
    assert(canon.select(col("filename")).distinct().collect()
      .map(_.getString(0)).toSet ===
      Set("contamination_a.csv", "vaccination_b.csv"))
  }

  test("SCD2 merge: every changed key gets a closed row plus a new open row") {
    val rows = queries.Ingestion.scd2Merge(spark, sf0001).collect()
      .map(r => (r.getInt(0), Option(r.getString(4)))) // (key, valid_to)
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (key, vs) =>
      val (closed, open) = vs.partition(_._2.isDefined)
      assert(open.length === 1, s"key $key must have exactly one open row")
      assert(closed.length === (if (key != 990 && key % 3 == 0) 1 else 0),
        s"key $key closed-row count")
    }
    assert(byKey.contains(990)) // the insert path
  }
}
