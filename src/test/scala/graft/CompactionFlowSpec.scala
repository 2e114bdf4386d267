package graft

import org.apache.spark.sql.functions._

import graft.operators.Compaction

/** The cadence loop's housekeeping flow: lakes over the file-count
  * threshold compact (content-identical), lakes under it are left
  * alone, missing lakes are skipped — all within one isolated tick. */
class CompactionFlowSpec extends SparkSpec {
  import spark.implicits._

  test("compaction flow rewrites only over-threshold lakes, content-identical") {
    val lakeDir = Fixtures.scratchDir("compact_flow_lake")
    // "cases": fragmented (40 files > threshold 8); "virtests": 2 files
    val frag = (1 to 400).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    LakeCommit.commit(frag.repartition(40), s"$lakeDir/cases")
    val small = (1 to 10).map(i => (i.toLong, s"s$i")).toDF("k", "v")
    LakeCommit.commit(small.repartition(2), s"$lakeDir/virtests")

    assert(Compaction.visibleFileCount(spark, s"$lakeDir/cases").get >= 40L)
    val smallBefore = Compaction.visibleFileCount(spark, s"$lakeDir/virtests").get

    val report = Schedule.runTick(
      Seq(Schedule.compactionFlow(spark, lakeDir, maxFiles = 8)), 0)
    assert(report.outcomes.forall(_._2.isEmpty), report.outcomes.toString)

    // fragmented lake compacted, rows identical
    val after = Compaction.visibleFileCount(spark, s"$lakeDir/cases").get
    assert(after < 8L, s"still $after files")
    val rows = spark.read.parquet(LakeCommit.resolve(spark, s"$lakeDir/cases").get)
    assert(rows.count() === 400L)
    assert(rows.agg(sum($"k")).as[Long].collect().head === (1 to 400).map(_.toLong).sum)
    // under-threshold lake untouched (same version, same file count)
    assert(Compaction.visibleFileCount(spark, s"$lakeDir/virtests").get === smallBefore)
    // absent lakes (news_crawl etc.) were skipped without failing the tick
  }

  test("compacting a partitioned lake preserves its hive layout") {
    val lakeDir = Fixtures.scratchDir("compact_flow_part")
    // the cases-lake shape: partitioned by source, many small files
    val df = (1 to 300).map(i => (i.toLong, s"src${i % 3}", s"v$i"))
      .toDF("k", "source_index", "v")
    LakeCommit.commit(df.repartition(30), s"$lakeDir/cases", Seq("source_index"))
    val before = LakeCommit.resolve(spark, s"$lakeDir/cases").get
    assert(Compaction.inferPartitioning(spark, before) === Seq("source_index"))

    val report = Schedule.runTick(
      Seq(Schedule.compactionFlow(spark, lakeDir, maxFiles = 8)), 0)
    assert(report.outcomes.forall(_._2.isEmpty), report.outcomes.toString)

    val after = LakeCommit.resolve(spark, s"$lakeDir/cases").get
    assert(after !== before, "compaction did not commit a new version")
    // layout preserved: still hive-partitioned on source_index...
    assert(Compaction.inferPartitioning(spark, after) === Seq("source_index"))
    // ...fewer files, identical content including the partition column
    assert(Compaction.visibleFileCount(spark, s"$lakeDir/cases").get < 30L)
    val rows = spark.read.parquet(after)
    assert(rows.count() === 300L)
    assert(rows.groupBy("source_index").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("src0" -> 100L, "src1" -> 100L, "src2" -> 100L))
  }
}
