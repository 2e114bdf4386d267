package graft

import org.apache.spark.sql.functions._
import graft.queries.LlmDedup

/** Dedup operator laws: idempotence, duplicate detection, LSH recall vs
  * the exact join (SURVEY §5.2 item 4). */
class DedupSpec extends SparkSpec {

  test("exact dedup groups identical normalized texts") {
    import spark.implicits._
    val df = Seq(
      (1L, "The  Quick brown fox"),
      (2L, "the quick BROWN fox "),   // same after normalize
      (3L, "a different document")).toDF("doc_id", "text")
    df.createOrReplaceTempView("documents_tmp")
    val hash = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
    val out = df.select(hash.as("h"), col("doc_id"))
      .groupBy("h").agg(min("doc_id").as("survivor"), count(lit(1)).as("n"))
      .collect()
    assert(out.length === 2)
    val dupGroup = out.find(_.getAs[Long]("n") == 2L).get
    assert(dupGroup.getAs[Long]("survivor") === 1L)
  }

  test("exact dedup is idempotent on the documents table") {
    val once = LlmDedup.exactDedup(spark, sf0001)
    // Re-deduping the survivors changes nothing: every group has size 1.
    val survivors = once.select(col("text_hash"))
    assert(survivors.distinct().count() === survivors.count())
  }

  test("minhash LSH finds every exact-jaccard pair at j>=0.5 (sf0.001)") {
    val lsh = LlmDedup.minhashNearDup(spark, sf0001)
      .select("x_id", "y_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = LlmDedup.shingleJaccard(spark, sf0001)
      .filter(col("jaccard") >= 0.5)
      .select("x_id", "y_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(lsh), s"LSH missed: ${exact.diff(lsh)}")
    assert(lsh.subsetOf(exact), s"LSH false positives: ${lsh.diff(exact)}")
  }

  test("connected components: chain, clique, and pair cluster to the min id") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3: needs several propagation rounds),
    // triangle 10-11-12, isolated pair 20-21
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("x_id", "y_id")
    val got = LlmDedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (10L, 10L, true), (11L, 10L, false), (12L, 10L, false),
      (20L, 20L, true), (21L, 20L, false)))
  }

  test("simhash: identical docs get identical fingerprints") {
    val fp = LlmDedup.simhash(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // fingerprint is a pure function of text: deterministic across runs
    val fp2 = LlmDedup.simhash(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp === fp2)
    assert(fp.values.forall(v => v >= 0 && v < (1L << 16)))
  }
}
