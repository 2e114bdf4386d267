package graft

import org.apache.spark.sql.functions._

import graft.functions.{BloomBits, BloomProbe}
import graft.queries.Relational

/** Bloom prefilter laws: exhaustive no-false-negative over an inserted
  * key set, bounded false-positive rate, and the operator's end-to-end
  * equality with the un-bloomed join (the fp-removal proof). */
class BloomJoinSpec extends SparkSpec {

  test("probe has no false negatives and a sane fp rate") {
    import spark.implicits._
    val inserted = (0L until 5000L).map(_ * 7919L) // spread keys
    val agg = udaf(BloomBits,
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    val (a, b) = BloomProbe.halves(col("k"))
    val bits = inserted.toDF("k").select(a.as("a"), b.as("b"))
      .agg(agg(col("a"), col("b"))).head()
      .getAs[scala.collection.Seq[Long]](0).toSeq
    // every inserted key probes true — exhaustively
    val fn = inserted.toDF("k")
      .filter(!BloomProbe.might(bits, a, b)).count()
    assert(fn === 0L, s"$fn false negatives — the prefilter would drop real matches")
    // disjoint probe set: fp rate stays well under 1% at this load
    val probes = (0L until 20000L).map(_ * 7919L + 1L)
    val fp = probes.toDF("k")
      .filter(BloomProbe.might(bits, a, b)).count()
    assert(fp < 200L, s"fp rate ${fp / 20000.0} — filter saturated or mis-sized")
  }

  test("operator equals the plain (un-bloomed) join on the fixture") {
    val got = Relational.bloomJoin(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = {
      val o = spark.read.parquet(s"$sf0001/orders.parquet")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
            .cast("double").as("rev"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(got === plain)
    assert(got.nonEmpty)
  }
}
