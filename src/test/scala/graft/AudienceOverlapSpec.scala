package graft

import java.sql.Timestamp

import graft.queries.AudienceOverlap

/** KMV audience-overlap gate: planted partial/disjoint/census audiences
  * (the live fixture's audiences are identical per type, so only the
  * planted matrix exercises a non-trivial intersection), plus an exact
  * plain-Scala KMV re-derivation of the estimate for one pair. */
class AudienceOverlapSpec extends SparkSpec {

  private val K = 256
  private val M = 1152921504606846976L // 2^60

  private def h60(u: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Plain-Scala KMV estimate of a planted user set. */
  private def kmvEst(users: Seq[Long]): Double = {
    val hs = users.map(h60).sorted.take(K)
    if (hs.size < K) hs.size.toDouble
    else {
      val raw = (K - 1).toDouble * M.toDouble / hs.last.toDouble
      math.floor(raw * 1e6 + 0.5) / 1e6 // round(…,6), HALF_UP like both engines
    }
  }

  private lazy val result: Map[(String, String), (Long, Double, Double, Boolean)] = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ao_events").toString
    // A: users 1..1000; B: users 501..1500 (overlap 500); C: 2001..3000
    // (disjoint); D: 1..50 (census mode, fully inside A)
    val rows =
      (1L to 1000L).map(u => (u, "A")) ++
        (501L to 1500L).map(u => (u, "B")) ++
        (2001L to 3000L).map(u => (u, "C")) ++
        (1L to 50L).map(u => (u, "D"))
    rows.zipWithIndex
      .map { case ((u, t), i) =>
        (i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"), u, t, 1.0, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    AudienceOverlap.audienceOverlap(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
  }

  test("exact overlaps are right and every estimate sits within its band") {
    assert(result.keySet === Set(("A", "B"), ("A", "C"), ("A", "D"),
      ("B", "C"), ("B", "D"), ("C", "D")))
    assert(result(("A", "B"))._1 === 500L)
    assert(result(("A", "C"))._1 === 0L)
    assert(result(("A", "D"))._1 === 50L)
    assert(result(("B", "D"))._1 === 0L) // D=1..50, B starts at 501
    result.foreach { case (pair, (_, _, _, within)) =>
      assert(within, s"$pair estimate outside its 3.5-sigma band: ${result(pair)}")
    }
    // disjoint audiences must estimate near zero, not near the union
    val (_, estAC, unionAC, _) = result(("A", "C"))
    assert(estAC < 0.2 * unionAC, s"disjoint pair over-estimated: $estAC vs union $unionAC")
  }

  test("operator estimate equals the plain-Scala KMV re-derivation for A∪B") {
    val a = (1L to 1000L).toSeq
    val b = (501L to 1500L).toSeq
    val estA = kmvEst(a)
    val estB = kmvEst(b)
    val estU = kmvEst((a ++ b).distinct)
    val expected = math.floor(math.max(0.0, estA + estB - estU) * 1e6 + 0.5) / 1e6
    val got = result(("A", "B"))._2
    assert(math.abs(got - expected) < 1e-6, s"got $got expected $expected")
    assert(math.abs(result(("A", "B"))._3 - estU) < 1e-6)
  }

  test("census mode: a type smaller than K is counted exactly, not estimated") {
    // D ⊂ A with |D| = 50 < K: est_D is exact, so the pair estimate
    // inherits only A's and the union's sketch error
    val estA = kmvEst((1L to 1000L).toSeq)
    val estU = kmvEst((1L to 1000L).toSeq) // A ∪ D = A
    val expected = math.floor(math.max(0.0, estA + 50.0 - estU) * 1e6 + 0.5) / 1e6
    assert(math.abs(result(("A", "D"))._2 - expected) < 1e-6)
  }
}
