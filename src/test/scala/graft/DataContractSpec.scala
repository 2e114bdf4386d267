package graft

import java.sql.Timestamp

import graft.queries.DataContract

/** Data-quality contract: the clean gate fixture passes every check, and
  * a planted-violation matrix trips exactly the expected checks with
  * exactly the expected metrics (the txt_gopher_rules convention). */
class DataContractSpec extends SparkSpec {

  test("clean fixture: every contract check passes") {
    val rows = DataContract.dataContract(spark, sf0001).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("pass"), s"clean fixture failed: $r")
      assert(r.getAs[Double]("metric") === 1.0)
    }
  }

  test("planted violations: each defect moves exactly its own metric") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dc_fix").toString
    val ts = Timestamp.valueOf("2024-03-01 00:00:00")
    // 10 orders: A null custkey (completeness + RI), B/C duplicate key
    // (uniqueness), D zero price, E bad status, F prehistoric date,
    // G dangling custkey (RI), H-J clean.
    val orders = Seq(
      (1L, Option.empty[Long], "O", 10.0, ts, "1-URGENT"), // A
      (2L, Some(1L), "O", 10.0, ts, "1-URGENT"), // B
      (2L, Some(1L), "O", 10.0, ts, "1-URGENT"), // C (dup key)
      (3L, Some(1L), "O", 0.0, ts, "1-URGENT"), // D
      (4L, Some(2L), "X", 10.0, ts, "1-URGENT"), // E
      (5L, Some(2L), "O", 10.0, Timestamp.valueOf("1970-01-01 00:00:00"), "1-URGENT"), // F
      (6L, Some(999L), "O", 10.0, ts, "1-URGENT"), // G
      (7L, Some(1L), "O", 10.0, ts, "1-URGENT"),
      (8L, Some(2L), "F", 10.0, ts, "1-URGENT"),
      (9L, Some(3L), "P", 10.0, ts, "1-URGENT"))
    orders.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq(1L, 2L, 3L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")

    def f(k: Long) = math.floor(k.toDouble / 10 * 1e6 + 0.5) / 1e6
    val got = DataContract.dataContract(spark, tmp).collect()
      .map(r => r.getAs[String]("check_name") ->
        ((r.getAs[Double]("metric"), r.getAs[Boolean]("pass"), r.getAs[Long]("n"))))
      .toMap
    assert(got.size === 6)
    got.values.foreach { case (_, _, n) => assert(n === 10L) }
    // exact compliant-row counts, no defect double-counted except the
    // null custkey, which legitimately fails completeness AND RI
    assert(got("complete_custkey") === ((f(9), false, 10L)))
    assert(got("unique_orderkey") === ((f(9), false, 10L)))
    assert(got("positive_totalprice") === ((f(9), false, 10L)))
    assert(got("accepted_status") === ((f(9), false, 10L)))
    assert(got("orderdate_in_range") === ((f(9), false, 10L)))
    assert(got("ri_custkey") === ((f(8), false, 10L)))
  }

  test("single-defect batch: only the matching check fails") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dc_one").toString
    val ts = Timestamp.valueOf("2024-03-01 00:00:00")
    val orders = Seq(
      (1L, Some(1L), "O", 10.0, ts, "1-URGENT"),
      (2L, Some(2L), "X", 10.0, ts, "1-URGENT"), // lone bad status
      (3L, Some(3L), "F", 10.0, ts, "1-URGENT"))
    orders.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq(1L, 2L, 3L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val got = DataContract.dataContract(spark, tmp).collect()
      .map(r => r.getAs[String]("check_name") -> r.getAs[Boolean]("pass")).toMap
    assert(got === Map(
      "complete_custkey" -> true, "unique_orderkey" -> true,
      "positive_totalprice" -> true, "accepted_status" -> false,
      "orderdate_in_range" -> true, "ri_custkey" -> true))
  }
}
