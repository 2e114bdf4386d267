package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Hand-computed coverage for the single-scan table profiler — the
  * driver fixture (TPC-H) carries no NULLs, so the null-counting path
  * is proven here on a synthetic orders table. */
class TableProfileSpec extends SparkSpec {

  test("profiler: counts, nulls, exact distincts, typed min/max rendering") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_profile").toString
    Seq(
      (1L, Option(10L), Option(100.5), "1-URGENT", "O", Option(Timestamp.valueOf("1995-01-02 00:00:00"))),
      (2L, Option(10L), Option(99.999), "5-LOW", "F", Option(Timestamp.valueOf("1995-03-04 00:00:00"))),
      (3L, None, None, "5-LOW", "O", None),
      (4L, Option(20L), Option(7.0), "1-URGENT", "F", Option(Timestamp.valueOf("1994-12-31 00:00:00"))))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority",
        "o_orderstatus", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val rows = graft.queries.Relational.tableProfile(spark, dir).collect()
      .map(r => r.getAs[String]("column_name") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"),
          r.getAs[Long]("n_distinct"), r.getAs[String]("min_val"),
          r.getAs[String]("max_val")))).toMap

    assert(rows.keySet === Set("o_orderkey", "o_custkey", "o_totalprice",
      "o_orderpriority", "o_orderstatus", "o_orderdate"))
    assert(rows("o_orderkey") === ((4L, 0L, 4L, "1", "4")))
    // nulls excluded from distinct; counted in n_null
    assert(rows("o_custkey") === ((4L, 1L, 2L, "10", "20")))
    // doubles render through DECIMAL(18,2): 99.999 rounds to "100.00",
    // and min is the TYPED min (7.0), not the lexicographic one
    assert(rows("o_totalprice") === ((4L, 1L, 3L, "7.00", "100.50")))
    assert(rows("o_orderpriority") === ((4L, 0L, 2L, "1-URGENT", "5-LOW")))
    assert(rows("o_orderstatus") === ((4L, 0L, 2L, "F", "O")))
    assert(rows("o_orderdate") ===
      ((4L, 1L, 3L, "1994-12-31 00:00:00", "1995-03-04 00:00:00")))
  }
}
