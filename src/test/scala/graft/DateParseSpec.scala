package graft

import org.apache.spark.sql.functions._
import graft.ingest.DateParse

/** Table-driven P4 date-parse cases (SURVEY §5.2 item 1; semantics from
  * parse_insert.py:54-75). */
class DateParseSpec extends SparkSpec {

  private def parse(raw: String): (String, String) = {
    import spark.implicits._
    val row = Seq(raw).toDF("d")
      .select(
        date_format(DateParse.dateStart(col("d")), "yyyy-MM-dd").as("s"),
        date_format(DateParse.dateEnd(col("d")), "yyyy-MM-dd").as("e"))
      .collect()(0)
    (row.getString(0), row.getString(1))
  }

  test("ISO week expands to monday..monday+6 (2021-W07)") {
    assert(parse("2021-W07") === (("2021-02-15", "2021-02-21")))
  }

  test("ISO week 1 anchors on Jan 4 (2021-W01)") {
    assert(parse("2021-W01") === (("2021-01-04", "2021-01-10")))
  }

  test("ISO week 1 can start in the previous year (2020-W01)") {
    // Jan 4 2020 is a Saturday; week 1 monday is 2019-12-30.
    assert(parse("2020-W01") === (("2019-12-30", "2020-01-05")))
  }

  test("single-digit week number (2021-W7)") {
    assert(parse("2021-W7") === (("2021-02-15", "2021-02-21")))
  }

  test("FR date dd-MM-yyyy, slash-normalized") {
    assert(parse("16/02/2021") === (("2021-02-16", "2021-02-16")))
    assert(parse("16-02-2021") === (("2021-02-16", "2021-02-16")))
  }

  test("ISO date yyyy-MM-dd, slash-normalized") {
    assert(parse("2021-02-15") === (("2021-02-15", "2021-02-15")))
    assert(parse("2021/02/15") === (("2021-02-15", "2021-02-15")))
  }

  test("free-form prose date (P3 tail)") {
    assert(parse("March 05, 2021") === (("2021-03-05", "2021-03-05")))
    assert(parse("December 31, 2020") === (("2020-12-31", "2020-12-31")))
  }

  test("unparseable dates yield null") {
    assert(parse("not-a-date") === ((null, null)))
    assert(parse("20210215") === ((null, null)))
  }
}
