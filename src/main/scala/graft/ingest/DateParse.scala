package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P4 + P3 date parsing (reference: parse_insert.py:54-75; free-form
  * tail = insert_owid.py:62-69's dateparser): slash normalization, then a
  * format cascade —
  *  - `YYYY-Www` ISO week  → [monday, monday+6] validity interval
  *  - `dd-MM-yyyy` (FR)    → single-day interval
  *  - `yyyy-MM-dd` (ISO)   → single-day interval
  *  - `Month dd, yyyy`     → single-day interval (free-form tail; the
  *    reference's dateparser accepts prose dates — we cover the observed
  *    formats with declarative, codegen-friendly patterns)
  * Anything else parses to null (and is dropped by the F1 validity
  * filter downstream).
  *
  * ISO-week monday uses the Jan-4 anchor: Jan 4 is always in week 1, so
  * week1_monday = jan4 - weekday(jan4), and week w starts (w-1)*7 days
  * later. All expressions are Spark built-ins (codegen-friendly; no UDF).
  */
object DateParse {

  def normalize(raw: Column): Column = regexp_replace(raw, "/", "-")

  private def isWeek(d0: Column) = d0.rlike("^\\d{4}-W\\d{1,2}$")
  private def isFr(d0: Column) = d0.rlike("^\\d{2}-\\d{2}-\\d{4}$")
  private def isIso(d0: Column) = d0.rlike("^\\d{4}-\\d{2}-\\d{2}$")
  private def isProse(d0: Column) = d0.rlike("^[A-Z][a-z]+ \\d{2}, \\d{4}$")

  private def weekMonday(d0: Column): Column = {
    val y = substring(d0, 1, 4).cast("int")
    val wk = regexp_extract(d0, "W(\\d+)", 1).cast("int")
    val jan4 = make_date(y, lit(1), lit(4))
    val week1Mon = date_sub(jan4, weekday(jan4)) // weekday: 0 = Monday
    date_add(week1Mon, (wk - 1) * 7)
  }

  /** Start of the validity interval (DateType; null if unparseable). */
  def dateStart(raw: Column): Column = {
    val d0 = normalize(raw)
    when(isWeek(d0), weekMonday(d0))
      .when(isFr(d0), to_date(d0, "dd-MM-yyyy"))
      .when(isIso(d0), to_date(d0, "yyyy-MM-dd"))
      .when(isProse(d0), to_date(d0, "MMMM dd, yyyy"))
  }

  /** End of the validity interval: monday+6 for weeks, = start otherwise. */
  def dateEnd(raw: Column): Column = {
    val d0 = normalize(raw)
    when(isWeek(d0), date_add(weekMonday(d0), 6)).otherwise(dateStart(raw))
  }
}
