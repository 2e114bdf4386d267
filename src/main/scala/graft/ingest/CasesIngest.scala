package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The EP1 ingestion slice (SURVEY.md §3, §7.2 step 2): multi-dialect CSV →
  * synonym coalesce → multi-format + ISO-week date parse → broadcast geo
  * dim join (alias rewrite, World poisoning) → validity filter → canonical
  * cases schema (§1.3) → partitioned Parquet lake.
  *
  * This is the Spark-first re-expression of the reference's flow scripts:
  *  - S4 dialect sniff  = insert_owid.py:162-178 / parse_insert.py:155-190
  *  - P2 synonym lists  = insert_owid.py:35-44 / parse_insert.py:29-34
  *  - P4 date parse     = parse_insert.py:54-75 (ISO week end = start+6d)
  *  - P5/J1/J3 geo join = insert_owid.py:72-101,255-277 (EL alias at :46,
  *                        World poisoned at :48); dim melt of the 3 name
  *                        key columns with first-wins dedup
  *  - P7 cast default   = insert_owid.py:137-141
  *  - P8 ratio guard    = parse_insert.py:121-123 (null, not 0, on pop=0)
  *  - P9 conditional    = parse_insert.py:135 (value lands in `vaccinated`
  *                        for vaccination sources, else `confirmed`)
  *  - P13 provenance    = insert_owid.py:142 (input_file_name)
  *  - F1 validity       = insert_owid.py:131 (drop missing date/location)
  *  - K2 sink           = insert_owid.py:231-252 delete+recreate, made
  *                        atomic here via partitioned overwrite
  *
  * Scale: the whole pipeline is scan → narrow projections → ONE broadcast
  * hash join (the dim is ~4k rows in the reference) → partitioned write.
  * No shuffle except the write's partitioning; at 100 TB the CSV scan
  * parallelizes per-file/per-split and the dim stays broadcast.
  */
object CasesIngest {

  val FixtureDir = "/root/repo/fixtures"
  val CasesPaths: Seq[String] =
    Seq(s"$FixtureDir/contamination_a.csv", s"$FixtureDir/vaccination_b.csv")
  val LookupPath = s"$FixtureDir/geo_lookup.csv"

  /** S4: sniff the delimiter from the first 10 kB (driver-side, like the
    * reference's clevercsv sniff window) — Spark's CSV reader then gets an
    * explicit dialect. */
  def sniffDelimiter(path: String): String = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val head = new String(bytes, 0, math.min(bytes.length, 10240), "UTF-8")
    val line = head.takeWhile(_ != '\n')
    Seq(",", ";", "\t", "|").maxBy(d => line.count(_ == d.head))
  }

  private def nullifEmpty(c: Column): Column =
    when(trim(c) === "", lit(null)).otherwise(trim(c))

  /** S6: lookup CSV → melt the 3 alternative name-key columns → keep rows
    * with resolvable geo → first-wins (min UID) per name → broadcastable
    * dim (name, uid, iso2, lat, lon). */
  def geoDim(spark: SparkSession, lookupPath: String = LookupPath): DataFrame = {
    val lk = spark.read.option("header", "true").csv(lookupPath)
    val arms = Seq("Province_State", "Country_Region", "Combined_Key").map { k =>
      lk.select(
        nullifEmpty(col(k)).as("name"),
        expr("try_cast(UID AS BIGINT)").as("uid"),
        col("iso2"),
        expr("try_cast(Lat AS DOUBLE)").as("lat"),
        expr("try_cast(Long_ AS DOUBLE)").as("lon"))
    }
    val melted = arms.reduce(_.unionByName(_))
      .filter(col("name").isNotNull && col("lat").isNotNull && col("lon").isNotNull)
    val w = Window.partitionBy(col("name")).orderBy(col("uid").asc)
    melted.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** S1+S4+P13: read each CSV with its sniffed dialect (all columns as
    * strings), attach file provenance, union by name across dialects. */
  def readRaw(spark: SparkSession, paths: Seq[String] = CasesPaths): DataFrame =
    paths.map { p =>
      spark.read.option("header", "true").option("sep", sniffDelimiter(p)).csv(p)
        .withColumn("filename", regexp_extract(input_file_name(), "([^/]+)$", 1))
    }.reduce(_.unionByName(_, allowMissingColumns = true))

  private val dateSyn = Seq("YearWeekISO", "dateRep", "date")
  private val locSyn = Seq("ReportingCountry", "countriesAndTerritories", "location", "country")
  private val valSyn = Seq("NumberDosesReceived", "cases", "new_cases")
  private val popSyn = Seq("population", "popData2020")

  /** F3: malformed-header rejection (parse_insert.py:168-185 — if any
    * required logical column resolves to NO header synonym, the whole
    * file is rejected before Spark ever scans it). Driver-side: reads
    * only the header line. Returns the rejected files. */
  def rejectMalformed(spark: SparkSession, paths: Seq[String]): (Seq[String], Seq[String]) = {
    val required = Seq(dateSyn, locSyn, valSyn)
    paths.partition { p =>
      val sep = sniffDelimiter(p)
      val header = scala.io.Source.fromFile(p).getLines().nextOption().getOrElse("")
      val cols = header.split(java.util.regex.Pattern.quote(sep)).map(_.trim).toSet
      required.forall(_.exists(cols.contains))
    }
  }

  private def synCoalesce(df: DataFrame, names: Seq[String]): Column = {
    val present = names.filter(df.columns.contains).map(n => nullifEmpty(col(n)))
    if (present.isEmpty) lit(null).cast("string") else coalesce(present: _*)
  }

  /** The full normalize+enrich pipeline producing the canonical cases
    * schema of SURVEY.md §1.3. */
  def canonicalCases(spark: SparkSession): DataFrame = {
    val raw = readRaw(spark)
    val dim = geoDim(spark)

    val norm = raw.select(
      synCoalesce(raw, dateSyn).as("date_raw"),
      synCoalesce(raw, locSyn).as("loc_raw"),
      synCoalesce(raw, valSyn).as("val_raw"),
      synCoalesce(raw, popSyn).as("pop_raw"),
      col("filename"))

    // P4: normalize slashes, then the 3-format cascade; ISO week expands
    // to a [monday, monday+6] validity interval (see [[DateParse]]).
    val dateStart = DateParse.dateStart(col("date_raw"))
    val dateEnd = DateParse.dateEnd(col("date_raw"))

    // J3 alias rewrite + P5 World-poisoning before the probe.
    val loc = when(col("loc_raw") === "World", lit(null))
      .when(col("loc_raw") === "EL", lit("Greece"))
      .otherwise(col("loc_raw"))

    val v = coalesce(expr("try_cast(val_raw AS BIGINT)"), lit(0L)) // P7
    val pop = expr("try_cast(pop_raw AS BIGINT)")
    val isVacc = col("filename").startsWith("vacc")

    val enriched = norm
      .withColumn("date_start", dateStart)
      .withColumn("date_end", dateEnd)
      .withColumn("loc", loc)
      .withColumn("v", v)
      .withColumn("pop", pop)
      .filter(col("date_start").isNotNull) // F1
      .join(broadcast(dim), col("loc") === dim("name")) // J1 (inner: drop unresolved)

    enriched.select(
      col("date_start"), col("date_end"),
      struct(col("lat"), col("lon")).as("location"),
      col("name").as("location_name"),
      when(!isVacc, col("v")).as("confirmed"), // P9
      lit(null).cast("long").as("deaths"),
      lit(null).cast("long").as("recovered"),
      when(isVacc, col("v")).as("vaccinated"),
      lit(null).cast("long").as("tested"),
      col("filename"),
      col("iso2").as("iso_code2"),
      lit(null).cast("string").as("iso_region2"),
      col("pop").as("max_population"),
      when(col("pop").isNotNull && col("pop") =!= 0,
        col("v").cast("double") / col("pop").cast("double") * 100.0).as("percentage"), // P8
      when(isVacc, lit("vaccination")).otherwise(lit("contamination")).as("source_index"))
  }

  /** K2: atomic full-refresh via partitioned overwrite (the swap semantics
    * the reference lacks, README.md:225-227). */
  def writeLake(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("source_index").parquet(path)
}
