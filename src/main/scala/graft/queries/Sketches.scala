package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The two remaining production sketch shapes, completing the family
  * (HLL approx-distinct: [[Relational]] rel_approx_distinct; KMV theta
  * intersection: [[AudienceOverlap]]; Bloom membership:
  * [[LlmDedup]] llm_bloom_dedup / [[Relational]] rel_bloom_join):
  *
  *   - '''rel_sketch_rollup''' — the PARTIAL-MERGE rollup: per-day HLL
  *     sketch partials over the fact table, merged upward to monthly
  *     unique-customer estimates WITHOUT rescanning the facts. This is
  *     the pattern behind the reference's Kibana unique-count panels
  *     (ES `cardinality` aggregations over time buckets,
  *     README.md:22-28 — ES stores exactly such per-shard HLL partials
  *     and merges them at query time), and THE way a 100 TB lake
  *     serves "unique users last month" style panels: one pass writes
  *     day-grain sketch blobs (a few KiB each), and every coarser
  *     grain — month, quarter, year, arbitrary date ranges — is a
  *     merge over day-count many blobs, never a second corpus pass.
  *     Built on Spark's native DataSketches HLL aggregates
  *     (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`,
  *     codegen'd, fixed-size mergeable state).
  *
  *   - '''evt_cms_freq''' — Count-Min point-frequency estimation
  *     (Cormode & Muthukrishnan 2005): d=4 pairwise hash rows × w=1024
  *     counters (a 4096-cell grid, constant size at any corpus scale)
  *     answer "how many events did user X generate?" without a
  *     per-user exact aggregation. Unlike the HLL/KMV entries, the
  *     WHOLE sketch is integer arithmetic — carter-wegman row hashes
  *     `((a·(u mod p) + b) mod p) mod w` with p = 2³¹−1 and fixed
  *     (a,b) per row, counter sums, estimate = min over the d rows —
  *     so the oracle replays the sketch itself symbolically and the
  *     estimates hash-compare EXACTLY cross-engine (no band verdict
  *     needed; the one-sided CMS law `est ≥ exact` ships as a checked
  *     column besides).
  *
  * Verification encoding (the rel_approx_distinct convention): both
  * entries also compute the exact side at gate SFs so the sketch's
  * claim is driver-checkable — exact counts hash-compare, the HLL
  * estimate carries a `within_band` verdict at 3.5× the sketch's rsd
  * (lgK=12 → rsd = 1.04/√4096 ≈ 1.63%, band ≈ 5.7%; fixture-validated
  * at the three gate SFs, re-audit on fixture change). A 100 TB caller
  * drops the exact halves and keeps the sketches — that asymmetry is
  * the entire point of the operators.
  */
object Sketches {

  // ---------------------------------------------------------------- HLL

  /** Daily HLL partials → monthly merged unique-customer estimate.
    * Scale shape: ONE fact pass builds the day-grain partials (map-side
    * partial hll_sketch_agg collapses before the exchange; ~2400 day
    * rows of ≤4 KiB blobs at any SF); the month estimate merges ~30
    * blobs per group — model-sized forever after. The exact
    * `countDistinct` month pass exists only to make the estimate's
    * error driver-checkable at gate SFs (second fact pass, documented
    * gate-encoding cost — the production caller keeps partials only). */
  def sketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val band = 3.5 * 0.0163 // 3.5x rsd of HLL lgK=12 (default config)
    val o = Tables.load(spark, dir, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        to_date(col("o_orderdate")).as("day"), col("o_custkey").as("c"))
    val daily = o.groupBy(col("month"), col("day"))
      .agg(hll_sketch_agg(col("c")).as("sk"))
    val est = daily.groupBy(col("month"))
      .agg(count(lit(1)).as("days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = o.groupBy(col("month"))
      .agg(countDistinct(col("c")).as("exact_cust"))
    exact.join(est, Seq("month"))
      .select(col("month"), col("days"), col("exact_cust"),
        (abs(col("est") - col("exact_cust")).cast("double")
          <= col("exact_cust").cast("double") * band).as("within_band"))
  }

  val sketchRollupSql: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |  COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS days,
      |  COUNT(DISTINCT o_custkey) AS exact_cust,
      |  TRUE AS within_band
      |FROM orders GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- CMS

  /** CMS geometry: d hash rows × w counters; p = 2³¹−1 (prime), fixed
    * per-row Carter-Wegman (a, b). `pmod(u, p)` first keeps every
    * intermediate below 2⁶² — no BIGINT overflow for any user_id. */
  private val CmsP = 2147483647L
  private val CmsW = 1024
  private[graft] val CmsParams: Seq[(Int, Long, Long)] =
    Seq((0, 131L, 7L), (1, 1031L, 19L), (2, 8191L, 101L), (3, 524287L, 3L))

  /** The d (row, position) pairs for a user-id column, as one array —
    * posexplode-free: row index rides in the struct. */
  private def cmsPositions(u: String): Column = array(CmsParams.map {
    case (i, a, b) => struct(lit(i).as("i"),
      expr(s"pmod(${a}L * pmod($u, ${CmsP}L) + ${b}L, ${CmsP}L) % $CmsW")
        .as("pos"))
  }: _*)

  /** Count-Min frequency estimates for the deterministic probe set
    * `user_id % 7 = 0`, vs exact counts, with the one-sided CMS law as
    * a checked column. Scale shape: the sketch build is one event pass
    * exploded ×4 that collapses map-side into ≤ d·w = 4096 groups (the
    * Bloom-fold shape — constant state no matter the corpus); the
    * probe side joins those 4096 rows (broadcast-sized) d times per
    * probe and min-folds. The probe-set exact counts are the
    * verification encoding (filter-pushed single agg); the production
    * caller serves point lookups from the 4096-cell grid alone. */
  def cmsFreq(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val counters = ev
      .select(explode(cmsPositions("user_id")).as("h"))
      .groupBy(col("h.i").as("i"), col("h.pos").as("pos"))
      .agg(count(lit(1)).as("cnt"))
    val probes = ev.filter(pmod(col("user_id"), lit(7L)) === 0L)
      .groupBy(col("user_id")).agg(count(lit(1)).as("exact_cnt"))
    val estimates = probes
      .select(col("user_id"), explode(cmsPositions("user_id")).as("h"))
      .join(counters,
        col("h.i") === counters("i") && col("h.pos") === counters("pos"))
      .groupBy(col("user_id")).agg(min(col("cnt")).as("cms_est"))
    probes.join(estimates, Seq("user_id"))
      .select(col("user_id"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") >= col("exact_cnt")).as("over_ok"))
  }

  val cmsFreqSql: String = {
    val params = CmsParams
      .map { case (i, a, b) => s"($i, ${a}::BIGINT, ${b}::BIGINT)" }
      .mkString(", ")
    def pos(u: String) =
      s"((p.a * ($u % $CmsP) + p.b) % $CmsP) % $CmsW"
    s"""WITH params(i, a, b) AS (VALUES $params),
       |counters AS (
       |  SELECT p.i, ${pos("e.user_id")} AS pos, COUNT(*) AS cnt
       |  FROM events e CROSS JOIN params p GROUP BY 1, 2),
       |probes AS (
       |  SELECT user_id, COUNT(*) AS exact_cnt FROM events
       |  WHERE user_id % 7 = 0 GROUP BY 1),
       |est AS (
       |  SELECT pr.user_id, MIN(c.cnt) AS cms_est
       |  FROM probes pr CROSS JOIN params p
       |  JOIN counters c ON c.i = p.i AND c.pos = ${pos("pr.user_id")}
       |  GROUP BY 1)
       |SELECT pr.user_id, pr.exact_cnt, e.cms_est,
       |  e.cms_est >= pr.exact_cnt AS over_ok
       |FROM probes pr JOIN est e USING (user_id)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_sketch_rollup" -> (sketchRollup _),
    "evt_cms_freq" -> (cmsFreq _))

  val oracles: Map[String, String] = Map(
    "rel_sketch_rollup" -> sketchRollupSql,
    "evt_cms_freq" -> cmsFreqSql)
}
