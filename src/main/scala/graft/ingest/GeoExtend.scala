package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable name→coordinates resolver for the P5 geocoder tail.
  *
  * The reference calls Nominatim inline, per unresolved location name,
  * in the middle of its ingest loop (insert_owid.py:81-87) — a remote
  * round-trip per row that can't work at scale (or in this offline
  * container). Implementations must be Serializable: the resolver runs
  * inside executor tasks in [[GeoExtend.extension]].
  */
trait GeoResolver extends Serializable {
  /** None = the resolver cannot place the name (it stays unresolved,
    * exactly like the reference's geocode-miss branch). */
  def resolve(name: String): Option[GeoResolver.Hit]

  /** Declared request-rate floor (ms between sends), 0 = unpaced.
    * A resolver that declares one is talking to a rate-limited remote
    * endpoint; [[GeoExtend.extension]] uses this to enforce the
    * single-slot coupling that makes the floor hold cluster-wide. */
  def minIntervalMs: Long = 0
}

object GeoResolver {
  case class Hit(iso2: String, lat: Double, lon: Double)

  /** Deterministic offline resolver (the container has no egress; a
    * production deployment would swap in an HTTP Nominatim client here).
    * Resolves names longer than 3 chars so tests can exercise the
    * miss branch too. The formula is mirrored verbatim in the
    * ing_geo_extend oracle SQL, which is what makes the whole job
    * hash-checkable against DuckDB. */
  object Fixture extends GeoResolver {
    def resolve(name: String): Option[Hit] =
      if (name.length > 3)
        Some(Hit(
          iso2 = name.take(2).toUpperCase,
          lat = name.length.toDouble,
          lon = name.head.toInt.toDouble))
      else None
  }
}

/** The geocoder dim-extension job (P5 tail, SURVEY §2 "What's missing"
  * item 1 of round 3): ingestion itself stays a pure strict broadcast
  * join — unresolved locations DROP — and this out-of-band batch job
  * turns the drops into geo-dim extension rows for the next ingest.
  * Run it between refreshes: `unresolved → resolver → extendedDim`,
  * persist the extension parquet next to the lookup CSV, done.
  *
  * Scale: the resolver only ever sees DISTINCT unresolved names — a
  * dim-scale set (thousands), never a fact-scale one — so a rate-limited
  * remote geocoder is feasible here where the reference's per-row inline
  * call is not.
  */
object GeoExtend {

  /** Distinct normalized `loc` values the strict dim join would drop:
    * the normalize front of every spec (shared with
    * [[SourceSpec.ingest]], so the two can't drift) → distinct →
    * anti-join the broadcast dim on name. One shuffle, on the
    * already-distinct name set. */
  def unresolved(spark: SparkSession, specs: Seq[SourceSpec], dim: DataFrame): DataFrame = {
    val locs = specs.map(SourceSpec.normalized(spark, _))
      .reduce(_.unionByName(_))
      .select(col("loc"))
      .filter(col("loc").isNotNull) // World-poisoned rows are not "unresolved"
      .distinct()
    locs.join(broadcast(dim), locs("loc") === dim("name"), "left_anti")
  }

  /** Resolver pass over [[unresolved]] → dim-extension rows in the
    * [[CasesIngest.geoDim]] schema (name, uid, iso2, lat, lon).
    *
    * `numSlots` caps resolver parallelism: a live geocoder is
    * rate-limited (the reference calls Nominatim strictly serially), so
    * the default funnels all names through one task. The deterministic
    * fixture resolver doesn't care; a production one does.
    */
  def extension(
      spark: SparkSession,
      specs: Seq[SourceSpec],
      dim: DataFrame,
      resolver: GeoResolver,
      numSlots: Int = 1): DataFrame = {
    // A rate-declaring resolver paces per JVM (HttpGeoResolver keys its
    // gate on the endpoint), but slots on DIFFERENT executors are
    // different JVMs — the only configuration where the declared floor
    // holds globally is one slot. Fail loudly instead of silently
    // violating a remote endpoint's rate policy.
    require(numSlots == 1 || resolver.minIntervalMs == 0,
      s"resolver declares minIntervalMs=${resolver.minIntervalMs}: " +
        s"pacing is per-JVM, so numSlots must be 1 (got $numSlots)")
    import spark.implicits._
    val hits = unresolved(spark, specs, dim)
      .select(col("loc")).as[String]
      .repartition(numSlots)
      .mapPartitions(_.flatMap(n =>
        resolver.resolve(n).map(h => (n, h.iso2, h.lat, h.lon))))
      .toDF("name", "iso2", "lat", "lon")
    // uid only exists as geoDim's first-wins tiebreak; extension names
    // are disjoint from the dim (anti-join) and distinct among
    // themselves, so any stable value works — a hash keeps it
    // deterministic across runs.
    hits
      .withColumn("uid", xxhash64(col("name")))
      .select("name", "uid", "iso2", "lat", "lon")
  }

  /** The dim the NEXT ingest should use. No dedup needed: extension
    * names can't collide with dim names by construction. */
  def extendedDim(dim: DataFrame, ext: DataFrame): DataFrame =
    dim.unionByName(ext)
}
