package graft.ingest

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Live HTTP [[GeoResolver]] over a Nominatim-style search endpoint
  * (reference: insert_owid.py:81-87 — `Nominatim(...).geocode(name,
  * addressdetails=True)`, keeping a hit only when the response carries
  * both coordinates and `address.country_code`).
  *
  * Request shape matches Nominatim's public search API:
  * `GET {endpoint}?q=<name>&format=json&addressdetails=1&limit=1`,
  * response a JSON array of candidates with string `lat`/`lon` and an
  * `address.country_code` field. A well-formed miss (empty array, or a
  * candidate without country_code/coords — the reference's
  * geocode-miss branch) returns None; a transport failure after
  * `retries` attempts throws, because silently mapping outages to
  * "unresolvable name" would poison the extension parquet.
  *
  * Serializable per the [[GeoResolver]] contract ([[GeoExtend.extension]]
  * runs resolvers inside executor tasks); the HttpClient and JSON
  * mapper are per-executor transient lazies. Concurrency limiting stays
  * where it is — `extension(numSlots = 1)` funnels all names through one
  * task, exactly the serial discipline the reference applies — and
  * `minIntervalMs` adds the REQUEST-RATE half of politeness: at least
  * that many ms between consecutive HTTP sends to this ENDPOINT
  * (public Nominatim policy is 1 req/s → 1000), covering retries too.
  * The pacing gate lives in the companion, keyed by endpoint — NOT in
  * the instance — because every deserialized task closure gets its own
  * instance copy; instance state would quietly degrade to per-task
  * pacing the moment a caller raised the slot count. Per-JVM is as far
  * as a JVM-local gate can reach, so [[GeoExtend.extension]] asserts
  * the declared-rate ⇒ single-slot coupling (`minIntervalMs` is
  * surfaced through the [[GeoResolver]] contract for exactly that).
  */
class HttpGeoResolver(
    endpoint: String,
    retries: Int = 3,
    backoffMs: Long = 500,
    timeoutSeconds: Long = 10,
    override val minIntervalMs: Long = 0) extends GeoResolver {

  @transient private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSeconds))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  @transient private lazy val mapper = new ObjectMapper()

  /** Sleep until `minIntervalMs` has elapsed since the previous send to
    * this endpoint — from ANY resolver instance in this JVM. */
  private def politePause(): Unit =
    if (minIntervalMs > 0) HttpGeoResolver.gate(endpoint).pause(minIntervalMs)

  def resolve(name: String): Option[GeoResolver.Hit] = {
    val q = URLEncoder.encode(name, StandardCharsets.UTF_8)
    val url = s"$endpoint?q=$q&format=json&addressdetails=1&limit=1"
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSeconds))
      .header("User-Agent", "graft-geoextend") // Nominatim requires one
      .GET().build()

    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < retries) {
      politePause()
      // The try covers ONLY the transport (send + status triage): a 2xx
      // body is parsed OUTSIDE it, so a malformed body — a permanent
      // schema/content defect, e.g. the endpoint switching to HTML —
      // fails fast instead of burning the whole retry budget as if it
      // were a transient transport error. (HttpTimeoutException needs no
      // case of its own: it IS an IOException.)
      val body: Option[String] = try {
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        val code = resp.statusCode()
        if (code >= 200 && code < 300) Some(resp.body())
        // Retry only what can heal: 5xx (server trouble) and 429 (rate
        // limit). Any other 4xx is a permanent request defect — burning
        // the retry budget on exponential sleeps just delays the
        // inevitable throw inside an executor task.
        else if (code >= 400 && code < 500 && code != 429)
          throw new RuntimeException(s"geocode rejected (HTTP $code, not retryable): $url")
        else { lastErr = new RuntimeException(s"HTTP $code for $url"); None }
      } catch {
        // Task cancellation must propagate promptly — never swallowed
        // into a retry sleep.
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
        case e: java.io.IOException => lastErr = e; None
      }
      body.foreach(b => return parse(b))
      attempt += 1
      if (attempt < retries) Thread.sleep(backoffMs * (1L << (attempt - 1)))
    }
    throw new RuntimeException(
      s"geocode failed after $retries attempts: $url", lastErr)
  }

  /** First candidate with coords + country_code, else None — the same
    * acceptance test as the reference's `if location and location.raw
    * and "country_code" in location.raw["address"]`. */
  private def parse(body: String): Option[GeoResolver.Hit] = {
    val root = mapper.readTree(body)
    if (root == null || !root.isArray || root.size() == 0) return None
    val c = root.get(0)
    val cc = Option(c.path("address").path("country_code").asText(null))
    (cc, numeric(c.path("lat")), numeric(c.path("lon"))) match {
      case (Some(code), Some(lat), Some(lon)) if code.nonEmpty =>
        Some(GeoResolver.Hit(code.toUpperCase, lat, lon))
      case _ => None
    }
  }

  /** Nominatim serializes coordinates as strings ("48.85"); accept
    * either a JSON number or a parseable string. */
  private def numeric(n: JsonNode): Option[Double] =
    if (n.isNumber) Some(n.asDouble)
    else if (n.isTextual) n.asText.toDoubleOption
    else None
}

object HttpGeoResolver {

  /** One pacing gate per endpoint: tracks the wall-clock of the last
    * send and makes the next caller wait out the remainder of the
    * interval. JVM-wide by construction (held here, never serialized),
    * so however many instances — constructor copies, deserialized task
    * closures, concurrent tasks — hit the same endpoint, the rate floor
    * holds within this JVM. Bounded: one entry per distinct endpoint
    * (a config value, not data). */
  private final class PaceGate {
    private var lastSendAt = 0L
    def pause(minIntervalMs: Long): Unit = synchronized {
      val wait = lastSendAt + minIntervalMs - System.currentTimeMillis()
      if (wait > 0) Thread.sleep(wait)
      lastSendAt = System.currentTimeMillis()
    }
  }

  private val gates =
    new java.util.concurrent.ConcurrentHashMap[String, PaceGate]
  private def gate(endpoint: String): PaceGate =
    gates.computeIfAbsent(endpoint, _ => new PaceGate)
}
