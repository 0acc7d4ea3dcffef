package graft.functions

/**
 * The structural seam where the reference's `BruteForceSerde` consults a live
 * schema registry (`DeadLetterAnalyzerTopology.java:102-105`): resolve a
 * Confluent schema id to its Avro schema JSON.
 *
 * Implementations must be serializable — the provider ships inside the decode
 * UDF to executors, where [[AvroDecode]] caches the resolved+parsed schema
 * per id per executor, so a remote implementation pays one lookup per id per
 * executor, not per record. [[StaticSchemas]] is the default transport (ids
 * and schemas known at submit time, e.g. from `--avro-schema-files`); an HTTP
 * schema-registry client is a drop-in: implement [[schemaFor]] with the
 * registry's GET-schema-by-id call.
 */
trait SchemaProvider extends Serializable {

  /** Avro schema JSON for a registry id; None for unknown ids — the decode
    * chain then falls through to the non-Avro tiers. */
  def schemaFor(id: Int): Option[String]

  /** False when the provider can never resolve anything, letting plan
    * construction skip building the Avro decode tier entirely. */
  def isActive: Boolean
}

/** Static id→schema map — the default provider. */
final case class StaticSchemas(byId: Map[Int, String]) extends SchemaProvider {
  override def schemaFor(id: Int): Option[String] = byId.get(id)
  override def isActive: Boolean = byId.nonEmpty
}

/** Live Confluent schema-registry client — the registry-first tier of the
  * reference's `BruteForceSerde` chain (`DeadLetterAnalyzerTopology
  * .java:102-105`), speaking the registry's public REST surface:
  * `GET {base}/schemas/ids/{id}` → `{"schema": "<avro schema json>"}`.
  *
  * Serialization: the case class ships only the URL string; the JDK
  * HttpClient and Jackson mapper (both already on Spark's classpath — no new
  * dependency) are rebuilt lazily per executor.
  *
  * Failure semantics match the reference's best-effort decode chain: a 404
  * (unregistered id) and a persistent transport failure (after `retries`
  * attempts with linear backoff) both resolve to None via `fallback`, so the
  * brute-force chain falls through to the string/hex tiers instead of
  * failing the task — the same degradation a registry outage causes in the
  * reference. Caveat, documented: [[AvroDecode]] memoizes per-executor, so
  * an outage-time miss stays degraded on that executor until it restarts;
  * definitive misses staying cheap is the point of that memo, and the trade
  * is inherited here. */
final case class HttpRegistrySchemas(baseUrl: String,
    fallback: SchemaProvider = StaticSchemas(Map.empty),
    retries: Int = 3) extends SchemaProvider {

  @transient private lazy val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(5)).build()
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  override def isActive: Boolean = true

  override def schemaFor(id: Int): Option[String] = {
    val uri = java.net.URI.create(s"${baseUrl.stripSuffix("/")}/schemas/ids/$id")
    val req = java.net.http.HttpRequest.newBuilder(uri)
      .timeout(java.time.Duration.ofSeconds(10))
      .header("Accept",
        "application/vnd.schemaregistry.v1+json, application/json")
      .GET().build()
    var attempt = 0
    while (attempt < retries) {
      attempt += 1
      try {
        val resp = http.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        resp.statusCode() match {
          case 200 =>
            val schema = Option(mapper.readTree(resp.body()).get("schema"))
              .filter(!_.isNull).map(_.asText())
            return schema.orElse(fallback.schemaFor(id))
          case 404 => return fallback.schemaFor(id) // definitive: unregistered
          case s if s >= 500 => // transient server side: retry
          case 429 | 408 =>
            // throttling/timeout are transient too — treating them as a
            // definitive miss would poison AvroDecode's per-executor memo
            // with a permanent decode degrade; honor Retry-After if present
            resp.headers().firstValue("Retry-After").ifPresent { v =>
              // clamp both ends: a malformed negative Retry-After (e.g. "-1")
              // would make Thread.sleep throw IllegalArgumentException, which
              // is not an IOException and would crash the decode path
              v.toLongOption.foreach(sec =>
                Thread.sleep(math.min(math.max(sec, 0L), 5L) * 1000L))
            }
          case _ => return fallback.schemaFor(id) // other 4xx: definitive
        }
      } catch {
        case _: java.io.IOException => // transient transport: retry
      }
      if (attempt < retries) Thread.sleep(100L * attempt)
    }
    System.err.println(
      s"[graft] schema registry unreachable after $retries attempts " +
        s"($uri); decode falls through to non-Avro tiers for id $id")
    fallback.schemaFor(id)
  }
}
