package graft.codec

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Driver-side Confluent Schema Registry client.
  *
  * The reference resolves subject → latest schema over HTTP once at
  * startup (reference src/consumer.js:212-219 via
  * @kafkajs/confluent-schema-registry) and never again per message; this
  * client does the same: `latest(subject)` is an HTTP GET of
  * `/subjects/{subject}/versions/latest`, cached for the lifetime of the
  * client, so schema resolution happens on the DRIVER at plan-build time
  * and the resolved schema JSON is baked into the decode/encode
  * expressions as a literal. Nothing registry-related ever runs per row
  * or per executor.
  */
final class SchemaRegistry(baseUrl: String,
    connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 5000) {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, SchemaRegistry.Resolved]()

  /** Latest registered schema under a subject (cached after first call). */
  def latest(subject: String): SchemaRegistry.Resolved =
    cache.computeIfAbsent(subject, fetch(_))

  /** The Confluent convention: the value schema of topic T lives under
    * subject "T-value".
    */
  def latestForTopic(topic: String): SchemaRegistry.Resolved =
    latest(s"$topic-value")

  /** All registered subjects (GET /subjects) — the catalog-sync input
    * (reference scripts/pipelines/getTopicsAndSchemas.js:62-70). Not
    * cached: sync runs want fresh listings.
    */
  def subjects(): Seq[String] = {
    implicit val fmts: Formats = DefaultFormats
    JsonMethods.parse(get("/subjects")).extract[Seq[String]]
  }

  private def fetch(subject: String): SchemaRegistry.Resolved =
    SchemaRegistry.parseResponse(
      get(s"/subjects/${SchemaRegistry.pathSegment(subject)}/versions/latest"))

  private def get(path: String): String = {
    val url = new URI(s"$baseUrl$path").toURL
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestProperty("Accept", "application/vnd.schemaregistry.v1+json")
    try {
      val code = conn.getResponseCode
      require(code == 200, s"schema registry GET $url returned $code")
      new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    } finally conn.disconnect()
  }
}

object SchemaRegistry {

  /** One resolved registry entry: the wire-format schema id and the
    * schema definition itself (Avro JSON).
    */
  final case class Resolved(id: Int, schemaJson: String)

  /** Percent-encode one URL PATH segment. URLEncoder alone is
    * form-encoding: it turns a space into '+', which the registry would
    * read as a literal plus in the subject name.
    */
  private[codec] def pathSegment(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  /** Parse the registry's versions/latest payload:
    * `{"subject": s, "version": v, "id": n, "schema": "<escaped json>"}`.
    */
  private[codec] def parseResponse(body: String): Resolved = {
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(body)
    Resolved(
      id = (j \ "id").extract[Int],
      schemaJson = (j \ "schema").extract[String])
  }
}
