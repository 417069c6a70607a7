package graft.codec

import scala.collection.concurrent.TrieMap
import java.util.concurrent.atomic.AtomicInteger

final case class RegisteredSchema(
    id: Int, subject: String, version: Int, schemaType: String, schema: String)

/** Confluent-style schema registry surface (reference registers via raw
  * REST `POST /subjects/{name}/versions` and fetches by id,
  * `jibaro/utils.py:43-54,170-179`). The engine only depends on this trait;
  * an HTTP implementation drops in where a live registry exists (this
  * container has zero egress, so tests use the in-memory one).
  */
trait SchemaRegistryClient {
  /** Register (or find) a schema under a subject; returns its global id. */
  def register(subject: String, schema: String, schemaType: String = "AVRO"): Int
  def getById(id: Int): Option[RegisteredSchema]
  def latest(subject: String): Option[RegisteredSchema]
}

/** In-memory registry with Confluent semantics: the same schema text under
  * the same subject keeps its id; new texts get a fresh global id and bump
  * the subject version. Thread-safe. */
final class InMemorySchemaRegistry extends SchemaRegistryClient {
  private val nextId = new AtomicInteger(0)
  private val byId = TrieMap.empty[Int, RegisteredSchema]
  private val bySubject = TrieMap.empty[String, Vector[RegisteredSchema]]

  override def register(subject: String, schema: String, schemaType: String): Int =
    synchronized {
      val versions = bySubject.getOrElse(subject, Vector.empty)
      versions.find(r => r.schema == schema && r.schemaType == schemaType) match {
        case Some(existing) => existing.id
        case None =>
          val rs = RegisteredSchema(nextId.incrementAndGet(), subject,
            versions.size + 1, schemaType, schema)
          byId.put(rs.id, rs)
          bySubject.put(subject, versions :+ rs)
          rs.id
      }
    }

  override def getById(id: Int): Option[RegisteredSchema] = byId.get(id)
  override def latest(subject: String): Option[RegisteredSchema] =
    bySubject.get(subject).flatMap(_.lastOption)
}

/** Confluent Schema Registry over REST — the reference's live path
  * (`jibaro/utils.py:43-54` registers via raw `POST
  * /subjects/{subject}/versions`; `utils.py:170-179` fetches by id).
  * JDK `java.net.http` client, no extra dependency; json4s (already on the
  * Spark classpath) for the tiny payloads. Driver-side only — ids/schemas
  * are resolved on the driver and enter plans as literals, so executors
  * never talk to the registry. `getById` caches: schema ids are immutable
  * in Confluent, so a decode loop never re-fetches. */
/** Non-2xx registry answer with the status preserved: 404 means
  * "not registered" (callers map it to None); anything else — 5xx during a
  * rolling restart, auth failures — must PROPAGATE, not masquerade as a
  * permanent-sounding schema-not-found. Extends IllegalStateException so
  * pre-existing broad handlers keep working. */
final class RegistryHttpException(val status: Int, msg: String)
  extends IllegalStateException(msg)

final class HttpSchemaRegistry(
    baseUrl: String,
    timeout: java.time.Duration = java.time.Duration.ofSeconds(10)
) extends SchemaRegistryClient {
  import org.json4s._
  import org.json4s.jackson.JsonMethods
  private implicit val fmts: Formats = DefaultFormats

  private val base = baseUrl.stripSuffix("/")
  private val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(timeout).build()
  private val idCache = TrieMap.empty[Int, RegisteredSchema]

  private def request(method: String, pathPart: String, body: Option[String]): JValue = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(base + pathPart))
      .timeout(timeout)
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
    val req = (body match {
      case Some(payload) =>
        b.method(method, java.net.http.HttpRequest.BodyPublishers.ofString(payload))
      case None => b.method(method, java.net.http.HttpRequest.BodyPublishers.noBody())
    }).build()
    val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RegistryHttpException(resp.statusCode(),
        s"registry $method $pathPart -> HTTP ${resp.statusCode()}: ${resp.body().take(300)}")
    JsonMethods.parse(resp.body())
  }

  override def register(subject: String, schema: String, schemaType: String): Int = {
    // AVRO is Confluent's default and older registries reject an explicit
    // schemaType field — send it only for non-default types, like the
    // reference's raw POST body (`utils.py:47-52`)
    val payload: JObject =
      if (schemaType == "AVRO") JObject("schema" -> JString(schema))
      else JObject("schema" -> JString(schema), "schemaType" -> JString(schemaType))
    val resp = request("POST", s"/subjects/${enc(subject)}/versions",
      Some(JsonMethods.compact(JsonMethods.render(payload))))
    (resp \ "id").extract[Int]
  }

  override def getById(id: Int): Option[RegisteredSchema] =
    idCache.get(id).orElse {
      try {
        val resp = request("GET", s"/schemas/ids/$id", None)
        val schemaType = (resp \ "schemaType").extractOpt[String].getOrElse("AVRO")
        // subject/version live on a sibling endpoint; best-effort (the
        // decode path only needs the schema text)
        val (subject, version) =
          try {
            val v = request("GET", s"/schemas/ids/$id/versions", None)
            v match {
              case JArray(first :: _) =>
                ((first \ "subject").extractOpt[String].getOrElse(""),
                  (first \ "version").extractOpt[Int].getOrElse(0))
              case _ => ("", 0)
            }
          } catch { case _: Exception => ("", 0) }
        val rs = RegisteredSchema(id, subject, version, schemaType,
          (resp \ "schema").extract[String])
        idCache.putIfAbsent(id, rs)
        Some(rs)
      } catch { case e: RegistryHttpException if e.status == 404 => None }
    }

  override def latest(subject: String): Option[RegisteredSchema] =
    try {
      val resp = request("GET", s"/subjects/${enc(subject)}/versions/latest", None)
      Some(RegisteredSchema(
        (resp \ "id").extract[Int],
        (resp \ "subject").extractOpt[String].getOrElse(subject),
        (resp \ "version").extract[Int],
        (resp \ "schemaType").extractOpt[String].getOrElse("AVRO"),
        (resp \ "schema").extract[String]))
    } catch { case e: RegistryHttpException if e.status == 404 => None }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
}
