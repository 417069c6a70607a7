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
