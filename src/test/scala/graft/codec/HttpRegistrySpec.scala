package graft.codec

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress

/** `HttpSchemaRegistry` against an in-process stub speaking the Confluent
  * REST surface the reference hits (`jibaro/utils.py:43-54,170-179`) —
  * zero-egress container, so the server runs on loopback, backed by the
  * in-memory registry (whose semantics CodecSpec already verifies). */
class HttpRegistrySpec extends AnyFunSuite {
  private implicit val fmts: Formats = DefaultFormats

  private def withServer(f: (HttpSchemaRegistry, InMemorySchemaRegistry) => Unit): Unit = {
    val backing = new InMemorySchemaRegistry
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val Subject = "^/subjects/([^/]+)/versions$".r
    val Latest = "^/subjects/([^/]+)/versions/latest$".r
    val ById = "^/schemas/ids/(\\d+)$".r
    val ByIdVersions = "^/schemas/ids/(\\d+)/versions$".r

    server.createContext("/", new HttpHandler {
      private def reply(x: HttpExchange, code: Int, body: String): Unit = {
        val bytes = body.getBytes("UTF-8")
        x.sendResponseHeaders(code, bytes.length)
        x.getResponseBody.write(bytes)
        x.close()
      }
      private def schemaJson(r: RegisteredSchema): JObject = {
        val base = JObject("schema" -> JString(r.schema))
        if (r.schemaType == "AVRO") base
        else base ~ ("schemaType" -> JString(r.schemaType))
      }
      override def handle(x: HttpExchange): Unit = try {
        val path = x.getRequestURI.getPath
        (x.getRequestMethod, path) match {
          case ("POST", Subject(subject)) =>
            val body = JsonMethods.parse(new String(x.getRequestBody.readAllBytes(), "UTF-8"))
            val schema = (body \ "schema").extract[String]
            val schemaType = (body \ "schemaType").extractOpt[String].getOrElse("AVRO")
            val id = backing.register(java.net.URLDecoder.decode(subject, "UTF-8"),
              schema, schemaType)
            reply(x, 200, s"""{"id":$id}""")
          case ("GET", ById(id)) =>
            backing.getById(id.toInt) match {
              case Some(r) => reply(x, 200, JsonMethods.compact(JsonMethods.render(schemaJson(r))))
              case None    => reply(x, 404, """{"error_code":40403,"message":"not found"}""")
            }
          case ("GET", ByIdVersions(id)) =>
            backing.getById(id.toInt) match {
              case Some(r) =>
                reply(x, 200, s"""[{"subject":"${r.subject}","version":${r.version}}]""")
              case None => reply(x, 404, """{"error_code":40403,"message":"not found"}""")
            }
          case ("GET", Latest(subject)) =>
            backing.latest(java.net.URLDecoder.decode(subject, "UTF-8")) match {
              case Some(r) =>
                val o = JObject("subject" -> JString(r.subject), "version" -> JInt(r.version),
                  "id" -> JInt(r.id)) ~ schemaJson(r)
                reply(x, 200, JsonMethods.compact(JsonMethods.render(o)))
              case None => reply(x, 404, """{"error_code":40401,"message":"not found"}""")
            }
          case _ => reply(x, 404, """{"error_code":404,"message":"no route"}""")
        }
      } catch { case e: Exception => reply(x, 500, s"""{"message":"${e.getMessage}"}""") }
    })
    server.start()
    try f(new HttpSchemaRegistry(s"http://127.0.0.1:${server.getAddress.getPort}"), backing)
    finally server.stop(0)
  }

  private val avroA =
    """{"type":"record","name":"A","fields":[{"name":"id","type":"int"}]}"""
  private val avroB =
    """{"type":"record","name":"A","fields":[{"name":"id","type":"int"},{"name":"v","type":["null","string"],"default":null}]}"""

  test("register/getById/latest round-trip over HTTP, Confluent semantics") {
    withServer { (http, _) =>
      val id1 = http.register("t-value", avroA)
      assert(http.register("t-value", avroA) === id1, "same text keeps its id")
      val id2 = http.register("t-value", avroB)
      assert(id2 !== id1)

      val got = http.getById(id1).get
      assert(got.schema === avroA)
      assert(got.subject === "t-value" && got.version === 1)
      assert(got.schemaType === "AVRO")

      val latest = http.latest("t-value").get
      assert(latest.id === id2 && latest.version === 2 && latest.schema === avroB)
      assert(http.latest("missing-subject").isEmpty)
      assert(http.getById(999).isEmpty)
    }
  }

  test("protobuf schemaType travels through registration and fetch") {
    withServer { (http, _) =>
      val proto = "syntax = \"proto3\";\nmessage M { int32 id = 1; }"
      val id = http.register("pb-value", proto, schemaType = "PROTOBUF")
      val got = http.getById(id).get
      assert(got.schemaType === "PROTOBUF")
      assert(got.schema === proto)
    }
  }

  test("decode path uses an HTTP-fetched schema end-to-end") {
    withServer { (http, _) =>
      val id = http.register("e2e-value", avroA)
      val schemaText = http.getById(id).get.schema
      // encode with the local text, decode with the HTTP-fetched one
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]").appName("http-reg-e2e")
        .config("spark.ui.enabled", "false").getOrCreate()
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val df = Seq(7, 11).toDF("id")
        .select(AvroExpressions.to_avro(struct(col("id")), avroA).as("payload"))
        .select(AvroExpressions.from_avro(col("payload"), schemaText).as("rec"))
        .select(col("rec.id"))
      assert(df.as[Int].collect().toSet === Set(7, 11))
    }
  }
}
