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

  /** One recorded client request: (method, path, contentType, body). */
  private type Req = (String, String, String, String)

  private def withServer(f: (HttpSchemaRegistry, InMemorySchemaRegistry) => Unit): Unit =
    withRecordingServer((http, backing, _) => f(http, backing))

  private def withRecordingServer(
      f: (HttpSchemaRegistry, InMemorySchemaRegistry, collection.mutable.Buffer[Req]) => Unit): Unit = {
    val backing = new InMemorySchemaRegistry
    val requests = collection.mutable.Buffer.empty[Req]
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
        val rawBody = new String(x.getRequestBody.readAllBytes(), "UTF-8")
        requests += ((x.getRequestMethod, path,
          Option(x.getRequestHeaders.getFirst("Content-Type")).getOrElse(""), rawBody))
        (x.getRequestMethod, path) match {
          case ("POST", Subject(subject)) =>
            val body = JsonMethods.parse(rawBody)
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
    try f(new HttpSchemaRegistry(s"http://127.0.0.1:${server.getAddress.getPort}"),
      backing, requests)
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

  test("EXACT REST payloads (FIXTURES.md): subject naming, headers, schemaType, no references") {
    withRecordingServer { (http, _, requests) =>
      val keySchema =
        """{"type":"record","name":"K","fields":[{"name":"id","type":"long"}]}"""
      http.register("orders-key", keySchema) // TopicNameStrategy: <topic>-key
      val (m, p, ct, body) = requests.head
      assert(m === "POST")
      assert(p === "/subjects/orders-key/versions")
      assert(ct === "application/vnd.schemaregistry.v1+json")
      // the exact JSON a live Confluent registry receives: one "schema"
      // field holding the JSON-ESCAPED schema text — no schemaType for
      // AVRO (pre-5.5 registries reject it), no references array
      val escaped = JsonMethods.compact(JsonMethods.render(JString(keySchema)))
      assert(body === s"""{"schema":$escaped}""")

      requests.clear()
      http.register("orders-value", "syntax = \"proto3\";\nmessage M { int64 id = 1; }",
        schemaType = "PROTOBUF")
      val pbBody = requests.head._4
      assert(requests.head._2 === "/subjects/orders-value/versions")
      assert(pbBody.contains(""""schemaType":"PROTOBUF""""))

      requests.clear()
      val id = http.register("orders-key", keySchema) // idempotent re-register
      http.getById(id)
      assert(requests.exists(_._2 === s"/schemas/ids/$id"))
      http.latest("orders-key")
      assert(requests.exists(_._2 === "/subjects/orders-key/versions/latest"))
    }
  }

  test("golden wire-format bytes (FIXTURES.md): framed Avro is byte-exact and round-trips") {
    withServer { (http, _) =>
      val keySchema =
        """{"type":"record","name":"K","fields":[{"name":"id","type":"long"}]}"""
      val id = http.register("golden-key", keySchema)
      assert(id === 1) // first registration in a fresh registry

      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]").appName("golden-bytes")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions).getOrCreate()
      import spark.implicits._
      import org.apache.spark.sql.functions._
      def framed(v: Long, schemaId: Int): Array[Byte] =
        Seq(v).toDF("id")
          .select(ConfluentWireFormat.frame(
            AvroExpressions.to_avro(struct(col("id")), keySchema), schemaId).as("b"))
          .head().getAs[Array[Byte]]("b")
      def hex(bs: Array[Byte]): String = bs.map(b => f"$b%02x").mkString

      // FIXTURES.md §4 golden rows: magic 0x00, big-endian id, zigzag body
      assert(hex(framed(42L, 1)) === "000000000154")
      assert(hex(framed(-1L, 7)) === "000000000701")

      // and the frame round-trips through the registry-driven decode path:
      // extract the id, fetch the schema over HTTP, decode the payload
      val bytes = framed(42L, id)
      val df = Seq(bytes).toDF("framed")
      val gotId = df.select(ConfluentWireFormat.schemaId(col("framed"))).head().getInt(0)
      assert(gotId === id)
      val schemaText = http.getById(gotId).get.schema
      val back = df.select(AvroExpressions.from_avro(
        ConfluentWireFormat.avroPayload(col("framed")), schemaText).as("rec"))
        .select(col("rec.id")).as[Long].head()
      assert(back === 42L)
    }
  }

  test("decode path uses an HTTP-fetched schema end-to-end") {
    withServer { (http, _) =>
      val id = http.register("e2e-value", avroA)
      val schemaText = http.getById(id).get.schema
      // encode with the local text, decode with the HTTP-fetched one
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]").appName("http-reg-e2e")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions).getOrCreate()
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val df = Seq(7, 11).toDF("id")
        .select(AvroExpressions.to_avro(struct(col("id")), avroA).as("payload"))
        .select(AvroExpressions.from_avro(col("payload"), schemaText).as("rec"))
        .select(col("rec.id"))
      assert(df.as[Int].collect().toSet === Set(7, 11))
    }
  }

  test("a 5xx registry outage PROPAGATES; only 404 means schema-not-found") {
    // missing id on a healthy registry: genuinely not registered -> None
    withServer { (http, _) =>
      assert(http.getById(99999).isEmpty)
      assert(http.latest("nope-value").isEmpty)
    }
    // rolling-restart registry answering 503: must THROW with the status,
    // never masquerade as a permanent-sounding "schema id not in registry"
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val b = """{"message":"service unavailable"}""".getBytes("UTF-8")
        x.sendResponseHeaders(503, b.length)
        x.getResponseBody.write(b)
        x.close()
      }
    })
    server.start()
    try {
      val http = new HttpSchemaRegistry(s"http://127.0.0.1:${server.getAddress.getPort}")
      val e1 = intercept[RegistryHttpException](http.getById(1))
      assert(e1.status === 503)
      val e2 = intercept[RegistryHttpException](http.latest("s-value"))
      assert(e2.status === 503)
    } finally server.stop(0)
  }
}
