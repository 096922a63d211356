package graft.codec

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Registry resolution against a stub HTTP registry (no network in this
  * container; the protocol is the public Confluent REST API the reference
  * consumes via @kafkajs/confluent-schema-registry, consumer.js:212-219).
  */
class SchemaRegistrySpec extends AnyFunSuite with Matchers {

  private val inSchema = ConfluentAvro.eventSchemaJson
  private val outSchema =
    """{"type":"record","name":"Out","fields":[{"name":"key","type":"string"}]}"""

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  private def withStubRegistry[A](f: (String, AtomicInteger) => A): A = {
    val hits = new AtomicInteger()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/subjects", ex => {
      hits.incrementAndGet()
      val path = ex.getRequestURI.getPath
      val body = path match {
        case "/subjects" =>
          """["events-value","out-value"]"""
        case "/subjects/events-value/versions/latest" =>
          s"""{"subject":"events-value","version":3,"id":7,"schema":"${escape(inSchema)}"}"""
        case "/subjects/out-value/versions/latest" =>
          s"""{"subject":"out-value","version":1,"id":9,"schema":"${escape(outSchema)}"}"""
        case _ => ""
      }
      val code = if (body.isEmpty) 404 else 200
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) { val os = ex.getResponseBody; os.write(bytes); os.close() }
    })
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}", hits)
    finally server.stop(0)
  }

  test("resolves latest schema id + definition per subject") {
    withStubRegistry { (url, _) =>
      val reg = new SchemaRegistry(url)
      val in = reg.latest("events-value")
      in.id shouldBe 7
      ConfluentAvro.parseSchema(in.schemaJson).getName shouldBe "Event"
      val out = reg.latest("out-value")
      out.id shouldBe 9
      ConfluentAvro.parseSchema(out.schemaJson).getFields.size() shouldBe 1
    }
  }

  test("caches per subject — one HTTP round trip each") {
    withStubRegistry { (url, hits) =>
      val reg = new SchemaRegistry(url)
      reg.latest("events-value")
      reg.latest("events-value")
      reg.latestForTopic("events") // same subject via the -value convention
      hits.get() shouldBe 1
    }
  }

  test("lists all subjects for catalog sync") {
    withStubRegistry { (url, _) =>
      new SchemaRegistry(url).subjects() shouldBe Seq("events-value", "out-value")
    }
  }

  test("unknown subject raises") {
    withStubRegistry { (url, _) =>
      val reg = new SchemaRegistry(url)
      an[IllegalArgumentException] should be thrownBy reg.latest("nope")
    }
  }
}
