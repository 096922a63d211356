package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{PipelineRunner, SparkSpec}
import graft.codec.ConfluentAvro
import graft.pipeline.PipelineDef

/** End-to-end operator plane: guarded decode (poison message survives),
  * conservation counters, and the /metrics + /health HTTP endpoints with
  * the reference's verbatim metric names (reference src/metrics.js:5-53,
  * src/listen.js:9-30).
  */
class MetricsServerSpec extends SparkSpec {

  private val outSchemaJson =
    """{"type":"record","name":"OutEvent","fields":[
      |{"name":"key","type":"string"},
      |{"name":"value","type":"string"},
      |{"name":"num","type":"int"}]}""".stripMargin

  private val spec = PipelineDef(
    id = 1, name = "metrics-e2e", sourceTopic = "in", targetTopic = "target",
    incomingSchema = "events-value", outgoingSchema = "out-value",
    processors = Seq("capitalize", "isEven"), dlq = Seq(None, None))

  test("decode guard + conservation counters + /metrics + /health") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // 3 valid Confluent-framed messages + 1 poison (the reference counts
    // it and keeps consuming, consumer.js:142-150)
    val valid = spark.range(3).select(
      ConfluentAvro.toConfluentAvro(
        struct(concat(lit("k"), col("id")).as("key"),
          concat(lit("v"), col("id")).as("value"),
          col("id").cast("int").as("num")),
        ConfluentAvro.eventSchemaJson, schemaId = 7).as("v"))
      .collect().map(_.getAs[Array[Byte]](0))
    val poison = "not-confluent".getBytes(StandardCharsets.UTF_8)

    val in = MemoryStream[Array[Byte]]
    in.addData(valid.toIndexedSeq :+ poison: _*)

    val listener = new StreamingOps.PipelineMetricsListener
    spark.streams.addListener(listener)
    val server = new MetricsServer(listener, port = 0)
    try {
      val routed = PipelineRunner.decodeAndRoute(
        in.toDF().toDF("value"), spec,
        inSchemaJson = ConfluentAvro.eventSchemaJson,
        outSchemaJson = outSchemaJson, outSchemaId = 9)
      val q = routed.writeStream.format("memory").queryName("metrics_e2e").start()
      q.processAllAvailable()
      q.stop()

      // poll: listener events arrive asynchronously after the batch
      val deadline = System.nanoTime() + 10e9.toLong
      while (listener.snapshot().getOrElse("messages_received_total", 0L) < 4L &&
        System.nanoTime() < deadline) Thread.sleep(50)

      val m = listener.snapshot()
      m("messages_received_total") shouldBe 4L   // ALL consumed, incl. poison
      m("messages_error_total") shouldBe 1L      // the poison message
      m("processors_applied_total") shouldBe 6L  // 3 rows × 2 steps
      m("messages_completed_total") shouldBe 2L  // num ∈ {0, 2}
      m("messages_dropped_total") shouldBe 1L    // num = 1 fails isEven
      m("messages_dlq_total") shouldBe 0L
      // the reference's conservation invariant holds across observations
      m("messages_received_total") shouldBe
        m("messages_completed_total") + m("messages_dlq_total") +
        m("messages_dropped_total") + m("messages_error_total")

      // sink payload is the OUTGOING schema + id, not the incoming
      val out = spark.table("metrics_e2e").collect()
      out.length shouldBe 2
      val wire = out.head.getAs[Array[Byte]]("value")
      wire(0) shouldBe ConfluentAvro.MagicByte
      java.nio.ByteBuffer.wrap(wire, 1, 4).getInt shouldBe 9

      // HTTP scrape: the reference's 7 metric names, verbatim
      def get(path: String): String = {
        val c = new java.net.URI(s"http://localhost:${server.boundPort}$path")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        try new String(c.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
        finally c.disconnect()
      }
      // per-step observability: rows_in localizes a conservation break
      // to one step — rows_in(i) = rows_in(i+1) + dropped(i) + errors(i)
      m("step_0_capitalize_rows_in_total") shouldBe 3L
      m("step_0_capitalize_dropped_total") shouldBe 0L
      m("step_0_capitalize_errors_total") shouldBe 0L
      m("step_1_isEven_rows_in_total") shouldBe 3L
      m("step_1_isEven_dropped_total") shouldBe 1L
      m("step_1_isEven_rows_in_total") shouldBe
        m("messages_completed_total") + m("step_1_isEven_dropped_total") +
        m("step_1_isEven_errors_total")

      val text = get("/metrics")
      Seq("messages_received_total", "processors_applied_total",
        "messages_completed_total", "messages_error_total",
        "messages_dlq_total", "messages_dropped_total",
        "message_processing_duration_seconds",
        "step_0_capitalize_rows_in_total", "step_1_isEven_rows_in_total",
        "step_1_isEven_dropped_total").foreach { name =>
        text should include(name)
      }
      text should include("messages_error_total 1")
      get("/health").trim shouldBe "ok"
    } finally {
      server.stop()
      spark.streams.removeListener(listener)
    }
  }
}
