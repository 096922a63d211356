package graft.codec

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.codec.ConfluentAvro._

class ConfluentAvroSpec extends SparkSpec {

  test("encode → decode round-trips the canonical 3-field record") {
    import spark.implicits._
    val in = Seq(("k1", "v1", 1), ("k2", "v2", -7)).toDF("key", "value", "num")
    val wire = in.select(
      toConfluentAvro(struct(col("key"), col("value"), col("num")),
        eventSchemaJson, schemaId = 42).as("value"))
    val back = wire.select(fromConfluentAvro(col("value"), eventSchemaJson).as("m"))
      .select("m.key", "m.value", "m.num")
    rows(back) shouldBe Seq(Seq("k1", "v1", 1), Seq("k2", "v2", -7))
  }

  test("wire format: magic byte 0 + big-endian schema id header") {
    import spark.implicits._
    val wire = Seq(("k", "v", 5)).toDF("key", "value", "num")
      .select(toConfluentAvro(struct(col("key"), col("value"), col("num")),
        eventSchemaJson, schemaId = 0x01020304).as("value"))
    val bytes = wire.head().getAs[Array[Byte]](0)
    bytes(0) shouldBe 0x00.toByte
    bytes.slice(1, 5) shouldBe Array(0x01, 0x02, 0x03, 0x04).map(_.toByte)
    // and the id expression reads it back
    wire.select(confluentSchemaId(col("value"))).head().getInt(0) shouldBe 0x01020304
  }

  test("nullable [null, T] union fields survive the round trip") {
    import spark.implicits._
    val schema =
      """{"type":"record","name":"N","fields":[
        |{"name":"s","type":["null","string"]},
        |{"name":"n","type":"long"}]}""".stripMargin
    val in = Seq((Some("x"), 1L), (None, 2L)).toDF("s", "n")
    val back = in.select(
        toConfluentAvro(struct(col("s"), col("n")), schema, 7).as("v"))
      .select(fromConfluentAvro(col("v"), schema).as("m"))
      .select("m.s", "m.n")
    rows(back) shouldBe Seq(Seq("x", 1L), Seq(null, 2L))
  }

  test("decode rejects payloads without the Confluent magic byte") {
    import spark.implicits._
    val junk = Seq(Array[Byte](9, 9, 9, 9, 9, 9)).toDF("value")
    val e = intercept[Exception] {
      junk.select(fromConfluentAvro(col("value"), eventSchemaJson)).collect()
    }
    e.getMessage should include("Confluent")
  }

  test("encode maps struct fields to schema fields by NAME, not position") {
    import spark.implicits._
    // outgoing schema orders fields (value, key, num) — a registry-
    // resolved schema need not match the struct's order
    val reordered =
      """{"type":"record","name":"Event","fields":[
        |{"name":"value","type":"string"},
        |{"name":"key","type":"string"},
        |{"name":"num","type":"int"}]}""".stripMargin
    val wire = Seq(("the-key", "the-value", 3)).toDF("key", "value", "num")
      .select(toConfluentAvro(struct(col("key"), col("value"), col("num")),
        reordered, schemaId = 1).as("value"))
    val back = wire.select(fromConfluentAvro(col("value"), reordered).as("m"))
      .select("m.key", "m.value", "m.num").head()
    back.getString(0) shouldBe "the-key"   // not silently swapped
    back.getString(1) shouldBe "the-value"
    back.getInt(2) shouldBe 3
  }

  test("encode rejects a schema field missing from the input struct") {
    import spark.implicits._
    val widened =
      """{"type":"record","name":"Event","fields":[
        |{"name":"key","type":"string"},
        |{"name":"extra","type":"string"}]}""".stripMargin
    val e = intercept[Exception] {
      Seq(("k", "v", 1)).toDF("key", "value", "num")
        .select(toConfluentAvro(struct(col("key"), col("value"), col("num")),
          widened, schemaId = 1)).collect()
    }
    e.getMessage should include("missing from input struct")
  }
}
