package graft.codec

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.codec.ConfluentProto._

class ConfluentProtoSpec extends SparkSpec {

  test("proto3 encode → decode round-trips SchemaC1 (incl. defaults)") {
    import spark.implicits._
    val in = Seq(("k1", "v1", 1), ("", "v2", 0), ("k3", "", -7))
      .toDF("key", "value", "num")
    val back = in
      .select(encodeProto(struct(col("key"), col("value"), col("num")), schemaC1).as("b"))
      .select(decodeProto(col("b"), schemaC1).as("m"))
      .select("m.key", "m.value", "m.num")
    rows(back) shouldBe Seq(Seq("k1", "v1", 1), Seq("", "v2", 0), Seq("k3", "", -7))
  }

  test("decode errors on a truncated length-delimited field (no zero-padding)") {
    import spark.implicits._
    // declares a 9-byte string but only 2 payload bytes follow
    val truncated = Array[Byte](0x0A, 0x09, 'a', 'b')
    val e = intercept[Exception] {
      Seq(truncated).toDF("b")
        .select(decodeProto(col("b"), schemaC1)).collect()
    }
    e.getMessage should include("truncated")
  }

  test("decode matches a canonical hand-built proto3 message") {
    import spark.implicits._
    // SchemaC1 {key:"ab", value:"c", num:5}:
    // tag1 LEN: 0x0A 0x02 'a' 'b' | tag2 LEN: 0x12 0x01 'c' | tag3 VARINT: 0x18 0x05
    val wire = Array[Byte](0x0A, 0x02, 'a', 'b', 0x12, 0x01, 'c', 0x18, 0x05)
    val out = Seq(wire).toDF("b")
      .select(decodeProto(col("b"), schemaC1).as("m"))
      .select("m.key", "m.value", "m.num")
    rows(out) shouldBe Seq(Seq("ab", "c", 5))
  }

  test("unknown tags are skipped per proto3") {
    import spark.implicits._
    // unknown tag 4 (varint) + known tag 3
    val wire = Array[Byte](0x20, 0x2A, 0x18, 0x07)
    val out = Seq(wire).toDF("b")
      .select(decodeProto(col("b"), schemaC1).as("m")).select("m.num")
    rows(out) shouldBe Seq(Seq(7))
  }

  test("Confluent framing round-trip with schema id") {
    import spark.implicits._
    val in = Seq(("k", "v", 42)).toDF("key", "value", "num")
    val wire = in.select(toConfluentProto(
      struct(col("key"), col("value"), col("num")), schemaC1, schemaId = 9).as("w"))
    wire.select(ConfluentAvro.confluentSchemaId(col("w"))).head().getInt(0) shouldBe 9
    val back = wire.select(fromConfluentProto(col("w"), schemaC1).as("m"))
      .select("m.key", "m.value", "m.num")
    rows(back) shouldBe Seq(Seq("k", "v", 42))
  }

  test("negative int32 varint round-trips (10-byte two's-complement)") {
    import spark.implicits._
    val in = Seq(("x", "y", Int.MinValue), ("a", "b", -1)).toDF("key", "value", "num")
    val back = in
      .select(encodeProto(struct(col("key"), col("value"), col("num")), schemaC1).as("b"))
      .select(decodeProto(col("b"), schemaC1).as("m")).select("m.num")
    rows(back) shouldBe Seq(Seq(Int.MinValue), Seq(-1))
  }
}
