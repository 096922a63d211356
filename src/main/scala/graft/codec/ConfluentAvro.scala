package graft.codec

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Confluent Schema Registry wire format + Avro codec, as custom Catalyst
  * expressions.
  *
  * The reference decodes/encodes every Kafka message in this framing
  * (magic byte 0x00 + 4-byte big-endian schema id + Avro body — reference
  * src/consumer.js:117-124,130,139 via @kafkajs/confluent-schema-registry).
  * Spark ships no Confluent framing and this build has no spark-avro
  * connector jar, so both layers are implemented here against the core
  * avro-1.12 jar. Schema resolution happens ONCE on the driver (as the
  * reference does at startup, consumer.js:212-219): the schema JSON is a
  * literal baked into the plan, never a per-row registry call.
  *
  * Supported Avro shape: flat records of string/int/long/float/double/
  * boolean/bytes, with nullable `[null, T]` unions — a superset of the
  * reference's 3-field payload (FIXTURES.md §1).
  *
  * Expressions are `CodegenFallback`: decode cost is dominated by Avro
  * itself, and fallback keeps surrounding projections codegen'd.
  */
object ConfluentAvro {

  val MagicByte: Byte = 0x00

  /** Avro schema JSON for the reference's canonical 3-field record. */
  val eventSchemaJson: String =
    """{"type":"record","name":"Event","fields":[
      |{"name":"key","type":"string"},
      |{"name":"value","type":"string"},
      |{"name":"num","type":"int"}]}""".stripMargin

  private[codec] def parseSchema(json: String): Schema =
    new Schema.Parser().parse(json)

  private[codec] def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING => StringType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.toArray.map(_.asInstanceOf[Schema])
        .filter(_.getType != Schema.Type.NULL)
      require(nonNull.length == 1, s"only [null, T] unions supported: $s")
      sparkType(nonNull.head)
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  private[codec] def structTypeFor(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"need a record schema, got $schema")
    StructType(schema.getFields.toArray.map { f0 =>
      val f = f0.asInstanceOf[Schema.Field]
      val nullable = f.schema().getType == Schema.Type.UNION
      StructField(f.name(), sparkType(f.schema()), nullable)
    })
  }

  private def avroToCatalyst(v: Any): Any = v match {
    case null => null
    case u: Utf8 => UTF8String.fromString(u.toString)
    case s: String => UTF8String.fromString(s)
    case b: ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case other => other // Int, Long, Float, Double, Boolean
  }

  private def catalystToAvro(v: Any, s: Schema): Any = {
    val t = s.getType match {
      case Schema.Type.UNION =>
        s.getTypes.toArray.map(_.asInstanceOf[Schema])
          .find(_.getType != Schema.Type.NULL).get.getType
      case t0 => t0
    }
    v match {
      case null => null
      case u: UTF8String => u.toString
      case arr: Array[Byte] if t == Schema.Type.BYTES => ByteBuffer.wrap(arr)
      case other => other
    }
  }

  /** Strip the 5-byte Confluent header; throws on bad magic byte (the
    * reference's registry client does the same — such rows take the error
    * path, src/consumer.js:142-150; wrap in a try-guard upstream to route
    * them to a poison sink instead).
    */
  case class ConfluentStrip(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      require(bytes.length >= 5 && bytes(0) == MagicByte,
        s"not Confluent wire format (len=${bytes.length})")
      java.util.Arrays.copyOfRange(bytes, 5, bytes.length)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** The 4-byte big-endian schema id from the Confluent header. */
  case class ConfluentSchemaId(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      require(bytes.length >= 5 && bytes(0) == MagicByte, "not Confluent wire format")
      ByteBuffer.wrap(bytes, 1, 4).getInt
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Prepend the Confluent header (magic 0 + schema id BE) to a payload. */
  case class ConfluentWrap(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(schemaId: Any, payload: Any): Any = {
      val body = payload.asInstanceOf[Array[Byte]]
      val out = ByteBuffer.allocate(5 + body.length)
      out.put(MagicByte).putInt(schemaId.asInstanceOf[Int]).put(body)
      out.array()
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** Decode a bare Avro body into a struct (schema fixed at plan time).
    *
    * The Avro decoder and record are REUSED across rows (Avro's factory
    * supports reconfiguring a `BinaryDecoder` onto new bytes and
    * `GenericDatumReader.read` a previous record) — this is the hot loop
    * of the pipeline throughput path, and per-row decoder/record
    * allocation dominated it. State is ThreadLocal because local-mode
    * tasks can share one deserialized expression tree across threads.
    */
  case class AvroDecode(child: Expression, schemaJson: String)
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val schema = parseSchema(schemaJson)
    @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
    @transient private lazy val fields = schema.getFields
    @transient private lazy val state =
      new ThreadLocal[(Array[org.apache.avro.io.BinaryDecoder],
        Array[GenericRecord])]() {
        override def initialValue() =
          (new Array[org.apache.avro.io.BinaryDecoder](1), new Array[GenericRecord](1))
      }
    // lazy: dataType is read repeatedly during analysis — re-parsing the
    // schema JSON per call would allocate a Parser each time
    @transient override lazy val dataType: DataType = structTypeFor(schema)
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val (decHolder, recHolder) = state.get()
      val dec = DecoderFactory.get().binaryDecoder(bytes, decHolder(0))
      decHolder(0) = dec
      val rec = reader.read(recHolder(0), dec)
      recHolder(0) = rec
      val n = fields.size()
      val vals = new Array[Any](n)
      var i = 0
      while (i < n) { vals(i) = avroToCatalyst(rec.get(i)); i += 1 }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Encode a struct into a bare Avro body. Encoder, output buffer, and
    * record are reused per thread (see [[AvroDecode]]).
    */
  case class AvroEncode(child: Expression, schemaJson: String)
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val schema = parseSchema(schemaJson)
    @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
    @transient private lazy val state =
      new ThreadLocal[(ByteArrayOutputStream,
        Array[org.apache.avro.io.BinaryEncoder], GenericData.Record)]() {
        override def initialValue() =
          (new ByteArrayOutputStream(256),
            new Array[org.apache.avro.io.BinaryEncoder](1),
            new GenericData.Record(schema))
      }
    override def dataType: DataType = BinaryType
    private lazy val inputType = child.dataType.asInstanceOf[StructType]
    // Avro fields resolved to input-struct ordinals BY NAME, once: the
    // outgoing schema (e.g. from the registry) may order fields
    // differently from the struct, and positional mapping would silently
    // swap same-typed values (ProtoEncode already maps by name)
    @transient private lazy val fieldSources: Array[Int] = {
      val fs = schema.getFields
      Array.tabulate(fs.size()) { i =>
        val name = fs.get(i).name()
        require(inputType.fieldNames.contains(name),
          s"outgoing schema field '$name' missing from input struct " +
            s"(${inputType.fieldNames.mkString(", ")})")
        inputType.fieldIndex(name)
      }
    }
    override def nullSafeEval(input: Any): Any = {
      val row = input.asInstanceOf[InternalRow]
      val (bos, encHolder, rec) = state.get()
      val fields = schema.getFields
      var i = 0
      while (i < fields.size()) {
        val f = fields.get(i)
        val src = fieldSources(i)
        val v = if (row.isNullAt(src)) null
          else row.get(src, inputType(src).dataType)
        rec.put(i, catalystToAvro(v, f.schema()))
        i += 1
      }
      bos.reset()
      val enc = EncoderFactory.get().binaryEncoder(bos, encHolder(0))
      encHolder(0) = enc
      writer.write(rec, enc)
      enc.flush()
      bos.toByteArray
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Null-on-failure wrapper: evaluates the child, returns null if it
    * throws. The per-message decode guard of the reference consumer loop
    * (src/consumer.js:142-150 catches per message, counts
    * messages_error_total, and keeps consuming) — without it one poison
    * Kafka message kills the whole streaming query.
    */
  case class TryEval(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = true
    override def eval(input: InternalRow): Any =
      try child.eval(input)
      catch { case scala.util.control.NonFatal(_) => null }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // ---- Column-level API ----
  // Spark 4 Columns wrap ColumnNodes, not Expressions; the classic
  // bridge converts both ways.
  import org.apache.spark.sql.graft.Bridge.{column => toCol, expression => toExpr}

  /** value bytes in Confluent wire format → decoded struct column. */
  def fromConfluentAvro(value: Column, schemaJson: String): Column =
    toCol(AvroDecode(ConfluentStrip(toExpr(value)), schemaJson))

  /** Like [[fromConfluentAvro]] but null (instead of a query-killing
    * throw) for malformed messages — bad framing, bad magic byte,
    * truncated or corrupt Avro bodies.
    */
  def fromConfluentAvroSafe(value: Column, schemaJson: String): Column =
    toCol(TryEval(AvroDecode(ConfluentStrip(toExpr(value)), schemaJson)))

  /** struct column → Confluent wire format bytes with the given id. */
  def toConfluentAvro(payload: Column, schemaJson: String, schemaId: Int): Column =
    toCol(ConfluentWrap(toExpr(lit(schemaId)), AvroEncode(toExpr(payload), schemaJson)))

  def confluentSchemaId(value: Column): Column =
    toCol(ConfluentSchemaId(toExpr(value)))
}
