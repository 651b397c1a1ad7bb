/*
 * Vendored completion of Spark's native Avro column functions for this
 * distribution's packaging gap (see graft/streaming/StreamingUniqueUsers
 * .scala: the bundled spark-sql jar ships the ENTIRE Avro connector —
 * AvroDeserializer, AvroSerializer, SchemaConverters, AvroOptions — but
 * omits the two thin Catalyst expression classes that `from_avro` /
 * `to_avro` resolve to by reflection; `org.apache.spark.sql.catalyst
 * .expressions.FromAvro#replacement` looks up
 * "org.apache.spark.sql.avro.AvroDataToCatalyst" by name and raises
 * AVRO_NOT_LOADED when absent).
 *
 * These are fresh implementations against the PUBLIC Apache Spark 4.x
 * API surface (constructor shapes fixed by FromAvro/ToAvro's reflective
 * call sites; behavior contract from the public spark-avro docs:
 * https://spark.apache.org/docs/latest/sql-data-sources-avro.html),
 * delegating all real conversion work to the bundled connector classes.
 * They live in `org.apache.spark.sql.avro` because that is the exact
 * class name the catalyst expressions reflect on — and it grants the
 * `private[sql]` access the bundled helpers require.
 */
package org.apache.spark.sql.avro

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.GenericDatumReader
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}

import org.apache.spark.SparkException
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, SpecificInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.{FailFastMode, ParseMode, PermissiveMode}
import org.apache.spark.sql.types._

/** Binary Avro wire bytes → Catalyst value of the schema's SQL type.
  *
  * `mode` option: PERMISSIVE (undecodable payload → all-null row) or
  * FAILFAST (default — throw, naming the record and the escape hatch).
  * Decoder/reader instances are reused across rows (expression instances
  * are per-task, same lifecycle the per-partition mapPartitions serde
  * gave us, without leaving whole-stage codegen).
  */
case class AvroDataToCatalyst(
    child: Expression,
    jsonFormatSchema: String,
    options: Map[String, String])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  override lazy val dataType: DataType = {
    val dt = SchemaConverters.toSqlType(
      avroSchema, avroOptions.useStableIdForUnionType,
      avroOptions.stableIdPrefixForUnionType,
      avroOptions.recursiveFieldMaxDepth).dataType
    parseMode match {
      // PERMISSIVE emits all-null rows for corrupt records, so every
      // column must read as nullable regardless of the Avro schema
      case PermissiveMode => dt.asNullable
      case _ => dt
    }
  }

  override def nullable: Boolean = true

  @transient private lazy val avroOptions = AvroOptions(options)

  @transient private lazy val avroSchema: Schema =
    new Schema.Parser().setValidateDefaults(false).parse(jsonFormatSchema)

  /** Schema evolution (the public connector's SPARK-27506 contract): the
    * `actualSchema` option carries the WRITER's schema when it differs
    * from `jsonFormatSchema` (the READER's schema the result conforms
    * to) — Avro schema resolution then fills added-with-default fields
    * and drops removed ones during decode. Absent the option, writer ==
    * reader, the original single-schema behavior. */
  @transient private lazy val writerSchema: Schema =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase("actualSchema") => v }
      .map(new Schema.Parser().setValidateDefaults(false).parse)
      .getOrElse(avroSchema)

  @transient private lazy val reader = new GenericDatumReader[Any](writerSchema, avroSchema)

  @transient private lazy val deserializer = new AvroDeserializer(
    avroSchema, dataType,
    avroOptions.datetimeRebaseModeInRead,
    avroOptions.useStableIdForUnionType,
    avroOptions.stableIdPrefixForUnionType,
    avroOptions.recursiveFieldMaxDepth)

  @transient private var decoder: BinaryDecoder = _
  @transient private var reused: Any = _

  @transient private lazy val parseMode: ParseMode = avroOptions.parseMode match {
    case PermissiveMode => PermissiveMode
    case FailFastMode => FailFastMode
    case other => // match the public connector: DROPMALFORMED has no
      // per-row shape to emit from a scalar expression — loud, not coerced
      throw new IllegalArgumentException(
        s"from_avro supports mode PERMISSIVE or FAILFAST, got ${other.name}")
  }

  @transient private lazy val nullResultRow: Any = dataType match {
    case st: StructType =>
      val row = new SpecificInternalRow(st.map(_.dataType))
      var i = 0
      while (i < st.length) { row.setNullAt(i); i += 1 }
      row
    case _ => null
  }

  override def nullSafeEval(input: Any): Any = {
    val binary = input.asInstanceOf[Array[Byte]]
    try {
      decoder = DecoderFactory.get().binaryDecoder(binary, 0, binary.length, decoder)
      reused = reader.read(reused, decoder)
      deserializer.deserialize(reused).getOrElse(null)
    } catch {
      case scala.util.control.NonFatal(e) => parseMode match {
        case PermissiveMode => nullResultRow
        case _ => throw new SparkException(
          "Malformed Avro record detected in from_avro (mode FAILFAST). " +
            "Set option \"mode\" to \"PERMISSIVE\" to emit null rows instead.", e)
      }
    }
  }

  override def prettyName: String = "from_avro"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("this", this)
    nullSafeCodeGen(ctx, ev, input => {
      val out = ctx.freshName("avroOut")
      s"""
         |Object $out = $expr.nullSafeEval($input);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (${CodeGenerator.boxedType(dataType)}) $out; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDataToCatalyst =
    copy(child = newChild)
}

/** Catalyst value → binary Avro wire bytes (single-record form, no
  * container framing — what a Kafka producer puts on a topic). With no
  * explicit schema, the child's Catalyst type converts via
  * `SchemaConverters.toAvroType`. */
case class CatalystDataToAvro(
    child: Expression,
    jsonFormatSchema: Option[String])
  extends UnaryExpression {

  override def dataType: DataType = BinaryType

  @transient private lazy val avroType: Schema =
    jsonFormatSchema
      .map(new Schema.Parser().setValidateDefaults(false).parse)
      .getOrElse(SchemaConverters.toAvroType(child.dataType, child.nullable))

  @transient private lazy val serializer =
    new AvroSerializer(child.dataType, avroType, child.nullable)

  @transient private lazy val writer =
    new org.apache.avro.generic.GenericDatumWriter[Any](avroType)

  @transient private var encoder: BinaryEncoder = _
  @transient private lazy val out = new ByteArrayOutputStream

  override def nullSafeEval(input: Any): Any = {
    out.reset()
    encoder = EncoderFactory.get().directBinaryEncoder(out, encoder)
    writer.write(serializer.serialize(input), encoder)
    encoder.flush()
    out.toByteArray
  }

  override def prettyName: String = "to_avro"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("this", this)
    defineCodeGen(ctx, ev, input => s"(byte[]) $expr.nullSafeEval($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): CatalystDataToAvro =
    copy(child = newChild)
}
