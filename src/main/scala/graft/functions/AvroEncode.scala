package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory

/**
 * Confluent-wire-format Avro encode — the write-side mirror of
 * [[AvroDecode]], for the reference's stats-topic serde distinction: the
 * stats sink produces plain Avro values while the other sinks are
 * string-rendered (reference `DeadLetterAnalyzerTopology.java:149-152`,
 * `DeadLetterAnalyzerApplication.java:63-66`). A static schema id stands in
 * for the registry-assigned one.
 *
 * Field values are bound positionally to the schema's field order; the
 * schema parses lazily per executor.
 */
final case class AvroEncode(schemaJson: String, schemaId: Int) extends Serializable {

  @transient private lazy val schema: Schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)

  def encode(values: Any*): Array[Byte] = {
    val record = new GenericData.Record(schema)
    values.zipWithIndex.foreach { case (v, i) =>
      record.put(schema.getFields.get(i).name(), v)
    }
    val body = new ByteArrayOutputStream()
    val enc = EncoderFactory.get.binaryEncoder(body, null)
    writer.write(record, enc)
    enc.flush()
    ByteBuffer.allocate(5 + body.size).put(0: Byte).putInt(schemaId)
      .put(body.toByteArray).array
  }
}

object AvroEncode {

  /** The stats sink's value schema (reference
    * `src/main/avro/sink/FullErrorStatistics.avsc`). */
  val FullErrorStatisticsSchema: String =
    """{"type":"record","name":"FullErrorStatistics","fields":[
      {"name":"count","type":"int"},
      {"name":"created","type":["null","string"],"default":null},
      {"name":"updated","type":["null","string"],"default":null},
      {"name":"topic","type":"string"},
      {"name":"type","type":"string"}]}"""

  /** Engine-assigned static schema id for FullErrorStatistics frames. */
  val FullErrorStatisticsId = 2
}
