package graft.functions

/**
 * The structural seam where the reference's `BruteForceSerde` consults a live
 * schema registry (`DeadLetterAnalyzerTopology.java:102-105`): resolve a
 * Confluent schema id to its Avro schema JSON.
 *
 * Implementations must be serializable — the provider ships inside the decode
 * UDF to executors, where [[AvroDecode]] caches the resolved+parsed schema
 * per id per executor, so a remote implementation pays one lookup per id per
 * executor, not per record. [[StaticSchemas]] is the default transport (ids
 * and schemas known at submit time, e.g. from `--avro-schema-files`); an HTTP
 * schema-registry client is a drop-in: implement [[schemaFor]] with the
 * registry's GET-schema-by-id call.
 */
trait SchemaProvider extends Serializable {

  /** Avro schema JSON for a registry id; None for unknown ids — the decode
    * chain then falls through to the non-Avro tiers. */
  def schemaFor(id: Int): Option[String]

  /** False when the provider can never resolve anything, letting plan
    * construction skip building the Avro decode tier entirely. */
  def isActive: Boolean
}

/** Static id→schema map — the default provider. */
final case class StaticSchemas(byId: Map[Int, String]) extends SchemaProvider {
  override def schemaFor(id: Int): Option[String] = byId.get(id)
  override def isActive: Boolean = byId.nonEmpty
}
