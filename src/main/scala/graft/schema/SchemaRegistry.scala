package graft.schema

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.StructType

object SchemaRegistry {
  sealed trait TopicSchema {
    def valueType: StructType
    /** Validation predicate over a JSON-string value column. */
    def isValid(value: Column): Column
  }
  final case class JsonTopic(compiled: JsonSchema.Compiled) extends TopicSchema {
    def valueType: StructType = compiled.schema
    def isValid(value: Column): Column = compiled.isValid(value)
  }
  final case class AvroTopic(avsc: String, struct: StructType) extends TopicSchema {
    def valueType: StructType = struct
    // structural validation happens at decode (AvroDecoder yields null for
    // undecodable payloads; the produce path counts those as INVALID_RECORD)
    def isValid(value: Column): Column = lit(true)
  }
  final case class ProtoTopic(text: String, parsed: ProtoSchema.Parsed,
                              valueMessage: String) extends TopicSchema {
    def valueType: StructType = parsed.toStructType(valueMessage)
    // structural validation happens at decode (ProtoSchema.decodeColumn
    // yields null for undecodable payloads, counted as INVALID_RECORD)
    def isValid(value: Column): Column = lit(true)
  }
}

/** Schema registry: per-topic schema files `<topic>.{avsc,json,proto}`
  * looked up in a directory, with a TTL cache.
  *
  * Reference: `nisshi-schema/src/lib.rs:491-570` (file/S3 registry with
  * TTL cache); `docs/schema-registry.md:14-18`. Every schema exposes
  * optional top-level `key` and `value` fields; the broker injects a
  * `meta` struct (see [[graft.lake.Lake.withMeta]]).
  *
  * Proto topics use [[ProtoSchema]]'s runtime-free parser and recursive
  * wire codec: the payload is decoded distributed (nested / repeated /
  * map subset) and materialized typed, like Avro topics.
  */
final class SchemaRegistry(root: String, ttlMillis: Long = 60000,
                           clock: () => Long = () => System.currentTimeMillis()) {
  import SchemaRegistry._

  private case class Entry(schema: Either[Throwable, Option[TopicSchema]],
                           loadedAt: Long)
  private val cache = scala.collection.concurrent.TrieMap.empty[String, Entry]

  /** Look up `<topic>.{json,avsc,proto}` (same precedence as the
    * reference's registry scan). None = schemaless topic. A MALFORMED
    * schema file still throws (the topic is misconfigured, not
    * schemaless — silently accepting everything would be worse), but
    * the failure is CACHED for the TTL like a success: without that,
    * every produce re-reads and re-parses the broken file in a hot
    * crash loop.
    */
  def lookup(topic: String): Option[TopicSchema] = {
    val entry =
      cache.get(topic).filter(e => clock() - e.loadedAt < ttlMillis)
        .getOrElse {
          val loaded =
            try Right(load(topic))
            catch { case scala.util.control.NonFatal(e) => Left(e) }
          val fresh = Entry(loaded, clock())
          cache.put(topic, fresh)
          fresh
        }
    entry.schema match {
      case Right(s) => s
      case Left(e) => throw new IllegalArgumentException(
        s"schema for topic '$topic' failed to load: ${e.getMessage}", e)
    }
  }

  private def read(p: Path): String = new String(Files.readAllBytes(p), "UTF-8")

  private def load(topic: String): Option[TopicSchema] = {
    val json = Paths.get(root, s"$topic.json")
    val avsc = Paths.get(root, s"$topic.avsc")
    val proto = Paths.get(root, s"$topic.proto")
    if (Files.exists(json)) Some(JsonTopic(JsonSchema.compile(read(json))))
    else if (Files.exists(avsc)) {
      val text = read(avsc)
      Some(AvroTopic(text, AvroSchemas.toStructType(text)))
    }
    else if (Files.exists(proto)) {
      val text = read(proto)
      val parsed = ProtoSchema.parse(text)
      // reference convention: the analytic payload is the `Value` message
      // (`etc/schema/taxi.proto`); fall back to the sole message
      val valueMsg =
        if (parsed.messages.contains("Value")) "Value"
        else if (parsed.messages.size == 1) parsed.messages.keys.head
        else throw new IllegalArgumentException(
          s"proto schema for '$topic' has no Value message")
      Some(ProtoTopic(text, parsed, valueMsg))
    }
    else None
  }

  def invalidate(topic: String): Unit = cache.remove(topic)
}
