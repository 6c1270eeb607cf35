package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Config file loading — the reference loads TOML
  * (reference: src/config/config.zig:172-182); the Spark build reads the
  * same shape as JSON (Jackson ships with Spark; zero extra deps):
  *
  * {{{
  * {
  *   "source": {"type": "postgres"},
  *   "sink":   {"type": "kafka"},
  *   "format": "json",
  *   "streams": [
  *     {"name": "users", "resource": "public.users",
  *      "operations": ["insert", "update", "delete"],
  *      "destination": "cdc.users", "routing_key": "id"}
  *   ]
  * }
  * }}}
  *
  * Loading normalizes resources (`t` → `public.t`) and lower-cases
  * operations, then validates — same pipeline as `Config.loadFromTomlFile` →
  * `normalizeResources` → `validate`.
  */
object ConfigLoader {

  final case class ConfigError(errors: Seq[String])
      extends RuntimeException(errors.mkString("invalid config: ", "; ", ""))

  def fromJsonText(text: String): EngineConfig = {
    val root = new ObjectMapper().readTree(text)
    def str(n: JsonNode, field: String, default: String = null): String = {
      val v = n.path(field)
      if (v.isMissingNode || v.isNull) {
        if (default != null) default
        else throw ConfigError(Seq(s"missing field: $field"))
      } else v.asText()
    }
    val streams = root.path("streams").elements().asScala.map { sn =>
      StreamDef(
        name = str(sn, "name"),
        resource = str(sn, "resource"),
        operations = sn.path("operations").elements().asScala.map(_.asText()).toSeq,
        destination = str(sn, "destination"),
        routingKey = str(sn, "routing_key", "id"))
    }.toSeq
    val pgNode = root.path("source").path("postgres")
    val postgres =
      if (pgNode.isMissingNode || pgNode.isNull) None
      else Some(PostgresSourceDef(
        connectionEnv = str(pgNode, "connection_env"),
        slotName = str(pgNode, "slot_name"),
        publicationName = str(pgNode, "publication_name"),
        queryTimeoutMs = {
          val v = pgNode.path("query_timeout_ms")
          if (v.isMissingNode || v.isNull) 30000 else v.asInt()
        }))
    val cfg = EngineConfig(
      sourceType = str(root.path("source"), "type", "postgres"),
      sinkType = str(root.path("sink"), "type", "kafka"),
      format = str(root, "format", "json"),
      streams = streams,
      postgres = postgres).normalized
    val errs = cfg.validate
    if (errs.nonEmpty) throw ConfigError(errs)
    cfg
  }

  def fromJsonFile(path: String): EngineConfig =
    fromJsonText(Files.readString(Paths.get(path)))
}
