package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** JSON config readers mirroring the reference's config documents:
  * per-table entries (`cig_tables.json`: target_name, source, is_enabled,
  * columns) and the environment config (`ingestion_config.json`:
  * environments, ingestion_date, data folder). Uses the Jackson that
  * ships with Spark; parsing is driver-side (S2 — not a Spark job).
  *
  * Column type metadata (which the reference reflects from the target DB)
  * can be embedded as "name:type[:notnull]" suffixes, e.g.
  * "Amount:int", "Created:datetime", "Notes:text", "ID:str:notnull";
  * bare names default to nullable Str — matching how config-only
  * deployments run before a DB reflection pass.
  */
object JsonConfig {

  private val mapper = new ObjectMapper()

  def parseColumn(spec: String): ColumnMeta = spec.split(":") match {
    case Array(n)          => ColumnMeta(n)
    case Array(n, t)       => ColumnMeta(n, typeClass(t, spec))
    case Array(n, t, "notnull") =>
      ColumnMeta(n, typeClass(t, spec), nullable = false)
    case _ =>
      // a typo'd spec must not silently become a nullable Str — that
      // would skip the type-driven cleanups and write wrong data
      throw new IllegalArgumentException(s"bad column spec: '$spec'")
  }

  private def typeClass(t: String, spec: String): TypeClass = t match {
    case "int" | "bigint" => TypeClass.IntLike
    case "datetime"       => TypeClass.DateTime
    case "text"           => TypeClass.TextMax
    case "str"            => TypeClass.Str
    case _ =>
      throw new IllegalArgumentException(s"bad column type in spec: '$spec'")
  }

  /** Parse a tables JSON array: [{target_name, source, is_enabled,
    * columns: [..]}, ...]. Errors on missing/empty, like the reference
    * (`main.py:70-76`). */
  def parseTables(json: String): Seq[TableConfig] = {
    val root = mapper.readTree(json)
    require(root != null && root.isArray && root.size() > 0,
      "tables config is missing or empty")
    root.elements().asScala.map { n =>
      TableConfig(
        targetName = req(n, "target_name").asText(),
        source = req(n, "source").asText(),
        isEnabled = req(n, "is_enabled").asBoolean(),
        columns = req(n, "columns").elements().asScala
          .map(c => parseColumn(c.asText())).toSeq)
    }.toSeq
  }

  def parseIngestionConfig(json: String, tables: Seq[TableConfig]): IngestionConfig = {
    val root = mapper.readTree(json)
    IngestionConfig(
      environments = req(root, "environments").elements().asScala
        .map(_.asText()).toSeq,
      ingestionDate = java.time.LocalDate.parse(
        req(root, "ingestion_date").asText()),
      dataFolder = req(root, "data_folder").asText(),
      tables = tables)
  }

  private def req(n: JsonNode, field: String): JsonNode = {
    val v = n.get(field)
    require(v != null, s"missing config field: $field")
    v
  }
}
