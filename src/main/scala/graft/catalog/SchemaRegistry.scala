package graft.catalog

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Schema registry: parses the BigQuery-JSON table-schema format the
  * reference declares its partitioned sinks with
  * (/root/reference/schema/custom_search.json etc., consumed by
  * create_from_schema_partition_table at
  * custom_search_extraction.py:41-42) into a Spark StructType.
  *
  * Format: `[{"name": ..., "type": STRING|FLOAT|INTEGER|DATE|TIMESTAMP|
  * BOOLEAN, "mode": NULLABLE|REQUIRED}, ...]`.
  */
object SchemaRegistry {

  private val typeMap: Map[String, DataType] = Map(
    "STRING" -> StringType,
    "FLOAT" -> DoubleType,
    "INTEGER" -> LongType,
    "DATE" -> DateType,
    "TIMESTAMP" -> TimestampType,
    "BOOLEAN" -> BooleanType)

  def fromJson(json: String): StructType = {
    val mapper = new ObjectMapper()
    val arr = mapper.readTree(json)
    require(arr.isArray, "schema JSON must be a top-level array")
    StructType(arr.elements().asScala.map { f =>
      val name = f.get("name").asText()
      val tpe = typeMap.getOrElse(f.get("type").asText().toUpperCase,
        throw new IllegalArgumentException(
          s"unsupported schema type for field $name"))
      val nullable =
        f.get("mode") == null || f.get("mode").asText() != "REQUIRED"
      StructField(name, tpe, nullable)
    }.toSeq)
  }

  def fromFile(path: String): StructType =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  /** Align a frame to a declared schema before a sink write: project to
    * declared columns in order, casting where needed (the reference's
    * write-with-schema behavior). */
  def align(df: org.apache.spark.sql.DataFrame,
            schema: StructType): org.apache.spark.sql.DataFrame =
    df.select(schema.fields.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType)
        .as(f.name)).toIndexedSeq: _*)
}
