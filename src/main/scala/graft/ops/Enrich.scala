package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StringType

/** Enrichment operator (SURVEY §2.8 U1-U3): per-row calls to an external
  * service, as a partition-batched map rather than a row UDF.
  *
  * `clientFactory` runs once per partition — the place to build a pooled
  * HTTP client with retry/rate-limit — instead of per row (a plain udf()
  * would re-create clients and hide failures; SURVEY §2.8). The input is
  * read from `in` and the service result appended as string column
  * `out`. Partition-preserving: no shuffle.
  */
object Enrich {
  def viaService(df: DataFrame, in: String, out: String)(
      clientFactory: () => String => String): DataFrame = {
    val schema = df.schema.add(out, StringType)
    val inIdx = df.schema.fieldIndex(in)
    df.mapPartitions { rows =>
      val client = clientFactory()
      rows.map { r =>
        val v = r.get(inIdx)
        Row.fromSeq(r.toSeq :+ client(if (v == null) null else v.toString))
      }
    }(Encoders.row(schema))
  }
}
