package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** String scalar operators (SURVEY §2.7 X1-X11, §2.2 P4).
  *
  * All are pure Column expression chains — codegen'd by Tungsten, no UDFs —
  * so they stay inside whole-stage codegen at any scale.
  */
object StringOps {

  /** Slugify, reproducing the reference's repeated column normalization
    * chain (process_open_data.py:39-43, wp_export_data.py:52-65,
    * custom_search_extraction.py:102-104): é/è→e, à→a, then each of
    * space, apostrophe, colon, dash → '_'.
    */
  def slugify(s: String): String =
    s.replace("é", "e").replace("è", "e").replace("à", "a")
      .replaceAll("[ ':\\-]", "_")

  /** P4: rename every column through slugify. */
  def normalizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(slugify).toIndexedSeq: _*)

  /** Value-level slugify as an expression (same normalization applied to
    * cell values, e.g. URL-slug cleanup in get_similarity.py:130-141). */
  def slugifyCol(c: Column): Column =
    regexp_replace(translate(c, "éèà", "eea"), "[ ':\\-]", "_")

  /** Python str.capitalize (first char upper, rest lower) — deliberately
    * distinct from initcap (SURVEY §2.7 X6). */
  def capitalizeFirst(c: Column): Column =
    concat(upper(substring(c, 1, 1)), lower(c.substr(lit(2), length(c))))

  /** X11/U4 clean_image (update_open_data.py:32-47): keep the first image
    * of a comma-separated list, strip the file extension, keep the last
    * path segment, drop the random storage prefix up to the first dash.
    * (Deviation, documented: a dot-leading basename loses its whole name
    * to the extension strip; the reference's os.path.splitext keeps it.)
    */
  def cleanImage(c: Column): Column = {
    val first = substring_index(c, ",", 1)
    val noExt = regexp_replace(first, "\\.[^./]*$", "")
    val base = substring_index(noExt, "/", -1)
    regexp_replace(base, "^[^-]*-", "")
  }
}
