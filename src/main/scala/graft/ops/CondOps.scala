package graft.ops

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Conditional / mapping operators (SURVEY §2.7 C1-C7). */
object CondOps {

  /** C1: masked yes/no flag (process_open_data.py:184-186 and six other
    * sites — the reference's pervasive boolean encoding). */
  def flagYesNo(cond: Column): Column =
    when(cond, lit("yes")).otherwise(lit("no"))

  /** C2: 3-way score banding, preserving the reference's evaluation order
    * (exact-100 checked before >=70; null falls to the no-band —
    * get_similarity.py:185-188). */
  def band3(score: Column, exactLabel: String, midLabel: String,
            noLabel: String, mid: Int = 70): Column =
    when(score === 100, lit(exactLabel))
      .when(score >= mid, lit(midLabel))
      .otherwise(lit(noLabel))

  /** C4: dict-map lookup via a map literal; unmapped keys → null (the
    * reference's pandas .map NaN behavior, process_open_data.py:102-125).
    * For large dims use a broadcast join instead — this is for the
    * ≤hundreds-of-entries literal maps the reference embeds. */
  def mapLookup[K: TypeTag, V: TypeTag](m: Map[K, V], key: Column): Column =
    element_at(typedLit(m), key)

  /** The reference's postal-code → arrondissement map
    * (process_open_data.py:102-125, assos_validation_retreatment.py:112-135). */
  val arrondissementMap: Map[Int, String] =
    (1 to 20).map(i => (75000 + i) -> f"Paris $i%02d").toMap
}
