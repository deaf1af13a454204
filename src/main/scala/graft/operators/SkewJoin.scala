package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utility: salted equi-join (SURVEY.md §7 "[EXT] at
  * 100 TB" risk list). When one join key carries a disproportionate share
  * of rows, a plain shuffle join lands that key's entire volume on one
  * task. Salting splits the hot key's left rows across `saltFactor`
  * sub-keys and replicates the matching right rows to every sub-key, so
  * the hot key's work spreads over `saltFactor` tasks.
  *
  * AQE's skew-join handles sort-merge skew at runtime, but only for
  * detected-at-shuffle skew; explicit salting is the deterministic tool
  * when skew is known (e.g. null-ish sentinel keys, power-law user ids).
  * Correctness is invariant: spec-tested equal to the unsalted join.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key`, with `left`'s rows
    * salted across `saltFactor` partitions per key. `right` must be the
    * smaller (replicated) side. */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val l = left.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
