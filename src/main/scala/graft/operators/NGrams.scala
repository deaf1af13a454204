package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The one n-gram pipeline every gram-consuming operator (Jaccard dedup,
  * MinHash, SimHash, decontamination, repetition) builds on: posexplode
  * words, optionally project each word ONCE (e.g. hash it), combine with
  * the next n-1 via window `lead`.
  *
  * This shape exists for a measured reason (NOTES.md invariant 5): the
  * "obvious" array-lambda formulation — `transform(sequence(...), i =>
  * f(w[i], w[i+1], ...))` over a split column — re-inlines the array
  * subtree per lambda reference (Catalyst doesn't CSE across lambda
  * boundaries) and measured 3.5× slower at sf0.1 even in its best
  * materialized-attribute form. Here every word is produced exactly once,
  * everything before the window shuffle is streaming whole-stage codegen,
  * and the one shuffle (by doc_id) is shared by all downstream consumers.
  */
object NGrams {

  /** One row per (doc_id, gram) where gram = `combine(first, lead1, ...,
    * lead_{n-1})`; positions with fewer than n following words emit
    * nothing. `wordProj` runs once per word BEFORE gram assembly — pass
    * e.g. `xxhash64(_)` so each word is hashed once, not once per gram. */
  def nGramRows(docs: DataFrame, n: Int,
      wordProj: Column => Column = identity)(
      combine: Seq[Column] => Column): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val base = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos"), wordProj(col("word")).as("w0"))
    val leadCols = (1 until n).map(k => lead(col("w0"), k).over(w).as(s"w$k"))
    base
      .select(col("doc_id") +: col("w0") +: leadCols: _*)
      .filter(col(s"w${n - 1}").isNotNull)
      .select(col("doc_id"),
        combine((0 until n).map(k => col(s"w$k"))).as("s"))
  }
}
