package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Label aggregation: per-item majority vote over repeated
  * observations — the reduction step for crowd/preference-label data
  * (N annotators per item → one training label) and for any
  * "modal value per key" profile question.
  *
  * Scale shape: one shuffle-on-(item,label) count, then the per-item
  * argmax runs in a window PARTITIONED BY item — each window task holds
  * one item's distinct labels (bounded by the label vocabulary, not the
  * corpus), never a global sort. Deterministic tie-break: higher count
  * first, then lexicographically smallest label — a total order, so the
  * winner is partition-invariant.
  */
object Labels {

  /** One row per item: (item, label, votes, total_votes, vote_share). */
  def majorityVote(df: DataFrame, item: String, label: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(item), col(label))
      .agg(count(lit(1)).as("votes"))
    val byItem = Window.partitionBy(col(item))
    val pick = Window.partitionBy(col(item))
      .orderBy(col("votes").desc, col(label).asc)
    counts
      .withColumn("total_votes", sum(col("votes")).over(byItem))
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col(item), col(label), col("votes"), col("total_votes"))
  }

  // ---------------------------------------------------------------------
  // q126_majority_label — modal event_type per user over the event
  // stream (the "dominant behavior" profile). Vote share stays
  // rational-exact as (votes, total_votes) ints; no float leaves the
  // operator.
  // ---------------------------------------------------------------------
  def q126MajorityLabel(s: SparkSession, dir: String): DataFrame =
    majorityVote(t(s, dir, "events"), "user_id", "event_type")

  val q126MajorityLabelSql: String =
    """WITH counts AS (
      |  SELECT user_id, event_type, COUNT(*) AS votes
      |  FROM events GROUP BY user_id, event_type),
      |ranked AS (
      |  SELECT user_id, event_type, votes,
      |    SUM(votes) OVER (PARTITION BY user_id) AS total_votes,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY votes DESC, event_type ASC) AS rn
      |  FROM counts)
      |SELECT user_id, event_type, votes,
      |  CAST(total_votes AS BIGINT) AS total_votes
      |FROM ranked WHERE rn = 1""".stripMargin
}
