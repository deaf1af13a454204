package graft.operators

import graft.SparkSpec

class LabelsSpec extends SparkSpec {
  import spark.implicits._

  test("majority vote picks the modal label; ties go to the smallest label") {
    val votes = Seq(
      (1L, "b"), (1L, "b"), (1L, "a"),            // clear winner b
      (2L, "z"), (2L, "a"),                        // tie -> a
      (3L, "only")                                 // singleton
    ).toDF("item", "label")
    val got = Labels.majorityVote(votes, "item", "label")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, "b", 2L, 3L),
      (2L, "a", 1L, 2L),
      (3L, "only", 1L, 1L)))
  }

  test("result is partition-invariant") {
    val votes = (1 to 500).map(i => ((i % 17).toLong, s"l${i % 5}"))
      .toDF("item", "label")
    val a = Labels.majorityVote(votes, "item", "label").collect().toSet
    val b = Labels.majorityVote(votes.repartition(11), "item", "label")
      .collect().toSet
    assert(a === b)
  }
}
