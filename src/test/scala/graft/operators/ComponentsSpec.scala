package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ComponentsSpec extends SparkSpec {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 10-node chain collapses to one component (multi-round propagation)") {
    // min label travels one hop per round — this exercises the loop, not
    // just the first join
    val got = cc((1L until 10L).map(i => (i, i + 1)))
    assert(got.keySet == (1L to 10L).toSet)
    assert(got.values.toSet == Set(1L))
  }

  test("disjoint components keep distinct canonical labels") {
    val got = cc(Seq((5L, 6L), (6L, 7L), (20L, 21L), (30L, 31L), (31L, 30L)))
    assert(got(5L) == 5L && got(6L) == 5L && got(7L) == 5L)
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got(30L) == 30L && got(31L) == 30L)
  }

  test("edge direction and duplicates don't matter") {
    val a = cc(Seq((2L, 1L), (3L, 2L), (3L, 1L), (1L, 3L)))
    assert(a == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("q66 groups every planted copy with its original") {
    val res = Components.q66DedupClusters(spark, sfDir).collect()
    assert(res.nonEmpty)
    val byComp = res.map(r => (r.getAs[Long]("component"),
      r.getAs[String]("members").split(",").map(_.toLong).toSet))
    byComp.foreach { case (comp, members) =>
      // canonical representative is the min member
      assert(comp == members.min)
      // transitive closure: a planted copy (id ≥ offset) is always in the
      // same component as its original
      members.filter(_ >= Components.PlantOffset).foreach { copy =>
        assert(members.contains(copy - Components.PlantOffset),
          s"copy $copy split from its original in component $comp")
      }
      assert(members.size >= 2)
    }
    // components are a partition: no doc in two components
    val all = byComp.flatMap(_._2)
    assert(all.length == all.distinct.length)
  }
  test("large-star/small-star equals hash-min on clique-ish graphs") {
    import spark.implicits._
    // several overlapping families + isolated pairs
    val edges = Seq((1L,2L),(2L,3L),(3L,1L),(10L,11L),(11L,12L),
      (20L,21L),(30L,31L),(31L,32L),(32L,33L),(33L,30L),(2L,10L))
      .toDF("a","b")
    val hm = Components.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lss = Components.connectedComponentsLSS(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lss == hm)
  }

  test("large-star/small-star converges on a 500-node chain in O(log^2 n)") {
    import spark.implicits._
    // a path graph: diameter 499 — hash-min would need ~499 rounds
    val chain = (1L until 500L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = Components.connectedComponentsLSS(chain, maxIters = 25)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 500)
    assert(comp.values.forall(_ == 1L), "single component rooted at the min")
  }
}
