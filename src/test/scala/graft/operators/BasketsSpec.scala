package graft.operators

import graft.SparkSpec

class BasketsSpec extends SparkSpec {
  import spark.implicits._

  test("pairLift: hand-computed lifts rank rare-but-together above popular") {
    // baskets: {x,y} {x,y} {x,z} {w,z}; N=4
    // counts: x=3 y=2 z=2 w=1; pairs: xy=2 xz=1 wz=1
    // lift xy = 2*4/(3*2)=1.333; xz = 4/(3*2)=0.667; wz = 4/(1*2)=2.0
    val rows = Seq(
      (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "w"), (4L, "z")
    ).toDF("bk", "it")
    val got = Baskets.pairLift(rows, "bk", "it", minCount = 1, k = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1, "w", "z", 1L, 1L, 2L),
      (2, "x", "y", 2L, 3L, 2L),
      (3, "x", "z", 1L, 3L, 2L)))
  }

  test("pairLift: repeated item rows dedupe; min-support prunes; cap drops mega-baskets") {
    // basket 1 lists x twice — co-occurrence must count the BASKET once
    val dup = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
      .toDF("bk", "it")
    val d = Baskets.pairLift(dup, "bk", "it", minCount = 1, k = 10)
      .collect()
    assert(d.length == 1 && d.head.getLong(3) == 2L &&
      d.head.getLong(4) == 2L, "dup rows must not inflate c12 or c_x")
    // min-support: the pair appears once, threshold 2 -> empty
    val rare = Seq((1L, "a"), (1L, "b")).toDF("bk", "it")
    assert(Baskets.pairLift(rare, "bk", "it", minCount = 2, k = 10)
      .isEmpty)
    // a basket over the cap contributes nothing (its pairs AND its
    // marginal mass vanish together — the capped world stays consistent)
    val mega = Seq((1L, "a"), (1L, "b"), (1L, "c"), // size 3 > cap 2
      (2L, "a"), (2L, "b")).toDF("bk", "it")
    val capped = Baskets.pairLift(mega, "bk", "it", minCount = 1, k = 10,
      maxBasket = 2).collect()
    assert(capped.length == 1)
    val r = capped.head
    assert((r.getString(1), r.getString(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ("a", "b", 1L, 1L, 1L))
  }

  test("setOverlap: exact intersections, disjoint groups emit no row") {
    // A={1,2,3} B={2,3,4} C={9}: (A,B) inter 2, jaccard 2/4; C disjoint
    val rows = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 3L), // dup el
      ("B", 2L), ("B", 3L), ("B", 4L), ("C", 9L)).toDF("g", "el")
    val got = Baskets.setOverlap(rows, "g", "el").collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ("A", "B", 2L, 3L, 3L))
    assert(r.getDouble(5) == 0.5)
  }

  test("tripleSupport: A-priori pruning equals the naive three-way count") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit}
    val rows = (1 to 200).flatMap { b =>
      (0 until 1 + b % 5).map(i => (b.toLong, ((b * 7 + i * 3) % 11).toLong))
    }
    val df = rows.toDF("bk", "it")
    val pruned = Baskets.tripleSupport(df, "bk", "it", minCount = 2, k = 10000)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val items = df.distinct()
    val naive = items.as("a")
      .join(items.as("b"), col("a.bk") === col("b.bk")
        && col("a.it") < col("b.it"))
      .join(items.as("c"), col("b.bk") === col("c.bk")
        && col("b.it") < col("c.it"))
      .groupBy(col("a.it").as("pa"), col("b.it").as("pb"),
        col("c.it").as("pc"))
      .agg(count(lit(1)).as("c123")).filter(col("c123") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(pruned == naive && naive.nonEmpty)
  }

  test("tripleSupport: maxBasket cap is a contract — mega-basket excluded") {
    import spark.implicits._
    // basket 1 has 4 distinct items (> cap 3) and would alone make
    // (10,20,30) frequent; baskets 2 and 3 supply an in-cap triple
    val rows = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L), (1L, 40L),
      (2L, 10L), (2L, 20L), (2L, 50L),
      (3L, 10L), (3L, 20L), (3L, 50L))
    val got = Baskets.tripleSupport(rows.toDF("bk", "it"), "bk", "it",
        minCount = 1, k = 100, maxBasket = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == Set((10L, 20L, 50L, 2L)),
      "capped basket must contribute no triples on either engine")
  }
}
