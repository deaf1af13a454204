package graft.operators

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {

  test("bm25TopK matches an independent driver-side reference") {
    val terms = Seq("spark", "merge", "window")
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val dls = docs.map { case (id, t) =>
      id -> t.split(" ", -1).length.toDouble }.toMap
    val n = docs.length.toDouble
    val avgdl = dls.values.sum / n
    val tf = docs.flatMap { case (id, t) =>
      t.split(" ", -1).filter(terms.contains).groupBy(identity)
        .map { case (tok, hits) => ((id, tok), hits.length.toDouble) }
    }.toMap
    val dfc = terms.map(t =>
      t -> tf.keysIterator.count(_._2 == t).toDouble).toMap
    def score(id: Long): Double =
      // left-to-right over the literal term order — the operator's (and
      // the oracle's) exact float association
      terms.foldLeft(0.0d) { (acc, t) =>
        acc + tf.get((id, t)).fold(0.0d) { f =>
          val idf = math.log(1.0 + (n - dfc(t) + 0.5) / (dfc(t) + 0.5))
          idf * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dls(id) / avgdl))
        }
      }
    val expected = docs.map(_._1)
      .sortBy(id => (-score(id), id)).take(15).zipWithIndex
      .map { case (id, i) => (i + 1, id) }.toSeq
    val got = TextAnalysis
      .bm25TopK(graft.Tables.load(spark, sfDir, "documents"), terms, 15)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    assert(got == expected)
  }

  test("bm25 semantics on a hand corpus: tf, idf rarity, length norm") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare rare common filler filler filler filler filler"),
      (2L, "rare common filler filler filler filler filler filler"),
      (3L, "rare common"), // same tf as 2 but much shorter → outranks 2
      (4L, "common filler"),
      (5L, "filler filler filler filler")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, Seq("rare", "common"), 5)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toList
    // 3: rare+common in a 2-token doc; 1: double tf of the rarer term;
    // 2: single hits in a long doc; 4: only the common term; 5: no hits
    // → not retrieved at all (standard BM25: no matching term, no row)
    assert(got == List((1, 3L), (2, 1L), (3, 2L), (4, 4L)))
  }

  test("unigramSurprisal ranks rare-token docs as most surprising") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z"), // singleton tokens → most surprising
      (2L, "a a b b"),
      (3L, "a b a b"), // same multiset as 2 → identical score, id break
      (4L, "a a a b")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisal(docs, 4)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toList
    // p(a)=7+1/.., p(b)=5+1.. over total 15 tokens + V=5: doc1's mean
    // ln p is the lowest; docs 2 and 3 tie exactly; doc4 leans on the
    // most common token so it is the least surprising
    assert(got == List((1, 1L), (2, 2L), (3, 3L), (4, 4L)))
  }

  test("unigramSurprisal is partitioning-invariant (ordered fold)") {
    val d = graft.Tables.load(spark, sfDir, "documents")
    val a = TextAnalysis.unigramSurprisal(d.repartition(1), 20)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    val b = TextAnalysis.unigramSurprisal(d.repartition(13), 20)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(a == b)
  }

  test("bigramSurprisal flags scrambled word ORDER that unigrams cannot see") {
    import spark.implicits._
    // docs 1 and 2 have the SAME token multiset — identical unigram
    // score — but doc 2's transitions never occur elsewhere in the
    // corpus while doc 1's dominate it. Only the bigram model separates
    // them, and it must put the scrambled doc first (most surprising).
    val docs = Seq(
      (1L, "a b a b a b a b"),
      (2L, "b b a a b a b a"),
      (3L, "a b a b a b"),
      (4L, "a b a b")
    ).toDF("doc_id", "text")
    val uni = TextAnalysis.unigramSurprisal(docs, 4)
      .collect().map(r => (r.getLong(1), r.getInt(0))).toMap
    assert(uni(1L) < uni(2L),
      "unigram ties break by doc_id — order damage is invisible to it")
    val bi = TextAnalysis.bigramSurprisal(docs, 4)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toList
    assert(bi.head._2 == 2L,
      s"the scrambled doc must rank most surprising, got $bi")
  }

  test("bigramSurprisal is partitioning-invariant (ordered fold)") {
    val d = graft.Tables.load(spark, sfDir, "documents")
    val a = TextAnalysis.bigramSurprisal(d.repartition(1), 20)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    val b = TextAnalysis.bigramSurprisal(d.repartition(13), 20)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(a == b)
  }

  test("knBigramModel: hand-computed discounted-backoff probabilities") {
    import spark.implicits._
    // corpus "a b a b": c12 = {(a,b):2, (b,a):1}; c1(a)=2, c1(b)=1;
    // N1+(a,·)=N1+(b,·)=1; N1+(·,a)=N1+(·,b)=1; B=2
    val bg = TextAnalysis.bigramRows(Seq((1L, "a b a b")).toDF("doc_id", "text"))
    val m = TextAnalysis.knBigramModel(bg, 0.75).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val pba = math.exp(m(("a", "b"))) // p(b|a) = (2-.75)/2 + (.75*1/2)*(1/2)
    val pab = math.exp(m(("b", "a"))) // p(a|b) = (1-.75)/1 + (.75*1/1)*(1/2)
    assert(math.abs(pba - 0.8125) < 1e-12, s"p(b|a)=$pba")
    assert(math.abs(pab - 0.625) < 1e-12, s"p(a|b)=$pab")
  }

  test("knBigramSurprisal: continuation novelty separates what add-one cannot") {
    import spark.implicits._
    // 'f' and 'g' are equally frequent, but f follows ONE context while
    // g follows many: under KN the backoff mass for f is smaller, so the
    // equally-unseen-context transitions "x f" and "x g" (both c12=1,
    // same c1(x), same discount term) differ ONLY via N1+(·,t2) — the
    // doc stepping into f must rank more surprising than the one
    // stepping into g.
    val docs = Seq(
      (1L, "s f s f s f"),
      (2L, "a g b g c g"),
      (5L, "x f"),
      (6L, "x g")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.knBigramSurprisal(docs, 4)
      .collect().map(r => (r.getLong(1), r.getInt(0))).toMap
    assert(got(5L) < got(6L),
      s"doc 'x f' must outrank doc 'x g' in surprisal, got $got")
  }

  test("knBigramSurprisal is partitioning-invariant (ordered fold)") {
    val d = graft.Tables.load(spark, sfDir, "documents")
    val a = TextAnalysis.knBigramSurprisal(d.repartition(1), 20)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    val b = TextAnalysis.knBigramSurprisal(d.repartition(13), 20)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(a == b)
  }
}
