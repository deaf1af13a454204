package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def vocab(ws: (String, Long)*) = ws.toDF("word", "freq")

  private def symsOf(df: org.apache.spark.sql.DataFrame) =
    df.as[(Seq[String], Long)].collect().toSet

  test("pairCounts weights adjacent pairs by word frequency") {
    val m = Bpe.pairCounts(Bpe.toSymbols(vocab("aba" -> 3L, "ab" -> 2L)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(m == Map(("a", "b") -> 5L, ("b", "a") -> 3L))
  }

  test("applyMerge is greedy left-to-right non-overlapping: aaa -> [aa, a]") {
    val out = symsOf(Bpe.applyMerge(
      Seq((Seq("a", "a", "a"), 1L)).toDF("syms", "freq"), "a", "a"))
    assert(out == Set((Seq("aa", "a"), 1L)))
  }

  test("applyMerge re-merges a just-merged symbol only at the next match") {
    // [ab,ab,ab,ab] under (ab,ab) -> [abab, abab]; odd count keeps a tail
    val out = symsOf(Bpe.applyMerge(
      Seq((Seq("ab", "ab", "ab", "ab"), 1L), (Seq("ab", "ab", "ab"), 1L))
        .toDF("syms", "freq"), "ab", "ab"))
    assert(out == Set((Seq("abab", "abab"), 1L), (Seq("abab", "ab"), 1L)))
  }

  test("applyMerge leaves non-matching words untouched") {
    val out = symsOf(Bpe.applyMerge(
      Seq((Seq("x", "y"), 7L)).toDF("syms", "freq"), "a", "b"))
    assert(out == Set((Seq("x", "y"), 7L)))
  }

  test("train learns the hand-computed merge sequence") {
    // corpus: "low" x5, "lower" x2 -> pairs: lo=7, ow=7, we=2, er=2
    // tie lo/ow broken by (a,b) asc -> first merge (l,o); second: (lo,w)=7
    val merges = Bpe.train(vocab("low" -> 5L, "lower" -> 2L), 2)
    assert(merges.map(m => (m._1, m._2)) == Seq(("l", "o"), ("lo", "w")))
    assert(merges.map(_._3) == Seq(7L, 7L))
  }

  test("train stops early when words are fully merged") {
    val merges = Bpe.train(vocab("ab" -> 1L), 5)
    assert(merges.map(m => (m._1, m._2)) == Seq(("a", "b")))
  }

  test("wordVocab lowercases and splits on non-letter runs") {
    val v = Bpe.wordVocab(Seq("Hello, WORLD! hello?").toDF("text"), "text")
      .as[(String, Long)].collect().toMap
    assert(v == Map("hello" -> 2L, "world" -> 1L))
  }

  test("encode applies merges in rank order; artifact roundtrips") {
    val docs = Seq((1L, "low lower")).toDF("id", "text")
    val merges = Bpe.train(Bpe.wordVocab(docs, "text"), 2)
      .map(m => (m._1, m._2))
    assert(merges == Seq(("l", "o"), ("lo", "w")))
    val toks = Bpe.encode(docs, "text", merges)
      .select("tokens").as[Seq[String]].head()
    assert(toks == Seq("low", "low", "e", "r"))
    val dir = java.nio.file.Files.createTempDirectory("bpe_").toString +
      "/merges"
    Bpe.saveMerges(spark, dir, Bpe.train(Bpe.wordVocab(docs, "text"), 2))
    val loaded = Bpe.loadMerges(spark, dir).map(m => (m._1, m._2))
    assert(loaded == merges)
  }

  test("encodeScalable equals the fold-based encode on a mixed corpus") {
    val docs = Seq((1L, "low lower lowest slow glow"),
      (2L, "Hello, WORLD! flow below")).toDF("id", "text")
    val merges = Bpe.train(Bpe.wordVocab(docs, "text"), 6)
      .map(m => (m._1, m._2))
    assert(merges.nonEmpty)
    val a = Bpe.encode(docs, "text", merges)
      .select("id", "tokens").as[(Long, Seq[String])].collect().toMap
    val b = Bpe.encodeScalable(docs, "text", merges)
      .select("id", "tokens").as[(Long, Seq[String])].collect().toMap
    assert(a == b, s"fold vs scalable diverged: $a vs $b")
  }
}
