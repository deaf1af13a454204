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

  test("trainScalable equals train on hand corpora (same greedy sequence)") {
    val v = vocab("low" -> 5L, "lower" -> 2L, "lowest" -> 1L,
      "slow" -> 3L, "glow" -> 1L)
    for (n <- Seq(1, 2, 3, 5, 8, 20)) {
      val seqSpark = Bpe.train(v, n)
      val seqMem = Bpe.trainScalable(v, n)
      assert(seqMem == seqSpark,
        s"n=$n: scalable $seqMem vs spark $seqSpark")
    }
  }

  test("trainScalable equals train on randomized corpora incl. repeat-heavy words") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val words = (1 to 12).map { _ =>
        val len = 1 + rnd.nextInt(7)
        // tiny alphabet forces heavy pair collisions, repeats, and the
        // overlapping-run greedy edge ("aaaa")
        (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString ->
          (1L + rnd.nextInt(9))
      }.groupBy(_._1).map { case (w, vs) => w -> vs.map(_._2).sum }.toSeq
      val v = vocab(words: _*)
      val seqSpark = Bpe.train(v, 10)
      val seqMem = Bpe.trainScalable(v, 10)
      assert(seqMem == seqSpark,
        s"trial $trial diverged:\n mem  $seqMem\n spark $seqSpark\n" +
          s" vocab $words")
    }
  }

  test("trainScalable handles a deep merge run without per-merge jobs") {
    // a vocabulary whose merge chain is long (hundreds of merges) —
    // the 32k-vocab path's shape at test scale; must complete fast and
    // produce a consistent artifact that encode can apply
    val words = (1 to 200).map(i =>
      ("w" + ("ab" * (1 + i % 6)) + i.toString.map(c =>
        ('a' + (c - '0')).toChar).mkString) -> (1L + i % 13))
    val v = vocab(words: _*)
    val merges = Bpe.trainScalable(v, 300)
    assert(merges.nonEmpty && merges.size <= 300)
    // well-formedness of the merge list: every merge's operands are
    // single characters or products of EARLIER merges (the invariant a
    // valid BPE artifact must satisfy for encode to be applicable)
    val built = scala.collection.mutable.Set.empty[String]
    merges.foreach { case (a, b, f) =>
      assert(f > 0)
      assert(a.length == 1 || built(a), s"operand $a not constructible")
      assert(b.length == 1 || built(b), s"operand $b not constructible")
      built += (a + b)
    }
    // and the artifact round-trips through encode on every word
    val docs = words.zipWithIndex
      .map { case ((w, _), i) => (i.toLong, w) }.toDF("id", "text")
    val perWord = Bpe.encodeScalable(docs, "text",
        merges.map(m => (m._1, m._2)))
      .select("id", "tokens").as[(Long, Seq[String])].collect()
    assert(perWord.length == words.length)
    perWord.foreach { case (i, toks) =>
      assert(toks.mkString == words(i.toInt)._1,
        "tokens must concatenate back to the word")
    }
  }

  test("trainScalable fails loudly when the vocabulary exceeds maxWords") {
    val v = vocab("aa" -> 1L, "bb" -> 1L, "cc" -> 1L)
    val ex = intercept[IllegalArgumentException] {
      Bpe.trainScalable(v, 2, maxWords = 2)
    }
    assert(ex.getMessage.contains("maxWords"))
  }
}
