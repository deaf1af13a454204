package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Distributed BPE (byte-pair-encoding) vocabulary learning —
  * the tokenizer-training step of an LLM data pipeline (Sennrich et
  * al., ACL 2016), re-expressed in the shape that scales: after ONE
  * corpus-sized word-count shuffle, every merge iteration runs on the
  * DISTINCT-WORD table (vocabulary-sized — thousands of rows for a
  * 100 TB corpus, weighted by word frequency), so training cost is
  * O(corpus) + nMerges × O(|vocab|), not nMerges × O(corpus). That is
  * exactly how production BPE trainers (SentencePiece/HF tokenizers)
  * structure the work; the driver loop holds only the single best pair
  * per iteration (one 1-row collect), never data.
  *
  * Simplification vs Sennrich: no end-of-word sentinel symbol — merges
  * can span the whole word but not cross words (the oracle mirrors the
  * same convention). Symbols are strings, so the machinery is agnostic
  * to whether the alphabet is characters or bytes.
  */
object Bpe {

  /** Corpus → weighted word vocabulary: lowercase, split on non-letter
    * runs, count. The ONLY corpus-sized pass in BPE training. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Vocabulary → per-word symbol arrays (initially characters). */
  def toSymbols(vocab: DataFrame): DataFrame =
    vocab.select(split(col("word"), "").as("syms"), col("freq"))

  /** Adjacent-pair statistics over the symbolized vocabulary: each
    * occurrence of (a, b) adjacent in a word contributes that word's
    * corpus frequency. Vocabulary-sized explode (Σ word lengths over
    * DISTINCT words), one aggregation — the per-iteration cost of BPE
    * training. */
  def pairCounts(syms: DataFrame): DataFrame =
    syms
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(
        transform(sequence(lit(1), size(col("syms")) - 1), i =>
          struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("pair_freq"))

  /** Apply ONE merge (a, b) → a+b to every word, greedy left-to-right
    * non-overlapping (the BPE contract: "aaa" under merge (a,a) becomes
    * ["aa","a"], not ["aa","aa"]). A pure array fold per word — map-only,
    * no shuffle. The fold needs no "just merged" flag: after a merge the
    * stack top is a+b, which can never textually equal a (b is
    * non-empty), so accidental chain-merges cannot happen within one
    * application. */
  def applyMerge(syms: DataFrame, a: String, b: String): DataFrame = {
    val merged = a + b
    syms.select(
      aggregate(col("syms"),
        array().cast("array<string>"),
        (acc, x) => when(
          size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
          .otherwise(concat(acc, array(x)))).as("syms"),
      col("freq"))
  }

  /** Learned merge list after `nMerges` iterations: each iteration
    * takes the highest-frequency adjacent pair (ties broken by (a, b)
    * ascending — deterministic), merges it everywhere, repeats. Driver
    * holds one (a, b, freq) row per iteration; per-word state lives in
    * the vocabulary DataFrame (localCheckpoint per iteration truncates
    * the growing fold lineage, the Components/PageRank discipline).
    * Stops early when no pair remains. */
  def train(vocab: DataFrame, nMerges: Int): Seq[(String, String, Long)] = {
    var syms = toSymbols(vocab).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to nMerges if !done) {
      val top = pairCounts(syms)
        .orderBy(col("pair_freq").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val r = top(0)
        val (a, b) = (r.getString(0), r.getString(1))
        merges += ((a, b, r.getLong(2)))
        syms = applyMerge(syms, a, b).localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Learned merge list at PRODUCTION vocabulary sizes (32k+ merges) —
    * bit-identical to [[train]] (spec-proved: same greedy sequence,
    * same (freq desc, pair asc) tie-break), with the per-merge Spark
    * job replaced by driver-side incremental pair-count maintenance.
    *
    * Why not run [[train]] for 32k merges: each iteration is 2 Spark
    * jobs (pair count + top-1 collect) — a real vocabulary is ~64k
    * SEQUENTIAL driver round-trips of pure scheduling latency over a
    * vocabulary-sized table. And why not batch top-k merges per
    * recount: batched greedy is NOT order-equivalent — applying the
    * top merge can CREATE a pair (x, a+b) whose count exceeds the
    * precomputed #2 (every occurrence of the merged symbol can carry a
    * new neighbor), so the true sequential trainer would pick the new
    * pair first; symbol-disjointness does not close that hazard.
    *
    * The scalable shape is the one production trainers
    * (SentencePiece, HF tokenizers) use: ONE corpus-sized shuffle
    * builds the weighted distinct-word vocabulary (corpus-size-
    * INDEPENDENT: heavy-tailed, ~10^6 rows · ~10 bytes regardless of
    * corpus bytes — the same bounded-driver-load class as k-means
    * centroids or PQ codebooks), then the merge loop runs in memory:
    * a TreeSet keyed (freq desc, a asc, b asc) gives the arg-max in
    * O(log); applying a merge touches ONLY the words containing the
    * pair (inverted index) and re-derives their pair deltas — total
    * cost nMerges × O(affected words), zero Spark jobs after the
    * shuffle. `maxWords` is the loud-failure guard on the collect
    * (never silently truncate a vocabulary). */
  def trainScalable(vocab: DataFrame, nMerges: Int,
      maxWords: Int = 5000000): Seq[(String, String, Long)] = {
    val rows = vocab.select(col("word"), col("freq"))
      .limit(maxWords + 1).collect()
    require(rows.length <= maxWords,
      s"vocabulary exceeds maxWords=$maxWords — raise the cap " +
        "(the collect is vocabulary-bounded, not corpus-bounded)")
    val words: Array[Array[String]] =
      rows.map(_.getString(0).split(""))
    val freqs: Array[Long] = rows.map(_.getLong(1))

    type Pair = (String, String)
    val counts = scala.collection.mutable.HashMap.empty[Pair, Long]
    val where = scala.collection.mutable
      .HashMap.empty[Pair, scala.collection.mutable.Set[Int]]
    def pairsOf(syms: Array[String]): Iterator[Pair] =
      if (syms.length < 2) Iterator.empty
      else (0 until syms.length - 1).iterator
        .map(i => (syms(i), syms(i + 1)))
    // ordered view: highest freq first, then (a, b) ascending — the
    // exact [[train]] orderBy
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long.reverse, Ordering.String,
        Ordering.String)
    val heap = scala.collection.mutable.TreeSet.empty[(Long, String, String)]
    // counts/heap only — membership (`where`) is maintained separately
    // by before/after set diffs: a count passing through zero mid-update
    // must NOT drop other words' membership
    def bump(p: Pair, delta: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old != 0L) heap.remove((old, p._1, p._2))
      val next = old + delta
      if (next > 0L) {
        counts(p) = next
        heap.add((next, p._1, p._2))
      } else counts.remove(p)
    }
    var w = 0
    while (w < words.length) {
      pairsOf(words(w)).foreach { p =>
        bump(p, freqs(w))
        where.getOrElseUpdate(p,
          scala.collection.mutable.Set.empty[Int]) += w
      }
      w += 1
    }

    def applyTo(syms: Array[String], a: String, b: String)
        : Array[String] = {
      // greedy left-to-right non-overlapping — applyMerge's contract
      val out = Array.newBuilder[String]
      var k = 0
      while (k < syms.length) {
        if (k < syms.length - 1 && syms(k) == a && syms(k + 1) == b) {
          out += (a + b); k += 2
        } else { out += syms(k); k += 1 }
      }
      out.result()
    }

    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    var iter = 0
    while (iter < nMerges && !done) {
      if (heap.isEmpty) done = true
      else {
        val (f, a, b) = heap.head
        merges += ((a, b, f))
        val pair = (a, b)
        val touched = where.getOrElse(pair,
          scala.collection.mutable.Set.empty[Int]).toArray
        touched.foreach { wi =>
          val before = words(wi)
          val after = applyTo(before, a, b)
          words(wi) = after
          // multiset delta on counts ("aaa" holds (a,a) twice — per-
          // occurrence bumps keep that exact), set delta on membership
          val beforePairs = pairsOf(before).toVector
          val afterPairs = pairsOf(after).toVector
          beforePairs.foreach(p => bump(p, -freqs(wi)))
          afterPairs.foreach(p => bump(p, freqs(wi)))
          val beforeSet = beforePairs.toSet
          val afterSet = afterPairs.toSet
          beforeSet.diff(afterSet).foreach(p =>
            where.get(p).foreach(_ -= wi))
          afterSet.diff(beforeSet).foreach(p =>
            where.getOrElseUpdate(p,
              scala.collection.mutable.Set.empty[Int]) += wi)
        }
        // the merged pair itself is gone from every word that held it
        counts.get(pair).foreach { c =>
          heap.remove((c, a, b)); counts.remove(pair)
        }
        where.remove(pair)
      }
      iter += 1
    }
    merges.toSeq
  }

  /** Persist a learned merge list as a tiny ordered parquet artifact
    * (rank, a, b, pair_freq) behind [[graft.pipeline.SafeSwap]] — the
    * tokenizer artifact the training pipeline content-addresses and
    * every downstream encode job loads. KBs regardless of corpus. */
  def saveMerges(spark: SparkSession, dir: String,
      merges: Seq[(String, String, Long)]): Unit = {
    import spark.implicits._
    val df = merges.zipWithIndex
      .map { case ((a, b, f), i) => (i, a, b, f) }
      .toDF("rank", "a", "b", "pair_freq")
    graft.pipeline.SafeSwap.replace(dir)(tmp =>
      df.coalesce(1).write.mode("overwrite").parquet(tmp))
  }

  def loadMerges(spark: SparkSession, dir: String): Seq[(String, String, Long)] =
    spark.read.parquet(dir).orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  /** ENCODE: apply a learned merge list, in rank order, to arbitrary
    * text — the map-only tokenization pass a 100 TB corpus takes after
    * training. Each merge is one array fold per word ([[applyMerge]]'s
    * greedy contract), composed as nMerges chained projections inside
    * one stage — no shuffle anywhere; the word structure comes from the
    * same split as [[wordVocab]]. Returns (original columns, tokens =
    * the concatenated per-word symbol sequences). */
  def encode(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs.withColumn("__words",
      filter(split(lower(col(textCol)), "[^a-z]+"), w => w =!= ""))
    val syms0 = words.withColumn("__syms",
      transform(col("__words"), w => split(w, "")))
    val merged = merges.foldLeft(syms0) { case (df, (a, b)) =>
      val m = a + b
      df.withColumn("__syms", transform(col("__syms"), word =>
        aggregate(word, array().cast("array<string>"),
          (acc, x) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
            .otherwise(concat(acc, array(x))))))
    }
    merged.withColumn("tokens", flatten(col("__syms")))
      .drop("__words", "__syms")
  }

  /** ENCODE at production vocabulary sizes — semantically identical to
    * [[encode]] (sequential rank-order application of every merge,
    * each greedy left-to-right), but the merge table travels as ONE
    * broadcast map and each word is tokenized in a tight per-partition
    * loop. The fold-based [[encode]] chains one Catalyst expression
    * per merge — exact and codegen-friendly at tens of merges,
    * impossible at a real tokenizer's 32k (the expression tree and
    * generated method would explode); this is the documented
    * last-resort escape hatch (a scalar function over the broadcast
    * merge array — the mapPartitions class of shape): a 32k-iteration
    * loop per word has no reasonable expression form, and nothing
    * built-in fits. Per word, only merges whose
    * pair is PRESENT are applied (a presence set makes the common case
    * O(len·log) not O(|vocab|)). */
  def encodeScalable(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(merges.toArray)
    val toks = udf { text: String =>
      if (text == null) null
      else {
        val ms = bc.value
        val words = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        words.flatMap { w =>
          var syms = w.split("").toVector
          var i = 0
          while (i < ms.length) {
            val (a, b) = ms(i)
            // cheap presence probe before the merge scan
            var j = 0; var present = false
            while (j < syms.length - 1 && !present) {
              if (syms(j) == a && syms(j + 1) == b) present = true
              j += 1
            }
            if (present) {
              val out = Vector.newBuilder[String]
              var k = 0
              while (k < syms.length) {
                if (k < syms.length - 1 && syms(k) == a &&
                    syms(k + 1) == b) { out += (a + b); k += 2 }
                else { out += syms(k); k += 1 }
              }
              syms = out.result()
            }
            i += 1
          }
          syms
        }.toSeq
      }
    }
    docs.withColumn("tokens", toks(col(textCol)))
  }

  // ---------------------------------------------------------------------
  // q179_bpe_pairs — the first BPE iteration's pair table over the
  // document corpus: top-20 adjacent character pairs by corpus-weighted
  // frequency (ties by pair text). Integer evidence only; the oracle
  // re-derives the same pairs positionally with substr over the distinct
  // word list. The merge APPLICATION (greedy, iterative) is spec-tested
  // against hand-computed fixtures — a loop SQL cannot express.
  // ---------------------------------------------------------------------
  def q179BpePairs(s: SparkSession, dir: String): DataFrame = {
    val top = pairCounts(toSymbols(wordVocab(t(s, dir, "documents"), "text")))
      .orderBy(col("pair_freq").desc, col("a").asc, col("b").asc)
      .limit(20)
    Similarity.rankBounded(top, "rnk",
        Seq(col("pair_freq").desc, col("a").asc, col("b").asc))
      .select(col("rnk").cast("int").as("rnk"),
        concat(col("a"), col("b")).as("pair"), col("pair_freq"))
  }

  val q179BpePairsSql: String =
    """WITH words AS (
      |  SELECT w AS word, COUNT(*) AS freq FROM (
      |    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
      |    FROM documents)
      |  WHERE w <> '' GROUP BY w),
      |pairs AS (
      |  SELECT substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b,
      |    CAST(SUM(freq) AS BIGINT) AS pair_freq
      |  FROM words, LATERAL unnest(range(1, length(word))) AS t(i)
      |  WHERE length(word) >= 2
      |  GROUP BY 1, 2)
      |SELECT CAST(rnk AS INT) AS rnk, a || b AS pair, pair_freq FROM (
      |  SELECT a, b, pair_freq,
      |    ROW_NUMBER() OVER (ORDER BY pair_freq DESC, a ASC, b ASC) AS rnk
      |  FROM pairs)
      |WHERE rnk <= 20""".stripMargin
}
