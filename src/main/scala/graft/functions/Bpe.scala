package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, count, explode, lit, lower, regexp_extract_all, udf}

/** A trained byte-pair-encoding tokenizer: merges learned from a corpus,
  * applied as a rank table — the thing a token-budget gate at training
  * time actually runs, where the `txt_token_stats` regex count is only
  * a proxy.
  *
  * Training (classic BPE over a word-frequency table): start from
  * characters, repeatedly merge the most frequent adjacent symbol pair;
  * ties break deterministically (count desc, then pair lexicographic),
  * so the same corpus always yields the same merges. The trainer is
  * driver-side over a BOUNDED word-frequency table (the Zipf-folded
  * vocabulary artifact `txt_vocab_topk` documents — computing it IS a
  * distributed map-side-combine aggregation; the merge loop over ≤50k
  * word types is the same bounded-artifact tier as IVF centroids).
  *
  * Encoding applies the rank table greedily: repeatedly merge the
  * LEFTMOST occurrence of the lowest-rank adjacent pair until none
  * applies. One merge per step, leftmost-first — exactly the recursion
  * the DuckDB oracle replays symbolically
  * ([[graft.queries.TextAnalysis.bpeStatsSql]]), so the two
  * implementations are comparable state-for-state, not just
  * count-for-count. Encoding distributes as a scalar function over a
  * shared rank map (a few KB — task-closure sized); the per-task memo
  * cache exploits the corpus' Zipf shape (most words repeat).
  *
  * Pre-tokenization reuses the exact `txt_token_stats` word regex
  * (letter runs / digit runs / single other symbols, lowercased), so
  * BPE counts refine — never contradict — the regex proxy counts.
  */
object Bpe {

  /** Same pre-token regex as `txt_token_stats`'s BPE-ish proxy. */
  val PreTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  private val PreTokenRe = PreTokenPattern.r

  def preTokens(text: String): Seq[String] =
    if (text == null) Nil
    else PreTokenRe.findAllIn(text.toLowerCase(java.util.Locale.ROOT)).toSeq

  /** Train `numMerges` merges from a word-frequency table. Stops early
    * when the best pair occurs fewer than `minCount` times (merging
    * hapax noise buys nothing and destabilizes the artifact). */
  def train(wordFreqs: Map[String, Long], numMerges: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    // deterministic starting order (map iteration order is not)
    var words: Vector[(Vector[String], Long)] = wordFreqs.toVector.sortBy(_._1)
      .map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (pair, n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (n < minCount) done = true
        else {
          merges += pair
          val joined = pair._1 + pair._2
          words = words.map { case (syms, f) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
                out += joined; i += 2 // left-to-right, non-overlapping
              } else { out += syms(i); i += 1 }
            }
            (out.result(), f)
          }
          round += 1
        }
      }
    }
    merges.result()
  }

  /** Rank lookup keyed `"a b"` (symbols never contain spaces: the
    * pre-tokenizer strips whitespace before characters ever become
    * symbols). */
  def ranks(merges: Seq[(String, String)]): Map[String, Int] =
    merges.zipWithIndex.map { case ((a, b), i) => s"$a $b" -> i }.toMap

  /** Encode one pre-token: leftmost occurrence of the lowest-rank pair
    * merges, one merge per step, until no listed pair remains. */
  def encodeWord(word: String, rank: Map[String, Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse(syms(i) + " " + syms(i + 1), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPos = i }
        i += 1
      }
      if (bestPos < 0) continue = false
      else {
        syms = syms.patch(bestPos, Vector(syms(bestPos) + syms(bestPos + 1)), 2)
        continue = syms.length > 1
      }
    }
    syms
  }

  def encode(text: String, rank: Map[String, Int]): Seq[String] =
    preTokens(text).flatMap(encodeWord(_, rank))

  /** Column function: trained-BPE token count of a text column. The
    * rank map rides the task closure (KBs); the memo cache is per task
    * and Zipf-effective. A merge LOOP cannot be a codegen'd builtin —
    * this is the documented case (b→UDF) where a scalar UDF is the
    * right tier. */
  def tokenCountCol(merges: Seq[(String, String)]): Column => Column = {
    val rank = ranks(merges)
    val f = udf { (text: String) =>
      if (text == null) 0L
      else {
        val cache = wordCache.get()
        val n = preTokens(text).map { w =>
          cache.getOrElseUpdate(w, encodeWord(w, rank).length.toLong)
        }.sum
        cacheGuard()
        n
      }
    }
    (c: Column) => f(c)
  }

  /** Column function: trained-BPE token ARRAY of a text column — the
    * chunking/packing side of the tokenizer (counts alone cannot slice
    * a token stream). Same closure/memo shape as [[tokenCountCol]]. */
  def tokensCol(merges: Seq[(String, String)]): Column => Column = {
    val rank = ranks(merges)
    val f = udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else {
        val cache = tokCache.get()
        val out = preTokens(text).flatMap { w =>
          cache.getOrElseUpdate(w, encodeWord(w, rank))
        }
        tokCacheGuard()
        out
      }
    }
    (c: Column) => f(c)
  }

  // per-thread (= per task slot) memo of word -> token count; bounded
  // by clearing at 64k distinct words so a pathological corpus cannot
  // grow executor memory without limit
  private val wordCache = new ThreadLocal[mutable.HashMap[String, Long]] {
    override def initialValue(): mutable.HashMap[String, Long] =
      mutable.HashMap.empty
  }
  private[functions] def cacheGuard(): Unit =
    if (wordCache.get().size > 65536) wordCache.get().clear()

  private val tokCache = new ThreadLocal[mutable.HashMap[String, Vector[String]]] {
    override def initialValue(): mutable.HashMap[String, Vector[String]] =
      mutable.HashMap.empty
  }
  private[functions] def tokCacheGuard(): Unit =
    if (tokCache.get().size > 65536) tokCache.get().clear()

  /** Load a merges table (one `a b` per line, rank = line order). */
  def loadMerges(path: String): Seq[(String, String)] =
    Files.readAllLines(Paths.get(path)).toArray(Array.empty[String]).toSeq
      .filter(_.nonEmpty)
      .map { line =>
        val i = line.indexOf(' ')
        require(i > 0 && i < line.length - 1, s"malformed merges line: '$line'")
        (line.substring(0, i), line.substring(i + 1))
      }

  def saveMerges(merges: Seq[(String, String)], path: String): Unit =
    Files.write(Paths.get(path),
      merges.map { case (a, b) => s"$a $b" }.mkString("\n").getBytes(UTF_8)): Unit

  /** Train from a corpus: the word-frequency table is a distributed
    * map-side-combined aggregation; only the top-`maxWords` rows (by
    * frequency, ties on the word) reach the driver — the bounded
    * vocabulary artifact, NOT the corpus. */
  def trainFromCorpus(docs: DataFrame, textCol: Column, numMerges: Int,
      maxWords: Int = 50000): Seq[(String, String)] = {
    val freqs = docs
      .select(explode(
        regexp_extract_all(lower(textCol), lit(PreTokenPattern), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc).limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    train(freqs, numMerges)
  }

  /** Train on the fixture news corpus (title + description text): the
    * training input every scale factor shares. */
  def trainFromFixture(spark: org.apache.spark.sql.SparkSession,
      numMerges: Int): Seq[(String, String)] = {
    val news = spark.read
      .schema(graft.streaming.NewsStream.newsSchema)
      .json(graft.Fixtures.newsLanding)
    trainFromCorpus(news,
      org.apache.spark.sql.functions.concat_ws(" ", col("title"), col("desc")),
      numMerges)
  }

  /** The checked-in fixture-trained merges (regeneration guarded by
    * BpeSpec): trained on the fixture news corpus, so the artifact is
    * scale-factor-independent and the oracle SQL can embed it as a
    * literal. Memoized — the file is a few KB read once per JVM. */
  lazy val fixtureMerges: Seq[(String, String)] =
    loadMerges(s"${graft.Fixtures.dir}/bpe_merges.txt")

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB CTE fragment replaying [[encodeWord]] symbolically over the
    * corpus' DISTINCT pre-tokens: a recursive CTE whose step merges the
    * LEFTMOST occurrence of the LOWEST-rank adjacent pair (rank looked
    * up in an embedded MAP literal of the merges), one merge per
    * iteration — exactly the Scala loop, state-for-state. Words reach
    * the `bpe_final` CTE precisely when no listed pair remains, so each
    * word contributes exactly one final row with its token list + count.
    * Must be preceded by `WITH RECURSIVE`; expects a `documents` table
    * with a `text` column. */
  def oracleCtes(merges: Seq[(String, String)] = fixtureMerges): String = {
    val rkMap = "MAP([" +
      merges.map { case (a, b) => sqlQuote(a + " " + b) }.mkString(", ") +
      "], [" + merges.indices.mkString(", ") + "])"
    // the rank-annotation subselect appears twice (step + final test);
    // shared here so the two stay literally identical
    def ranked(src: String): String =
      s"""(SELECT w, syms,
         |        list_transform(range(1, len(syms)), i ->
         |          map_extract($rkMap, syms[i] || ' ' || syms[i+1])[1]) AS rks
         |      FROM $src)""".stripMargin
    s"""bpe_words AS (SELECT DISTINCT unnest(regexp_extract_all(lower(text), '$PreTokenPattern')) AS w
       |  FROM documents),
       |bpe_enc(w, syms) AS (
       |  SELECT w, list_transform(range(1, len(w) + 1), i -> w[i]) FROM bpe_words
       |  UNION ALL
       |  SELECT w, list_concat(list_concat(syms[1:bp-1], [syms[bp] || syms[bp+1]]), syms[bp+2:])
       |  FROM (SELECT w, syms,
       |          list_position(rks, list_min(list_filter(rks, x -> x IS NOT NULL))) AS bp
       |        FROM ${ranked("bpe_enc")}
       |        WHERE len(list_filter(rks, x -> x IS NOT NULL)) > 0)),
       |bpe_final AS (
       |  SELECT w, syms, CAST(len(syms) AS BIGINT) AS n_toks
       |  FROM ${ranked("bpe_enc")}
       |  WHERE len(list_filter(rks, x -> x IS NOT NULL)) = 0),
       |bpe_pre AS (SELECT doc_id, source,
       |    regexp_extract_all(lower(text), '$PreTokenPattern') AS pts
       |  FROM documents),
       |bpe_doc_toks AS (
       |  SELECT p.doc_id, p.source, COALESCE(s.n, 0) AS n_toks
       |  FROM bpe_pre p LEFT JOIN (
       |    SELECT doc_id, CAST(SUM(f.n_toks) AS BIGINT) AS n
       |    FROM (SELECT doc_id, unnest(pts) AS w FROM bpe_pre) u
       |    JOIN bpe_final f USING (w) GROUP BY doc_id) s USING (doc_id)),
       |bpe_doc_stream AS (
       |  SELECT p.doc_id, COALESCE(s.t, CAST([] AS VARCHAR[])) AS t
       |  FROM bpe_pre p LEFT JOIN (
       |    SELECT doc_id, flatten(list(f.syms ORDER BY i)) AS t
       |    FROM (SELECT doc_id, u.i AS i, pts[u.i] AS w
       |          FROM bpe_pre, unnest(range(1, len(pts) + 1)) AS u(i)) x
       |    JOIN bpe_final f USING (w) GROUP BY doc_id) s USING (doc_id))""".stripMargin
  }
}

/** Regenerate the checked-in merges artifact from the fixture news
  * corpus: `runMain graft.functions.BpeTrain [out] [numMerges]`.
  * Deterministic — BpeSpec fails if the committed file drifts from
  * what this would write. */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(s"${graft.Fixtures.dir}/bpe_merges.txt")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(200)
    val spark = graft.Tables.session("graft-bpe-train")
    spark.sparkContext.setLogLevel("WARN")
    val merges = Bpe.trainFromFixture(spark, numMerges)
    Bpe.saveMerges(merges, out)
    println(s"wrote ${merges.size} merges to $out")
  }
}
