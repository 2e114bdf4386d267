package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators for a large-scale training-data pipeline, over
  * the `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Four dedup families, each designed to scale to 100 TB (every join is
  * keyed — hash buckets, LSH bands, or inverted shingle index — never an
  * all-pairs cartesian):
  *
  *  - exact:   md5 of normalized text → hash-groupBy (one shuffle on the
  *             hash; map-side partial agg).
  *  - minhash: word-3-shingles → 32 minhash signatures → 16 LSH bands of
  *             2 rows → candidate pairs ONLY where a band collides →
  *             exact shingle-Jaccard verification on the candidates.
  *             At j=0.5 similarity the band-collision probability is
  *             1-(1-0.5^2)^16 ≈ 99%; false positives are removed by the
  *             verification join, so precision is exact.
  *  - simhash: 16-bit term-frequency simhash from per-token md5 bits;
  *             identical-fingerprint grouping.
  *  - shingle-Jaccard: exact sparse similarity join via an inverted
  *             shingle index (pairs share ≥1 shingle; no LSH recall loss).
  *
  * The md5-based hash family is used (instead of Spark's murmur3 `hash`)
  * because both engines — Spark and the DuckDB oracle — implement
  * identical md5, making the whole pipeline bit-reproducible across
  * engines; determinism is also what makes dedup auditable in production.
  *
  * Reference tie-in: the reference is duplicate-prone by design (random
  * uuid4 doc ids + full refresh, insert_owid.py:154; dedup is its
  * acknowledged TODO, README.md:225-227) — these operators are the
  * capability it lacks.
  */
object LlmDedup {

  private val NumHashes = 32
  private val NumBands = 16 // 2 rows per band

  /** tokens of normalized text: lower, trim, collapse whitespace. */
  private def toks(text: Column): Column =
    split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")

  /** word 3-gram shingles (empty array when < 3 tokens — mirrors DuckDB's
    * empty `range`). */
  private def shingleCol(t: Column): Column =
    when(size(t) >= 3,
      transform(sequence(lit(1), size(t) - 2),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** (doc_id, shingle) distinct pairs — the inverted-index building block.
    * The token array is materialized behind a projection boundary BEFORE
    * the shingle transform: `element_at` inside the lambda would otherwise
    * re-evaluate the regex split per element (~3 × shingle-count re-splits
    * per document — measured 10× slowdown at sf0.1). */
  private def distinctShingles(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs.select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), explode(shingleCol(col("t"))).as("shingle"))
      .distinct()
      // The inverted index is consumed by several branches (signatures,
      // candidate join probes, set sizes) and Spark does NOT deduplicate
      // identical non-exchange subtrees (measured: 0 ReusedExchange, the
      // index recomputed ~5x). Materializing it is also the production
      // design at scale: the index is O(docs x shingles), far smaller
      // than re-tokenizing the corpus per branch. Lifecycle: the harness
      // (Bench/Verify) clears the cache between queries, so the persist
      // is scoped to one query's execution and never times a warm cache.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  private val shingleSqlCte =
    """toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
      |         FROM documents),
      |sh AS (SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
      |       FROM toks, unnest(range(1, len(t)-1)) AS r(i))""".stripMargin

  // ---------------------------------------------------------------- exact

  /** Exact dedup: group by md5 of normalized text; survivor = min doc_id.
    * At 100 TB this is one shuffle keyed on the 128-bit hash (never on the
    * full text), with map-side partial aggregation. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs
      .select(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("text_hash"),
        col("doc_id"))
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_dups"))
  }

  val exactDedupSql: String =
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash,
      |  MIN(doc_id) AS survivor_id, COUNT(*) AS n_dups
      |FROM documents GROUP BY 1""".stripMargin

  // -------------------------------------------------------------- minhash

  /** MinHash + LSH near-dup: banded candidate generation (the join key is
    * a band hash, NEVER a cartesian pair), then exact Jaccard verification
    * restricted to candidates. Output: near-dup pairs with j >= 0.5. */
  def minhashNearDup(spark: SparkSession, dir: String): DataFrame = {
    val dsh = distinctShingles(spark, dir)

    // 32 md5 minima computed inline in ONE partial-aggregating pass over
    // the inverted index (no extra shuffle; measured faster than a
    // hash-distinct-shingles-then-join variant, whose shuffle of 32 hash
    // columns costs more than the redundant hashing it saves).
    val mhAggs = (0 until NumHashes).map(i =>
      min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"m$i")) :+
      count(lit(1)).as("n") // set size folded into the same pass (no
                            // separate sizes branch re-scanning the index)
    val mh = dsh.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val bandKeys = (0 until NumBands).map(b =>
      md5(concat(col(s"m${2 * b}"), col(s"m${2 * b + 1}"))))
    val bands = mh.select(col("doc_id"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))

    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x_id"), col("b.doc_id").as("y_id"))
      .distinct()

    jaccardOf(cand, dsh, mh.select(col("doc_id"), col("n")))
      .filter(col("jaccard") >= 0.5)
  }

  /** Exact shingle-Jaccard for a set of (x_id, y_id) candidate pairs:
    * the (small) candidate set is broadcast against the inverted index,
    * so per-pair work is bounded by document length and nothing large
    * shuffles. */
  private def jaccardOf(cand: DataFrame, dsh: DataFrame, sz: DataFrame): DataFrame = {
    val shared = broadcast(cand)
      .join(dsh.as("sa"), col("x_id") === col("sa.doc_id"))
      .join(dsh.as("sb"),
        col("y_id") === col("sb.doc_id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("x_id"), col("y_id"))
      .agg(count(lit(1)).as("shared"))
    withJaccard(shared, sz)
  }

  /** Attach set sizes and the Jaccard ratio to (x_id, y_id, shared). */
  private def withJaccard(shared: DataFrame, sz: DataFrame): DataFrame = {
    shared
      .join(sz.as("nx"), col("x_id") === col("nx.doc_id"))
      .join(sz.as("ny"), col("y_id") === col("ny.doc_id"))
      .select(col("x_id"), col("y_id"),
        (col("shared").cast("double") /
          (col("nx.n") + col("ny.n") - col("shared"))).as("jaccard"))
  }

  val minhashNearDupSql: String = {
    val mhAggs = (0 until NumHashes)
      .map(i => s"min(md5('$i:' || shingle)) AS m$i").mkString(", ")
    val bandArms = (0 until NumBands)
      .map(b => s"SELECT doc_id, $b AS band, md5(m${2 * b} || m${2 * b + 1}) AS bkey FROM mh")
      .mkString("\n UNION ALL ")
    s"""WITH $shingleSqlCte,
       |mh AS (SELECT doc_id, $mhAggs FROM sh GROUP BY doc_id),
       |bands AS ($bandArms),
       |cand AS (SELECT DISTINCT a.doc_id AS x_id, b.doc_id AS y_id
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |shared AS (SELECT c.x_id, c.y_id, COUNT(*) AS shared
       |           FROM cand c
       |           JOIN sh sa ON sa.doc_id = c.x_id
       |           JOIN sh sb ON sb.doc_id = c.y_id AND sb.shingle = sa.shingle
       |           GROUP BY c.x_id, c.y_id)
       |SELECT s.x_id, s.y_id,
       |  CAST(s.shared AS DOUBLE) / (nx.n + ny.n - s.shared) AS jaccard
       |FROM shared s
       |JOIN sz nx ON nx.doc_id = s.x_id
       |JOIN sz ny ON ny.doc_id = s.y_id
       |WHERE CAST(s.shared AS DOUBLE) / (nx.n + ny.n - s.shared) >= 0.5""".stripMargin
  }

  // -------------------------------------------------------------- simhash

  /** 16-bit term-frequency SimHash: per token, bit j of the fingerprint
    * votes +1/-1 by the high bit of hex digit j of md5(token); fingerprint
    * bit = sign of the vote sum. One shuffle (groupBy doc_id) with 16
    * map-side partial sums; no join at all. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val votes = (0 until 16).map(j =>
      sum(when(substring(col("h"), j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
        .otherwise(-1)).as(s"v$j"))
    val fp = (0 until 16).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    tok.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  val simhashSql: String = {
    val votes = (0 until 16).map(j =>
      s"SUM(CASE WHEN substr(md5(tok), ${j + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v$j")
      .mkString(", ")
    val fp = (0 until 16).map(j => s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""WITH t AS (SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
       |           FROM documents),
       |v AS (SELECT doc_id, $votes FROM t GROUP BY doc_id)
       |SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM v""".stripMargin
  }

  // ----------------------------------------------------- shingle jaccard

  /** Exact n-gram Jaccard similarity join via the inverted shingle index:
    * candidate pairs are docs sharing >= 1 shingle (keyed join on the
    * shingle — scales with index selectivity, never cartesian), reported
    * at j >= 0.05. The exact-recall counterpart to [[minhashNearDup]]. */
  def shingleJaccard(spark: SparkSession, dir: String): DataFrame = {
    val dsh = distinctShingles(spark, dir)
    // One self-join on the shingle key produces the shared-count per pair
    // directly (no candidates-then-recount round trip): the intersection
    // size IS the number of index rows joining per pair.
    val shared = dsh.as("a")
      .join(dsh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("x_id"), col("b.doc_id").as("y_id"))
      .agg(count(lit(1)).as("shared"))
    val sz = dsh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    withJaccard(shared, sz).filter(col("jaccard") >= 0.05)
  }

  val shingleJaccardSql: String =
    s"""WITH $shingleSqlCte,
       |cand AS (SELECT DISTINCT a.doc_id AS x_id, b.doc_id AS y_id
       |         FROM sh a JOIN sh b
       |           ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |shared AS (SELECT c.x_id, c.y_id, COUNT(*) AS shared
       |           FROM cand c
       |           JOIN sh sa ON sa.doc_id = c.x_id
       |           JOIN sh sb ON sb.doc_id = c.y_id AND sb.shingle = sa.shingle
       |           GROUP BY c.x_id, c.y_id)
       |SELECT s.x_id, s.y_id,
       |  CAST(s.shared AS DOUBLE) / (nx.n + ny.n - s.shared) AS jaccard
       |FROM shared s
       |JOIN sz nx ON nx.doc_id = s.x_id
       |JOIN sz ny ON ny.doc_id = s.y_id
       |WHERE CAST(s.shared AS DOUBLE) / (nx.n + ny.n - s.shared) >= 0.05""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_exact_dedup" -> (exactDedup _),
    "llm_minhash_neardup" -> (minhashNearDup _),
    "llm_simhash" -> (simhash _),
    "llm_shingle_jaccard" -> (shingleJaccard _))

  val oracles: Map[String, String] = Map(
    "llm_exact_dedup" -> exactDedupSql,
    "llm_minhash_neardup" -> minhashNearDupSql,
    "llm_simhash" -> simhashSql,
    "llm_shingle_jaccard" -> shingleJaccardSql)
}
