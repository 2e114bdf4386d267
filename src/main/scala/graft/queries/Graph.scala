package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** Graph centrality — PageRank (Page, Brin, Motwani & Winograd 1999)
  * with a FIXED, unrolled iteration count, the rank-propagation
  * complement to [[LlmDedup]]'s pointer-doubling connected components.
  * Crawl pipelines rank the host graph exactly this way before quality
  * filtering (OPIC/harmonic/PageRank centrality over CommonCrawl's link
  * graph); the reference's corpus carries no hyperlinks, so the graph
  * here is the supplier CO-SUPPLY graph — suppliers are adjacent when
  * they serve the same order — which has real cycles and hubs, unlike a
  * bipartite projection.
  *
  * Determinism: the whole computation is BIGINT micro-units — initial
  * mass `1e12 div N`, per-edge share `rank div outdeg` (integer
  * division), damped update `(15·base) div 100 + (85·Σshares) div 100`
  * — zero floats anywhere, so the 5-round fixpoint is bit-identical
  * cross-engine with no fence needed. Integer division leaks remainder
  * mass identically in both engines (documented, not hidden: PageRank
  * here is a RANKING signal, not a probability measure).
  *
  * Scale shape (100 TB answer): the edge list comes from a per-order
  * pairwise expansion — order width is bounded (≤7 lines in TPC-H, and
  * bounded in any real order system), so the expansion is O(k²·orders)
  * with small k, never all-pairs — and collapses through DISTINCT
  * map-side. Edges + out-degrees persist ONCE (MEMORY_AND_DISK, the
  * hashedShingles lesson: 5 unrolled rounds would otherwise re-pay the
  * self-join 5×); each round then shuffles only the NARROW |nodes|-row
  * rank table to the edge partitioning and folds incoming shares — the
  * standard Pregel round, O(iterations) node-sized exchanges after a
  * one-time edge shuffle. The final ordering window runs on |nodes|
  * rows.
  */
object Graph {

  private val Scale = 1000000000000L
  private val Iters = 5

  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val sl = StorageLevel.MEMORY_AND_DISK
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("s"))
    // Edge build = groupBy(order).collect_set + INLINE pair expansion,
    // not a self-join. The self-join form (distinct (ok,s), a⋈b on ok)
    // sort-merge-joins two 480M-row sides at the 1000× decade and its
    // per-thread sort/read-ahead buffers exhausted the 8 GiB
    // single-JVM harness (found twice: first un-collapsed — 2.4B pair
    // rows — then again even WITH the distinct collapse). This shape
    // pays ONE exchange of the raw (ok,s) pairs with map-side partial
    // collect_set (the hub supplier's repeats per order collapse
    // before the wire), builds each order's ≤width² pairs from a
    // bounded in-memory array (order width is schema-bounded: ≤7 in
    // TPC-H, 16 in the adversarial corpus), and streams them straight
    // into the distinct's partial aggregate — no 480M-row sorts, no
    // join buffers, same 1.76B logical pair stream, same edge set.
    val pairs = expr(
      "flatten(transform(ss, x -> transform(filter(ss, y -> y != x), " +
        "y -> struct(x AS src, y AS dst))))")
    // Persist the static sides ALREADY HASH-PARTITIONED on their join
    // keys: every unrolled round then consumes them exchange-free (the
    // cached InMemoryTableScan keeps its child partitioning), and the
    // only per-round shuffles left are the two narrow |nodes|-row moves
    // (rank table to the edge partitioning, incoming-share fold). The
    // first cut skipped the repartition and paid 27 shuffles — each
    // round re-exchanged the SAME cached edge list.
    val edges = li.groupBy(col("ok")).agg(collect_set(col("s")).as("ss"))
      .select(explode(pairs).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct().repartition(col("src")).persist(sl)
    val nodes = li.select(col("s").as("v")).distinct()
      .repartition(col("v")).persist(sl)
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist(sl)
    val nn = broadcast(nodes.agg(count(lit(1)).as("nn")))

    var ranks = nodes.crossJoin(nn)
      .select(col("v"), expr(s"$Scale div nn").as("r"))
    (1 to Iters).foreach { _ =>
      val inc = edges.join(outdeg, "src")
        .join(ranks.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v"), expr("r div deg").as("share"))
        .groupBy(col("v")).agg(sum(col("share")).as("inc"))
      // lazy localCheckpoint at each round boundary (the dedup_clusters
      // pattern): the next round plans against a materialized leaf, so
      // the executed plan stays ~4 exchanges whatever the iteration
      // count instead of nesting all prior rounds' subtrees (the
      // un-truncated form planned 27 exchange nodes at 5 rounds).
      ranks = nodes.crossJoin(nn).join(inc, Seq("v"), "left")
        .select(col("v"),
          (expr(s"(15 * ($Scale div nn)) div 100")
            + expr("(85 * coalesce(inc, 0L)) div 100")).as("r"))
        .localCheckpoint(false)
    }
    val w = Window.orderBy(col("pr_micro").desc, col("suppkey").asc)
    ranks.select(col("v").as("suppkey"), col("r").as("pr_micro"))
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  val pagerankSql: String = {
    val base = s"(15 * ($Scale // nn)) // 100"
    def round(k: Int): String =
      s"""r$k AS (
         |  SELECT nd.v, $base + (85 * COALESCE(inc.s, 0)) // 100 AS r
         |  FROM nodes nd CROSS JOIN n
         |  LEFT JOIN (
         |    SELECT e.dst AS v, CAST(SUM(rp.r // od.deg) AS BIGINT) AS s
         |    FROM e0 e JOIN r${k - 1} rp ON e.src = rp.v
         |    JOIN od ON od.src = e.src
         |    GROUP BY 1) inc ON inc.v = nd.v)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
       |nodes AS (SELECT DISTINCT l_suppkey AS v FROM lineitem),
       |od AS (SELECT src, COUNT(*) AS deg FROM e0 GROUP BY 1),
       |n AS (SELECT COUNT(*) AS nn FROM nodes),
       |r0 AS (SELECT v, $Scale // nn AS r FROM nodes CROSS JOIN n),
       |${(1 to Iters).map(round).mkString(",\n")}
       |SELECT v AS suppkey, r AS pr_micro,
       |  CAST(row_number() OVER (ORDER BY r DESC, v ASC) AS BIGINT) AS rank
       |FROM r$Iters""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_pagerank" -> (pagerank _))

  val oracles: Map[String, String] = Map(
    "rel_pagerank" -> pagerankSql)
}
