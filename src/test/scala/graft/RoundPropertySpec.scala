package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.functions._

import graft.operators.ZOrder
import graft.queries.{Pii, TextClean}

/** Property laws for the round-15 kernels. The Z-order interleave is
  * checked against an independent bit-walk reference over random
  * inputs (the arithmetic ships as BOTH a Catalyst expression tree and
  * generated DuckDB SQL — the property pins the Scala reference the
  * spec-level cases compare both against). PII and markup stripping
  * get false-positive guards: clean text must pass through untouched,
  * because a scrub that mangles non-PII corrupts the corpus silently —
  * counts alone never show it. */
class RoundPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(label: String, prop: Prop, trials: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), prop)
    assert(res.passed, s"$label: ${res.status}")
  }

  private def zRef(x: Long, y: Long): Long = {
    var z = 0L
    (0 until ZOrder.Bits).foreach { i =>
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue equals the bit-walk reference on random 16-bit pairs (batched)") {
    // one Spark job over 500 random pairs beats 200 single-row jobs
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(500)((rnd.nextLong() & 0xffffL, rnd.nextLong() & 0xffffL))
    val got = pairs.toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"))).as[Long].collect()
    pairs.zip(got).foreach { case ((x, y), z) =>
      assert(z === zRef(x, y), s"($x,$y)")
    }
  }

  test("zValue orders quadrants: low-quadrant points precede high-x points") {
    // the property pruning relies on: a point with x's top bit set has
    // z-bit 30 set, so EVERY point of the (0,0) quadrant (both coords
    // < 2^15, z < 2^30) precedes it on the curve, whatever its y
    check("quadrant-order", Prop.forAll(
      Gen.chooseNum(0L, 32767L), Gen.chooseNum(0L, 32767L),
      Gen.chooseNum(32768L, 65535L), Gen.chooseNum(0L, 65535L)) {
      (xLo, yLo, xHi, yAny) =>
        zRef(xLo, yLo) < zRef(xHi, yAny)
    })
  }

  private val cleanWord: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(12))

  private val cleanText: Gen[String] =
    Gen.nonEmptyListOf(cleanWord).map(_.mkString(" ").take(400).trim)

  test("PII scrub passes clean alphabetic text through untouched") {
    // alphabetic words can never contain @, +digits, or dotted quads;
    // any redaction or count here is a false positive
    check("pii-clean-identity", Prop.forAll(Gen.listOfN(20, cleanText)) { texts =>
      val rows = Pii.scrub(texts.toDF("text"), "text")
        .select("n_email", "n_phone", "n_ip", "redacted", "text").collect()
      rows.forall { r =>
        r.getInt(0) == 0 && r.getInt(1) == 0 && r.getInt(2) == 0 &&
          r.getString(3) == r.getString(4)
      }
    }, trials = 20) // each trial is a Spark job over 20 texts
  }

  test("markup strip is identity on tag-free single-spaced text") {
    check("strip-clean-identity", Prop.forAll(Gen.listOfN(20, cleanText)) { texts =>
      val rows = texts.toDF("t")
        .select(col("t"), TextClean.stripHtml(col("t")).as("s")).collect()
      rows.forall(r => r.getString(1) == r.getString(0))
    }, trials = 20)
  }

  // --- SymSpell deletion-key completeness (txt_fuzzy_search's kernel) ---

  private def deletionKeys(w: String): Set[String] =
    (w.indices.map(i => w.take(i) + w.drop(i + 1)).toSet + w)

  private def lev1Edit(w: String): Gen[String] = {
    val alpha = Gen.alphaLowerChar
    val deletion =
      if (w.length <= 1) Gen.const(w)
      else Gen.chooseNum(0, w.length - 1).map(i => w.take(i) + w.drop(i + 1))
    val insertion = for {
      i <- Gen.chooseNum(0, w.length); c <- alpha
    } yield w.take(i) + c + w.drop(i)
    val substitution = for {
      i <- Gen.chooseNum(0, w.length - 1); c <- alpha
    } yield w.take(i) + c + w.drop(i + 1)
    Gen.oneOf(deletion, insertion, substitution)
  }

  test("SymSpell: any single edit of a word shares a deletion key with it") {
    // The completeness claim behind the fuzzy search's keyed join: for
    // EVERY Levenshtein-1 neighbor (deletion, insertion, substitution),
    // {self}∪{1-deletions} of the two words intersect — so the index
    // join can never miss a distance-1 match, and the exact confirm
    // only ever DROPS candidates. Pure-kernel property, no Spark job.
    check("symspell-complete", Prop.forAll(
      cleanWord.suchThat(_.nonEmpty), Gen.long) { (w, seed) =>
      val edited = lev1Edit(w)(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed)).getOrElse(w)
      deletionKeys(w).intersect(deletionKeys(edited)).nonEmpty
    })
  }

  // --- PQ self-encoding (llm_embed_ann_pq's kernel) ---

  test("PQ: every codebook vector encodes to its own code in every sub-space") {
    // The quantizer's fixed point: a vector that IS a codebook entry
    // has sub-space distance exactly 0 to itself, and ties break to
    // the lower code id — so codebook row k encodes to code k unless
    // an earlier row duplicates the sub-vector (impossible in the
    // fixture: vec_ids synthesize distinct embeddings). A drift here
    // means the argmin or the distance got re-derived wrong.
    import graft.queries.VectorSearch
    val enc = VectorSearch.pqTopk(spark, sf0001) // forces registration
    assert(enc.columns.nonEmpty) // plan builds
    val emb = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") < 64)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1))
    emb.foreach { case (id, v) =>
      (0 until 8).foreach { m =>
        val sv = v.slice(m * 8, m * 8 + 8)
        val best = emb.map { case (cid, cv) =>
          val c = cv.slice(m * 8, m * 8 + 8)
          val d = sv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, cid)
        }.minBy(identity)
        assert(best._2 == id, s"codebook vec $id sub-space $m encoded to ${best._2}")
      }
    }
  }
}
