package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BloomBits, CmsSketch}

/** Property-based laws for the pure sketch kernels (no SparkSession —
  * these are the Aggregator objects' reduce/merge/finish functions,
  * which is exactly the code a distributed aggregation folds in any
  * order over any partitioning). 200 random cases per law. */
class SketchPropertySpec extends AnyFunSuite {

  private def check(label: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$label: ${res.status}")
  }

  private val keyGen: Gen[(Long, Long)] = for {
    a <- Gen.chooseNum(0L, (1L << 32) - 1)
    b <- Gen.chooseNum(0L, (1L << 32) - 1)
  } yield (a, b)

  private def probe(buf: Array[Long], key: (Long, Long)): Boolean =
    (0 until BloomBits.K).forall { i =>
      val idx = ((key._1 + i.toLong * key._2) % BloomBits.Bits).toInt
      (buf(idx >>> 6) & (1L << (idx & 63))) != 0L
    }

  test("BloomBits: inserted keys always probe positive (no false negatives)") {
    check("no-false-negative", Prop.forAll(Gen.listOf(keyGen)) { keys =>
      val filt = keys.foldLeft(BloomBits.zero)(BloomBits.reduce)
      keys.forall(probe(filt, _))
    })
  }

  test("BloomBits: any partitioning + merge order folds to the same bitset") {
    val gen = for {
      keys <- Gen.nonEmptyListOf(keyGen)
      cuts <- Gen.listOfN(keys.length, Gen.chooseNum(0, 7))
    } yield (keys, cuts)
    check("partition-invariance", Prop.forAll(gen) { case (keys, cuts) =>
      val sequential = keys.foldLeft(BloomBits.zero)(BloomBits.reduce)
      // partition by the random cut labels, fold each, merge in label order
      val parts = keys.zip(cuts).groupBy(_._2).toSeq.sortBy(_._1)
        .map(_._2.map(_._1).foldLeft(BloomBits.zero)(BloomBits.reduce))
      val merged = parts.reduce(BloomBits.merge)
      merged.toSeq == sequential.toSeq
    })
  }

  test("BloomBits: re-inserting any subset is a no-op (idempotent OR)") {
    val gen = for {
      keys <- Gen.nonEmptyListOf(keyGen)
      again <- Gen.someOf(keys)
    } yield (keys, again.toList)
    check("idempotence", Prop.forAll(gen) { case (keys, again) =>
      val once = keys.foldLeft(BloomBits.zero)(BloomBits.reduce)
      val twice = again.foldLeft(once.clone())(BloomBits.reduce)
      twice.toSeq == once.toSeq
    })
  }

  private val termGen: Gen[String] = Gen.choose(0, 500).map(i => s"term-$i")

  test("CmsSketch: estimate never undercounts, and is exact in expectation bound") {
    check("one-sided error", Prop.forAll(Gen.listOf(termGen)) { terms =>
      val sk = terms.foldLeft(CmsSketch.zero)(CmsSketch.reduce)
      val truth = terms.groupBy(identity).view.mapValues(_.size.toLong)
      truth.forall { case (t, n) =>
        val est = (0 until CmsSketch.Depth)
          .map(r => sk(r * CmsSketch.Width + CmsSketch.bucket(r, t))).min
        est >= n // CMS error is strictly one-sided
      }
    })
  }

  test("CmsSketch: merge of any split equals the sequential sketch") {
    val gen = for {
      terms <- Gen.nonEmptyListOf(termGen)
      cut <- Gen.chooseNum(0, terms.length)
    } yield (terms, cut)
    check("merge-additivity", Prop.forAll(gen) { case (terms, cut) =>
      val sequential = terms.foldLeft(CmsSketch.zero)(CmsSketch.reduce)
      val (l, r) = terms.splitAt(cut)
      val merged = CmsSketch.merge(
        l.foldLeft(CmsSketch.zero)(CmsSketch.reduce),
        r.foldLeft(CmsSketch.zero)(CmsSketch.reduce))
      merged.toSeq == sequential.toSeq
    })
  }
}
