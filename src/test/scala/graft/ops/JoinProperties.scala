package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based check of the general as-of join: on arbitrary
  * (key, time) data it must agree with the obvious per-row reference
  * computation, in both directions, with and without tolerance. Right
  * rows get unique times per key (the documented contract: ties between
  * right rows are otherwise unordered). */
object JoinProperties extends Properties("AsofJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxDiscardRatio(10)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val keyGen = Gen.oneOf("a", "b", "c")
  private val tGen = Gen.chooseNum(0L, 50L)
  private val leftGen = Gen.resize(25, Gen.listOf(Gen.zip(keyGen, tGen)))
  private val rightGen = Gen.resize(25, Gen.listOf(Gen.zip(keyGen, tGen)))
    .map(_.distinctBy(r => (r._1, r._2))) // unique (key, t) on the right

  private def reference(
      left: List[(String, Long)], right: List[(String, Long)],
      backward: Boolean, tol: Option[Long]): Set[(String, Long, Option[Long])] =
    left.zipWithIndex.map { case ((k, t), _) =>
      val cands = right.filter(r => r._1 == k && (if (backward) r._2 <= t else r._2 >= t))
        .filter(r => tol.forall(x => math.abs(t - r._2) <= x))
      val m = if (cands.isEmpty) None
        else Some(if (backward) cands.map(_._2).max else cands.map(_._2).min)
      (k, t, m)
    }.toSet

  private def run(
      left: List[(String, Long)], right: List[(String, Long)],
      direction: String, tol: Option[Long]): Set[(String, Long, Option[Long])] = {
    val l = left.toDF("k", "t")
    val r = right.toDF("k", "t")
    Joins.asofJoin(l, r, on = "t", by = Seq("k"), direction = direction, tolerance = tol)
      .collect()
      .map(row => (row.getString(0), row.getLong(1),
        Option(row.get(2)).map(_.asInstanceOf[Long])))
      .toSet
  }

  property("backward matches the per-row reference") = forAll(leftGen, rightGen) { (l, r) =>
    l.isEmpty || run(l, r, "backward", None) == reference(l, r, backward = true, None)
  }

  property("forward matches the per-row reference") = forAll(leftGen, rightGen) { (l, r) =>
    l.isEmpty || run(l, r, "forward", None) == reference(l, r, backward = false, None)
  }

  property("tolerance matches the per-row reference") = forAll(leftGen, rightGen) { (l, r) =>
    l.isEmpty || run(l, r, "backward", Some(5L)) == reference(l, r, backward = true, Some(5L))
  }

  // fuzzyJoin completeness on arbitrary strings — including empty and
  // length ≤ maxDist values, the band-clamp edge the round-7 fix closed:
  // the blocked join must equal the exhaustive levenshtein cross join
  private val wordGen = Gen.oneOf(
    Gen.const(""),
    Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c'))))
  private val vocabGen = Gen.resize(18, Gen.nonEmptyListOf(wordGen))

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def fuzzyProp(maxDist: Int) = forAll(vocabGen, vocabGen) { (ls, rs) =>
    val got = Joins.fuzzyJoin(ls.toDF("a"), rs.toDF("b"), "a", "b", maxDist = maxDist)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = (for {
      a <- ls.distinct; b <- rs.distinct
      d = lev(a, b) if d <= maxDist
    } yield (a, b, d.toLong)).toSet
    got == want
  }

  property("fuzzyJoin(maxDist=1) equals exhaustive levenshtein incl empty strings") = fuzzyProp(1)
  property("fuzzyJoin(maxDist=2) equals exhaustive levenshtein incl empty strings") = fuzzyProp(2)
}
