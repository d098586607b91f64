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
}
