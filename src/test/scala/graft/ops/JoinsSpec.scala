package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** General as-of join semantics (`ops/Joins.scala`) on hand-computable
  * fixtures, plus consistency with the windowed single-relation
  * attribution form (`q_asof_join`) on the driver tables. */
class JoinsSpec extends SparkSpec {

  import spark.implicits._

  // quotes: per-symbol reference prices at times 10/20/30 (A), 15 (B)
  private lazy val quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)).toDF("sym", "t", "px")
  // trades: probes at 5/20/25 (A), 14/16 (B)
  private lazy val trades = Seq(
    ("A", 5L, 100L), ("A", 20L, 200L), ("A", 25L, 300L),
    ("B", 14L, 400L), ("B", 16L, 500L)).toDF("sym", "t", "qty")

  private def matches(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
    df.collect().map(r => r.getAs[Long]("qty") ->
      Option(r.getAs[Any]("px")).map(_.asInstanceOf[Double])).toMap

  test("backward as-of picks the greatest right.on <= left.on, inclusive, per key") {
    val j = Joins.asofJoin(trades, quotes, on = "t", by = Seq("sym"))
    assert(j.count() === trades.count(), "left-outer: every probe row survives")
    assert(matches(j) === Map(
      100L -> None,        // t=5: no quote yet
      200L -> Some(2.0),   // t=20: the equal-time quote (inclusive)
      300L -> Some(2.0),   // t=25: quote at 20
      400L -> None,        // B t=14: quote at 15 is in the future
      500L -> Some(9.0)))  // B t=16: quote at 15
  }

  test("forward as-of picks the least right.on >= left.on") {
    val j = Joins.asofJoin(trades, quotes, on = "t", by = Seq("sym"), direction = "forward")
    assert(matches(j) === Map(
      100L -> Some(1.0),   // next quote at 10
      200L -> Some(2.0),   // equal time, inclusive
      300L -> Some(3.0),   // next quote at 30
      400L -> Some(9.0),   // next quote at 15
      500L -> None))       // B has nothing after 15
  }

  test("tolerance nulls distant matches but keeps the left row") {
    val j = Joins.asofJoin(trades, quotes, on = "t", by = Seq("sym"), tolerance = Some(2L))
    assert(j.count() === trades.count())
    assert(matches(j) === Map(
      100L -> None,
      200L -> Some(2.0),   // distance 0
      300L -> None,        // distance 5 > 2
      400L -> None,
      500L -> Some(9.0)))  // distance 1
  }

  test("null times never match: null right rows are ignored, null left rows get no match") {
    val q = Seq(("A", Option.empty[Long], 9.0), ("A", Some(20L), 2.0)).toDF("sym", "t", "px")
    val tr = Seq(("A", Some(5L), 100L), ("A", Some(25L), 200L), ("A", Option.empty[Long], 300L))
      .toDF("sym", "t", "qty")
    val j = Joins.asofJoin(tr, q, on = "t", by = Seq("sym"))
    assert(j.count() === 3, "left-outer: null-time left rows survive")
    assert(matches(j) === Map(
      100L -> None,        // t=5: the null-time quote must NOT be a phantom match
      200L -> Some(2.0),   // t=25: quote at 20
      300L -> None))       // null-time probe matches nothing
  }

  test("right columns clashing with left are suffixed; by-keys are not duplicated") {
    val j = Joins.asofJoin(trades, quotes, on = "t", by = Seq("sym"))
    assert(j.columns.toSeq === Seq("sym", "t", "qty", "t_right", "px"))
  }

  test("general as-of agrees with the windowed attribution query on driver data") {
    val dir = "/root/testdata/sf0.001"
    val general = graft.SparkEntry.queries("q_asof_general")(spark, dir)
      .select(col("user_id"), col("purchase_seq").as("seq"), col("click_seq").as("last_click_seq"))
    val windowed = graft.SparkEntry.queries("q_asof_join")(spark, dir)
    assert(general.count() > 0)
    assert(general.exceptAll(windowed).isEmpty && windowed.exceptAll(general).isEmpty,
      "the two as-of formulations must produce identical attribution")
  }

  test("as-of plan is one keyed window pass — no join operator, single shuffle") {
    val j = Joins.asofJoin(trades, quotes, on = "t", by = Seq("sym"))
    j.collect()
    val plan = (j.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(!plan.contains("Join"), s"expected no join node:\n${plan.take(1200)}")
    assert(plan.contains("Window"), "expected a window operator")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1,
      s"expected at most one key shuffle:\n${plan.take(1200)}")
  }

  test("fuzzy join equals the exhaustive levenshtein cross join, incl short strings") {
    import spark.implicits._
    // vocabulary with planted near-misses at every length class: long
    // words (gram path), length-3 words (short all-pairs path), and
    // substitution/insertion/deletion variants
    val terms = Seq("spark", "spork", "sparkle", "catalyst", "catalist",
      "cat", "car", "ca", "dog", "dig", "partition", "partitions",
      "shuffle", "shufle", "window", "winnow", "", "a", "b").toDF("term")
    val probes = Seq("spark", "catalyst", "cat", "dg", "shuffl", "windw",
      "partition", "", "x").toDF("probe")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val got = key(Joins.fuzzyJoin(probes, terms, "probe", "term", maxDist = 1))
    val exhaustive = key(probes.crossJoin(terms)
      .select(col("probe").as("a"), col("term").as("b"),
        levenshtein(col("probe"), col("term")).cast("bigint").as("dist"))
      .where(col("dist") <= 1))
    assert(got == exhaustive,
      s"missing=${exhaustive -- got} extra=${got -- exhaustive}")
    // sanity: the planted pairs are present, including the short 'dg'→'dog'/'dig'
    assert(got.contains(("dg", "dog", 1L)) && got.contains(("dg", "dig", 1L)))
    assert(got.contains(("shuffl", "shuffle", 1L)) && got.contains(("spark", "spork", 1L)))
    // empty-string boundary: ("","") at dist 0 and ("","a")/("x","") at dist 1
    assert(got.contains(("", "", 0L)) && got.contains(("", "a", 1L)) && got.contains(("x", "", 1L)))
  }

  test("fuzzy join at maxDist=2 stays complete (wider gram threshold, longer min length)") {
    import spark.implicits._
    val terms = ((1 to 60).map(i => s"function$i") ++ Seq("", "q", "qr")).toDF("term") // shared 'function' stem + length<=maxDist boundary
    val probes = Seq("function1", "functoin2", "fnction3", "xyz", "", "z").toDF("probe")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val got = key(Joins.fuzzyJoin(probes, terms, "probe", "term", maxDist = 2))
    val exhaustive = key(probes.crossJoin(terms)
      .select(col("probe").as("a"), col("term").as("b"),
        levenshtein(col("probe"), col("term")).cast("bigint").as("dist"))
      .where(col("dist") <= 2))
    assert(got == exhaustive, s"missing=${exhaustive -- got} extra=${got -- exhaustive}")
  }
}
