package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General two-table as-of join — the `merge_asof` / kdb `aj` operator
  * Spark has no built-in for: each left row picks the single right row
  * with the greatest (backward) or least (forward) `on`-value on the
  * matching side of its own, per `by`-key, optionally within
  * `tolerance`.
  *
  * Expressed by composition (the brief's preferred tier — no custom
  * strategy needed): tag both sides, union on the `(by, on)` spine, and
  * run ONE window pass that carries the latest right payload forward
  * (`last(_, ignoreNulls)` over rows-between). Plan shape: one shuffle
  * of `by`-hash + an in-partition sort — identical to what a dedicated
  * merge-as-of physical operator would shuffle, so there is nothing for
  * a custom `SparkPlan` to save at 100 TB. Skewed `by`-keys fall under
  * the same salting note as any keyed window (SCALING.md).
  */
object Joins {

  /** @param left      probe side; every row survives (left-outer semantics)
    * @param right     reference side; its columns come back suffixed
    * @param on        ordering column name, present in both (numeric or
    *                  any ordered type; comparisons are inclusive)
    * @param by        equi-keys that must match before time proximity
    * @param direction "backward" (greatest right.on <= left.on — the
    *                  merge_asof default) or "forward" (least right.on
    *                  >= left.on)
    * @param tolerance max |left.on - right.on| as a long distance on the
    *                  `on` axis; matches further away are nulled (keeps
    *                  left-outer semantics). None = unbounded.
    * @param rightSuffix appended to right-side column names on clash */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      on: String,
      by: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None,
      rightSuffix: String = "_right"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asofJoin direction must be backward|forward, got $direction")
    val backward = direction == "backward"

    val leftCols = left.columns.toSeq
    val rightCols = right.columns.toSeq
    val rightPayloadCols = rightCols.filterNot(by.contains) // `on` kept: tolerance needs it
    def outName(c: String): String =
      if (leftCols.contains(c)) c + rightSuffix else c

    // One spine: (by, on, side-tag, payload struct). The right payload is
    // nullable on left rows and vice versa; unionByName fills the gap.
    // Null `on` values never match under merge_asof semantics: null right
    // rows are dropped from the spine outright (sort order would
    // otherwise place them nulls-first and last(ignoreNulls) would carry
    // them as phantom matches); null LEFT rows survive (left-outer) but
    // have their match nulled below.
    val lTagged = left
      .withColumn("__lpay", struct(leftCols.map(col): _*))
      .select((by :+ on).map(col) :+ lit(true).as("__isL") :+ col("__lpay") : _*)
    val rTagged = right
      .where(col(on).isNotNull)
      .withColumn("__rpay", struct(rightPayloadCols.map(col): _*))
      .select((by :+ on).map(col) :+ lit(false).as("__isL") :+ col("__rpay") : _*)
    val spine = lTagged.unionByName(rTagged, allowMissingColumns = true)

    // Backward: sort ascending with right rows first at ties, carry the
    // last right payload seen so far (inclusive). Forward: mirror by
    // sorting descending. `last(ignoreNulls)` over unbounded-preceding
    // rows is computed in one pass over each sorted partition.
    val ord =
      if (backward) Seq(col(on).asc, col("__isL").asc)
      else Seq(col(on).desc, col("__isL").asc)
    val w = Window.partitionBy(by.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = spine
      .withColumn("__match",
        when(col(on).isNotNull, last(col("__rpay"), ignoreNulls = true).over(w)))
      .where(col("__isL"))

    // Tolerance nulls the match but keeps the left row.
    val withTol = tolerance.fold(matched) { tol =>
      val dist =
        if (backward) col(on).cast("long") - col("__match")(on).cast("long")
        else col("__match")(on).cast("long") - col(on).cast("long")
      matched.withColumn("__match", when(dist <= tol, col("__match")))
    }

    val leftOut = leftCols.map(c => col("__lpay")(c).as(c))
    val rightOut = rightPayloadCols.map(c => col("__match")(c).as(outName(c)))
    withTol.select(leftOut ++ rightOut: _*)
  }

  /** Fuzzy (edit-distance) string join: all `(a, b)` pairs with
    * `levenshtein(a, b) <= maxDist`, without the quadratic cross join.
    *
    * Candidate generation is q-gram blocking: `d` edits destroy at most
    * `d·q` of a string's `len − q + 1` grams, so two strings of length
    * ≥ `q·(d+1)` within distance `d` MUST share a q-gram — the prefilter
    * is provably complete there, and the equi-join on gram keys shuffles
    * small tokens, never pairs. Strings shorter than `q·(d+1)` carry too
    * few grams for the bound; for them the `|len(a) − len(b)| ≤ d` band
    * IS an equi-join key — each short string explodes to its ±d
    * neighborhood of lengths and equi-joins the other side keyed by
    * length, pre-pruned to `len ≤ q·(d+1) − 1 + d` (nothing longer can
    * be within d of a short string). So the short path shuffles only the
    * near-short population, never a cross join against the full corpus;
    * the low-cardinality length key is the operator's documented skew
    * point, split by AQE. Survivors are verified with
    * the built-in `levenshtein` (codegen'd), so the output is EXACT.
    * Inputs are deduplicated on the join value (string-match semantics). */
  def fuzzyJoin(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDist: Int = 1,
      q: Int = 2): DataFrame = {
    require(maxDist >= 1 && q >= 2, s"need maxDist >= 1, q >= 2; got $maxDist/$q")
    val minLongLen = q * (maxDist + 1)
    val la = left.select(col(leftCol).cast("string").as("a")).where(col("a").isNotNull).distinct()
    val rb = right.select(col(rightCol).cast("string").as("b")).where(col("b").isNotNull).distinct()
    def gramsOf(s: Column): Column =
      array_distinct(transform(sequence(lit(1), length(s) - (q - 1)),
        i => s.substr(i, lit(q))))
    val longA = la.where(length(col("a")) >= minLongLen)
      .select(col("a"), explode(gramsOf(col("a"))).as("g"))
    val longB = rb.where(length(col("b")) >= minLongLen)
      .select(col("b"), explode(gramsOf(col("b"))).as("g"))
    val gramCand = longA.join(longB, "g").select("a", "b").distinct()
    val maxMatchLen = minLongLen - 1 + maxDist
    def lenBand(s: Column): Column =
      explode(sequence(greatest(length(s) - maxDist, lit(0)), length(s) + maxDist))
    val shortCand = la.where(length(col("a")) < minLongLen)
      .select(col("a"), lenBand(col("a")).as("lb"))
      .join(rb.where(length(col("b")) <= maxMatchLen)
        .select(col("b"), length(col("b")).as("lb")), "lb")
      .select("a", "b")
    val shortCandB = rb.where(length(col("b")) < minLongLen)
      .select(col("b"), lenBand(col("b")).as("lb"))
      .join(la.where(length(col("a")) <= maxMatchLen)
        .select(col("a"), length(col("a")).as("lb")), "lb")
      .select("a", "b")
    gramCand.unionByName(shortCand).unionByName(shortCandB).distinct()
      .where(abs(length(col("a")) - length(col("b"))) <= maxDist)
      .select(col("a"), col("b"),
        levenshtein(col("a"), col("b")).cast("bigint").as("dist"))
      .where(col("dist") <= maxDist)
  }
}
