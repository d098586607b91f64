package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the clustering
  * stage of a training-data pipeline (topic bucketing, diversity
  * sampling, IVF coarse quantizer training).
  *
  * Scale shape per iteration (the only shape that survives 100 TB):
  *  - assignment strategy-switches on k (shared
  *    [[Similarity.CellAssignLiteralMax]] threshold): small quantizers
  *    fold the centroids into the plan as a literal array (k × dim
  *    doubles, a few KB; the driver holds them between iterations) — a
  *    NARROW map, zero shuffle, no join; above the threshold (training
  *    at the SemDeDup k ∝ N operating point) the centroids broadcast as
  *    a TABLE and a `min(struct(dist, cid))` partial aggregate takes the
  *    argmin, keeping the expression tree O(1) in k ([[nearestJoined]]);
  *  - the centroid update is ONE partial-aggregated shuffle:
  *    `posexplode` the vectors and `groupBy(cell, dim)` — map-side
  *    combine reduces each partition to ≤ k×dim partial sums before
  *    anything crosses the wire, so shuffle volume is k × dim ×
  *    partitions, independent of row count.
  * Driver state is k×dim doubles per iteration — no `collect()` of data.
  *
  * Determinism: seeding takes the k lowest-id vectors (no RNG), argmin
  * ties break on the lowest cell id, empty cells keep their previous
  * centroid. Every stage is reproducible run-to-run and replayable in
  * plain SQL, which is what makes the operator oracle-checkable.
  */
object KMeans {

  /** Squared L2 distance between two `array<double>` columns. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Argmin-cell struct over a literal centroid list: `(dist, cid)` of
    * the nearest centroid, ties to the lowest cid (lexicographic struct
    * min). Narrow — no join, no shuffle — but O(k) expression nodes, so
    * it is capped at [[Similarity.CellAssignLiteralMax]]; above that,
    * [[assignNearest]] switches to the broadcast-join argmin
    * ([[nearestJoined]]) that training a quantizer at the SemDeDup
    * operating point (k ∝ N, Abbas et al. 2023 §3) requires. */
  private def nearest(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column = {
    val carr = array(centroids.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), typedLit(cv).as("cvec"))
    }: _*)
    array_min(transform(carr, c =>
      struct(l2sq(vec, c.getField("cvec")).as("dist"), c.getField("cid").as("cid"))))
  }

  /** Nearest-centroid argmin via a broadcast JOIN of the centroid table
    * — the large-k twin of [[nearest]], mirroring
    * [[Similarity.cellAssignJoined]] with squared L2 in place of cosine.
    * Each input row meets every centroid through a broadcast nested-loop
    * against a k-row table (no corpus shuffle), `l2sq` is computed per
    * (row, centroid) with the exact accumulation order of the literal
    * path (bit-identical dist), and a `min(struct(dist, cid))` aggregate
    * takes the argmin — lexicographic struct min, ties to the lowest
    * cid, the same tie-break as `array_min` over the literal array. The
    * partial aggregate collapses the k-fold expansion map-side (each
    * row's k candidates share a partition, by construction of a
    * broadcast join), so the shuffle moves one row per input row.
    * `idCol` must be unique per row (it is the aggregate key).
    *
    * Plan shape is O(1) in k: one broadcast of a k × dim double table
    * plus a constant-size argmin aggregate — per Lloyd iteration, k
    * literal structs never enter the expression tree. */
  private[ops] def nearestJoined(
      df: DataFrame,
      centroids: Seq[(Int, Seq[Double])],
      idCol: String,
      vecCol: String,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val centTable = centroids.toDF("__cent_cid", "__cent_vec")
    val carried = df.columns.filterNot(_ == idCol).toIndexedSeq
      .map(c => first(col(c)).as(c))
    val nearAgg = min(struct(
      l2sq(col(vecCol), col("__cent_vec")).as("dist"),
      col("__cent_cid").as("cid"))).as(outCol)
    df.crossJoin(broadcast(centTable))
      .groupBy(col(idCol))
      .agg((carried :+ nearAgg).head, (carried :+ nearAgg).tail: _*)
  }

  /** Appends `outCol` = the `(dist, cid)` argmin struct, with the
    * strategy switch shared with [[Similarity.assignCells]]: the literal
    * expression at or below [[Similarity.CellAssignLiteralMax]] centroids
    * (zero shuffle, whole-stage codegen), the broadcast-join argmin above
    * it. `fit` / `clusterSummary` / `assign` all route through this, so
    * training at large k changes the plan, not the caller. */
  def assignNearest(
      df: DataFrame,
      centroids: Seq[(Int, Seq[Double])],
      idCol: String,
      vecCol: String,
      outCol: String): DataFrame = {
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column — the carried-column aggregate would collide")
    if (centroids.length <= Similarity.CellAssignLiteralMax)
      df.withColumn(outCol, nearest(col(vecCol), centroids))
    else nearestJoined(df, centroids, idCol, vecCol, outCol)
  }

  /** `iters` Lloyd iterations from the deterministic seed (k lowest-id
    * vectors). Returns the final centroids — k×dim driver-side doubles,
    * the model artifact.
    *
    * TAKEDOWN POLICY: with `iters >= 1` every non-empty cluster's
    * centroid is the MEAN of its members — an aggregate statistic a
    * corpus takedown may keep (it summarizes, it does not copy). Two
    * residual copies to know about: `iters = 0` returns the seed
    * vectors verbatim, and an iteration whose cluster EMPTIES keeps the
    * previous vector (which at iteration 1 is still the seed copy) —
    * callers whose erasure obligations cover model bytes should retrain
    * via [[graft.core.FlumeDb.onRetract]] when the removed seq set
    * intersects their training snapshot (the hook delivers exactly that
    * set). The mounted IVF quantizer handles its own seed redaction
    * ([[graft.views.IVFIndexView]]). */
  def fit(
      points: DataFrame,
      k: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[(Int, Seq[Double])] = {
    val pts = points.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("v"))
    var centroids: Seq[(Int, Seq[Double])] =
      pts.orderBy("id").limit(k).collect().zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Double](1).toVector)
      }.toVector
    var it = 0
    while (it < iters) {
      val means = assignNearest(pts, centroids, "id", "v", "a")
        .select(col("a.cid").as("cell"), posexplode(col("v")))
        .groupBy("cell", "pos").agg(avg("col").as("m"))
        .collect() // k × dim rows — model-sized, not data-sized
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toVector
        }
      centroids = centroids.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
      it += 1
    }
    centroids
  }

  /** Cluster summary after `iters` iterations: per-cell member count,
    * lowest member id, and mean squared distance to the centroid. The
    * final assignment pass is the same narrow map as training. */
  def clusterSummary(
      points: DataFrame,
      k: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val model = fit(points, k, iters, idCol, vecCol)
    val pts = points.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("v"))
    assignNearest(pts, model, "id", "v", "a")
      .select(col("id"), col("a.cid").as("cell"), col("a.dist").as("d"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_members"), min("id").as("min_id"),
        round(avg("d"), 4).as("avg_sqdist"))
      .select(col("cell").cast("bigint").as("cell"), col("n_members"),
        col("min_id"), col("avg_sqdist"))
  }

  /** Assignment frame `(id, cell)` under a trained model — the labeling
    * pass a pipeline persists next to the corpus. */
  def assign(
      points: DataFrame,
      model: Seq[(Int, Seq[Double])],
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    assignNearest(
        points.select(col(idCol).as("id"),
          transform(col(vecCol), _.cast("double")).as("v")),
        model, "id", "v", "a")
      .select(col("id"), col("a.cid").cast("bigint").as("cell"))
}
