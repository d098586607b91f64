package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the clustering
  * stage of a training-data pipeline (topic bucketing, diversity
  * sampling, IVF coarse quantizer training).
  *
  * Scale shape per iteration (the only shape that survives 100 TB):
  *  - assignment is a NARROW map — the k centroids are folded into the
  *    plan as a literal array (k × dim doubles, a few KB; the driver
  *    holds them between iterations), so every row computes its argmin
  *    cell with zero shuffle and no join;
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
    * min). Narrow — no join, no shuffle. */
  private def nearest(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column = {
    val carr = array(centroids.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), typedLit(cv).as("cvec"))
    }: _*)
    array_min(transform(carr, c =>
      struct(l2sq(vec, c.getField("cvec")).as("dist"), c.getField("cid").as("cid"))))
  }

  /** `iters` Lloyd iterations from the deterministic seed (k lowest-id
    * vectors). Returns the final centroids — k×dim driver-side doubles,
    * the model artifact. */
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
      val means = pts
        .withColumn("cell", nearest(col("v"), centroids).getField("cid"))
        .select(col("cell"), posexplode(col("v")))
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
    pts.withColumn("a", nearest(col("v"), model))
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
    points.select(col(idCol).as("id"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .select(col("id"), nearest(col("v"), model).getField("cid").cast("bigint").as("cell"))
}
