package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("kmeans assignment matches a per-row brute-force reference") {
    // two obvious blobs around (0,0) and (10,10), seeds are ids 0 and 1
    // (one from each blob, so Lloyd converges immediately)
    val pts = vecs(
      0L -> Seq(0.1, 0.0), 1L -> Seq(10.0, 10.1), 2L -> Seq(0.0, 0.2),
      3L -> Seq(9.9, 10.0), 4L -> Seq(0.2, 0.1), 5L -> Seq(10.1, 9.8))
    val model = KMeans.fit(pts, k = 2, iters = 2)
    val got = KMeans.assign(pts, model).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val centroids = model.toMap
    val data = pts.collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    data.foreach { case (id, v) =>
      val best = centroids.toSeq.map { case (cid, c) =>
        (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min._2
      assert(got(id) == best.toLong, s"vec $id")
    }
    // the blobs must separate
    assert(got(0L) == got(2L) && got(2L) == got(4L))
    assert(got(1L) == got(3L) && got(3L) == got(5L))
    assert(got(0L) != got(1L))
  }

  test("kmeans inertia is non-increasing across iterations") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def inertia(iters: Int): Double =
      KMeans.clusterSummary(emb, k = 4, iters = iters)
        .agg(sum(col("avg_sqdist") * col("n_members"))).head().getDouble(0)
    val i1 = inertia(1); val i2 = inertia(2); val i3 = inertia(3)
    assert(i2 <= i1 + 1e-6, s"$i1 -> $i2")
    assert(i3 <= i2 + 1e-6, s"$i2 -> $i3")
  }

  test("kmeans keeps a centroid whose cell goes empty") {
    // ids 0 and 1 are identical, so both seeds coincide; every point
    // tie-breaks to cell 0 and cell 1 is empty from iteration 1 on —
    // it must keep its previous centroid, not crash or vanish
    val pts = vecs(0L -> Seq(0.0, 0.0), 1L -> Seq(0.0, 0.0), 2L -> Seq(1.0, 1.0))
    val model = KMeans.fit(pts, k = 2, iters = 2)
    assert(model.size == 2)
    assert(model.forall(_._2.length == 2))
  }

  test("int8 quantization round-trips within half a scale step") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Embeddings.quantizedVectors(emb)
    val bad = q.join(emb, "vec_id")
      .select(col("vec_id"),
        size(filter(zip_with(col("embedding"), col("q"),
          (x, qi) => abs(x.cast("double") - qi * col("scale")) > col("scale") * 0.5 + lit(1e-12)),
          b => b)).as("n_bad"))
      .agg(sum("n_bad")).head().getLong(0)
    assert(bad == 0L)
    // saturation bound: |q| <= 127 everywhere
    val over = q.select(size(filter(col("q"), x => abs(x) > 127L)).as("o"))
      .agg(sum("o")).head().getLong(0)
    assert(over == 0L)
  }

  test("quantization handles the zero vector") {
    val z = vecs(0L -> Seq(0.0, 0.0, 0.0))
    val r = Embeddings.quantizeInt8(z).head()
    assert(r.getAs[Double]("scale") == 0.0)
    assert(r.getAs[Long]("q_sum") == 0L)
  }
}
