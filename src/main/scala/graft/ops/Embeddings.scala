package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column utilities for training-data pipelines. All narrow
  * per-row transforms (no shuffle, no UDFs — pure Catalyst column
  * algebra), so they scale linearly with input splits and stay inside
  * whole-stage codegen. */
object Embeddings {

  /** L2 norm of an array column (as double). */
  def l2norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")), lit(0.0), _ + _))

  /** Unit-normalized copy of the vector (zero vectors pass through). */
  def normalized(v: Column): Column = {
    val n = l2norm(v)
    when(n === 0.0, transform(v, _.cast("double")))
      .otherwise(transform(v, x => x.cast("double") / n))
  }

  /** Symmetric int8 quantization: `scale = max|x| / 127`,
    * `q_i = floor(x_i / scale + 0.5)` (round-half-up, sign-symmetric
    * range [-127, 127]). The standard storage/serving compression for
    * embedding tables — 4× smaller than float32 on the wire and on
    * disk, which at 100 TB of vectors is the difference between one
    * cluster and four. Deterministic pure arithmetic: reproducible
    * anywhere, including the SQL oracle. */
  def quantizeInt8(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // Staged projections: higher-order array expressions sit outside
    // whole-stage codegen, so a flat select would recompute v/maxabs/q
    // once per referencing output column. Each stage materializes one
    // expensive array exactly once; CollapseProject keeps the stages
    // because the producers are non-cheap and multiply referenced.
    val s1 = embeddings.select(
      col(idCol), transform(col(vecCol), _.cast("double")).as("__v"))
    val s2 = s1.select(
      col(idCol), col("__v"),
      array_max(transform(col("__v"), x => abs(x))).as("__maxabs"))
    val scale = col("__maxabs") / lit(127.0)
    val s3 = s2.select(
      col(idCol), col("__maxabs"),
      when(col("__maxabs") === 0.0, transform(col("__v"), _ => lit(0L)))
        .otherwise(transform(col("__v"), x => floor(x / scale + lit(0.5)).cast("long")))
        .as("__q"))
    s3.select(
      col(idCol),
      round(col("__maxabs") / lit(127.0), 6).as("scale"),
      aggregate(col("__q"), lit(0L), _ + _).as("q_sum"),
      array_min(col("__q")).as("q_min"),
      array_max(col("__q")).as("q_max"),
      size(filter(col("__q"), x => abs(x) === 127L)).cast("bigint").as("n_saturated"))
  }

  /** The quantized vectors themselves (`array<long>` in [-127,127]),
    * for pipelines that store the compressed table. */
  def quantizedVectors(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // staged like quantizeInt8: with scale inlined, the per-element
    // lambda would re-run array_max over the whole vector for EVERY
    // element — O(d^2) per row
    val s1 = embeddings.select(
      col(idCol), transform(col(vecCol), _.cast("double")).as("__v"))
    val s2 = s1.select(
      col(idCol), col("__v"),
      (array_max(transform(col("__v"), x => abs(x))) / lit(127.0)).as("scale"))
    s2.select(
      col(idCol),
      col("scale"),
      when(col("scale") === 0.0, transform(col("__v"), _ => lit(0L)))
        .otherwise(transform(col("__v"), x => floor(x / col("scale") + lit(0.5)).cast("long")))
        .as("q"))
  }
}
