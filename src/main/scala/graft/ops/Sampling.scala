package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, portable sampling for training-data pipelines.
  *
  * `df.sample` / `sampleBy` draw from a seeded RNG whose stream depends
  * on partitioning — rerun the pipeline with different parallelism and
  * the sample changes. Training-data splits must be a pure function of
  * the KEY: the same document lands in the same split on every run, on
  * every engine, forever (eval contamination is the bug these guard
  * against). So the bucket is derived from an md5 of the key — portable
  * enough that the DuckDB oracle reproduces it bit-for-bit — and all
  * assignment is a narrow, codegen'd projection: no shuffle, no state,
  * trivially parallel at 100 TB.
  */
object Sampling {

  /** Stable bucket in [0, 1000) as a pure function of (key, salt):
    * the first 7 md5 hex digits (28 bits — sign-safe everywhere) mod
    * 1000. Change `salt` to draw an independent assignment. */
  def hashPermille(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 7), 16, 10)
      .cast("bigint") % 1000

  /** Keep a deterministic `keepPermille`/1000 fraction of rows by key. */
  def sampleByHash(df: DataFrame, keyCol: String, keepPermille: Int, salt: String = ""): DataFrame =
    df.where(hashPermille(col(keyCol), salt) < keepPermille)

  /** Stable train/eval split: rows whose bucket falls under
    * `evalPermille` go to "eval", the rest to "train". */
  def hashSplit(df: DataFrame, keyCol: String, evalPermille: Int, salt: String = ""): DataFrame =
    df.withColumn("bucket", hashPermille(col(keyCol), salt))
      .withColumn("split", when(col("bucket") < evalPermille, "eval").otherwise("train"))

  /** Domain mixing: downsample each source so the output matches the
    * `targetShares` mixture (web/books/code/... proportions of a
    * pretraining recipe), keeping as much data as feasible — the
    * binding source (largest target share relative to its row count)
    * is kept whole and every other source is hash-downsampled to
    * match. No upsampling, no RNG: acceptance is the same md5-permille
    * function of the key as every other split here, so the selection
    * is partition-invariant and replayable by the oracle.
    *
    * The per-source counts are a tiny aggregate collected to the
    * driver (the mixture spec is driver-side anyway); the filter
    * itself is a narrow projection — no shuffle on the data path.
    * Sources missing from `targetShares` are dropped. */
  def mixDomains(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      targetShares: Map[String, Double],
      salt: String = ""): DataFrame = {
    require(targetShares.nonEmpty && targetShares.values.forall(_ > 0),
      "targetShares must be non-empty and positive")
    val counts = df.groupBy(sourceCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = targetShares.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    if (present.isEmpty) return df.where(lit(false))
    // feasible output size: the binding source caps it
    val total = present.map { case (s, share) => counts(s) / share }.min
    // permille arithmetic mirrors the oracle expression exactly
    // (left-assoc double ops on exact integer counts), so both engines
    // floor the same IEEE value
    val permille = present.map { case (s, share) =>
      s -> math.min(1000L, math.floor(1000.0 * share * total / counts(s) + 1e-9).toLong)
    }
    val pmCol = permille.foldLeft(lit(-1L)) { case (acc, (s, p)) =>
      when(col(sourceCol) === s, lit(p)).otherwise(acc)
    }
    df.where(hashPermille(col(keyCol), salt) < pmCol)
  }

  /** Temperature-scaled domain mixing (the multilingual-pretraining
    * recipe: sample source i with probability ∝ nᵢ^α, α ∈ [0, 1] —
    * α = 1 keeps the natural distribution, α → 0 flattens toward
    * uniform). Restated as downsampling-only acceptance, the target
    * share s_i = nᵢ^α / Σ nⱼ^α with the smallest source kept whole
    * reduces to a per-source keep-fraction `(n_min / nᵢ)^(1-α)` — the
    * normalizing sum cancels, so no cross-engine float summation enters
    * the oracle math. Per-source counts are a tiny driver aggregate;
    * acceptance is the same portable md5-permille as the rest of the
    * sampling family (no RNG, partition-invariant). */
  def mixByTemperature(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      alpha: Double,
      salt: String = ""): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(sourceCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return df.where(lit(false))
    val nMin = counts.values.min
    val permille = counts.map { case (s, n) =>
      s -> math.min(1000L,
        math.floor(1000.0 * math.pow(nMin.toDouble / n, 1.0 - alpha) + 1e-9).toLong)
    }
    val pmCol = permille.foldLeft(lit(-1L)) { case (acc, (s, p)) =>
      when(col(sourceCol) === s, lit(p)).otherwise(acc)
    }
    df.where(hashPermille(col(keyCol), salt) < pmCol)
  }

  /** Deterministic per-group quota: at most `nPerGroup` rows per
    * `groupCol`, chosen by md5 order of the key (ties broken by the key
    * itself, so the pick is total and partition-invariant) — balanced
    * per-language / per-source quotas without an RNG. One shuffle on the
    * group key; a skewed group costs one task's sort of that group, the
    * standard windowed-top-k tradeoff (grouped top-k via bounded heaps
    * exists for the val-ranked case, `TopKAggregator`). */
  def stratifiedByHash(df: DataFrame, groupCol: String, keyCol: String,
      nPerGroup: Int, salt: String = ""): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(md5(concat(col(keyCol).cast("string"), lit(salt))), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= nPerGroup)
      .drop("__rk")
  }

  /** Deterministic training-data sharding: assign each row to one of
    * `nShards` output shards and give it a stable position inside the
    * shard — both pure functions of (key, salt), so the exported order
    * is partition-invariant and reproducible forever (the same md5
    * discipline as the split family; an RNG shuffle would re-deal on
    * every rerun). Shard = md5-permille mod nShards; position = rank by
    * (md5, key) inside the shard — a per-shard window, never a global
    * sort. Change `salt` for an independent epoch order. */
  def shardByHash(
      df: DataFrame,
      keyCol: String,
      nShards: Int,
      salt: String = ""): DataFrame = {
    require(nShards > 0, "need at least one shard")
    val h = md5(concat(col(keyCol).cast("string"), lit(salt)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", h)
      .withColumn("shard", (hashPermille(col(keyCol), salt) % nShards).cast("bigint"))
      .withColumn("shard_pos", row_number().over(w).cast("bigint"))
      .drop("__h")
  }

  /** Token-budget corpus selection: greedily keep documents in
    * (score DESC, id ASC) order while the running token total stays
    * under `budgetTokens` — "take the best N-token corpus", the
    * data-selection step between scoring and training. A document is
    * kept iff the total BEFORE it is under budget (the last kept doc may
    * straddle the line).
    *
    * The running total is a global prefix sum in score order — the
    * `Window.orderBy` one-partition trap again — so this reuses
    * [[Packing]]'s two-phase scan with SCORE-range buckets: bucket =
    * floor((max - score) / width) (a pure function of the score, so
    * equal scores share a bucket and bucket order IS descending score
    * order), per-bucket totals collected as P driver rows, exclusive
    * offsets broadcast back, cumulative window per bucket. One shuffle
    * of (id, n_tokens, score) triples; the text is scanned once.
    *
    * `score` must be deterministic and cross-engine-stable (e.g. the
    * ROUNDED [[TextAnalysis.qualityCol]]); ties break on id. */
  def selectByBudget(
      docs: DataFrame,
      budgetTokens: Long,
      score: Column,
      nBuckets: Int = 32,
      idCol: String = "doc_id",
      textCol: String = "text",
      checkpointResult: Boolean = true): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    val counted = docs.select(
      col(idCol).cast("long").as("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"),
      score.cast("double").as("score"))
    budgetScan(counted, budgetTokens, nBuckets, checkpointResult)
  }

  /** Exact top-fraction selection by score — keep the `frac`·n
    * highest-(score, doc_id)-ranked rows. A quantile FILTER restated as
    * a count budget with unit weights, so it rides [[selectByBudget]]'s
    * two-phase distributed prefix scan: exact global rank semantics
    * without an exact-percentile aggregate (which buffers every value)
    * and without a one-partition global window. Bucketing by score
    * range preserves the total (score DESC, doc_id ASC) order across
    * buckets, so `cum_before` IS the global 0-based rank. */
  def topFraction(
      docs: DataFrame,
      frac: Double,
      score: Column,
      idCol: String = "doc_id",
      nBuckets: Int = 32): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac out of (0,1]: $frac")
    val counted = docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit(1L).as("n_tokens"),
      score.cast("double").as("score"))
    val keepN = math.max(1L, math.floor(counted.count() * frac).toLong)
    budgetScan(counted, keepN, nBuckets, checkpointResult = true)
      .select(col("doc_id"), col("score"), col("cum_before").as("rank_before"))
  }

  /** The shared two-phase scan over a pre-counted (doc_id, n_tokens,
    * score) frame: score-range buckets, P-row broadcast offsets,
    * per-bucket windows. */
  private def budgetScan(
      counted: DataFrame,
      budgetTokens: Long,
      nBuckets: Int,
      checkpointResult: Boolean): DataFrame = {
    val b = counted.agg(min("score"), max("score")).head()
    // same column ORDER as the normal path — positional consumers must
    // see one schema whether or not the input was empty
    if (b.isNullAt(1))
      return counted.select(col("doc_id"), col("score"), col("n_tokens"))
        .withColumn("cum_before", lit(0L)).limit(0)
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    val width = if (hi > lo) (hi - lo) / nBuckets else 1.0
    val bucketed = counted.withColumn("__b",
      least(greatest(floor((lit(hi) - col("score")) / lit(width)), lit(0.0)),
        lit((nBuckets - 1).toDouble)).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // P rows to the driver; the collect doubles as cache materialization
    val totals = bucketed.groupBy("__b").agg(sum("n_tokens").as("__bsum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offs = totals.scanLeft((0L, 0L)) { case ((_, acc), (bk, s)) => (bk, acc + s) }
    val offsets = totals.map(_._1).zip(offs.dropRight(1).map(_._2)).toSeq
    val spark = counted.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__b", "__off")
    val wIn = org.apache.spark.sql.expressions.Window.partitionBy("__b")
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val out = bucketed.join(broadcast(offDf), "__b")
      .withColumn("cum_before", coalesce(sum("n_tokens").over(wIn), lit(0L)) + col("__off"))
      .where(col("cum_before") < budgetTokens)
      .select(col("doc_id"), col("score"), col("n_tokens"), col("cum_before"))
    if (!checkpointResult) return out
    val ck = out.localCheckpoint(true)
    bucketed.unpersist(blocking = false)
    ck
  }
}
