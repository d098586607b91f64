package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation: two-stage salted group-by.
  *
  * A hot key (one user producing 10% of a 100 TB log) turns a plain
  * `groupBy(key)` into a single straggler task. Salting spreads each key
  * over `salts` partial groups — stage 1 aggregates `(key, salt)` with
  * map-side combine, stage 2 merges the ≤`salts` partials per key. Works
  * for any algebraic aggregate given its (partial, merge) column pair.
  * AQE's skew-join splitting covers joins; this covers aggregation,
  * which AQE does not rebalance.
  */
object Skew {

  /** Salted count + sum of `valueCol` per `key` — the common shape.
    * Result columns: key, cnt, sum_v. */
  def saltedSumCount(df: DataFrame, key: Column, valueCol: Column, salts: Int = 16): DataFrame = {
    val salted = df.groupBy(key.as("key"), pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).as("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(valueCol).as("__sum"))
    salted.groupBy("key")
      .agg(sum("__cnt").as("cnt"), sum("__sum").as("sum_v"))
  }

  /** General two-stage form: `partials` aggregate within (key, salt);
    * `merges` combine partials per key. The caller guarantees each merge
    * column re-aggregates its partial (sum→sum, count→sum, min→min...). */
  def salted(df: DataFrame, key: Column, partials: Seq[Column], merges: Seq[Column], salts: Int = 16): DataFrame = {
    val stage1 = df
      .groupBy(key.as("key"), pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).as("__salt"))
      .agg(partials.head, partials.tail: _*)
    stage1.groupBy("key").agg(merges.head, merges.tail: _*)
  }

  /** Skew-safe equi-join: salt the (skewed) fact side's key with a
    * random-ish shard in [0, salts) and replicate each dimension row
    * across ALL salts, so a hot key's join rows land on `salts` tasks
    * instead of one. Semantics are exactly `fact.join(dim, keys, "inner")`
    * with `dim` unique per key-tuple; the price is a `salts`× blow-up of
    * the (small) dimension shuffle — the standard remedy when the dim is
    * too large to broadcast outright and AQE's skew splitting is
    * unavailable (e.g. the join feeds a co-partitioned downstream op).
    * The salt must NOT be derived from the key (a hot key would land its
    * whole bulk on one shard again) — it spreads rows, not keys. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String], salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val shards = dim.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(shards, keys :+ "__salt").drop("__salt")
  }
}
