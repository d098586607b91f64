package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hash-bucketed co-located tables: the shuffle-free join layout.
  *
  * `bucketBy(n, key)` at write time hashes every row into one of `n`
  * buckets (bucket id encoded in the file name) and records the
  * bucketing in the catalog. Two tables bucketed on the SAME key with
  * the SAME bucket count are co-located: a sort-merge join between them
  * needs NO exchange on either side — each task zips bucket i of A with
  * bucket i of B — and with `sortBy(key)` the per-bucket sort is
  * pre-paid at write time too, so the join plan is scan→scan→merge.
  *
  * At 100 TB this is the decisive layout choice for repeated fact-fact
  * joins (orders × lineitem every day): a plain join shuffles BOTH
  * tables on every run, bucketing shuffles each exactly once, at write.
  * Broadcast handles small dims; bucketing handles the joins where both
  * sides are too big to broadcast. (Public Spark feature; the same
  * trick as Hive's clustered tables / Iceberg's bucket transform.)
  *
  * The bucket metadata lives in the session catalog (in-memory here, a
  * metastore on a real cluster), so a fresh session re-attaches an
  * existing layout with [[register]] — the files need no rewrite; the
  * reader recovers bucket ids from the file names.
  */
object Bucketed {

  /** Write `df` as an external bucketed+sorted parquet table at `path`,
    * registered as `tableName`. One shuffle now, none at every later
    * co-located join. */
  def write(df: DataFrame, path: String, tableName: String, key: String, nBuckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS `$tableName`")
    df.write
      .format("parquet")
      .mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(tableName)
  }

  /** Re-declare an existing bucketed layout in a fresh session (the
    * test catalog is per-session; on a cluster the metastore persists
    * this). `schemaDdl` is the column list, e.g. "a BIGINT, b STRING". */
  def register(
      spark: SparkSession, path: String, tableName: String,
      key: String, nBuckets: Int, schemaDdl: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    spark.sql(
      s"CREATE TABLE `$tableName` ($schemaDdl) USING parquet " +
        s"CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $nBuckets BUCKETS " +
        s"LOCATION '$path'")
  }

  def table(spark: SparkSession, tableName: String): DataFrame = spark.table(tableName)
}
