package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range-bucketed storage layout: the generic form of the seq-bucketed
  * directory scheme `ParquetLog` uses for log ranges, applied to any
  * numeric key of any table.
  *
  * `writeRangeBucketed` bins rows into `nBuckets` contiguous key
  * intervals, writes the bin as a parquet PARTITION column (one
  * directory per bucket), and sorts rows inside each file. A sidecar
  * file records the bin origin/width so readers can translate a key
  * predicate into a bucket predicate. `scanRange` then prunes at three
  * levels:
  *   1. bucket predicate -> Catalyst partition pruning drops whole
  *      DIRECTORIES at plan time (never listed, never opened);
  *   2. the key predicate is pushed to parquet, whose row-group min/max
  *      stats (tight, because files are sorted) drop pages inside
  *      surviving files;
  *   3. column pruning reads only requested columns.
  * At 100 TB this is the difference between "range query touches every
  * executor" and "range query reads two directories". Plan-time pruning
  * is observable: the scan's partition/file counts shrink (asserted in
  * LayoutSpec), unlike sorted-only layouts whose file skipping happens
  * invisibly inside the parquet reader.
  *
  * Mirrors the reference's offset-bucketed log segments
  * (/root/reference/README.md:101 "log is a sequence of records
  * addressed by byte offset") generalized to arbitrary keys.
  */
object Layout {

  /** Bucket function: floor((key - origin) / width), as integer `div`
    * so bucket ids stay exact past 2^53 (origin = table min, so the
    * numerator is non-negative and div == floor). */
  private def bucketOf(key: String, origin: Long, width: Long): Column =
    expr(s"(`$key` - ${origin}L) div ${width}L")

  /** Write `df` range-bucketed by numeric `key` into `path` with
    * `nBuckets` directories; returns (origin, width). One shuffle
    * (repartition by bucket) + one tiny min/max agg over the key. */
  def writeRangeBucketed(df: DataFrame, path: String, nBuckets: Int, key: String): (Long, Long) = {
    val bounds = df.agg(min(col(key)).cast("bigint"), max(col(key)).cast("bigint")).head()
    // fail fast: writing an empty frame would produce a directory with
    // no parquet files, and a later scanRange would die on schema
    // inference far from the actual cause
    require(!bounds.isNullAt(0), s"cannot range-bucket an empty table (no non-null `$key`)")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (hi - lo) / nBuckets + 1)
    val bucketed = df.withColumn("__bucket", bucketOf(key, lo, width))
    bucketed
      .repartition(col("__bucket"))
      .sortWithinPartitions(col("__bucket"), col(key))
      .write.mode("overwrite").partitionBy("__bucket").parquet(path)
    val meta = s"""{"key":"$key","origin":$lo,"width":$width}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "_layout.json"),
      meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (lo, width)
  }

  private def readMeta(path: String): (String, Long, Long) = {
    val txt = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path, "_layout.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    def field(name: String): String =
      s""""$name":\\s*("?)([^,}"]*)\\1""".r.findFirstMatchIn(txt)
        .getOrElse(throw new IllegalStateException(s"_layout.json missing $name"))
        .group(2)
    (field("key"), field("origin").toLong, field("width").toLong)
  }

  /** Inclusive key-range scan of a range-bucketed table. The bucket
    * predicate (from the sidecar's origin/width) makes partition pruning
    * kick in; the key predicate handles bucket-edge rows and feeds
    * parquet row-group stats. */
  def scanRange(spark: SparkSession, path: String, lo: Long, hi: Long): DataFrame = {
    val (key, origin, width) = readMeta(path)
    val bLo = (lo - origin) / width
    val bHi = (hi - origin) / width
    spark.read.parquet(path)
      .where(col("__bucket").between(bLo, bHi) && col(key).between(lo, hi))
      .drop("__bucket")
  }

  /** Pruning evidence: (partition directories in the table, directories
    * the filtered scan kept after plan-time pruning). Does not execute
    * the scan — pruning is visible in the planned FileSourceScanExec. */
  def pruningCounts(table: DataFrame, filtered: DataFrame): (Long, Long) = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scanOf(df: DataFrame): FileSourceScanExec =
      df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case s: FileSourceScanExec => s }
        .getOrElse(throw new IllegalStateException("no file scan in plan"))
    (scanOf(table).selectedPartitions.partitionCount.toLong,
      scanOf(filtered).selectedPartitions.partitionCount.toLong)
  }
}
