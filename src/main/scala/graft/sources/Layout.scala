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

  // ---------------------------------------------------------------------
  // Z-order (Morton) two-dimensional layout
  // ---------------------------------------------------------------------

  /** Bit-interleave two quantized cell coordinates into a Morton code:
    * z = ... x1 y1 x0 y0 (x in the higher bit of each pair). Pure
    * shift/and/or column algebra — stays inside whole-stage codegen. */
  private def mortonExpr(qx: Column, qy: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(qx, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(qy, i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Driver-side inverse of [[mortonExpr]]. */
  private def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var x = 0L; var y = 0L; var i = 0
    while (i < bits) {
      x |= ((z >> (2 * i + 1)) & 1L) << i
      y |= ((z >> (2 * i)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  /** Write `df` clustered on the Z-order (Morton) curve over TWO numeric
    * keys: each key is quantized into `2^bitsPerDim` cells, the cell
    * coordinates are bit-interleaved into a Morton code, and the code's
    * top bits pick one of `nBuckets` partition DIRECTORIES (files inside
    * are sorted by the full code). Because a Morton prefix block is an
    * axis-aligned rectangle of cells, a 2-D box predicate prunes whole
    * directories at plan time in BOTH dimensions — the multi-dimensional
    * generalization of [[writeRangeBucketed]], where a single-key layout
    * can only prune one dimension and a box query on the other key reads
    * everything. The standard lakehouse data-skipping trick (public
    * Delta/Iceberg OPTIMIZE ZORDER), built here from plain partition
    * columns. One shuffle; the stored `__z` column is the in-file
    * clustering key that keeps parquet row-group stats tight for both
    * keys. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      keyX: String,
      keyY: String,
      bitsPerDim: Int = 8,
      nBuckets: Int = 64): Unit = {
    require(bitsPerDim >= 1 && bitsPerDim <= 20, s"bitsPerDim out of range: $bitsPerDim")
    require(nBuckets >= 2 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two, got $nBuckets")
    val bucketBits = java.lang.Long.numberOfTrailingZeros(nBuckets.toLong)
    require(bucketBits <= 2 * bitsPerDim, s"nBuckets $nBuckets exceeds 4^bitsPerDim")
    val bounds = df.agg(
      min(col(keyX)).cast("bigint"), max(col(keyX)).cast("bigint"),
      min(col(keyY)).cast("bigint"), max(col(keyY)).cast("bigint")).head()
    require(!bounds.isNullAt(0) && !bounds.isNullAt(2),
      s"cannot z-order an empty table (no non-null `$keyX`/`$keyY`)")
    val (loX, hiX, loY, hiY) =
      (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2), bounds.getLong(3))
    val cells = 1L << bitsPerDim
    val widthX = math.max(1L, (hiX - loX) / cells + 1)
    val widthY = math.max(1L, (hiY - loY) / cells + 1)
    val shift = 2 * bitsPerDim - bucketBits
    val z = mortonExpr(
      expr(s"(`$keyX` - ${loX}L) div ${widthX}L"),
      expr(s"(`$keyY` - ${loY}L) div ${widthY}L"), bitsPerDim)
    df.withColumn("__z", z)
      .withColumn("__zbucket", expr(s"__z div ${1L << shift}L"))
      .repartition(col("__zbucket"))
      .sortWithinPartitions(col("__zbucket"), col("__z"))
      .write.mode("overwrite").partitionBy("__zbucket").parquet(path)
    val meta = s"""{"keyX":"$keyX","keyY":"$keyY","originX":$loX,"widthX":$widthX,""" +
      s""""originY":$loY,"widthY":$widthY,"bits":$bitsPerDim,"nBuckets":$nBuckets}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "_zlayout.json"),
      meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def readZMeta(path: String): (String, String, Long, Long, Long, Long, Int, Int) = {
    val txt = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path, "_zlayout.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    def field(name: String): String =
      s""""$name":\\s*("?)([^,}"]*)\\1""".r.findFirstMatchIn(txt)
        .getOrElse(throw new IllegalStateException(s"_zlayout.json missing $name"))
        .group(2)
    (field("keyX"), field("keyY"), field("originX").toLong, field("widthX").toLong,
      field("originY").toLong, field("widthY").toLong, field("bits").toInt,
      field("nBuckets").toInt)
  }

  /** Inclusive 2-D box scan of a z-ordered table. Driver-side, each of
    * the `nBuckets` Morton prefix blocks is decoded to its cell
    * rectangle (a prefix block spans exactly
    * [deinterleave(zMin), deinterleave(zMax)] per axis because every
    * suffix bit combination occurs inside it); buckets whose rectangle
    * misses the query box are dropped from an `isin` partition
    * predicate — Catalyst never lists their directories. The residual
    * row predicate handles cell-edge rows and feeds parquet row-group
    * stats in the surviving files. */
  def scanBox(
      spark: SparkSession, path: String,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    val (keyX, keyY, originX, widthX, originY, widthY, bits, nBuckets) = readZMeta(path)
    val table = spark.read.parquet(path)
    if (xLo > xHi || yLo > yHi) return table.where(lit(false)).drop("__z", "__zbucket")
    val cells = 1L << bits
    def qOf(v: Long, origin: Long, width: Long): Long =
      math.min(cells - 1, math.max(0L, Math.floorDiv(v - origin, width)))
    val (qxLo, qxHi) = (qOf(xLo, originX, widthX), qOf(xHi, originX, widthX))
    val (qyLo, qyHi) = (qOf(yLo, originY, widthY), qOf(yHi, originY, widthY))
    val bucketBits = java.lang.Long.numberOfTrailingZeros(nBuckets.toLong)
    val shift = 2 * bits - bucketBits
    val kept = (0L until nBuckets.toLong).filter { b =>
      val (bxLo, byLo) = deinterleave(b << shift, bits)
      val (bxHi, byHi) = deinterleave(((b + 1L) << shift) - 1L, bits)
      bxHi >= qxLo && bxLo <= qxHi && byHi >= qyLo && byLo <= qyHi
    }
    table
      .where(col("__zbucket").isin(kept: _*) &&
        col(keyX).between(xLo, xHi) && col(keyY).between(yLo, yHi))
      .drop("__z", "__zbucket")
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
