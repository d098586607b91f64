package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Shared behavioral contract for every log backend, the analog of the
  * reference's storage-parameterized suite (`test/util/memlog.js:9` run
  * against memory/level/offset logs). */
trait FlumeLogContract extends SparkSpec {
  def mkLog(): FlumeLog

  val payloadSchema: StructType = StructType(Seq(StructField("foo", LongType)))
  def rows(vs: Long*): Seq[Row] = vs.map(v => Row(v))

  private def append(log: FlumeLog, vs: Long*): Long = log match {
    case m: MemoryLog  => m.appendRows(rows(vs: _*))
    case p: ParquetLog => p.appendRows(rows(vs: _*))
    case other         => other.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows(vs: _*)), payloadSchema))
  }

  test("empty log: since = -1, read is empty") {
    val log = mkLog()
    assert(log.since === -1L)
    assert(log.read.count() === 0L)
  }

  test("append advances since contiguously; batch append is atomic") {
    val log = mkLog()
    assert(append(log, 10L) === 0L)
    assert(log.since === 0L)
    assert(append(log, 20L, 30L, 40L) === 3L) // one batch, one final seq
    assert(log.since === 3L)
    assert(log.read.count() === 4L)
  }

  test("onSince: subscribe emits the current cursor, each committed append emits once") {
    val log = mkLog()
    append(log, 1L)
    val seen = scala.collection.mutable.Buffer[Long]()
    val unsub = log.onSince(seen += _)
    assert(seen.toSeq === Seq(0L), "subscribe emits the current value (obz)")
    append(log, 2L, 3L)
    assert(seen.toSeq === Seq(0L, 2L), "one emission per committed batch, at its final seq")
    unsub()
    append(log, 4L)
    assert(seen.size === 2, "unsubscribed listener must not fire")
  }

  test("get is a point lookup by seq") {
    val log = mkLog()
    append(log, 10L, 20L, 30L)
    val r = log.get(1L).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("foo") === 20L)
  }

  test("stream honors gt/gte/lt/lte bounds") {
    val log = mkLog()
    append(log, 0L, 10L, 20L, 30L, 40L)
    assert(log.stream(LogRange(gt = Some(1L), lte = Some(3L)))
      .select("seq").collect().map(_.getLong(0)).toSeq === Seq(2L, 3L))
    assert(log.stream(LogRange(gte = Some(1L), lt = Some(3L)))
      .select("seq").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("stream reverse + limit = top-k by seq") {
    val log = mkLog()
    append(log, 0L, 10L, 20L, 30L, 40L)
    assert(log.stream(LogRange(reverse = true, limit = Some(2)))
      .select("seq").collect().map(_.getLong(0)).toSeq === Seq(4L, 3L))
  }

  test("seqs/values projection flags prune columns") {
    val log = mkLog()
    append(log, 10L, 20L)
    assert(log.stream(LogRange(values = false)).columns.toSeq === Seq("seq"))
    assert(log.stream(LogRange(seqs = false)).columns.toSeq === Seq("foo"))
    assert(log.stream().columns.toSeq === Seq("seq", "foo"))
  }

  test("retract: matching rows leave, surviving seqs unchanged, cursor never regresses") {
    import org.apache.spark.sql.functions.col
    val log = mkLog()
    append(log, 10L, 20L, 30L, 40L, 50L)
    // middle takedown: holes in the seq space, neighbors untouched
    assert(log.retract(col("foo") === 30L) === 1L)
    assert(log.read.select("seq", "foo").collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((0L, 10L), (1L, 20L), (3L, 40L), (4L, 50L)))
    assert(log.since === 4L)
    // idempotent: nothing left to match, nothing rewritten
    assert(log.retract(col("foo") === 30L) === 0L)
    // NULL predicate rows are KEPT
    assert(log.retract(org.apache.spark.sql.functions.lit(null).cast("boolean")) === 0L)
    // TAIL takedown: retired seqs are never re-stamped
    assert(log.retract(col("foo") === 50L) === 1L)
    assert(log.since === 4L, "cursor preserved after tail retraction")
    assert(append(log, 60L) === 5L, "new rows extend the seq space past the retired tail")
    // batch id-list form: the join-marked path, same contract
    val ids = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(20L), org.apache.spark.sql.Row(999L))),
      StructType(Seq(StructField("foo", LongType))))
    assert(log.retractIds(ids, "foo") === 1L)
    assert(log.read.select("foo").collect().map(_.getLong(0)).toSet === Set(10L, 40L, 60L))
  }

  test("expire: the seq prefix leaves, survivors keep seqs, cursor never regresses") {
    val log = mkLog()
    append(log, 10L, 20L, 30L, 40L, 50L) // seqs 0..4
    assert(log.expire(1L) === 2L)
    assert(log.read.select("seq", "foo").collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((2L, 30L), (3L, 40L), (4L, 50L)))
    assert(log.since === 4L)
    assert(log.expire(1L) === 0L, "idempotent: the prefix is already gone")
    assert(log.expire(-5L) === 0L, "a negative horizon expires nothing")
    // retention past the tail: everything leaves, but the cursor is the
    // HWM of seqs ever ISSUED — the retired tail seqs never re-stamp
    assert(log.expire(100L) === 3L)
    assert(log.read.count() === 0L)
    assert(log.since === 4L, "cursor preserved after tail expiry")
    assert(append(log, 60L) === 5L, "new rows extend the retired seq space")
    assert(log.read.select("seq").collect().map(_.getLong(0)).toSeq === Seq(5L))
  }
}

class MemoryLogSpec extends FlumeLogContract {
  def mkLog(): FlumeLog = new MemoryLog(spark, payloadSchema)
}

class BucketedParquetLogSpec extends FlumeLogContract {
  def mkLog(): FlumeLog = new ParquetLog(spark,
    java.nio.file.Files.createTempDirectory("graft-test-blog").toString, payloadSchema,
    bucketSize = 2L)

  test("range scans prune seq buckets at planning time (PartitionFilters)") {
    val log = mkLog().asInstanceOf[ParquetLog]
    log.appendRows(rows(0L, 10L, 20L, 30L, 40L, 50L))
    val buckets = new java.io.File(log.dir).listFiles().filter(_.getName.startsWith("seq_bucket=")).map(_.getName).sorted
    assert(buckets.toSeq === Seq("seq_bucket=0", "seq_bucket=1", "seq_bucket=2"))
    val df = log.stream(LogRange(gte = Some(2L), lte = Some(3L)))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(2L, 3L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("seq_bucket") && plan.contains("isnotnull(seq_bucket"),
      s"expected bucket partition pruning:\n${plan.take(1500)}")
  }

  test("compact keeps the bucket layout and pruning") {
    val log = mkLog().asInstanceOf[ParquetLog]
    (0 until 6).foreach(i => log.appendRows(rows(i * 10L))) // tiny appends across 3 buckets
    log.compact()
    val buckets = new java.io.File(log.dir).listFiles()
      .filter(_.getName.startsWith("seq_bucket=")).map(_.getName).sorted
    assert(buckets.toSeq === Seq("seq_bucket=0", "seq_bucket=1", "seq_bucket=2"),
      s"bucket directories must survive compaction, got ${buckets.toSeq}")
    val df = log.stream(LogRange(gte = Some(2L), lte = Some(3L)))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(2L, 3L))
    assert(df.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    log.appendRows(rows(77L))
    assert(log.since === 6L)
  }

  test("expire truncates whole buckets; buckets past the boundary stay byte-identical") {
    val log = mkLog().asInstanceOf[ParquetLog] // bucketSize = 2
    log.appendRows(rows(0L, 10L, 20L, 30L, 40L, 50L, 60L)) // seqs 0..6, buckets 0..3
    def files(b: Long): Seq[(String, Long, Long)] =
      Option(new java.io.File(log.dir, s"seq_bucket=$b").listFiles())
        .getOrElse(Array.empty[java.io.File]).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length(), f.lastModified())).sortBy(_._1).toSeq
    val sig2 = files(2L); val sig3 = files(3L)
    // horizon inside bucket 1: bucket 0 truncates WHOLE (no read of its
    // data), bucket 1 rewrites (seq 3 survives), buckets 2,3 untouched
    assert(log.expire(2L) === 3L)
    val names = new java.io.File(log.dir).listFiles()
      .map(_.getName).filter(_.startsWith("seq_bucket=")).sorted
    assert(names.toSeq === Seq("seq_bucket=1", "seq_bucket=2", "seq_bucket=3"))
    assert(files(2L) === sig2 && files(3L) === sig3,
      "buckets past the boundary must keep their files byte-for-byte")
    assert(log.read.select("seq").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(3L, 4L, 5L, 6L))
    // horizon exactly on a bucket edge: NO rewrite anywhere — bucket 1
    // (now just seq 3) truncates whole, later buckets byte-identical
    val sig2b = files(2L)
    assert(log.expire(3L) === 1L)
    assert(files(2L) === sig2b && files(3L) === sig3)
    assert(log.read.select("seq").collect().map(_.getLong(0)).sorted.toSeq === Seq(4L, 5L, 6L))
    assert(log.since === 6L)
    // the HWM marker written by expiry survives reopen AND compaction
    val reopened = new ParquetLog(spark, log.dir, payloadSchema, bucketSize = 2L)
    assert(reopened.since === 6L)
    reopened.compact()
    assert(reopened.since === 6L)
    val reopened2 = new ParquetLog(spark, log.dir, payloadSchema, bucketSize = 2L)
    assert(reopened2.since === 6L, "the cursor marker must ride the compaction swap")
    assert(reopened2.read.select("seq").collect().map(_.getLong(0)).sorted.toSeq === Seq(4L, 5L, 6L))
  }

  test("expire fences live tails like retract") {
    val log = mkLog().asInstanceOf[ParquetLog]
    log.appendRows(rows(1L, 2L))
    // a planned-but-uncommitted micro-batch (the only tail state a
    // rewrite must wait out now that every tail rides the seq-offset
    // source) makes the rewrite refuse rather than invalidate readers
    log.inflightTailBatches.add("tail-x")
    val e = intercept[IllegalStateException](log.expire(0L))
    assert(e.getMessage.startsWith("expire:") && e.getMessage.contains("micro-batch"))
    log.inflightTailBatches.remove("tail-x")
    assert(log.expire(0L) === 1L, "the fence lifts when the batch commits")
  }
}

/** The third appendable backend through the same contract — the analog
  * of the reference running its shared suite against flumelog-level
  * (`test/level.js:4`): same behavior, different store + codec. */
class JsonLinesLogSpec extends FlumeLogContract {
  def mkLog(): FlumeLog = new JsonLinesLog(spark,
    java.nio.file.Files.createTempDirectory("graft-test-jlog").toString, payloadSchema)

  test("log survives reopen: cursor and contents recovered from the files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-test-jlog2").toString
    val log1 = new JsonLinesLog(spark, dir, payloadSchema)
    log1.appendRows(rows(10L, 20L, 30L))
    val log2 = new JsonLinesLog(spark, dir, payloadSchema)
    assert(log2.since === 2L)
    assert(log2.read.orderBy("seq").collect().map(_.getAs[Long]("foo")).toSeq === Seq(10L, 20L, 30L))
    assert(log2.appendRows(rows(40L)) === 3L)
  }

  test("records on disk are human-readable JSON lines (the flumecodec story)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-test-jlog3").toString
    val log = new JsonLinesLog(spark, dir, payloadSchema)
    log.appendRows(rows(42L))
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".json"))
    assert(files.nonEmpty)
    val lines = files.flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
    assert(lines.exists(l => l.contains("\"seq\":0") && l.contains("\"foo\":42")),
      s"expected a JSON record line, got:\n${lines.mkString("\n")}")
  }
}

class ParquetLogSpec extends FlumeLogContract {
  def mkLog(): FlumeLog = new ParquetLog(spark,
    java.nio.file.Files.createTempDirectory("graft-test-log").toString, payloadSchema)

  test("multi-partition append preserves the batch's row order in seq order") {
    val log = mkLog().asInstanceOf[ParquetLog]
    // 1000 rows across 7 partitions with uneven sizes: the per-partition
    // offset scheme must reproduce zipWithIndex's ordering exactly
    val vals = (0L until 1000L).map(i => Row(i * 3))
    log.append(spark.createDataFrame(spark.sparkContext.parallelize(vals, 7), payloadSchema))
    assert(log.since === 999L)
    val got = log.read.orderBy("seq").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === (0L until 1000L).map(i => (i, i * 3)))
  }

  test("compact coalesces small append files; contents and cursor unchanged") {
    val log = mkLog().asInstanceOf[ParquetLog]
    (0 until 8).foreach(i => log.appendRows(rows(i * 10L))) // 8 tiny appends
    def parquetFiles(): Int = {
      def walk(f: java.io.File): Int = {
        val fs = f.listFiles()
        if (fs == null) 0
        else fs.map(c => if (c.isDirectory) walk(c) else if (c.getName.endsWith(".parquet")) 1 else 0).sum
      }
      walk(new java.io.File(log.dir))
    }
    val before = parquetFiles()
    assert(before >= 8, s"8 appends should leave >=8 files, got $before")
    val snapshot = log.read.orderBy("seq").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    log.compact()
    assert(parquetFiles() < before, "compaction must reduce file count")
    assert(log.since === 7L, "cursor unchanged")
    assert(log.read.orderBy("seq").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq === snapshot,
      "contents unchanged")
    log.appendRows(rows(99L)) // appends still work on the rewritten layout
    assert(log.since === 8L)
    assert(log.get(8L).collect()(0).getAs[Long]("foo") === 99L)
  }

  test("compact is exported as a log method on the db (passthrough)") {
    val log = mkLog().asInstanceOf[ParquetLog]
    log.appendRows(rows(1L, 2L))
    val db = new FlumeDb(log)
    assert(db.call("compact") === 1L) // returns the (unchanged) cursor
    assert(db.meta("compact").get() === 1L)
  }

  test("cursor is recovered on reopen") {
    val dir = java.nio.file.Files.createTempDirectory("graft-test-reopen").toString
    val log = new ParquetLog(spark, dir, payloadSchema)
    log.appendRows(rows(10L, 20L, 30L))
    assert(log.since === 2L)
    val reopened = new ParquetLog(spark, dir, payloadSchema)
    assert(reopened.since === 2L)
    assert(reopened.read.count() === 3L)
    reopened.appendRows(rows(40L))
    assert(reopened.since === 3L)
  }

  test("reopen recovers a crash between compact's two renames (.precompact survives)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-test-crash1").toString
    val log = new ParquetLog(spark, dir, payloadSchema)
    log.appendRows(rows(10L, 20L, 30L))
    // Simulate the crash window: root moved aside, rewritten copy staged,
    // JVM dies before tmp -> root.
    val root = new java.io.File(dir)
    val old = new java.io.File(dir + ".precompact")
    val tmp = new java.io.File(dir + ".compacting")
    assert(root.renameTo(old))
    tmp.mkdirs() // a partial rewrite (no _SUCCESS) must not be adopted
    val reopened = new ParquetLog(spark, dir, payloadSchema)
    assert(reopened.since === 2L, "recovered log must see its data")
    assert(reopened.read.orderBy("seq").collect().map(_.getLong(1)).toSeq === Seq(10L, 20L, 30L))
    assert(!old.exists() && !tmp.exists(), "recovery must consume the leftover dirs")
    reopened.compact() // and the next compact must not destroy anything
    assert(reopened.since === 2L)
  }

  test("reopen recovers a crash after compact's swap (stale .precompact beside healthy root)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-test-crash2").toString
    val log = new ParquetLog(spark, dir, payloadSchema)
    log.appendRows(rows(10L, 20L))
    // Simulate: swap completed, crash before deleteTree(old) — old holds a
    // stale pre-compact copy that must NOT resurrect.
    val old = new java.io.File(dir + ".precompact")
    old.mkdirs()
    java.nio.file.Files.copy(
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head.toPath,
      new java.io.File(old, "stale.parquet").toPath)
    val reopened = new ParquetLog(spark, dir, payloadSchema)
    assert(reopened.since === 1L)
    assert(reopened.read.count() === 2L, "stale leftovers must not duplicate data")
    // a read-only open of a healthy log never mutates the directory;
    // the next compact is what cleans the stale leftover
    assert(old.exists())
    reopened.compact()
    assert(!old.exists(), "compact cleans stale leftovers before swapping")
    assert(reopened.read.count() === 2L)
  }

  test("reopen discards an abandoned rewrite staged before the swap began") {
    // Crash window 1: .compacting fully written (with _SUCCESS) but the
    // JVM died before root was moved aside — root is intact and must win.
    val dir = java.nio.file.Files.createTempDirectory("graft-test-crash0").toString
    val log = new ParquetLog(spark, dir, payloadSchema)
    log.appendRows(rows(10L, 20L))
    val tmp = new java.io.File(dir + ".compacting")
    tmp.mkdirs()
    java.nio.file.Files.copy(
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head.toPath,
      new java.io.File(tmp, "staged.parquet").toPath)
    java.nio.file.Files.createFile(new java.io.File(tmp, "_SUCCESS").toPath)
    val reopened = new ParquetLog(spark, dir, payloadSchema)
    assert(reopened.since === 1L)
    assert(reopened.read.count() === 2L, "root must win over a staged rewrite")
    assert(tmp.exists(), "a read-only open leaves the leftover in place")
    reopened.compact()
    assert(reopened.read.count() === 2L, "compact discards the abandoned rewrite, not the data")
  }

  test("compact coexists with the seq-offset tail (no file-granular fence remains)") {
    val log = mkLog().asInstanceOf[ParquetLog]
    log.appendRows(rows(1L, 2L, 3L))
    log.readStream // the ONLY tail: seq-offset source, plans by seq intervals
    log.compact()  // ...so compaction proceeds (readers re-resolve intervals)
    assert(log.read.count() === 3L)
    // a fresh handle on the same dir compacts too — there is no sticky
    // per-directory file-tail guard left to trip
    val second = new ParquetLog(spark, log.dir, payloadSchema)
    second.compact()
    assert(second.read.count() === 3L)
  }
}

/** CSV / JSON-lines tables as read-only logs — the codec-pluggable half
  * of the flumelog family (`/root/reference/README.md:84-87`). */
class TableLogFormatsSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def sample = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(Row(0L, "a"), Row(1L, "b"), Row(2L, "c"), Row(3L, "d"))),
    schema)

  test("csv table log: scan, range, point get") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    sample.write.option("header", "true").mode("overwrite").csv(dir)
    val log = TableLog.csv(spark, dir, "id", schema)
    assert(log.since === 3L)
    assert(log.stream(LogRange(gte = Some(1L), lte = Some(2L)))
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(log.get(2L).collect()(0).getAs[String]("v") === "c")
  }

  test("json table log: scan, range, appends rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    sample.write.mode("overwrite").json(dir)
    val log = TableLog.json(spark, dir, "id", schema)
    assert(log.since === 3L)
    assert(log.read.where(col("id") > 1).count() === 2L)
    intercept[UnsupportedOperationException](log.append(sample))
  }

  test("orc table log: scan, range, point get, predicate pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    sample.write.mode("overwrite").orc(dir)
    val log = TableLog.orc(spark, dir, "id")
    assert(log.since === 3L)
    assert(log.stream(LogRange(gte = Some(1L), lte = Some(2L)))
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(log.get(2L).collect()(0).getAs[String]("v") === "c")
    // the range predicate reaches the ORC reader (stripe-stat skipping)
    val qe = log.stream(LogRange(gt = Some(1L))).queryExecution.toString
    assert(qe.contains("PushedFilters") && qe.contains("GreaterThan(id,1"),
      s"expected pushed ORC filters:\n${qe.take(1500)}")
  }
}

/** Bucket-stats takedown pruning: per-bucket [min,max] for declared
  * takedown-key columns lets a predicate or id-list takedown SKIP
  * non-overlapping buckets in its match scan (the way seq arithmetic
  * already prunes retention). */
class BucketStatsPruningSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.graftbridge.ColumnBridge

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("tag", StringType)))

  test("statsProveEmpty: the data-skipping grammar, conservatively") {
    import org.apache.spark.sql.graftbridge.{LongStats, StatsRange}
    val st: String => Option[StatsRange] =
      { case "a" => Some(LongStats(10L, 20L)); case _ => None }
    def empty(c: org.apache.spark.sql.Column) = ColumnBridge.statsProveEmpty(c, st)
    assert(empty(col("a") === 5L) && empty(col("a") === 25L))
    assert(!empty(col("a") === 15L))
    assert(empty(lit(5L) === col("a")), "flipped equality")
    assert(empty(col("a") > 20L) && !empty(col("a") > 19L))
    assert(empty(col("a") >= 21L) && !empty(col("a") >= 20L))
    assert(empty(col("a") < 10L) && !empty(col("a") < 11L))
    assert(empty(col("a") <= 9L) && !empty(col("a") <= 10L))
    assert(empty(lit(25L) < col("a")), "flipped comparison: 25 < a is a > 25")
    assert(empty(col("a").isin(1L, 2L, 30L)) && !empty(col("a").isin(1L, 15L)))
    // and: one provably-empty conjunct suffices; or: all disjuncts must be
    assert(empty(col("a") === 5L && col("b") === 1L))
    assert(!empty(col("a") === 15L && col("b") === 1L))
    assert(empty(col("a") === 5L || col("a") === 25L))
    assert(!empty(col("a") === 5L || col("a") === 15L))
    // untracked columns, non-integral literals, other operators: Unknown
    assert(!empty(col("b") === 5L))
    assert(!empty(col("a") === "x"))
    assert(!empty(col("a") % 2 === 0L))
    assert(!empty(!(col("a") === 15L)), "negation is Unknown, kept")
  }

  test("statsProveEmpty: string ranges (binary UTF-8 order) and expr() SQL predicates") {
    import org.apache.spark.sql.graftbridge.{LongStats, StatsRange, StringStats}
    val st: String => Option[StatsRange] = {
      case "u" => Some(StringStats("example.com/b", "example.com/m"))
      case "a" => Some(LongStats(10L, 20L))
      case _ => None
    }
    def empty(c: org.apache.spark.sql.Column) = ColumnBridge.statsProveEmpty(c, st)
    assert(empty(col("u") === "example.com/a") && empty(col("u") === "example.com/z"))
    assert(!empty(col("u") === "example.com/c"))
    assert(empty(lit("example.com/zz") === col("u")), "flipped string equality")
    assert(empty(col("u") > "example.com/m") && !empty(col("u") > "example.com/l"))
    assert(empty(col("u") < "example.com/b") && !empty(col("u") < "example.com/c"))
    assert(empty(col("u").isin("aaa", "zzz")) && !empty(col("u").isin("aaa", "example.com/c")))
    // a literal of the WRONG domain for the tracked range is Unknown
    assert(!empty(col("u") === 5L))
    assert(!empty(col("a") === "x"))
    // prefix boundary: min/max sharing a prefix still prune correctly
    assert(empty(col("u") >= "example.com/m "),
      "just above the max in binary order")
    // expr("...") predicates (the durable queue's replayable form) parse
    // into the same grammar — pruning survives the SQL round-trip
    assert(empty(expr("a > 20")) && !empty(expr("a > 19")))
    assert(empty(expr("a = 5 AND u = 'example.com/c'")))
    assert(empty(expr("u = 'zzz'")) && !empty(expr("u = 'example.com/c'")))
    assert(empty(expr("a IN (1, 2, 30)")) && !empty(expr("a IN (1, 15)")))
    assert(empty(expr("a = 5 OR u > 'example.com/m'")))
    assert(!empty(expr("a = 5 OR u > 'example.com/a'")))
    assert(!empty(expr("a % 2 = 0")), "non-grammar SQL is Unknown, kept")
    assert(!empty(expr("not a garbage expression ((")), "unparseable SQL is Unknown, kept")
    // composed: a DSL conjunct plus an expr() leaf inside one Column
    assert(empty(col("a") === 15L && expr("u = 'zzz'")))
  }

  test("stats-pruned takedown skips non-overlapping buckets (poisoned-bucket proof) and stays correct") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bstats").toString
    val log = new ParquetLog(spark, dir, schema, bucketSize = 100L,
      statsColumns = Seq("doc_id"))
    // doc_id aligned with seq so each 100-seq bucket holds a distinct range
    log.append(spark.range(1000L).select(col("id").as("doc_id"), lit("x").as("tag")))
    assert(new java.io.File(dir, "_graft_stats").exists(), "manifest written")
    // POISON bucket 0: drop a garbage "parquet" file in it — any scan
    // that touches the bucket fails loudly, so a takedown whose stats
    // prune it away is PROVEN never to read it
    val poison = new java.io.File(dir, "seq_bucket=0/part-poison.parquet")
    java.nio.file.Files.writeString(poison.toPath, "this is not parquet")
    // clustered predicate inside bucket 9 only
    assert(log.retract(col("doc_id") >= 950L && col("doc_id") < 960L) === 10L)
    // clustered id list inside bucket 8 only
    val ids = spark.range(10L).select((col("id") + 840L).as("doc_id"))
    assert(log.retractIds(ids, "doc_id") === 10L)
    // an out-of-range takedown prunes EVERY bucket: zero jobs, zero rows
    assert(log.retract(col("doc_id") === 99999L) === 0L)
    java.nio.file.Files.delete(poison.toPath)
    assert(log.read.count() === 980L)
    assert(log.read.where(col("doc_id").between(950L, 959L)).count() === 0L)
    assert(log.read.where(col("doc_id").between(840L, 849L)).count() === 0L)
    // a predicate on an UNTRACKED column cannot prune — still correct
    assert(log.retract(col("tag") === "nope") === 0L)
    // manifest survives reopen; a reopened log still prunes and removes
    val log2 = new ParquetLog(spark, dir, schema, bucketSize = 100L,
      statsColumns = Seq("doc_id"))
    java.nio.file.Files.writeString(poison.toPath, "still not parquet")
    assert(log2.retract(col("doc_id") === 955L) === 0L, "already retracted: idempotent")
    assert(log2.retract(col("doc_id") === 970L) === 1L)
    java.nio.file.Files.delete(poison.toPath)
    assert(log2.read.count() === 979L)
  }

  test("legacy buckets (rows predating statsColumns) stay unprunable — a takedown cannot miss them") {
    // the upgrade path every pre-existing log hits: rows appended
    // WITHOUT stats, then the same dir reopened WITH statsColumns and
    // appended into the same bucket — an entry built from the new batch
    // alone would claim coverage it doesn't have and a takedown would
    // silently skip the legacy rows (erasure failure, not a crash)
    val dir = java.nio.file.Files.createTempDirectory("graft-bstats3").toString
    val legacy = new ParquetLog(spark, dir, schema, bucketSize = 100L)
    legacy.append(spark.range(50L).select(col("id").as("doc_id"), lit("old").as("tag")))
    val log = new ParquetLog(spark, dir, schema, bucketSize = 100L,
      statsColumns = Seq("doc_id"))
    log.append(spark.range(10L).select((col("id") + 500L).as("doc_id"), lit("new").as("tag")))
    // bucket 0 holds legacy doc_ids 0..49 AND new 500..509; the
    // manifest must NOT hold a (bucket 0) entry narrowed to [500,509]
    assert(log.retract(col("doc_id") === 10L) === 1L,
      "legacy row must be found: its bucket is unprunable by design")
    assert(log.read.where(col("doc_id") === 10L).count() === 0L)
    // a brand-new bucket appended under stats IS prunable
    log.append(spark.range(100L).select((col("id") + 10000L).as("doc_id"), lit("n2").as("tag")))
    assert(log.retract(col("doc_id") === 10005L) === 1L)
    assert(log.read.count() === 158L)
  }

  test("seq-list takedowns prune by directory arithmetic; expired buckets leave the manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bstats4").toString
    val log = new ParquetLog(spark, dir, schema, bucketSize = 100L,
      statsColumns = Seq("doc_id"))
    log.append(spark.range(1000L).select(col("id").as("doc_id"), lit("x").as("tag")))
    // poison bucket 0: a seq-list takedown clustered in bucket 9 must
    // never read it (the durable replay / drain path rewrites by seq)
    val poison = new java.io.File(dir, "seq_bucket=0/part-poison.parquet")
    java.nio.file.Files.writeString(poison.toPath, "not parquet")
    val seqs = spark.range(10L).select((col("id") + 950L).as("seq"))
    assert(log.retractIds(seqs, "seq") === 10L)
    // and the pruned auxiliary read the db orchestration uses
    assert(log.readForTakedownIds(seqs, "seq").count() === 90L)
    java.nio.file.Files.delete(poison.toPath)
    // manifest hygiene: expire drops whole buckets; the next append
    // retains only live buckets' entries
    log.expire(499L)
    log.append(spark.range(5L).select((col("id") + 5000L).as("doc_id"), lit("y").as("tag")))
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "_graft_stats"))
    assert(!manifest.lines().anyMatch(l => l.startsWith("0 ") || l.startsWith("1 ")),
      s"expired buckets' entries must leave the manifest:\n$manifest")
  }

  test("STRING takedown-key stats prune buckets (poisoned-bucket proof) — urls/uuids/hashes") {
    // real corpora key on strings; before r17 these silently fell back
    // to the ∝-corpus match scan. Same proof shape as the integral
    // twin: a garbage parquet planted in a non-candidate bucket makes
    // any scan that touches it fail loudly.
    val strSchema = StructType(Seq(
      StructField("url", StringType), StructField("v", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-bstats-s").toString
    val log = new ParquetLog(spark, dir, strSchema, bucketSize = 100L,
      statsColumns = Seq("url"))
    // urls sorted with seq so each bucket holds a distinct lexicographic band
    log.append(spark.range(1000L).select(
      format_string("https://example.com/doc-%04d", col("id")).as("url"), col("id").as("v")))
    val poison = new java.io.File(dir, "seq_bucket=0/part-poison.parquet")
    java.nio.file.Files.writeString(poison.toPath, "this is not parquet")
    // clustered string-range predicate inside bucket 9 only
    assert(log.retract(col("url") >= "https://example.com/doc-0950" &&
      col("url") < "https://example.com/doc-0960") === 10L)
    // clustered string id list inside bucket 8 only
    val ids = spark.range(10L).select(
      format_string("https://example.com/doc-%04d", col("id") + 840L).as("url"))
    assert(log.retractIds(ids, "url") === 10L)
    // equality fully outside every range prunes every bucket
    assert(log.retract(col("url") === "zzz://nowhere") === 0L)
    // the pruned auxiliary read the db orchestration uses
    assert(log.readForTakedownIds(ids, "url").count() === 90L)
    java.nio.file.Files.delete(poison.toPath)
    assert(log.read.count() === 980L)
    assert(log.read.where(col("url") >= "https://example.com/doc-0950" &&
      col("url") < "https://example.com/doc-0960").count() === 0L)
    // the manifest survives reopen with its string ranges intact
    val log2 = new ParquetLog(spark, dir, strSchema, bucketSize = 100L,
      statsColumns = Seq("url"))
    java.nio.file.Files.writeString(poison.toPath, "still not parquet")
    assert(log2.retract(col("url") === "https://example.com/doc-0970") === 1L)
    java.nio.file.Files.delete(poison.toPath)
    assert(log2.read.count() === 979L)
    // strings with whitespace/newlines round-trip the manifest encoding
    val dir2 = java.nio.file.Files.createTempDirectory("graft-bstats-s2").toString
    val logWs = new ParquetLog(spark, dir2, strSchema, bucketSize = 100L,
      statsColumns = Seq("url"))
    logWs.append(spark.range(5L).select(
      concat(lit("a b\nc "), col("id").cast("string")).as("url"), col("id").as("v")))
    val logWs2 = new ParquetLog(spark, dir2, strSchema, bucketSize = 100L,
      statsColumns = Seq("url"))
    assert(logWs2.retract(col("url") === "a b\nc 3") === 1L)
    assert(logWs2.read.count() === 4L)
  }

  test("horizonOlderThan: manifest arithmetic + boundary scan equals min(seq where ts > T) - 1") {
    val tsSchema = StructType(Seq(
      StructField("ts_ms", LongType), StructField("v", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-ettl").toString
    val log = new ParquetLog(spark, dir, tsSchema, bucketSize = 100L,
      statsColumns = Seq("ts_ms"))
    // event time tracks seq except ONE out-of-order newer row at seq 250
    log.append(spark.range(1000L).select(
      when(col("id") === 250L, lit(999999L)).otherwise(col("id") * 10L).as("ts_ms"),
      col("id").as("v")))
    // poison buckets past the boundary: the walk must stop at bucket 2
    // (the first newer row) and never read later buckets
    val poison = new java.io.File(dir, "seq_bucket=7/part-poison.parquet")
    java.nio.file.Files.writeString(poison.toPath, "not parquet")
    // T = 5000ms: rows 0..500 are nominally old, but seq 250 is newer —
    // the PREFIX contract stops just before it (boundary conservatism)
    assert(log.horizonOlderThan("ts_ms", 5000L) === 249L)
    java.nio.file.Files.delete(poison.toPath)
    assert(log.expireOlderThan("ts_ms", 5000L) === 250L)
    assert(log.read.count() === 750L)
    assert(log.read.agg(min("seq")).head().getLong(0) === 250L,
      "the out-of-order newer row held the prefix line")
    assert(log.since === 999L, "retention never regresses the cursor")
    // after the newer row itself ages out, the rest of the old prefix goes
    assert(log.expireOlderThan("ts_ms", 999999L + 1L) === 750L)
    assert(log.read.count() === 0L)
    // nothing expirable → horizon -1, expire is a no-op
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ettl2").toString
    val log2 = new ParquetLog(spark, dir2, tsSchema, bucketSize = 100L,
      statsColumns = Seq("ts_ms"))
    log2.append(spark.range(10L).select((col("id") + 100L).as("ts_ms"), col("id").as("v")))
    assert(log2.horizonOlderThan("ts_ms", 50L) === -1L)
    assert(log2.expireOlderThan("ts_ms", 50L) === 0L)
    // an UNDECLARED ts column falls back to the single corpus scan —
    // same horizon, no manifest
    assert(log2.horizonOlderThan("v", 3L) === 3L)
    // string event times order lexicographically (ISO dates)
    val isoSchema = StructType(Seq(
      StructField("day", StringType), StructField("v", LongType)))
    val dir3 = java.nio.file.Files.createTempDirectory("graft-ettl3").toString
    val log3 = new ParquetLog(spark, dir3, isoSchema, bucketSize = 4L,
      statsColumns = Seq("day"))
    log3.append(spark.range(12L).select(
      format_string("2026-01-%02d", col("id") + 1L).as("day"), col("id").as("v")))
    assert(log3.horizonOlderThan("day", "2026-01-08") === 7L)
    assert(log3.expireOlderThan("day", "2026-01-08") === 8L)
    assert(log3.read.count() === 4L)
    // a live tail fences event-time retention exactly like expire
    val dirT = java.nio.file.Files.createTempDirectory("graft-ettl4").toString
    val logT = new ParquetLog(spark, dirT, tsSchema, bucketSize = 100L,
      statsColumns = Seq("ts_ms"))
    logT.append(spark.range(10L).select((col("id") * 10L).as("ts_ms"), col("id").as("v")))
    logT.inflightTailBatches.add("tail-y") // a planned-but-uncommitted micro-batch
    val e = intercept[IllegalStateException](logT.expireOlderThan("ts_ms", 1000L))
    assert(e.getMessage.contains("live tail"))
    assert(logT.read.count() === 10L, "a fence refusal mutates nothing")
    logT.inflightTailBatches.remove("tail-y")
  }

  test("stats merge across appends widens ranges; seq-column pruning rides directory names") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bstats2").toString
    val log = new ParquetLog(spark, dir, schema, bucketSize = 1000L,
      statsColumns = Seq("doc_id"))
    // two appends into the SAME bucket with disjoint doc_id bands: the
    // manifest entry must widen, not replace
    log.append(spark.range(10L).select((col("id") + 100L).as("doc_id"), lit("a").as("tag")))
    log.append(spark.range(10L).select((col("id") + 500L).as("doc_id"), lit("b").as("tag")))
    assert(log.retract(col("doc_id") === 105L) === 1L)
    assert(log.retract(col("doc_id") === 505L) === 1L)
    assert(log.read.count() === 18L)
    // a seq predicate prunes by directory arithmetic even with no
    // stats entry for it (the retention freebie on the retract path)
    assert(log.retract(col("seq") >= 19L) === 1L)
    assert(log.read.count() === 17L)
  }

  test("empty-string stats values survive reopen (non-empty manifest tokens)") {
    // "" is a legal column value, and before the '=' token marker the
    // manifest line for a bucket whose min was "" serialized with an
    // EMPTY token — whitespace-collapsed into the 4-token legacy form,
    // 'S'.toLong threw, and the entry was silently dropped: the bucket
    // permanently lost pruning. Poisoned-bucket proof: after reopen, a
    // provably-outside retract must still prune bucket 0.
    val strSchema = StructType(Seq(
      StructField("url", StringType), StructField("v", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-bstats-e").toString
    val log = new ParquetLog(spark, dir, strSchema, bucketSize = 4L,
      statsColumns = Seq("url"))
    log.append(spark.range(8L).select(
      when(col("id") === 0L, lit("")).otherwise(concat(lit("k"), col("id"))).as("url"),
      col("id").as("v"))) // bucket 0 range ["", "k3"], bucket 1 ["k4", "k7"]
    val log2 = new ParquetLog(spark, dir, strSchema, bucketSize = 4L,
      statsColumns = Seq("url"))
    val poison = new java.io.File(dir, "seq_bucket=0/part-poison.parquet")
    java.nio.file.Files.writeString(poison.toPath, "not parquet")
    assert(log2.retract(col("url") === "zzz") === 0L,
      "bucket 0's entry survived reopen: the outside match never reads it")
    java.nio.file.Files.delete(poison.toPath)
    assert(log2.retract(col("url") === "") === 1L, "empty string still matches")
    assert(log2.read.count() === 7L)
    // legacy bare-token manifest lines (pre-marker) still parse
    val dirL = java.nio.file.Files.createTempDirectory("graft-bstats-l").toString
    val logL = new ParquetLog(spark, dirL, strSchema, bucketSize = 4L,
      statsColumns = Seq("url"))
    logL.append(spark.range(4L).select(concat(lit("m"), col("id")).as("url"),
      col("id").as("v")))
    val mf = new java.io.File(dirL, "_graft_stats")
    java.nio.file.Files.writeString(mf.toPath, "0 url S m0 m3") // r17 form, no '='
    val logL2 = new ParquetLog(spark, dirL, strSchema, bucketSize = 4L,
      statsColumns = Seq("url"))
    val poisonL = new java.io.File(dirL, "seq_bucket=0/part-poison.parquet")
    java.nio.file.Files.writeString(poisonL.toPath, "not parquet")
    assert(logL2.retract(col("url") === "zzz") === 0L, "legacy tokens still prune")
    java.nio.file.Files.delete(poisonL.toPath)
    assert(logL2.retract(col("url") === "m2") === 1L)
  }
}
