package graft.views

import graft.SparkSpec
import graft.core._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ViewsSpec extends SparkSpec {

  val schema: StructType = StructType(Seq(
    StructField("foo", LongType), StructField("tag", StringType)))

  def db2(): (MemoryLog, FlumeDb) = {
    val log = new MemoryLog(spark, schema)
    (log, new FlumeDb(log))
  }
  def append(db: FlumeDb, vs: (Long, String)*): Unit =
    db.append(spark.createDataFrame(
      spark.sparkContext.parallelize(vs.map { case (a, b) => Row(a, b) }), schema))

  test("IndexView: 1 value -> N keys via explode; point get (rebuild.js:27-48)") {
    val (_, db) = db2()
    db.use("idx", IndexView(array(col("tag"), concat(lit("f"), col("foo").cast("string")))))
    append(db, (1L, "a"), (2L, "b"), (1L, "c"))
    val hits = db.gated("idx")(_.asInstanceOf[IndexView].get("f1")).collect().map(_.getLong(1))
    assert(hits.toSeq === Seq(0L, 2L))
    val tagHit = db.gated("idx")(_.asInstanceOf[IndexView].get("b")).collect().map(_.getLong(1))
    assert(tagHit.toSeq === Seq(1L))
  }

  test("IndexView maintains incrementally across appends") {
    val (_, db) = db2()
    db.use("idx", IndexView(array(col("tag"))))
    append(db, (1L, "x"))
    append(db, (2L, "x"))
    val hits = db.gated("idx")(_.asInstanceOf[IndexView].get("x")).collect().map(_.getLong(1))
    assert(hits.toSeq === Seq(0L, 1L))
  }

  test("HashtableView keeps the latest record per key") {
    val (_, db) = db2()
    db.use("ht", HashtableView("tag"))
    append(db, (1L, "k1"), (2L, "k2"))
    append(db, (3L, "k1"))
    val r = db.gated("ht")(_.asInstanceOf[HashtableView].get("k1")).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("foo") === 3L)
    val all = db.gated("ht")(_.asInstanceOf[HashtableView].frame.get).count()
    assert(all === 2L)
  }

  test("SearchView: single term and AND-intersection") {
    val log = new MemoryLog(spark, StructType(Seq(StructField("text", StringType))))
    val db = new FlumeDb(log).use("s", SearchView("text"))
    db.append(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("spark joins fast"), Row("spark streams"), Row("slow joins"))),
      StructType(Seq(StructField("text", StringType)))))
    val sv = db.view("s").view.asInstanceOf[SearchView]
    db.awaitView("s")
    assert(sv.search("spark").collect().map(_.getLong(0)).toSeq === Seq(0L, 1L))
    assert(sv.searchAll(Seq("spark", "joins")).collect().map(_.getLong(0)).toSeq === Seq(0L))
    // OR = posting union: any-term membership, each seq once
    assert(sv.searchAny(Seq("streams", "slow")).collect().map(_.getLong(0)).toSeq
      === Seq(1L, 2L))
    assert(sv.searchAny(Seq("spark", "joins")).collect().map(_.getLong(0)).toSeq
      === Seq(0L, 1L, 2L))
    assert(sv.searchAny(Seq("nosuchterm")).collect().isEmpty)
  }

  test("PositionalSearchView: OR disjunction = union of single-term reads, each seq once") {
    val log = new MemoryLog(spark, StructType(Seq(StructField("text", StringType))))
    val db = new FlumeDb(log).use("p", PositionalSearchView("text"))
    db.append(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("spark joins fast"), Row("spark streams"), Row("slow joins"), Row("none here"))),
      StructType(Seq(StructField("text", StringType)))))
    val pv = db.view("p").view.asInstanceOf[PositionalSearchView]
    db.awaitView("p")
    assert(pv.searchAny(Seq("spark", "joins")).collect().map(_.getLong(0)).toSeq
      === Seq(0L, 1L, 2L), "a doc holding both terms must appear exactly once")
    assert(pv.searchAny(Seq("streams")).collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(pv.searchAny(Seq("absent", "missing")).collect().isEmpty)
    // API parity: the positional index fully subsumes the plain one —
    // term and AND reads work here too (occurrence rows dedup first)
    assert(pv.search("spark").collect().map(_.getLong(0)).toSeq === Seq(0L, 1L))
    assert(pv.searchAll(Seq("spark", "joins")).collect().map(_.getLong(0)).toSeq === Seq(0L))
    assert(pv.searchAll(Seq("spark", "absent")).collect().isEmpty)
  }

  test("PositionalSearchView: phrase matches adjacency and order, not co-occurrence") {
    val log = new MemoryLog(spark, StructType(Seq(StructField("text", StringType))))
    val db = new FlumeDb(log).use("p", PositionalSearchView("text"))
    db.append(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a full table scan hurts"),       // 0: phrase present
      Row("scan the table again"),          // 1: both terms, wrong order
      Row("table by table, scan by scan"),  // 2: both terms, never adjacent... but "table, scan" IS adjacent after tokenization
      Row("no relevant terms here"),        // 3: neither
      Row("table scan table scan"))),       // 4: phrase twice -> one seq
      StructType(Seq(StructField("text", StringType)))))
    val pv = db.view("p").view.asInstanceOf[PositionalSearchView]
    db.awaitView("p")
    // tokenizer strips punctuation, so doc 2's "table, scan" IS adjacent
    assert(pv.searchPhrase(Seq("table", "scan")).collect().map(_.getLong(0)).toSeq
      === Seq(0L, 2L, 4L))
    // three-term phrase: only doc 0
    assert(pv.searchPhrase(Seq("full", "table", "scan")).collect().map(_.getLong(0)).toSeq
      === Seq(0L))
    // wrong order finds nothing adjacent in doc 0
    assert(!pv.searchPhrase(Seq("scan", "full")).collect().map(_.getLong(0)).contains(0L))
  }

  test("BloomView: no false negatives; merge across batches") {
    val (_, db) = db2()
    db.use("bloom", BloomView("tag", 1000L, 0.01))
    append(db, (1L, "alpha"), (2L, "beta"))
    append(db, (3L, "gamma"))
    val bv = db.view("bloom").view.asInstanceOf[BloomView]
    db.awaitView("bloom")
    assert(bv.mightContain("alpha") && bv.mightContain("beta") && bv.mightContain("gamma"))
  }

  test("CountMinView estimates merge across batches, never undercount") {
    val (_, db) = db2()
    db.use("cm", CountMinView("tag"))
    append(db, (1L, "hot"), (2L, "hot"), (3L, "cold"))
    append(db, (4L, "hot"))
    val cm = db.view("cm").view.asInstanceOf[CountMinView]
    db.awaitView("cm")
    assert(cm.estimate("hot") >= 3L)
    assert(cm.estimate("cold") >= 1L)
    assert(cm.estimate("hot") <= 4L + 1L) // tiny input: estimate ~ exact
  }

  test("OrderedFoldView folds in strict seq order (non-commutative reducer)") {
    val (_, db) = db2()
    db.use("concat", OrderedFoldView[String]("")((acc, r) => acc + r.getAs[String]("tag")))
    append(db, (1L, "a"), (2L, "b"))
    append(db, (3L, "c"))
    val v = db.gated("concat")(_.asInstanceOf[OrderedFoldView[String]].value)
    assert(v === Some("abc"))
  }

  test("SegmentedFoldView: parallel ordered fold equals sequential fold") {
    val (_, db) = db2()
    // string concat: associative but NOT commutative — order must hold
    db.use("concat", SegmentedFoldView[String]("", partitions = 4)(
      (acc, r) => acc + r.getAs[String]("tag"))(_ + _))
    val tags = (0 until 37).map(i => (i.toLong, ('a' + i % 26).toChar.toString))
    append(db, tags: _*)
    append(db, (99L, "Z"))
    val v = db.gated("concat")(_.asInstanceOf[SegmentedFoldView[String]].value)
    assert(v === Some(tags.map(_._2).mkString + "Z"))
  }

  test("Query DSL compiles filter/project/sort/limit/agg") {
    val (_, db) = db2()
    append(db, (5L, "a"), (3L, "b"), (8L, "a"), (1L, "c"))
    val top = Query().where(col("tag") === "a")
      .select(col("seq"), col("foo"))
      .orderBy(col("foo").desc).limit(1)
      .run(db.mapped).collect()
    assert(top.length === 1 && top(0).getAs[Long]("foo") === 8L)
    val agg = Query().groupBy(col("tag")).agg(sum("foo").as("s"))
      .orderBy(col("tag")).run(db.mapped).collect()
    assert(agg.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("a", 13L), ("b", 3L), ("c", 1L)))
  }

  test("Query index selection: equality and isin served by a mounted column index") {
    val (_, db) = db2()
    db.use("byTag", IndexView.onColumn("tag"))
    append(db, (5L, "a"), (3L, "b"), (8L, "a"), (1L, "c"), (9L, "b"))
    def key(r: Row) = (r.getLong(0), r.getLong(1))
    val plain = Query().where(col("tag") === "a" && col("foo") > 4)
      .select(col("seq"), col("foo")).orderBy(col("seq"))
    assert(plain.run(db).collect().map(key).toSeq === plain.run(db.mapped).collect().map(key).toSeq)
    // isin conjunct; also exercise the semi-join fallback (maxInline = 1)
    val multi = Query().where(col("tag").isin("a", "b"))
      .select(col("seq"), col("foo")).orderBy(col("seq"))
    assert(multi.run(db).collect().map(key).toSeq === multi.run(db.mapped).collect().map(key).toSeq)
    assert(multi.run(db, maxInline = 1).collect().map(key).toSeq
      === multi.run(db.mapped).collect().map(key).toSeq)
    // no matching key → empty, not an error
    assert(Query().where(col("tag") === "zzz").run(db).collect().isEmpty)
    // a db with no index on the column falls back to the plain scan
    val (_, db2_) = db2()
    append(db2_, (5L, "a"), (3L, "b"))
    assert(Query().where(col("tag") === "a").select(col("seq")).run(db2_)
      .collect().map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("Query index selection: range conjuncts served as a posting range read") {
    val (_, db) = db2()
    db.use("byFoo", IndexView.onColumn("foo"))
    append(db, (5L, "a"), (3L, "b"), (8L, "a"), (1L, "c"), (9L, "b"), (12L, "a"))
    def key(r: Row) = (r.getLong(0), r.getLong(1))
    // numeric range: string-keyed postings MUST be decoded, not compared
    // lexically ("12" < "3" as strings, but 12 > 3 as longs)
    val band = Query().where(col("foo") >= 3 && col("foo") < 9)
      .select(col("seq"), col("foo")).orderBy(col("seq"))
    assert(band.run(db).collect().map(key).toSeq === band.run(db.mapped).collect().map(key).toSeq)
    val high = Query().where(col("foo") > 8).select(col("seq"), col("foo")).orderBy(col("seq"))
    assert(high.run(db).collect().map(key).toSeq === high.run(db.mapped).collect().map(key).toSeq)
    assert(high.run(db).collect().map(_.getLong(1)).toSet === Set(9L, 12L))
    // flipped literal order (lit <= attr) and between (splits into >= + <=)
    val flipped = Query().where(lit(9) <= col("foo")).select(col("foo"))
    assert(flipped.run(db).collect().map(_.getLong(0)).toSet === Set(9L, 12L))
    val btw = Query().where(col("foo").between(3, 8)).select(col("foo")).orderBy(col("foo"))
    assert(btw.run(db).collect().map(_.getLong(0)).toSeq === Seq(3L, 5L, 8L))
    // range + residual on another column, and the semi-join fallback
    val mixed = Query().where(col("foo") >= 3 && col("tag") === "a")
      .select(col("seq"), col("foo")).orderBy(col("seq"))
    assert(mixed.run(db).collect().map(key).toSeq === mixed.run(db.mapped).collect().map(key).toSeq)
    assert(mixed.run(db, maxInline = 1).collect().map(key).toSeq
      === mixed.run(db.mapped).collect().map(key).toSeq)
    // string-column range uses key order directly
    val (_, dbs) = db2()
    dbs.use("byTag", IndexView.onColumn("tag"))
    append(dbs, (5L, "apple"), (3L, "pear"), (8L, "fig"), (1L, "zuc"))
    val sRange = Query().where(col("tag") >= "fig" && col("tag") <= "pear").select(col("tag"))
    assert(sRange.run(dbs).collect().map(_.getString(0)).toSet === Set("fig", "pear"))
    // empty range → empty, not an error
    assert(Query().where(col("foo") > 1000).run(db).collect().isEmpty)
  }

  test("Query index-union (OR) selection: every-arm-indexed disjunction reads postings, dedups, falls back") {
    val (_, db) = db2()
    db.use("byTag", IndexView.onColumn("tag"))
    db.use("byFoo", IndexView.onColumn("foo"))
    // (3, "a") matches BOTH arms of (tag = 'a' OR foo = 3) — the union
    // must surface it exactly once
    append(db, (5L, "a"), (3L, "b"), (8L, "a"), (1L, "c"), (3L, "a"), (9L, "b"))
    def key(r: Row) = (r.getLong(0), r.getLong(1))
    val both = Query().where((col("tag") === "a" || col("foo") === 3L) && col("foo") > 2)
      .select(col("seq"), col("foo")).orderBy(col("seq"))
    assert(both.run(db).collect().map(key).toSeq === both.run(db.mapped).collect().map(key).toSeq)
    // the double-match row appears once (union-distinct across views)
    assert(both.run(db).where(col("seq") === 4L).count() === 1L)
    // isin arm + semi-join fallback (maxInline = 1)
    val mixed = Query().where(col("tag").isin("a", "c") || col("foo") === 9L)
      .select(col("seq"), col("foo")).orderBy(col("seq"))
    assert(mixed.run(db).collect().map(key).toSeq === mixed.run(db.mapped).collect().map(key).toSeq)
    assert(mixed.run(db, maxInline = 1).collect().map(key).toSeq
      === mixed.run(db.mapped).collect().map(key).toSeq)
    // no arm matches anything → empty, not an error
    assert(Query().where(col("tag") === "zzz" || col("foo") === 777L).run(db).collect().isEmpty)
    // RANGE arm: eq arm unions with a decoded-key range read; the
    // original disjunction stays as a residual guard (exact answer)
    val rangeOr = Query().where(col("tag") === "c" || col("foo") >= 8L)
      .select(col("seq"), col("foo")).orderBy(col("seq"))
    assert(rangeOr.run(db).collect().map(key).toSeq
      === rangeOr.run(db.mapped).collect().map(key).toSeq)
    // two range arms, one bounded both sides
    val twoRanges = Query().where((col("foo") >= 8L && col("foo") < 10L) || col("foo") < 2L)
      .select(col("seq"), col("foo")).orderBy(col("seq"))
    assert(twoRanges.run(db).collect().map(key).toSeq
      === twoRanges.run(db.mapped).collect().map(key).toSeq)
    // CONJUNCTIVE arm: (tag = 'a' AND foo > 4) serves through the tag
    // posting (superset read); the residual guard drops foo <= 4 rows
    val conjArm = Query().where((col("tag") === "a" && col("foo") > 4L) || col("foo") === 9L)
      .select(col("seq"), col("foo")).orderBy(col("seq"))
    assert(conjArm.run(db).collect().map(key).toSeq
      === conjArm.run(db.mapped).collect().map(key).toSeq)
    // the superset read must NOT leak rows the arm rejects: (3, "a") at
    // seq 4 matches tag = 'a' but fails foo > 4 and foo = 9
    assert(!conjArm.run(db).collect().map(_.getLong(0)).contains(4L))
    // one arm on an UNINDEXED column disqualifies the whole disjunction
    // (falls back to the scan — same answer, no wrong-plan risk)
    val (_, dbp) = db2()
    dbp.use("byTag", IndexView.onColumn("tag"))
    append(dbp, (5L, "a"), (3L, "b"), (8L, "a"))
    val partial = Query().where(col("tag") === "a" || col("foo") === 3L)
      .select(col("seq")).orderBy(col("seq"))
    assert(partial.run(dbp).collect().map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
  }

  test("SQL surface: log and relational views queryable via spark.sql") {
    val (_, db) = db2()
    db.use("idx", IndexView(array(col("tag"))))
    append(db, (1L, "a"), (2L, "b"), (3L, "a"))
    db.registerTempViews("t1")
    val joined = db.sql(
      """SELECT l.seq, l.foo FROM t1_idx i JOIN t1_log l ON i.seq = l.seq
         WHERE i.key = 'a' ORDER BY l.seq""").collect()
    assert(joined.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((0L, 1L), (2L, 3L)))
    val agg = db.sql("SELECT count(*) FROM t1_log").head().getLong(0)
    assert(agg === 3L)
  }

  test("frame views stay correct across many appends (auto-compaction)") {
    val (_, db) = db2()
    db.use("idx", IndexView(array(col("tag"))))
    (1 to 40).foreach(i => append(db, (i.toLong, s"t${i % 5}")))
    val v = db.view("idx").view.asInstanceOf[IndexView]
    assert(v.frame.get.count() === 40L)
    assert(v.get("t0").collect().map(_.getLong(1)).toSeq ===
      (1 to 40).filter(_ % 5 == 0).map(i => (i - 1).toLong))
  }

  test("concurrent appends stay contiguous (single-writer lock)") {
    val log = new MemoryLog(spark, schema)
    val threads = (0 until 8).map { t =>
      new Thread(() => (0 until 25).foreach(i => log.appendRows(Seq(Row(t * 100L + i, "x")))))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(log.since === 199L)
    val seqs = log.read.select("seq").collect().map(_.getLong(0)).sorted
    assert(seqs.toSeq === (0L until 200L))
  }

  test("view version bump forces rebuild on mount (README.md:26-29)") {
    // same view state object mounted under a def with a changed version:
    // FlumeDb re-creates on use(), so state must start clean
    val (_, db) = db2()
    db.use("idx", IndexView(array(col("tag"))))
    append(db, (1L, "x"))
    assert(db.view("idx").viewDef.version === 1)
  }

  test("Query composite-index selection: both-component lookup, null rows, partial-match fallthrough") {
    val (_, db) = db2()
    db.use("cidx", IndexView.onColumns(Seq("tag", "foo"), "seq"))
    db.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a"), Row(2L, "b"), Row(1L, "a"), Row(3L, null), Row(2L, "a"))), schema))
    def rows(q: Query) = q.run(db).collect().map(_.getLong(0)).sorted.toSeq
    // equality on BOTH components: served by the composite lookup
    assert(rows(Query().where(col("tag") === "a" && col("foo") === 1L)
      .select(col("seq"))) === Seq(0L, 2L))
    // isin expands the cartesian key list
    assert(rows(Query().where(col("tag").isin("a", "b") && col("foo") === 2L)
      .select(col("seq"))) === Seq(1L, 4L))
    // null-component rows are not indexed AND not equality-selectable:
    // same (empty) answer either path
    assert(rows(Query().where(col("tag") === "x" && col("foo") === 3L)
      .select(col("seq"))) === Seq())
    // only ONE component constrained: composite can't serve it; the
    // answer must still be right (plain scan path)
    assert(rows(Query().where(col("foo") === 2L).select(col("seq"))) === Seq(1L, 4L))
    // the null-component row is reachable by a scan (IS NULL is not an
    // equality conjunct, so no index path claims it)
    assert(rows(Query().where(col("tag").isNull).select(col("seq"))) === Seq(3L))
  }

  test("Query.lookupJoin: probe join via the posting table on both read paths; no-index degrade") {
    import spark.implicits._
    val (_, db) = db2()
    db.use("tagIdx2", IndexView.onColumn("tag", "seq"))
    db.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a"), Row(2L, "b"), Row(3L, "a"), Row(4L, "c"), Row(5L, "a"))), schema))
    val probe = Seq(("a", 10L), ("c", 30L), ("zz", 99L)).toDF("tag", "w")
    def runIt(maxInline: Int) = Query.lookupJoin(db, probe, "tag", maxInline)
      .select("seq", "tag", "w", "foo")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = Set(
      (0L, "a", 10L, 1L), (2L, "a", 10L, 3L), (4L, "a", 10L, 5L),
      (3L, "c", 30L, 4L)) // 'zz' matches nothing; 'b' not probed
    assert(runIt(8192) === want, "inline isin path")
    assert(runIt(1) === want, "semi-join path (posting list over maxInline)")
    // no mounted index on foo: degrades to the plain join, same semantics
    val plain = Query.lookupJoin(db, Seq((1L, "x")).toDF("foo", "lbl"), "foo")
      .select("seq", "lbl").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(plain === Set((0L, "x")))
    // fence fallback: past maxBroadcastKeys the probe keys SHUFFLE into
    // the posting join instead of broadcasting — answer-identical (the
    // corpus-scale arm, same discipline as FenceFallbackSpec)
    val fallback = Query.lookupJoin(db, probe, "tag", maxBroadcastKeys = 0L)
      .select("seq", "tag", "w", "foo")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(fallback === want, "shuffle arm must equal the broadcast arm")
  }

  test("Query covering-index count: posting-only aggregation, null keys, filters, fallback") {
    val (_, db) = db2()
    db.use("tagIdx", IndexView.onColumn("tag", "seq"))
    db.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a"), Row(2L, "b"), Row(3L, "a"), Row(4L, null), Row(5L, "a"))), schema))
    def collect(q: Query) = q.run(db).collect()
      .map(r => (if (r.isNullAt(0)) "<null>" else r.getString(0)) -> r.getLong(1)).toMap
    // count-by-key from the posting table — null values are a group too
    val n = collect(Query().groupBy(col("tag")).agg(count(lit(1)).as("n")))
    assert(n === Map("a" -> 3L, "b" -> 1L, "<null>" -> 1L))
    // min/max of the SEQ column are posting-covered too (first/last
    // occurrence per value); any other min/max falls through
    val span = Query().groupBy(col("tag"))
      .agg(min(col("seq")).as("fs"), max(col("seq")).as("ls")).run(db)
      .collect().map(r => (if (r.isNullAt(0)) "<null>" else r.getString(0)) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(span === Map("a" -> ((0L, 4L)), "b" -> ((1L, 1L)), "<null>" -> ((3L, 3L))))
    val fooMin = Query().groupBy(col("tag")).agg(min(col("foo")).as("m")).run(db)
      .collect().map(r => (if (r.isNullAt(0)) "<null>" else r.getString(0)) -> r.getLong(1)).toMap
    assert(fooMin === Map("a" -> 1L, "b" -> 2L, "<null>" -> 4L),
      "min of a NON-seq column must fall through to the scan path and stay correct")
    // equality filter on the SAME column narrows the posting read
    val one = collect(Query().where(col("tag") === "a")
      .groupBy(col("tag")).agg(count(lit(1)).as("n")))
    assert(one === Map("a" -> 3L))
    // non-count aggregate: falls through to the normal path, same answer
    val sums = Query().groupBy(col("tag")).agg(sum("foo").as("s")).run(db)
      .collect().map(r => (if (r.isNullAt(0)) "<null>" else r.getString(0)) -> r.getLong(1)).toMap
    assert(sums === Map("a" -> 9L, "b" -> 2L, "<null>" -> 4L))
    // filter on a DIFFERENT column: not coverable, falls through
    val filtered = collect(Query().where(col("foo") > 2)
      .groupBy(col("tag")).agg(count(lit(1)).as("n")))
    assert(filtered === Map("a" -> 2L, "<null>" -> 1L))
  }

  private def changelogFixture = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 11.0),
      (4L, "c", 30.0), (5L, "a", 12.0), (6L, "b", 21.0))
      .toDF("seq", "k", "v")
  }

  test("Changelog.changesBetween: insert vs update, old/new images, untouched keys dropped") {
    val r = Changelog.changesBetween(changelogFixture, "k", "seq", "v", fromSeq = 2, toSeq = 5)
      .orderBy("k").collect()
      .map(x => (x.getString(0), x.getString(1),
        if (x.isNullAt(2)) -1L else x.getLong(2),
        if (x.isNullAt(3)) -1.0 else x.getDouble(3),
        x.getLong(4), x.getDouble(5)))
    assert(r.toSeq === Seq(
      ("a", "update", 1L, 10.0, 5L, 12.0),  // seen before `from`, changed in window
      ("c", "insert", -1L, -1.0, 4L, 30.0)  // first appearance inside the window
    )) // b's last change (seq 2) predates the window -> absent
  }

  test("Changelog.changesBetween equals a driver-side recompute on random logs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 3) {
      val n = 40 + rnd.nextInt(40)
      val rows = (1 to n).map(i => (i.toLong, s"k${rnd.nextInt(8)}", rnd.nextInt(100).toDouble))
      val a = rnd.nextInt(n).toLong
      val b = a + rnd.nextInt(n - a.toInt + 1)
      val got = Changelog.changesBetween(rows.toDF("seq", "k", "v"), "k", "seq", "v", a, b)
        .collect().map(r => (r.getString(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1.0 else r.getDouble(3), r.getLong(4), r.getDouble(5))).toSet
      val want = rows.filter(_._1 <= b).groupBy(_._2).flatMap { case (k, es) =>
        val newest = es.maxBy(_._1)
        if (newest._1 <= a) None
        else {
          val old = es.filter(_._1 <= a) match {
            case Seq() => None
            case seen  => Some(seen.maxBy(_._1))
          }
          Some((k, if (old.isEmpty) "insert" else "update",
            old.map(_._1).getOrElse(-1L), old.map(_._3).getOrElse(-1.0),
            newest._1, newest._3))
        }
      }.toSet
      assert(got === want, s"round $round (a=$a b=$b)")
    }
  }

  test("Changelog.changesBetween: empty window is empty; from=-1 replays latest-per-key as inserts") {
    val df = changelogFixture
    assert(Changelog.changesBetween(df, "k", "seq", "v", 4, 4).count() === 0L)
    val full = Changelog.changesBetween(df, "k", "seq", "v", -1L, 6L)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(4), x.getDouble(5))).toSet
    // the full-range changelog IS the hashtable view's state, all inserts
    assert(full === Set(("a", "insert", 5L, 12.0), ("b", "insert", 6L, 21.0),
      ("c", "insert", 4L, 30.0)))
  }
}
