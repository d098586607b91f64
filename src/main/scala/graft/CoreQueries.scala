package graft

import graft.core._
import graft.ops.{Cluster, Decontaminate, Dedup, Multimodal, Packing, Similarity, TextAnalysis}
import graft.views._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core log + flume-view machinery queries (SURVEY §2.1-§2.3).
  *
  * A pure round-8 relocation of [[SparkEntry]] catalog entries (r7
  * verdict #7) — zero renames, zero semantic changes; the driver
  * contract stays on [[SparkEntry.queries]]/[[SparkEntry.oracleSql]],
  * which merge the per-domain objects. Shared fixtures/caches live in
  * [[EntryHelpers]].
  */
private[graft] object CoreQueries {
  import EntryHelpers._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_append_scan" -> ((s, dir) => {
      appendedEventsLog(s, dir).read
        .select("seq", "user_id", "event_type", "value", "props").orderBy("seq")
    }),
    "q_expire" -> ((s, dir) => {
      // RETENTION end-to-end: re-append events into a fresh seq-bucketed
      // log, age out the oldest 40% by seq horizon — whole `seq_bucket=`
      // directories DELETE without their data ever being read (bucket
      // membership is arithmetic on the directory name), only the one
      // boundary bucket rewrites — then aggregate the survivors.
      // `min_seq` proves the prefix physically left storage; the cursor
      // stays at the pre-expiry HWM (retired seqs never re-stamp).
      // Pre-expiry log TEMPLATE-CLONED per rep (r19, the r18 verdict's
      // item 2 — the reingest precedent): the deterministic ingested log
      // builds once, every rep byte-copies it and runs the REAL
      // directory truncation on the pristine copy, so the bench median
      // prices the operator, never a zero-match re-probe.
      val ev = t(s, dir, "events").orderBy("event_id")
        .select("user_id", "event_type", "value")
      val root = EntryHelpers.clonedFixtureLazy("graftexp", dir) { tpl =>
        new ParquetLog(s, s"$tpl/log", ev.schema, bucketSize = 512L).append(ev)
      }
      val log = new ParquetLog(s, s"$root/log", ev.schema, bucketSize = 512L)
      val horizon = ((log.since + 1L) * 2L) / 5L
      log.expire(horizon)
      log.read.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        round(sum("value"), 4).as("sum_value"),
        min("seq").as("min_seq"))
        .orderBy("event_type")
    }),
    "q_retract_pruned" -> ((s, dir) => {
      // BUCKET-STATS pruned takedown: the log declares its takedown key
      // (`statsColumns`) so append maintains a per-bucket [min,max]
      // manifest, and a clustered predicate takedown then reads ONLY
      // the overlapping `seq_bucket=` dirs in its match scan — the
      // r15-era corpus-wide (narrow) scan is proven skippable for every
      // other bucket. event_id rides append order, so the middle-decile
      // range is physically clustered, the shape of a single uploader's
      // corpus leaving under a rights-holder request.
      // Pre-takedown log TEMPLATE-CLONED per rep (r19, verdict item 2):
      // every rep runs the REAL pruned match-scan + boundary-bucket
      // rewrite on a pristine byte-copy of the once-built ingested log.
      val ev = t(s, dir, "events").orderBy("event_id")
        .select("event_id", "event_type", "value")
      val root = EntryHelpers.clonedFixtureLazy("graftprn", dir) { tpl =>
        new ParquetLog(s, s"$tpl/log", ev.schema, bucketSize = 512L,
          statsColumns = Seq("event_id")).append(ev)
      }
      val log = new ParquetLog(s, s"$root/log", ev.schema, bucketSize = 512L,
        statsColumns = Seq("event_id"))
      val n = log.since + 1L
      log.retract(col("event_id") >= n / 2 && col("event_id") < n / 2 + (n + 9L) / 10L)
      log.read.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        round(sum("value"), 4).as("sum_value"))
        .orderBy("event_type")
    }),
    "q_db_retract_keyed" -> ((s, dir) => {
      // IN-PLACE db takedown through the KEYED folding families (the
      // r15 scale-killer closed): a latest-per-key hashtable purges +
      // recomputes ONLY the affected keys from a key-pruned log scan,
      // the SCD-2 dimension deletes removed version rows outright, and
      // the sum reduce subtracts the removed rows' partial — no view
      // pays a full-log rebuild. The outputs read every artifact after
      // ONE db.retract call. Pre-takedown state (log + hashtable +
      // SCD-2 stores at parity) TEMPLATE-CLONED per rep (r19, verdict
      // item 2 — supersedes the r16-era live cache): every rep runs the
      // REAL keyed in-place takedown on a pristine byte-copy; the gated
      // reads collect scalars, so the clone is reclaimed in-line.
      import s.implicits._
      val ev = t(s, dir, "events").orderBy("event_id")
        .select("user_id", "event_type", "value")
      val root = EntryHelpers.clonedFixture("graftdbk", dir) { tpl =>
        val log = new ParquetLog(s, s"$tpl/log", ev.schema, bucketSize = 8192L)
        val db0 = new FlumeDb(log)
          .use("ht", graft.views.PersistentHashtableView(s"$tpl/ht", "user_id"))
          .use("dim", graft.views.Scd2TableView(s"$tpl/dim", "user_id", "seq", Seq("value")))
        db0.append(ev)
        db0.close()
      }
      val log = new ParquetLog(s, s"$root/log", ev.schema, bucketSize = 8192L)
      val db = new FlumeDb(log)
        .use("ht", graft.views.PersistentHashtableView(s"$root/ht", "user_id"))
        .use("dim", graft.views.Scd2TableView(s"$root/dim", "user_id", "seq", Seq("value")))
        .use("sum", graft.views.SumReduceView("value"))
      try {
        db.retract(col("user_id") % 7 === 3)
        val ht = db.gated("ht")(_.asInstanceOf[PersistentHashtableView].frame)
        val htRow = ht.agg(sum("value").cast("double").as("s"), count(lit(1)).as("c")).head()
        val latestSum = round4(htRow.getDouble(0))
        val nUsers = htRow.getLong(1)
        val versions = db.gated("dim")(_.asInstanceOf[Scd2TableView].dimension).count()
        val (sumV, cnt) = db.gated("sum")(_.asInstanceOf[MergeableReduceView[(Double, Long)]].value.get)
        Seq((nUsers, latestSum, versions, round4(sumV), cnt))
          .toDF("n_users", "latest_sum", "versions", "sum_value", "value_cnt")
      } finally { db.close(); EntryHelpers.deleteTreeAsync(root) }
    }),
    "q_expire_by_time" -> ((s, dir) => {
      // EVENT-TIME retention end-to-end: the log declares its epoch-ms
      // event time as a stats column, so `expireOlderThan` derives the
      // seq horizon from per-bucket [min,max] manifest ARITHMETIC —
      // whole-old buckets truncate with no data read, only the boundary
      // bucket pays a (ts, seq) scan — then ages the prefix out exactly
      // like q_expire. The horizon is min(seq where ts > T) - 1: the
      // prefix a time policy provably covers.
      // Pre-expiry log TEMPLATE-CLONED per rep (r19, verdict item 2);
      // the policy threshold is read at TEMPLATE-build time (its
      // boundary row leaves storage with the aged prefix on every rep)
      // and rides the template as a sidecar file, so each rep re-runs
      // the REAL manifest-arithmetic truncation at the same threshold
      // on a pristine byte-copy.
      val ev = t(s, dir, "events").orderBy("event_id")
        .select(tsMs(s, dir).as("ts_ms"), col("event_type"), col("value"))
      val root = EntryHelpers.clonedFixtureLazy("graftett", dir) { tpl =>
        val log = new ParquetLog(s, s"$tpl/log", ev.schema, bucketSize = 512L,
          statsColumns = Seq("ts_ms"))
        log.append(ev)
        // the policy threshold: the event time at the 40%-by-seq row
        val thr = log.read.where(col("seq") === (log.since + 1L) * 2L / 5L)
          .select("ts_ms").head().getLong(0)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(tpl, "thr"), thr.toString)
      }
      val log = new ParquetLog(s, s"$root/log", ev.schema, bucketSize = 512L,
        statsColumns = Seq("ts_ms"))
      val thr = java.nio.file.Files.readString(
        java.nio.file.Paths.get(root, "thr")).trim.toLong
      log.expireOlderThan("ts_ms", thr)
      log.read.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        round(sum("value"), 4).as("sum_value"),
        min("seq").as("min_seq"))
        .orderBy("event_type")
    }),
    "q_retract_pruned_str" -> ((s, dir) => {
      // STRING-KEY stats-pruned takedown: real corpora key on urls/
      // uuids/hashes — the manifest stores lexicographic [min,max]
      // (binary-UTF-8 order) per bucket, and a clustered url-range
      // takedown reads only the overlapping `seq_bucket=` dirs in its
      // match scan, exactly like the integral twin q_retract_pruned.
      // Pre-takedown log TEMPLATE-CLONED per rep (r19, verdict item 2 —
      // same shape as the integral twin q_retract_pruned).
      val ev = t(s, dir, "events").orderBy("event_id")
        .select(format_string("https://example.com/doc-%09d", col("event_id")).as("url"),
          col("event_type"), col("value"))
      val root = EntryHelpers.clonedFixtureLazy("graftprs", dir) { tpl =>
        new ParquetLog(s, s"$tpl/log", ev.schema, bucketSize = 512L,
          statsColumns = Seq("url")).append(ev)
      }
      val log = new ParquetLog(s, s"$root/log", ev.schema, bucketSize = 512L,
        statsColumns = Seq("url"))
      val n = log.since + 1L
      def u(i: Long) = f"https://example.com/doc-$i%09d"
      log.retract(col("url") >= u(n / 2) && col("url") < u(n / 2 + (n + 9L) / 10L))
      log.read.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        round(sum("value"), 4).as("sum_value"))
        .orderBy("event_type")
    }),
    "q_db_retract" -> ((s, dir) => {
      // DB-LEVEL takedown: ONE call retracts the log AND brings every
      // mounted view to a no-trace state — the seq-keyed posting index
      // retracts IN PLACE (pruned delta rewrite, ∝ matches), the folding
      // reduce view rebuilds from the retracted log (a Welford/sum fold
      // cannot un-absorb a row any other way). Gated reads then prove
      // both views serve the post-takedown state.
      // Pre-takedown state (coarse-bucketed log + posting index at
      // parity) TEMPLATE-CLONED per rep (r19, verdict item 2): every
      // rep mounts the pristine byte-copy and runs the REAL db-level
      // takedown — log rewrite, in-place posting retraction, reduce
      // rebuild from the retracted log — so the bench median prices the
      // operator. The gated reads collect scalars, so the clone is
      // reclaimed in-line once they land.
      import s.implicits._
      val ev = t(s, dir, "events").orderBy("event_id")
        .select("user_id", "event_type", "value")
      val root = EntryHelpers.clonedFixture("graftdbr", dir) { tpl =>
        // coarse buckets: a scattered takedown matches every bucket
        // anyway (the worst shape, deliberately), so fine granularity
        // only adds directory churn to the build and the clones
        val log = new ParquetLog(s, s"$tpl/log", ev.schema, bucketSize = 8192L)
        log.append(ev)
        // mount syncs the posting index to parity; the template then
        // holds its materialized store alongside the log
        new FlumeDb(log)
          .use("byType", graft.views.PersistentIndexView.onColumn(s"$tpl/idx", "event_type"))
          .close()
      }
      val log = new ParquetLog(s, s"$root/log", ev.schema, bucketSize = 8192L)
      val db = new FlumeDb(log)
        .use("byType", graft.views.PersistentIndexView.onColumn(s"$root/idx", "event_type"))
        .use("sum", graft.views.SumReduceView("value"))
      try {
        db.retract(col("user_id") % 7 === 3)
        val clicks = db.gated("byType")(_.asInstanceOf[PersistentIndexView].get("click")).count()
        val (sumV, cnt) = db.gated("sum")(_.asInstanceOf[MergeableReduceView[(Double, Long)]].value.get)
        val nRows = db.log.read.count()
        Seq((nRows, clicks, round4(sumV), cnt))
          .toDF("n_rows", "click_postings", "sum_value", "value_cnt")
      } finally { db.close(); EntryHelpers.deleteTreeAsync(root) }
    }),
    "q_get_point" -> ((s, dir) =>
      eventsDb(s, dir).get(500L)
        .select(col("event_id").as("seq"), col("user_id"), col("event_type"), col("value"), col("props"))),
    "q_range_scan" -> ((s, dir) =>
      eventsLog(s, dir).stream(LogRange(gt = Some(100L), lte = Some(600L)))
        .select(col("event_id").as("seq"), col("event_type"), col("value"))),
    "q_orc_scan" -> ((s, dir) =>
      // the same log surface over the ORC codec: range predicate pushed
      // to ORC stripe/row-group stats, projection pruned
      TableLog.orc(s, eventsOrcPath(s, dir), "event_id")
        .stream(LogRange(gt = Some(300L), lte = Some(900L)))
        .select(col("event_id").as("seq"), col("event_type"), col("value"))),
    "q_reverse_scan" -> ((s, dir) =>
      eventsLog(s, dir).stream(LogRange(gte = Some(200L), lt = Some(300L), reverse = true))
        .select(col("event_id").as("seq"), col("event_type"), col("value"))),
    "q_limit" -> ((s, dir) =>
      eventsLog(s, dir).stream(LogRange(limit = Some(100)))
        .select(col("event_id").as("seq"), col("user_id"), col("value"))),
    "q_topk" -> ((s, dir) =>
      eventsLog(s, dir).stream(LogRange(reverse = true, limit = Some(50)))
        .select(col("event_id").as("seq"), col("user_id"), col("value"))),
    "q_project_seqs" -> ((s, dir) =>
      eventsLog(s, dir).stream(LogRange(values = false))
        .select(col("event_id").as("seq"))),
    "q_project_values" -> ((s, dir) =>
      eventsLog(s, dir).stream(LogRange(seqs = false))
        .select("user_id", "event_type", "value", "props")
        .orderBy("user_id", "event_type", "value", "props")),
    "q_mapper" -> ((s, dir) => {
      val db = new FlumeDb(eventsLog(s, dir), mapper = Some(df =>
        df.withColumn("etype_u", upper(col("event_type")))
          .withColumn("value2", round(col("value") * 2, 4))))
      db.stream().select(col("event_id").as("seq"), col("etype_u"), col("value2"))
    }),
    "q_since" -> ((s, dir) => {
      import s.implicits._
      Seq(eventsDb(s, dir).since).toDF("since")
    }),
    "q_reduce_stats" -> ((s, dir) => {
      import s.implicits._
      val db = eventsDb(s, dir).use("stats", StatsReduceView("value"))
      val st = db.gated("stats")(_.asInstanceOf[MergeableReduceView[Stats]].value.get)
      Seq((st.n, round4(st.mean), round4(st.stdevSamp))).toDF("cnt", "mean", "sd")
    }),
    "q_reduce_sum" -> ((s, dir) => {
      import s.implicits._
      val db = eventsDb(s, dir).use("sum", SumReduceView("value"))
      val (sum, n) = db.gated("sum")(_.asInstanceOf[MergeableReduceView[(Double, Long)]].value.get)
      Seq((round4(sum), n)).toDF("sum_value", "cnt")
    }),
    "q_index_lookup" -> ((s, dir) => {
      val db = eventsDb(s, dir).use("byType", IndexView(array(col("event_type")), "event_id"))
      db.gated("byType")(_.asInstanceOf[IndexView].get("click"))
    }),
    "q_query_composite" -> ((s, dir) => {
      // composite-index selection: equality on BOTH components becomes
      // one posting lookup on the NUL-joined key (the isin side expands
      // as a capped cartesian key list); the reference's level views
      // take composite keys natively (README.md:93)
      val db = eventsDb(s, dir).use("byTypeUser",
        IndexView.onColumns(Seq("event_type", "user_id"), "event_id"))
      Query()
        .where(col("event_type") === "purchase" && col("user_id").isin(3L, 7L))
        .select(col("event_id").as("seq"), col("user_id"),
          round(col("value"), 4).as("value_r"))
        .orderBy(col("seq"))
        .run(db)
    }),
    "q_index_join" -> ((s, dir) => {
      // index nested-loop join: the probe table meets the posting
      // table, matching seqs drive a point-get read of the log (inline
      // isin under maxInline — the sf0.001/0.01 path — or a seq
      // semi-join beyond it — the sf0.1 path; both exercised)
      val db = eventsDb(s, dir).use("byTypeJoin",
        IndexView.onColumn("event_type", "event_id"))
      import s.implicits._
      val probe = Seq(("purchase", "rev"), ("signup", "acq"), ("error", "ops"))
        .toDF("event_type", "label")
      Query.lookupJoin(db, probe, "event_type")
        .select(col("event_id").as("seq"), col("event_type"), col("label"),
          round(col("value"), 4).as("value_r"))
        .orderBy("seq")
    }),
    "q_index_count" -> ((s, dir) => {
      // covering-index aggregation: count-by-key answered ENTIRELY from
      // the durable (key, seq) posting table — the log is never scanned
      // (PlanSpec asserts the plan reads the posting parquet only)
      // stable fixture dir: the first rep builds the posting store, later
      // reps remount it at parity (swept at process exit)
      val tmp = EntryHelpers.stableTmpDir("graftcntidx", dir)
      val db = eventsDb(s, dir).use("byTypeCnt",
        PersistentIndexView.onColumn(tmp, "event_type", "event_id"))
      Query()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("event_id")).as("first_seq"), // first/last occurrence per
          max(col("event_id")).as("last_seq")) // value — also posting-covered
        .orderBy(col("event_type"))
        .run(db)
    }),
    "q_index_compacted" -> ((s, dir) => {
      // durable index absorbed in two deltas then compacted to one base
      // (the LSM level-merge keeping a 100 TB delta chain off the
      // small-files wall) — reads over the base must equal the chain
      val tmp = EntryHelpers.stableTmpDir("graftcidx", dir)
      val v = new graft.views.PersistentIndexView(s, s"$tmp/idx", 1,
        array(col("event_type")), "event_id")
      // first rep builds + compacts; later reps reopen the compacted base
      if (v.since < 2L) {
        val ev = t(s, dir, "events").select("event_type", "event_id")
        v.absorb(ev.where(col("event_id") < 500), 1L)
        v.absorb(ev.where(col("event_id") >= 500), 2L)
        v.compact()
      }
      v.frame.orderBy("key", "seq")
    }),
    "q_index_asof" -> ((s, dir) => {
      // snapshot read: postings as of the first absorbed delta — flume's
      // log-centric determinism (state at cursor N is a pure function of
      // entries ≤ N) surfaced as time travel over the delta store
      val tmp = EntryHelpers.stableTmpDir("graftaidx", dir)
      val v = new graft.views.PersistentIndexView(s, s"$tmp/idx", 1,
        array(col("event_type")), "event_id")
      // first rep absorbs both deltas; later reps time-travel the chain
      if (v.since < 2L) {
        val ev = t(s, dir, "events").select("event_type", "event_id")
        v.absorb(ev.where(col("event_id") < 500), 1L)
        v.absorb(ev.where(col("event_id") >= 500), 2L)
      }
      v.frameAsOf(1L).orderBy("key", "seq")
    }),
    "q_index_multikey" -> ((s, dir) => {
      val db = eventsDb(s, dir).use("multi",
        IndexView(array(col("event_type"), concat(lit("u:"), col("user_id").cast("string"))), "event_id"))
      db.gated("multi")(_.asInstanceOf[IndexView].frame.get.orderBy("key", "seq"))
    }),
    "q_query_filter_project" -> ((s, dir) =>
      Query()
        .where(col("event_type") === "purchase" && col("value") > 50)
        .select(col("event_id").as("seq"), col("user_id"), round(col("value"), 4).as("value_r"))
        .orderBy(col("value_r").desc, col("seq"))
        .limit(100)
        .run(eventsDb(s, dir).mapped)),
    "q_query_indexed" -> ((s, dir) => {
      // same query, but run(db) with a mounted index on event_type: the
      // equality conjunct becomes a posting-table lookup + read-by-seq,
      // not a full-log filter (reference index selection, README.md:94)
      val db = eventsDb(s, dir).use("byTypeIdx", IndexView.onColumn("event_type", "event_id"))
      Query()
        .where(col("event_type") === "purchase" && col("value") > 50)
        .select(col("event_id").as("seq"), col("user_id"), round(col("value"), 4).as("value_r"))
        .orderBy(col("value_r").desc, col("seq"))
        .limit(100)
        .run(db)
    }),
    "q_query_indexed_or" -> ((s, dir) => {
      // index-UNION selection (r8 verdict #3): a disjunction whose every
      // arm is an indexed equality resolves to a union-distinct of
      // posting reads — two index lookups, zero log scans; the level-view
      // analog is a union of two ordered index reads (README.md:93).
      // value > 50 stays a residual filter on the seq-narrowed rows.
      val db = eventsDb(s, dir)
        .use("byTypeIdx", IndexView.onColumn("event_type", "event_id"))
        .use("byUserIdx", IndexView.onColumn("user_id", "event_id"))
      Query()
        .where((col("event_type") === "purchase" || col("user_id") === 3) && col("value") > 50)
        .select(col("event_id").as("seq"), col("user_id"), round(col("value"), 4).as("value_r"))
        .orderBy(col("value_r").desc, col("seq"))
        .limit(100)
        .run(db)
    }),
    "q_query_indexed_or_mixed" -> ((s, dir) => {
      // mixed-arm index union: an exact equality arm, a range arm, and
      // a conjunctive arm — each served by its own posting read, seqs
      // union-distinct, the original disjunction kept as the residual
      // guard that makes the superset reads exact
      val db = eventsDb(s, dir)
        .use("byTypeIdx", IndexView.onColumn("event_type", "event_id"))
        .use("byUserIdx", IndexView.onColumn("user_id", "event_id"))
      Query()
        .where(col("event_type") === "signup" ||
          col("user_id") < 8 ||
          (col("event_type") === "purchase" && col("value") > 95))
        .select(col("event_id").as("seq"), col("user_id"), round(col("value"), 4).as("value_r"))
        .orderBy(col("value_r").desc, col("seq"))
        .limit(100)
        .run(db)
    }),
    "q_query_indexed_range" -> ((s, dir) => {
      // range-predicate index selection: >=/< conjuncts on the indexed
      // column become a range read of the (key, seq) posting table — the
      // reference's level views are ordered, so range reads are native to
      // its index family (README.md:93); value > 50 stays residual
      val db = eventsDb(s, dir).use("byUserIdx", IndexView.onColumn("user_id", "event_id"))
      Query()
        .where(col("user_id") >= 3 && col("user_id") < 9 && col("value") > 50)
        .select(col("event_id").as("seq"), col("user_id"), round(col("value"), 4).as("value_r"))
        .orderBy(col("value_r").desc, col("seq"))
        .limit(100)
        .run(db)
    }),
    "q_search_term" -> ((s, dir) => {
      val db = new FlumeDb(new TableLog(s, t(s, dir, "documents"), "doc_id"))
        .use("search", SearchView("text", "doc_id"))
      db.gated("search")(_.asInstanceOf[SearchView].search("spark"))
    }),
    "q_search_and" -> ((s, dir) => {
      val db = new FlumeDb(new TableLog(s, t(s, dir, "documents"), "doc_id"))
        .use("search", SearchView("text", "doc_id"))
      db.gated("search")(_.asInstanceOf[SearchView].searchAll(Seq("spark", "join")))
    }),
    "q_search_or" -> ((s, dir) => {
      // multi-term DISJUNCTION on the positional search view (r9
      // verdict #5): posting union-distinct — one isin over the
      // posting table, the orIndexSeqs shape, never a LIKE over the log
      val db = new FlumeDb(new TableLog(s, t(s, dir, "documents"), "doc_id"))
        .use("psearch", PositionalSearchView("text", "doc_id"))
      db.gated("psearch")(_.asInstanceOf[PositionalSearchView]
        .searchAny(Seq("spark", "join", "bloom")))
    }),
    "q_search_phrase" -> ((s, dir) => {
      val db = new FlumeDb(new TableLog(s, t(s, dir, "documents"), "doc_id"))
        .use("psearch", PositionalSearchView("text", "doc_id"))
      db.gated("psearch")(_.asInstanceOf[PositionalSearchView]
        .searchPhrase(Seq("table", "scan")))
    }),
    "q_hashtable_latest" -> ((s, dir) => {
      val db = eventsDb(s, dir).use("latest", HashtableView("user_id", "event_id"))
      db.gated("latest")(_.asInstanceOf[HashtableView].frame.get)
        .select(col("user_id"), col("event_id").as("seq"), col("event_type"), col("value"))
        .orderBy("user_id")
    }),
    "q_bloom_check" -> ((s, dir) => {
      import s.implicits._
      val db = eventsDb(s, dir).use("bloom", BloomView("event_type", 100000L, 0.01))
      val bv = db.view("bloom").view.asInstanceOf[BloomView]
      db.awaitView("bloom")
      Seq("click", "view", "purchase", "signup", "error", "nosuchtype")
        .map(k => (k, bv.mightContain(k))).toDF("key", "might_contain").orderBy("key")
    }),
    "q_seq_lookup_join" -> ((s, dir) => {
      val db = eventsDb(s, dir).use("byType", IndexView(array(col("event_type")), "event_id"))
      val seqs = db.gated("byType")(_.asInstanceOf[IndexView].get("error")).select("seq")
      db.mapped.join(broadcast(seqs), col("event_id") === col("seq"))
        .select(col("seq"), col("user_id"), round(col("value"), 4).as("value_r"))
        .orderBy("seq")
    }),
    "q_search_bm25" -> ((s, dir) =>
      // ranked retrieval over the corpus; scores are distinct at 4
      // decimals around the k=20 cutoff at every SF (checked), so the
      // top-k SET is deterministic cross-engine
      TextAnalysis.bm25Rank(t(s, dir, "documents"), Seq("data", "hash", "scan"), k = 20)),
    "q_layout_scan" -> ((s, dir) =>
      graft.sources.Layout.scanRange(s, eventsRangeLayout(s, dir), 1000, 1999)
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 4).as("value"))
        .orderBy("event_id")),
    "q_zorder_scan" -> ((s, dir) =>
      // 2-D box over the Morton-clustered layout: both dimensions prune
      // partition directories at plan time (asserted in LayoutSpec)
      graft.sources.Layout.scanBox(s, eventsZLayout(s, dir), 100, 119, 2000, 3999)
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 4).as("value"))
        .orderBy("event_id")),
    "q_view_changes" -> ((s, dir) => {
      // CDC read of the latest-per-key view between two log positions,
      // answered from the log itself (one aggregate, no stored view)
      val ev = t(s, dir, "events")
      val mx = ev.agg(max("event_id")).head().getLong(0)
      Changelog.changesBetween(ev, "user_id", "event_id", "value",
          fromSeq = mx * 2 / 5, toSeq = mx * 4 / 5)
        .orderBy("user_id")
    }),
    "q_scd2" -> ((s, dir) => {
      // SCD-2 dimension build (r8 verdict #5): one row per version of
      // each user's record, validity [from_seq, to_seq) from a per-key
      // lead window, to_seq null + is_current on the live version
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"),
        col("event_type"), round(col("value"), 4).as("value_r"))
      Scd2.dimension(ev, "user_id", "event_id", Seq("event_type", "value_r"))
        .orderBy("user_id", "from_seq")
    }),
    "q_scd2_stored" -> ((s, dir) => {
      // the DURABLE dimension (r9 verdict #3): three absorbed deltas,
      // compacted to one base, then a fourth over the base — the
      // physical rewrite of q_scd2, sharing its oracle; intervals close
      // across deltas at read, compaction folds the closed ones
      val tmp = EntryHelpers.stableTmpDir("graftscd2", dir)
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"),
        col("event_type"), round(col("value"), 4).as("value_r"))
      val mx = ev.agg(max("event_id")).head().getLong(0)
      val v = new graft.views.Scd2TableView(s, s"$tmp/scd2", 1,
        "user_id", "event_id", Seq("event_type", "value_r"))
      // first rep builds the 3-delta + compact + 1-delta chain; later
      // reps reopen the dimension at parity
      if (v.since < mx) {
        v.absorb(ev.where(col("event_id") <= mx / 4), mx / 4)
        v.absorb(ev.where(col("event_id") > mx / 4 && col("event_id") <= mx / 2), mx / 2)
        v.absorb(ev.where(col("event_id") > mx / 2 && col("event_id") <= mx * 3 / 4), mx * 3 / 4)
        v.compact()
        v.absorb(ev.where(col("event_id") > mx * 3 / 4), mx)
      }
      v.dimension.orderBy("user_id", "from_seq")
    }),
    "q_scd2_asof" -> ((s, dir) => {
      // record-granular as-of read of the dimension: the version of
      // each user valid at 2/5 of the log — one filter, no replay
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"),
        col("event_type"), round(col("value"), 4).as("value_r"))
      val mx = ev.agg(max("event_id")).head().getLong(0)
      Scd2.asOf(
          Scd2.dimension(ev, "user_id", "event_id", Seq("event_type", "value_r")),
          mx * 2 / 5)
        .orderBy("user_id")
    }),
  )

  def oracles: Map[String, String] = Map(
    "q_append_scan" ->
      "SELECT row_number() OVER (ORDER BY event_id) - 1 AS seq, user_id, event_type, value, props FROM events ORDER BY seq",
    "q_expire" ->
      // retention replay: seqs are append order (row_number over
      // event_id); the horizon is the oldest 40% by integer division,
      // survivors are seq > horizon
      ("WITH seqs AS (SELECT row_number() OVER (ORDER BY event_id) - 1 AS seq, event_type, value FROM events), " +
        "h AS (SELECT (count(*) * 2) // 5 AS horizon FROM seqs) " +
        "SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value, min(seq) AS min_seq " +
        "FROM seqs, h WHERE seq > horizon GROUP BY event_type ORDER BY event_type"),
    "q_retract_pruned" ->
      // event_id IS the seq (dense 0-based append order), so the
      // clustered middle-decile range maps 1:1 onto the Spark cond
      ("WITH c AS (SELECT count(*) AS total FROM events) " +
        "SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value " +
        "FROM events, c " +
        "WHERE NOT (event_id >= total // 2 AND event_id < total // 2 + (total + 9) // 10) " +
        "GROUP BY event_type ORDER BY event_type"),
    "q_retract_pruned_str" ->
      // the url is a zero-padded bijection of event_id, so the string
      // range on Spark's side is exactly this numeric range
      ("WITH c AS (SELECT count(*) AS total FROM events) " +
        "SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value " +
        "FROM events, c " +
        "WHERE NOT (event_id >= total // 2 AND event_id < total // 2 + (total + 9) // 10) " +
        "GROUP BY event_type ORDER BY event_type"),
    "q_expire_by_time" ->
      // event-time retention replay: T = the epoch-ms event time at the
      // 40%-by-seq row; the horizon is min(seq where ts > T) - 1, so
      // survivors are seq >= that min (everything expires when no row
      // is newer — the coalesce arm)
      ("WITH seqs AS (SELECT row_number() OVER (ORDER BY event_id) - 1 AS seq, " +
        "epoch_ms(ts) AS ts_ms, event_type, value FROM events), " +
        "thr AS (SELECT ts_ms AS t FROM seqs WHERE seq = (SELECT (count(*) * 2) // 5 FROM seqs)), " +
        "h AS (SELECT coalesce(min(seq), (SELECT count(*) FROM seqs)) AS firstnew " +
        "FROM seqs, thr WHERE ts_ms > t) " +
        "SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value, min(seq) AS min_seq " +
        "FROM seqs, h WHERE seq >= firstnew GROUP BY event_type ORDER BY event_type"),
    "q_db_retract_keyed" ->
      // every keyed artifact after the takedown: latest-per-user store,
      // version dimension, and the (sum, count) fold over kept rows
      ("WITH kept AS (SELECT * FROM events WHERE user_id % 7 <> 3), " +
        "latest AS (SELECT user_id, arg_max(value, event_id) AS lv FROM kept GROUP BY user_id) " +
        "SELECT (SELECT count(*) FROM latest)::BIGINT AS n_users, " +
        "(SELECT round(sum(lv), 4) FROM latest) AS latest_sum, " +
        "(SELECT count(*) FROM kept)::BIGINT AS versions, " +
        "(SELECT round(sum(value), 4) FROM kept) AS sum_value, " +
        "(SELECT count(*) FROM kept)::BIGINT AS value_cnt"),
    "q_db_retract" ->
      // the takedown replay: every artifact of the db — log rows, index
      // postings, the reduce fold — must agree with the kept set
      ("SELECT count(*) AS n_rows, " +
        "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click_postings, " +
        "round(sum(value), 4) AS sum_value, count(*) AS value_cnt " +
        "FROM events WHERE user_id % 7 <> 3"),
    "q_get_point" ->
      "SELECT event_id AS seq, user_id, event_type, value, props FROM events WHERE event_id = 500",
    "q_range_scan" ->
      "SELECT event_id AS seq, event_type, value FROM events WHERE event_id > 100 AND event_id <= 600 ORDER BY seq",
    "q_orc_scan" ->
      "SELECT event_id AS seq, event_type, value FROM events WHERE event_id > 300 AND event_id <= 900 ORDER BY seq",
    "q_reverse_scan" ->
      "SELECT event_id AS seq, event_type, value FROM events WHERE event_id >= 200 AND event_id < 300 ORDER BY seq DESC",
    "q_limit" ->
      "SELECT event_id AS seq, user_id, value FROM events ORDER BY seq LIMIT 100",
    "q_topk" ->
      "SELECT event_id AS seq, user_id, value FROM events ORDER BY seq DESC LIMIT 50",
    "q_project_seqs" ->
      "SELECT event_id AS seq FROM events ORDER BY seq",
    "q_project_values" ->
      "SELECT user_id, event_type, value, props FROM events ORDER BY user_id, event_type, value, props",
    "q_mapper" ->
      "SELECT event_id AS seq, upper(event_type) AS etype_u, round(value * 2, 4) AS value2 FROM events ORDER BY seq",
    "q_since" ->
      "SELECT coalesce(max(event_id), -1) AS since FROM events",
    "q_reduce_stats" ->
      "SELECT count(value) AS cnt, round(avg(value), 4) AS mean, round(stddev_samp(value), 4) AS sd FROM events",
    "q_reduce_sum" ->
      "SELECT round(sum(value), 4) AS sum_value, count(*) AS cnt FROM events",
    "q_index_lookup" ->
      "SELECT event_type AS key, event_id AS seq FROM events WHERE event_type = 'click' ORDER BY seq",
    "q_index_multikey" ->
      "SELECT key, seq FROM (SELECT event_type AS key, event_id AS seq FROM events UNION ALL SELECT 'u:' || CAST(user_id AS VARCHAR), event_id FROM events) ORDER BY key, seq",
    "q_query_composite" ->
      // identical answer to the unindexed form — composite selection is
      // a physical rewrite, never a semantic one
      "SELECT event_id AS seq, user_id, round(value, 4) AS value_r FROM events WHERE event_type = 'purchase' AND user_id IN (3, 7) ORDER BY seq",
    "q_index_join" ->
      ("SELECT event_id AS seq, event_type, label, round(value, 4) AS value_r " +
        "FROM events JOIN (VALUES ('purchase', 'rev'), ('signup', 'acq'), ('error', 'ops')) p(event_type, label) USING (event_type) ORDER BY seq"),
    "q_index_count" ->
      // the covering-index rewrite is physical, never semantic
      "SELECT event_type, count(*) AS n, min(event_id) AS first_seq, max(event_id) AS last_seq FROM events GROUP BY 1 ORDER BY 1",
    "q_index_compacted" ->
      // compaction is a physical rewrite: identical postings to a plain scan
      "SELECT event_type AS key, event_id AS seq FROM events ORDER BY key, seq",
    "q_index_asof" ->
      "SELECT event_type AS key, event_id AS seq FROM events WHERE event_id < 500 ORDER BY key, seq",
    "q_query_filter_project" ->
      "SELECT event_id AS seq, user_id, round(value, 4) AS value_r FROM events WHERE event_type = 'purchase' AND value > 50 ORDER BY value_r DESC, seq LIMIT 100",
    "q_query_indexed" ->
      // identical answer to the unindexed form — index selection is a
      // physical rewrite, never a semantic one
      "SELECT event_id AS seq, user_id, round(value, 4) AS value_r FROM events WHERE event_type = 'purchase' AND value > 50 ORDER BY value_r DESC, seq LIMIT 100",
    "q_query_indexed_or" ->
      // identical answer to the unindexed disjunction — index-union
      // selection is a physical rewrite, never a semantic one
      "SELECT event_id AS seq, user_id, round(value, 4) AS value_r FROM events WHERE (event_type = 'purchase' OR user_id = 3) AND value > 50 ORDER BY value_r DESC, seq LIMIT 100",
    "q_query_indexed_or_mixed" ->
      "SELECT event_id AS seq, user_id, round(value, 4) AS value_r FROM events WHERE event_type = 'signup' OR user_id < 8 OR (event_type = 'purchase' AND value > 95) ORDER BY value_r DESC, seq LIMIT 100",
    "q_query_indexed_range" ->
      "SELECT event_id AS seq, user_id, round(value, 4) AS value_r FROM events WHERE user_id >= 3 AND user_id < 9 AND value > 50 ORDER BY value_r DESC, seq LIMIT 100",
    "q_search_term" ->
      "SELECT doc_id AS seq FROM documents WHERE list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'spark') ORDER BY seq",
    "q_search_phrase" ->
      // positional adjacency replayed with 1-based list indexing; the
      // Spark side's 0-based posexplode positions cancel in b = a + 1
      ("WITH docs AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents), " +
        "toks AS (SELECT doc_id, toks[i] AS term, i AS pos FROM docs, LATERAL unnest(range(1, len(toks) + 1)) AS u(i)) " +
        "SELECT DISTINCT a.doc_id AS seq FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 " +
        "WHERE a.term = 'table' AND b.term = 'scan' ORDER BY seq"),
    "q_search_and" ->
      "SELECT doc_id AS seq FROM documents WHERE list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'spark') AND list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'join') ORDER BY seq",
    "q_search_or" ->
      // the unindexed disjunction form — index union is a physical
      // rewrite, never a semantic one
      "SELECT doc_id AS seq FROM documents WHERE list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'spark') OR list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'join') OR list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'bloom') ORDER BY seq",
    "q_hashtable_latest" ->
      "SELECT user_id, event_id AS seq, event_type, value FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM events) WHERE rn = 1 ORDER BY user_id",
    "q_seq_lookup_join" ->
      "SELECT l.event_id AS seq, l.user_id, round(l.value, 4) AS value_r FROM (SELECT event_id FROM events WHERE event_type = 'error') i JOIN events l ON i.event_id = l.event_id ORDER BY seq",
    "q_search_bm25" ->
      ("WITH base AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tk FROM documents), " +
        "b2 AS (SELECT doc_id, len(tk)::DOUBLE AS dl, tk FROM base), " +
        "g AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM b2), " +
        "tf AS (SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM (SELECT doc_id, dl, unnest(tk) AS term FROM b2) WHERE term IN ('data', 'hash', 'scan') GROUP BY 1, 2, 3), " +
        "df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1), " +
        "s AS (SELECT doc_id, ln(1.0 + (g.n_docs - df.df + 0.5) / (df.df + 0.5)) * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl / g.avgdl)) AS s FROM tf JOIN df USING (term), g) " +
        "SELECT doc_id, round(sum(s), 4) AS score FROM s GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20"),
    "q_view_changes" ->
      ("WITH m AS (SELECT max(event_id) * 2 // 5 AS lo, max(event_id) * 4 // 5 AS hi FROM events), " +
        "g AS (SELECT user_id, " +
        "max(event_id) FILTER (WHERE event_id <= (SELECT lo FROM m)) AS old_seq, " +
        "max_by(value, event_id) FILTER (WHERE event_id <= (SELECT lo FROM m)) AS old_value, " +
        "max(event_id) AS new_seq, max_by(value, event_id) AS new_value " +
        "FROM events WHERE event_id <= (SELECT hi FROM m) GROUP BY user_id) " +
        "SELECT user_id, CASE WHEN old_seq IS NULL THEN 'insert' ELSE 'update' END AS op, " +
        "old_seq, old_value, new_seq, new_value FROM g WHERE new_seq > (SELECT lo FROM m) ORDER BY user_id"),
    "q_scd2" ->
      ("WITH d AS (SELECT user_id, event_id AS from_seq, " +
        "lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS to_seq, " +
        "event_type, round(value, 4) AS value_r FROM events) " +
        "SELECT user_id, from_seq, to_seq, (to_seq IS NULL) AS is_current, event_type, value_r " +
        "FROM d ORDER BY user_id, from_seq"),
    "q_scd2_stored" ->
      // the stored dimension is a physical rewrite of q_scd2 — same oracle
      ("WITH d AS (SELECT user_id, event_id AS from_seq, " +
        "lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS to_seq, " +
        "event_type, round(value, 4) AS value_r FROM events) " +
        "SELECT user_id, from_seq, to_seq, (to_seq IS NULL) AS is_current, event_type, value_r " +
        "FROM d ORDER BY user_id, from_seq"),
    "q_scd2_asof" ->
      ("WITH m AS (SELECT max(event_id) * 2 // 5 AS at FROM events), " +
        "d AS (SELECT user_id, event_id AS from_seq, " +
        "lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS to_seq, " +
        "event_type, round(value, 4) AS value_r FROM events) " +
        "SELECT user_id, from_seq, to_seq, (to_seq IS NULL) AS is_current, event_type, value_r " +
        "FROM d WHERE from_seq <= (SELECT at FROM m) AND (to_seq IS NULL OR to_seq > (SELECT at FROM m)) " +
        "ORDER BY user_id"),
    "q_bloom_check" ->
      ("SELECT key, key IN (SELECT DISTINCT event_type FROM events) AS might_contain " +
        "FROM (VALUES ('click'),('error'),('nosuchtype'),('purchase'),('signup'),('view')) t(key) ORDER BY key"),
    "q_layout_scan" ->
      ("SELECT event_id, user_id, event_type, round(value, 4) AS value " +
        "FROM events WHERE event_id BETWEEN 1000 AND 1999 ORDER BY event_id"),
    "q_zorder_scan" ->
      ("SELECT event_id, user_id, event_type, round(value, 4) AS value " +
        "FROM events WHERE user_id BETWEEN 100 AND 119 AND event_id BETWEEN 2000 AND 3999 " +
        "ORDER BY event_id"),
  )
}
