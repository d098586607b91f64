package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property checks for the round-6 pipeline operators against obvious
  * driver-side reference computations on arbitrary small corpora drawn
  * from a tiny alphabet (to force gram/pair collisions on purpose). */
object PipelineProperties extends Properties("Pipeline") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withMaxDiscardRatio(10)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // ---- substring spans ----

  private val tokGen = Gen.oneOf("x", "y", "z", "w")
  private val docGen = Gen.resize(30, Gen.nonEmptyListOf(tokGen)).map(_.mkString(" "))
  private val corpusGen = Gen.resize(6, Gen.nonEmptyListOf(docGen))
    .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  /** Reference: string k-grams with positions, doc frequency, hit
    * positions, left-to-right island merge. */
  private def refSpans(corpus: List[(Long, String)], k: Int): Set[(Long, Long, Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toList }
    val grams = toks.flatMap { case (id, tk) =>
      if (tk.length < k) Nil
      else (0 to tk.length - k).map(i => (id, i + 1L, tk.slice(i, i + k).mkString(" ")))
    }
    val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    grams.filter(g => dup(g._3)).groupBy(_._1).flatMap { case (id, hs) =>
      val ps = hs.map(_._2).distinct.sorted
      // islands: break when gap > k
      val islands = ps.foldLeft(List.empty[List[Long]]) {
        case (Nil, p) => List(List(p))
        case (cur :: done, p) =>
          if (p - cur.head <= k) (p :: cur) :: done else List(p) :: (cur :: done)
      }
      islands.map { isl =>
        val lo = isl.min; val hi = isl.max
        (id, lo, hi + k - 1, hi + k - lo)
      }
    }.toSet
  }

  property("substringSpans matches the reference on arbitrary corpora") =
    forAll(corpusGen, Gen.chooseNum(2, 4)) { (corpus, k) =>
      val got = Dedup.substringSpans(corpus.toDF("doc_id", "text"), k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      got == refSpans(corpus, k)
    }

  // ---- budget selection ----

  private val rowGen = Gen.zip(Gen.chooseNum(0L, 40L), Gen.oneOf(1.0, 2.0, 2.5, 3.0),
    Gen.chooseNum(1, 6))
  private val budgetCorpusGen = Gen.resize(20, Gen.nonEmptyListOf(rowGen))
    .map(_.zipWithIndex.map { case ((_, s, nt), i) => (i.toLong, Seq.fill(nt)("w").mkString(" "), s) })

  property("selectByBudget equals the single-ordering greedy reference (ties included)") =
    forAll(budgetCorpusGen, Gen.chooseNum(1L, 60L)) { (rows, budget) =>
      val df = rows.toDF("doc_id", "text", "s")
      val got = Sampling.selectByBudget(df, budget, org.apache.spark.sql.functions.col("s"), nBuckets = 3)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      // reference: sort by (score desc, id), exclusive running total
      val ordered = rows.map { case (id, t, s) => (id, t.split(" ").count(_.nonEmpty).toLong, s) }
        .sortBy { case (id, _, s) => (-s, id) }
      val ref = ordered.scanLeft((-1L, 0L, 0L)) { case ((_, acc, _), (id, nt, _)) => (id, acc + nt, acc) }
        .drop(1).filter(_._3 < budget).map(x => (x._1, x._3)).toMap
      got == ref
    }

  // ---- BPE ----

  private val wordGen = Gen.resize(8, Gen.nonEmptyListOf(Gen.oneOf('a', 'b'))).map(_.mkString)
  private val wcGen = Gen.resize(8, Gen.nonEmptyListOf(Gen.zip(wordGen, Gen.chooseNum(1L, 9L))))
    .map(_.distinctBy(_._1).toArray)

  property("bpe encode round-trips and merges are well-formed") =
    forAll(wcGen, Gen.chooseNum(1, 6)) { (wf, n) =>
      val merges = Bpe.trainDriver(wf, n)
      // ranks contiguous from 1; each merge's symbols only reference
      // chars or earlier merges (the invariant encode-in-rank-order needs)
      val ok = merges.zipWithIndex.forall { case (m, i) =>
        m.rank == i + 1 && {
          val known = Set("a", "b") ++ merges.take(i).map(m2 => m2.left + m2.right)
          known(m.left) && known(m.right)
        }
      }
      val enc = wf.map(_._1).toSeq.toDF("word")
        .select(org.apache.spark.sql.functions.array_join(
          Bpe.encodeWord(org.apache.spark.sql.functions.col("word"), merges), "").as("glued"),
          org.apache.spark.sql.functions.col("word"))
        .collect().forall(r => r.getString(0) == r.getString(1))
      ok && enc
    }

  // ---- ordered funnel ----

  private val evGen = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 5L)
      t <- Gen.oneOf("view", "click", "purchase", "other")
    } yield (u, t))
  } yield evs.zipWithIndex.map { case ((u, t), i) => (u, i.toLong, t) }

  /** Reference: walk each user's events in seq order, advancing the
    * stage pointer on exact matches. */
  private def refFunnel(evs: List[(Long, Long, String)], stages: List[String])
      : Map[Long, (List[Long], Int)] =
    evs.groupBy(_._1).flatMap { case (u, es) =>
      var stage = 0
      val seqs = scala.collection.mutable.ListBuffer.empty[Long]
      es.sortBy(_._2).foreach { case (_, seq, t) =>
        if (stage < stages.length && t == stages(stage)) { seqs += seq; stage += 1 }
      }
      if (stage == 0) None else Some(u -> ((seqs.toList, stage)))
    }

  /** Reference: per-user (ms, seq)-ordered walk, gap-split sessions,
    * trigram slide, global counts. */
  private def refPaths(evs: List[(Long, Long, Long, String)], gap: Long)
      : Map[String, Long] =
    evs.groupBy(_._1).values.flatMap { es =>
      val ordered = es.sortBy(e => (e._2, e._3))
      val sessions = ordered.foldLeft(List.empty[List[(Long, Long, Long, String)]]) {
        case (Nil, e) => List(List(e))
        case (cur :: done, e) =>
          if (e._2 - cur.head._2 >= gap) List(e) :: (cur :: done)
          else (e :: cur) :: done
      }.map(_.reverse)
      sessions.flatMap(s => s.map(_._4).sliding(3).filter(_.size == 3)
        .map(_.mkString(">")))
    }.groupBy(identity).map { case (p, os) => p -> os.size.toLong }

  property("topPaths == per-session reference walk on random event logs") =
    forAll(for {
      n <- Gen.choose(3, 30)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 3L)
        ms <- Gen.choose(0L, 20L).map(_ * 400000L) // gaps straddle the 600k threshold
        t <- Gen.oneOf("a", "b", "c")
      } yield (u, ms, t))
    } yield evs.zipWithIndex.map { case ((u, ms, t), i) => (u, ms, i.toLong, t) }) { evs =>
      val got = Paths.topPaths(evs.toDF("user_id", "ms", "seq", "et"),
          "user_id", org.apache.spark.sql.functions.col("ms"),
          org.apache.spark.sql.functions.col("seq"),
          org.apache.spark.sql.functions.col("et"), k = 1000)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      got == refPaths(evs, 600000L)
    }

  property("funnel == per-user ordered walk on random event logs") =
    forAll(evGen) { evs =>
      val stages = List("view", "click", "purchase")
      val got = Funnel.funnel(evs.toDF("user_id", "seq", "et"),
          "user_id", org.apache.spark.sql.functions.col("seq"),
          org.apache.spark.sql.functions.col("et"), stages)
        .collect().map { r =>
          val seqs = (1 to 3).flatMap(i => if (r.isNullAt(i)) None else Some(r.getLong(i))).toList
          r.getLong(0) -> ((seqs, r.getInt(4)))
        }.toMap
      got == refFunnel(evs, stages)
    }

  /** Reference for the time-bounded funnel: same seq-ordered walk, but a
    * stage only advances while its ts is within `gap` of the previously
    * chosen stage's ts (the first qualifying event IS the min-seq
    * qualifying event, because the walk runs in seq order). */
  private def refFunnelGapped(evs: List[(Long, Long, Long, String)],
      stages: List[String], gap: Long): Map[Long, (List[Long], Int)] =
    evs.groupBy(_._1).flatMap { case (u, es) =>
      var stage = 0
      var prevMs = 0L
      val seqs = scala.collection.mutable.ListBuffer.empty[Long]
      es.sortBy(_._2).foreach { case (_, seq, ms, t) =>
        if (stage < stages.length && t == stages(stage) &&
            (stage == 0 || ms - prevMs <= gap)) {
          seqs += seq; prevMs = ms; stage += 1
        }
      }
      if (stage == 0) None else Some(u -> ((seqs.toList, stage)))
    }

  /** Reference for the TOTAL-window funnel: every stage beyond the
    * first must land within `gap` of the chosen stage-1 ts. */
  private def refFunnelTotalWindow(evs: List[(Long, Long, Long, String)],
      stages: List[String], gap: Long): Map[Long, (List[Long], Int)] =
    evs.groupBy(_._1).flatMap { case (u, es) =>
      var stage = 0
      var firstMs = 0L
      val seqs = scala.collection.mutable.ListBuffer.empty[Long]
      es.sortBy(_._2).foreach { case (_, seq, ms, t) =>
        if (stage < stages.length && t == stages(stage) &&
            (stage == 0 || ms - firstMs <= gap)) {
          seqs += seq; if (stage == 0) firstMs = ms; stage += 1
        }
      }
      if (stage == 0) None else Some(u -> ((seqs.toList, stage)))
    }

  property("total-window funnel == first-anchored walk on random event logs") =
    forAll(for {
      n <- Gen.choose(1, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 5L)
        ms <- Gen.choose(0L, 15L)
        t <- Gen.oneOf("view", "click", "purchase", "other")
      } yield (u, ms, t))
    } yield evs.zipWithIndex.map { case ((u, ms, t), i) => (u, i.toLong, ms, t) }) { evs =>
      val stages = List("view", "click", "purchase")
      val got = Funnel.funnel(evs.toDF("user_id", "seq", "ms", "et"),
          "user_id", org.apache.spark.sql.functions.col("seq"),
          org.apache.spark.sql.functions.col("et"), stages,
          tsCol = Some(org.apache.spark.sql.functions.col("ms")),
          maxGap = Some(5L), gapFrom = "first")
        .collect().map { r =>
          val seqs = (1 to 3).flatMap(i => if (r.isNullAt(i)) None else Some(r.getLong(i))).toList
          r.getLong(0) -> ((seqs, r.getInt(4)))
        }.toMap
      got == refFunnelTotalWindow(evs, stages, 5L)
    }

  property("time-bounded funnel == gap-gated walk on random event logs") =
    forAll(for {
      n <- Gen.choose(1, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 5L)
        ms <- Gen.choose(0L, 15L) // gap = 5 straddles the boundary
        t <- Gen.oneOf("view", "click", "purchase", "other")
      } yield (u, ms, t))
    } yield evs.zipWithIndex.map { case ((u, ms, t), i) => (u, i.toLong, ms, t) }) { evs =>
      val stages = List("view", "click", "purchase")
      val got = Funnel.funnel(evs.toDF("user_id", "seq", "ms", "et"),
          "user_id", org.apache.spark.sql.functions.col("seq"),
          org.apache.spark.sql.functions.col("et"), stages,
          tsCol = Some(org.apache.spark.sql.functions.col("ms")), maxGap = Some(5L))
        .collect().map { r =>
          val seqs = (1 to 3).flatMap(i => if (r.isNullAt(i)) None else Some(r.getLong(i))).toList
          r.getLong(0) -> ((seqs, r.getInt(4)))
        }.toMap
      got == refFunnelGapped(evs, stages, 5L)
    }

  // ---- cohort retention ----

  /** Reference: per-key cohort = min period, offsets = distinct
    * (period − cohort) / width, counts per (cohort, offset). */
  private def refRetention(evs: List[(Long, Long)], width: Long): Map[(Long, Long), Long] =
    evs.groupBy(_._1).toList.flatMap { case (_, es) =>
      val ps = es.map(_._2).distinct
      val cohort = ps.min
      ps.map(p => (cohort * 1000L, (p - cohort) / width))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }

  property("retention == per-key cohort walk on random activity") =
    forAll(for {
      n <- Gen.choose(1, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 6L)
        d <- Gen.choose(0L, 9L) // day index
      } yield (u, d * 86400L))
    } yield evs) { evs =>
      val df = evs.toDF("k", "sec")
        .select(org.apache.spark.sql.functions.col("k"),
          org.apache.spark.sql.functions.timestamp_seconds(
            org.apache.spark.sql.functions.col("sec")).as("ts"))
      val got = Retention.retention(df, "k", org.apache.spark.sql.functions.col("ts"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      got == refRetention(evs, 86400L)
    }

  // ---- type affinity ----

  /** Reference: distinct (key, type), ordered pairs, floored-ppm
    * support/lift with the 1e-9 nudge — same double arithmetic order. */
  private def refAffinity(evs: List[(Long, String)]): Set[(String, String, Long, Long, Long)] = {
    val b = evs.distinct
    val u = b.map(_._1).distinct.size.toDouble
    val per = b.groupBy(_._2).map { case (t, xs) => t -> xs.size }
    b.groupBy(_._1).values.toList
      .flatMap(ts => for {
        a <- ts.map(_._2); c <- ts.map(_._2) if a < c
      } yield (a, c))
      .groupBy(identity).map { case ((a, c), xs) =>
        val nxy = xs.size
        (a, c, nxy.toLong,
          math.floor(nxy * 1000000.0 / u + 1e-9).toLong,
          math.floor(nxy * u * 1000000.0 / (per(a).toDouble * per(c).toDouble) + 1e-9).toLong)
      }.toSet
  }

  property("typeAffinity == reference pair counts on random activity") =
    forAll(for {
      n <- Gen.choose(1, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 5L)
        t <- Gen.oneOf("a", "b", "c", "d")
      } yield (u, t))
    } yield evs) { evs =>
      val got = Affinity.typeAffinity(evs.toDF("k", "t"), "k",
          org.apache.spark.sql.functions.col("t"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      got == refAffinity(evs)
    }

  // ---- corpus-self audio containment sweep ----

  private lazy val sweepDocs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").limit(60)

  /** ANY window-aligned cut of ANY stored recording must be found by
    * the sweep at its exact offset (clip windows ≥ 25 so at least one
    * 24-gram exists; cut bounded by the shortest fixture recording, 50
    * windows). The sweep sees originals ∪ cuts as PEER recordings. */
  property("containment sweep finds every window-aligned cut at its offset") =
    forAll(for {
      start <- Gen.choose(0, 20)
      win <- Gen.choose(25, 50 - 20)
      gain <- Gen.choose(1, 4)
    } yield (start, win, gain)) { case (start, win, gain) =>
      val originals = Multimodal.syntheticWavMedia(sweepDocs, textured = true)
      val cuts = Multimodal.syntheticWavClip(sweepDocs,
        startWindow = start, nWindows = win, gain = gain)
      val hits = Multimodal.audioContainmentSweep(originals.unionByName(cuts))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val n = originals.count()
      val planted = hits.filter { case (s, l, off, ng) =>
        l == s - 90000L && off == start.toLong && ng == (win - 24).toLong }
      planted.length == n && hits.length == planted.length
    }

  /** ANY cut at ANY multiple of the hop (8 samples = ws/2, including
    * every NON-window-aligned odd multiple) must be found by the
    * hop-gram containment at its exact hop offset with the exact gram
    * count (clip hop-windows = 2·win − 1 ⇒ grams = 2·win − 25).
    * Planted recall only — the mixer's (id·31 + 17i) streams collide
    * across ids 17k apart at 1-sample skew, which the operator is
    * right to report as genuine near-copies, so extras are allowed. */
  property("hop grams find every hop-multiple cut at its hop offset") =
    forAll(for {
      startHops <- Gen.choose(0, 40)
      win <- Gen.choose(25, 30)
      gain <- Gen.choose(1, 4)
    } yield (startHops, win, gain)) { case (sh, win, gain) =>
      val corpus = Multimodal.syntheticWavMedia(sweepDocs, textured = true)
      val clips = Multimodal.syntheticWavClip(sweepDocs,
        nWindows = win, gain = gain, startSamples = sh * 8)
      val hits = Multimodal.audioClipContainment(clips, corpus, hopSamples = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val n = corpus.count()
      val planted = hits.filter { case (c, p, off, ng) =>
        p == c - 90000L && off == sh.toLong && ng == (2 * win - 25).toLong }
      planted.length == n
    }
}
