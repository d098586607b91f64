package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfTopTerms: rare terms outrank common ones; ties break on term asc") {
    // 'rare' appears in 1 doc, 'shared' in all 3 — idf(shared) = ln(4/4) = 0
    val docs = Seq(
      (1L, "shared shared rare rare rare"),
      (2L, "shared alpha beta"),
      (3L, "shared alpha gamma")).toDF("doc_id", "text")
    val r = TextAnalysis.tfidfTopTerms(docs, topK = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    // doc 1: rare (tf=3, df=1 -> 3*ln(2)=2.0794) then shared (score 0)
    assert(r.filter(_._1 == 1L).map(_._3).toSeq === Seq("rare", "shared"))
    assert(math.abs(r.find(x => x._1 == 1L && x._3 == "rare").get._4 - 2.0794) < 1e-9)
    // doc 2: alpha (df=2) and beta (df=1) — beta rarer, ranks first
    assert(r.filter(_._1 == 2L).map(_._3).toSeq === Seq("beta", "alpha"))
    // doc 3: gamma first (df=1), then alpha; 'shared' (score 0) cut at k=2
    assert(r.filter(_._1 == 3L).map(_._3).toSeq === Seq("gamma", "alpha"))
  }

  test("urlDedup: canonicalization collapses query/fragment variants; lowest doc wins") {
    val docs = Seq(
      (5L, "x http://A.example.com/p?q=1 y"),
      (2L, "z http://a.example.com/p?q=2#frag"),
      (9L, "w http://a.example.com/other")).toDF("doc_id", "text")
    val r = TextAnalysis.urlDedup(docs)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq(
      ("http://a.example.com/other", 9L, 1L),
      ("http://a.example.com/p", 2L, 2L)))
  }

  test("tokenEntropy: uniform text maxes ln(n); constant text scores zero") {
    val docs = Seq(
      (1L, "a b c d"),      // 4 distinct -> H = ln 4
      (2L, "a a a a"),      // constant -> H = 0
      (3L, "a a b b")).toDF("doc_id", "text") // 2 symbols p=1/2 -> ln 2
    val r = TextAnalysis.tokenEntropy(docs)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).sortBy(_._1)
    assert(r(0)._3 === BigDecimal(math.log(4)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r(1)._3 === 0.0)
    assert(r(2)._3 === BigDecimal(math.log(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.map(_._2).toSeq === Seq(4L, 4L, 4L))
  }

  test("urlStats: per-host url and distinct-doc counts") {
    val docs = Seq(
      (1L, "a http://x.example.com/1 b http://x.example.com/2 c https://y.example.org/p?q=1"),
      (2L, "see http://x.example.com/3 only"),
      (3L, "no urls at all")).toDF("doc_id", "text")
    val r = TextAnalysis.urlStats(docs)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq(("x.example.com", 3L, 2L), ("y.example.org", 1L, 1L)))
  }

  test("chunkTokens: full coverage, exact overlap, short docs in one chunk") {
    // 10 tokens, size 4, overlap 1 (stride 3): chunks at 1,4,7,10 —
    // nChunks = 1 + ceil((10-4)/3) = 3 → starts 1,4,7; last covers to 10
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.chunkTokens(docs, size = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    assert(r.filter(_._1 == 1L).toSeq === Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 4L, "t7 t8 t9 t10")))
    assert(r.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 2L, "a b"))) // fits one window
    assert(!r.exists(_._1 == 3L), "empty docs emit no chunks")
    // consecutive chunks share exactly `overlap` tokens; union covers all
    val toks = r.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(toks === (1 to 10).map(i => s"t$i").toSet)
  }

  test("repetition flags duplicated lines and bigrams") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),            // all distinct
      (2L, "spam ham spam ham spam ham spam ham"),            // bigrams repeat
      (3L, "one line\none line\nother line\n\n  ")            // dup line
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Double]("dup_bigram_frac") == 0.0)
    assert(r(2L).getAs[Double]("dup_bigram_frac") > 0.5)
    assert(r(3L).getAs[Long]("n_lines") == 3L) // blank/whitespace lines dropped
    assert(r(3L).getAs[Double]("dup_line_frac") > 0.3)
    assert(r(1L).getAs[Double]("dup_line_frac") == 0.0)
  }

  test("pii scrub counts and redacts emails, ips, phones") {
    val docs = Seq(
      (1L, "reach me at jo.doe+x@corp.example.com or 192.168.1.10 tel 555-1234"),
      (2L, "no pii here at all")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.scrubPii(docs).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Long]("n_emails") == 1L)
    assert(r(1L).getAs[Long]("n_ips") == 1L)
    assert(r(1L).getAs[Long]("n_phones") == 1L)
    val s = r(1L).getAs[String]("scrubbed")
    assert(s.contains("<EMAIL>") && s.contains("<IP>") && s.contains("<PHONE>"))
    assert(!s.contains("@") && !s.contains("192.168"))
    assert(r(2L).getAs[String]("scrubbed") == "no pii here at all")
    assert(r(2L).getAs[Long]("n_emails") == 0L)
  }

  test("pii scrub is idempotent on already-scrubbed text") {
    val once = TextAnalysis.scrubPii(
      Seq((1L, "mail a@b.co ip 10.0.0.1 tel 555-0000")).toDF("doc_id", "text"))
      .select("doc_id", "scrubbed").withColumnRenamed("scrubbed", "text")
    val twice = TextAnalysis.scrubPii(once).head()
    assert(twice.getAs[Long]("n_emails") == 0L)
    assert(twice.getAs[Long]("n_ips") == 0L)
    assert(twice.getAs[Long]("n_phones") == 0L)
  }

  test("vocabBuild counts tf per occurrence, df per doc, honors minDf and tie order") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry cherry"),
      (3L, "banana durian")
    ).toDF("doc_id", "text")
    val v = TextAnalysis.vocabBuild(docs, minDf = 2, topN = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // durian (df=1) and cherry's df=1 check: cherry appears twice but only in doc 2
    assert(v.toSeq == Seq(("apple", 3L, 2L), ("banana", 2L, 2L)))
    // topN cut is deterministic under tf ties (term breaks the tie)
    val cut = TextAnalysis.vocabBuild(docs, minDf = 1, topN = 3).collect().map(_.getString(0))
    assert(cut.toSeq == Seq("apple", "banana", "cherry")) // tf 3, 2, 2; the tf tie breaks on term asc
  }

  test("compression ratio flags repetitive text below natural prose, deterministically") {
    val prose = "the quick brown fox jumps over a lazy dog while seventeen " +
      "violinists argue about parquet encodings near the harbor at dusk"
    val docs = Seq(
      (1L, prose),
      (2L, "spam ham " * 40),                 // highly repetitive
      (3L, "")                                // empty: ratio defined as 1.0
    ).toDF("doc_id", "text")
    val r = TextAnalysis.compressionRatio(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(2L).getAs[Double]("compress_ratio") < 0.2, "repetition compresses hard")
    assert(r(1L).getAs[Double]("compress_ratio") >
      r(2L).getAs[Double]("compress_ratio") + 0.2, "prose compresses far less")
    assert(r(3L).getAs[Double]("compress_ratio") == 1.0)
    assert(r(1L).getAs[Long]("n_bytes") == prose.getBytes("UTF-8").length.toLong)
    // deterministic across runs and partitionings
    val again = TextAnalysis.compressionRatio(docs.repartition(3)).collect()
      .map(x => x.getLong(0) -> x.getAs[Double]("compress_ratio")).toMap
    assert(docs.collect().forall(row =>
      again(row.getLong(0)) == r(row.getLong(0)).getAs[Double]("compress_ratio")))
  }

  test("heavyHitters finds exactly the terms above total/k, in exact counts") {
    // 40 tokens: "the" x 12 (30%), "of" x 6 (15%), everything else unique
    val filler = (1 to 22).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, ("the " * 8).trim + " of of of " + filler),
      (2L, ("the " * 4).trim + " of of of")
    ).toDF("doc_id", "text")
    // k=5 → threshold 40/5 = 8: "the" (12 > 8) qualifies, "of" (6) does not
    val r = TextAnalysis.heavyHitters(docs, k = 5).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSeq == Seq(("the", 12L)))
    // k=10 → threshold 4: both qualify, ordered by cnt desc
    val r2 = TextAnalysis.heavyHitters(docs, k = 10).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(r2.toSeq == Seq(("the", 12L), ("of", 6L)))
  }

  test("heavyHittersApprox is a superset of exact with CMS-bounded estimates") {
    // skewed corpus: planted heavy terms over a uniform tail
    val docs = (1 to 200).map { i =>
      (i.toLong, s"alpha beta u${i}a u${i}b" + (if (i % 2 == 0) " alpha" else ""))
    }.toDF("doc_id", "text")
    val n = 200 * 4 + 100 // 900 tokens; alpha=300, beta=200
    val exact = TextAnalysis.heavyHitters(docs, k = 6).collect()
      .map(x => (x.getString(0), x.getLong(1))).toMap
    assert(exact == Map("alpha" -> 300L, "beta" -> 200L)) // threshold 150
    val approx = TextAnalysis.heavyHittersApprox(docs, k = 6, eps = 1e-3, seed = 42)
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    // CMS never underestimates → no false negatives vs exact
    assert(exact.keySet.subsetOf(approx.keySet))
    for ((t, est) <- approx; truth <- exact.get(t)) {
      assert(est >= truth, s"$t: CMS must not underestimate")
      assert(est <= truth + (1e-3 * n).ceil.toLong + 1, s"$t: est $est too far above $truth")
    }
  }

  test("lineDedup: cross-doc boilerplate lines drop, unique lines keep order") {
    val docs = Seq(
      (1L, "follow us everywhere\nalpha unique content\nfooter text here"),
      (2L, "follow us everywhere\nbeta body line\nfooter text here"),
      (3L, "follow us everywhere\ngamma middle\nfooter text here"),
      (4L, "follow us everywhere\n\ndelta only")).toDF("doc_id", "text")
    val r = TextAnalysis.lineDedup(docs, minDocs = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
      .sortBy(_._1)
    // 'follow us...' in 4 docs and 'footer...' in 3 docs — both dropped;
    // empty line in doc 4 never counts
    assert(r(0) === ((1L, 3L, 1L, "alpha unique content")))
    assert(r(1) === ((2L, 3L, 1L, "beta body line")))
    assert(r(2) === ((3L, 3L, 1L, "gamma middle")))
    assert(r(3) === ((4L, 2L, 1L, "delta only")))
  }

  test("lineDedup: a fully-boilerplate doc survives as an empty husk") {
    val docs = Seq(
      (1L, "x\ny"), (2L, "x\ny"), (3L, "x\ny"),
      (4L, "x\nkeep me\ny")).toDF("doc_id", "text")
    val r = TextAnalysis.lineDedup(docs, minDocs = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
      .sortBy(_._1)
    assert(r(0) === ((1L, 2L, 0L, "")))
    assert(r(3) === ((4L, 3L, 1L, "keep me")))
    // multi-line keeps reassemble with the original separator and order
    val r2 = TextAnalysis.lineDedup(
        Seq((9L, "c line\na line\nb line")).toDF("doc_id", "text"), minDocs = 2)
      .collect().map(_.getString(3))
    assert(r2.head === "c line\na line\nb line")
  }

  test("lineDedup: a line repeated within ONE doc is not cross-doc boilerplate") {
    val docs = Seq(
      (1L, "echo\necho\necho\nbody one"),
      (2L, "other\nbody two")).toDF("doc_id", "text")
    // 'echo' has 3 occurrences but 1 distinct doc — must survive
    val r = TextAnalysis.lineDedup(docs, minDocs = 2)
      .collect().map(x => (x.getLong(0), x.getString(3))).sortBy(_._1)
    assert(r(0)._2 === "echo\necho\necho\nbody one")
  }

  test("gopherRules: each structural gate trips on its planted violator, measures exact") {
    val good = (1 to 30).map(i => s"word$i").mkString("the quick fox and that dog have fun with it ", " ", "")
    val docs = Seq(
      (1L, good),                                                    // passes everything
      (2L, "too short but the and of that have with be to"),          // < minWords
      (3L, good + " " + (1 to 10).map(_ => "###").mkString(" ")),     // symbol ratio blows the 0.1 cap
      (4L, (1 to 25).map(i => s"- bullet $i the of and").mkString("\n")), // bullet lines > 0.9
      (5L, ("1 2 3 4 5 6 7 8 9 0 " * 3) + "the of and that with be to have " + (1 to 12).map(_ => "42").mkString(" ")), // alpha frac < 0.8
      (6L, (1 to 30).map(i => s"w$i").mkString(" ")))                  // no required stopwords
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, minWords = 20, maxWords = 90)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Boolean]("passes"), "clean doc must pass")
    assert(!r(2L).getAs[Boolean]("passes") && r(2L).getAs[Int]("n_words") < 20)
    assert(!r(3L).getAs[Boolean]("passes") && r(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!r(4L).getAs[Boolean]("passes") && r(4L).getAs[Double]("bullet_ratio") > 0.9)
    assert(!r(5L).getAs[Boolean]("passes") && r(5L).getAs[Double]("alpha_frac") < 0.8)
    assert(!r(6L).getAs[Boolean]("passes") && r(6L).getAs[Long]("stop_hits") === 0L)
    // exact measure spot check on the clean doc: 10 header + 30 filler words
    assert(r(1L).getAs[Int]("n_words") === 40)
    assert(r(1L).getAs[Long]("stop_hits") >= 4L)
    // ellipsis lines
    val e = TextAnalysis.gopherRules(
        Seq((7L, "first line...\nsecond line\nthird goes on...")).toDF("doc_id", "text"),
        minWords = 1).collect().head
    assert(e.getAs[Double]("ellipsis_ratio") === 0.6667)
  }

  test("DSIR: target-like docs outweigh off-domain docs; featureless docs unscored") {
    // target speaks "alpha beta gamma"; corpus mixes target-like docs,
    // off-domain docs, and a one-token doc (no bigrams -> no score)
    val target = Seq(
      (100L, "alpha beta gamma alpha beta"),
      (101L, "beta gamma alpha beta gamma")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma alpha beta gamma"), // on-domain
      (2L, "delta epsilon zeta delta epsilon"),  // off-domain
      (3L, "alpha beta delta epsilon"),          // mixed
      (4L, "solo")                               // featureless
    ).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(corpus, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!w.contains(4L), "a doc with < 2 tokens has no features")
    assert(w(1L) > w(3L) && w(3L) > w(2L),
      s"weights must order on-domain > mixed > off-domain, got $w")
    assert(w(1L) > 0 && w(2L) < 0,
      s"target bigrams score positive, unseen bigrams negative: $w")
    // selection takes the top-k in (rounded weight, id) order
    val sel = Dsir.importanceSelect(corpus, target, k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(sel === Seq(1L, 3L))
  }

  test("DSIR self variant (one text pass) equals the general two-pass form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val general = Dsir.importanceWeights(docs, docs.where(col("lang") === "en"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val self = Dsir.importanceWeightsSelf(docs, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(self === general, "identical weights: same counts feed the same log-ratio arithmetic")
  }
}
