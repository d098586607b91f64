package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("kmeans assignment matches a per-row brute-force reference") {
    // two obvious blobs around (0,0) and (10,10), seeds are ids 0 and 1
    // (one from each blob, so Lloyd converges immediately)
    val pts = vecs(
      0L -> Seq(0.1, 0.0), 1L -> Seq(10.0, 10.1), 2L -> Seq(0.0, 0.2),
      3L -> Seq(9.9, 10.0), 4L -> Seq(0.2, 0.1), 5L -> Seq(10.1, 9.8))
    val model = KMeans.fit(pts, k = 2, iters = 2)
    val got = KMeans.assign(pts, model).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val centroids = model.toMap
    val data = pts.collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    data.foreach { case (id, v) =>
      val best = centroids.toSeq.map { case (cid, c) =>
        (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min._2
      assert(got(id) == best.toLong, s"vec $id")
    }
    // the blobs must separate
    assert(got(0L) == got(2L) && got(2L) == got(4L))
    assert(got(1L) == got(3L) && got(3L) == got(5L))
    assert(got(0L) != got(1L))
  }

  test("kmeans inertia is non-increasing across iterations") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def inertia(iters: Int): Double =
      KMeans.clusterSummary(emb, k = 4, iters = iters)
        .agg(sum(col("avg_sqdist") * col("n_members"))).head().getDouble(0)
    val i1 = inertia(1); val i2 = inertia(2); val i3 = inertia(3)
    assert(i2 <= i1 + 1e-6, s"$i1 -> $i2")
    assert(i3 <= i2 + 1e-6, s"$i2 -> $i3")
  }

  test("kmeans keeps a centroid whose cell goes empty") {
    // ids 0 and 1 are identical, so both seeds coincide; every point
    // tie-breaks to cell 0 and cell 1 is empty from iteration 1 on —
    // it must keep its previous centroid, not crash or vanish
    val pts = vecs(0L -> Seq(0.0, 0.0), 1L -> Seq(0.0, 0.0), 2L -> Seq(1.0, 1.0))
    val model = KMeans.fit(pts, k = 2, iters = 2)
    assert(model.size == 2)
    assert(model.forall(_._2.length == 2))
  }

  test("int8 quantization round-trips within half a scale step") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Embeddings.quantizedVectors(emb)
    val bad = q.join(emb, "vec_id")
      .select(col("vec_id"),
        size(filter(zip_with(col("embedding"), col("q"),
          (x, qi) => abs(x.cast("double") - qi * col("scale")) > col("scale") * 0.5 + lit(1e-12)),
          b => b)).as("n_bad"))
      .agg(sum("n_bad")).head().getLong(0)
    assert(bad == 0L)
    // saturation bound: |q| <= 127 everywhere
    val over = q.select(size(filter(col("q"), x => abs(x) > 127L)).as("o"))
      .agg(sum("o")).head().getLong(0)
    assert(over == 0L)
  }

  test("quantization handles the zero vector") {
    val z = vecs(0L -> Seq(0.0, 0.0, 0.0))
    val r = Embeddings.quantizeInt8(z).head()
    assert(r.getAs[Double]("scale") == 0.0)
    assert(r.getAs[Long]("q_sum") == 0L)
  }

  // --- product quantization ---

  private def fvecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("pq encode picks the nearest sub-centroid in every subspace") {
    // 8-dim, m=2: subspace blobs around 0-vector and 5-vector; every
    // vector's code must match the brute-force per-subspace argmin
    val data = (0L until 40L).map { i =>
      val hi1 = i % 2 == 0; val hi2 = i % 3 == 0
      i -> (0 until 8).map { d =>
        val base = if (d < 4) { if (hi1) 5.0f else 0.0f } else { if (hi2) 5.0f else 0.0f }
        base + (((i + d) % 5) - 2) * 0.01f
      }
    }
    val df = fvecs(data: _*)
    val model = Pq.train(df, m = 2, k = 4, iters = 4)
    val codes = Pq.encode(df, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val books = model.codebooks
    data.foreach { case (id, v) =>
      (0 until 2).foreach { mi =>
        val sub = v.slice(mi * 4, mi * 4 + 4).map(_.toDouble)
        val best = books(mi).map { case (cid, c) =>
          (sub.lazyZip(c).map((a, b) => (a - b) * (a - b)).sum, cid)
        }.min._2
        assert(codes(id)(mi) == best, s"vec $id subspace $mi")
      }
    }
  }

  test("pq search finds the planted nearest cluster and the exact top-k after re-rank") {
    // 4 well-separated direction clusters in 8-dim; query sits in
    // cluster 0 — ADC must shortlist cluster 0, re-rank makes the
    // returned top-k EXACTLY the brute-force top-k
    val dirs = Seq(
      Seq(1f, 1f, 0f, 0f, 0f, 0f, 0f, 0f), Seq(0f, 0f, 1f, 1f, 0f, 0f, 0f, 0f),
      Seq(0f, 0f, 0f, 0f, 1f, 1f, 0f, 0f), Seq(0f, 0f, 0f, 0f, 0f, 0f, 1f, 1f))
    val data = (0L until 80L).map { i =>
      val c = (i % 4).toInt
      i -> dirs(c).zipWithIndex.map { case (x, d) => x * 10f + (((i + d) % 7).toFloat - 3f) * 0.1f }
    }
    val df = fvecs(data: _*)
    val model = Pq.train(df, m = 4, k = 8, iters = 4)
    val codes = Pq.encode(df, model)
    val query = data.find(_._1 == 0L).get._2
    val got = Pq.search(codes, df, model, query, k = 10, rerank = 20, excludeId = Some(0L))
      .collect().map(_.getLong(0))
    assert(got.forall(_ % 4 == 0), s"all hits from the query's cluster, got ${got.toSeq}")
    val exact = Similarity.knnForVector(df, query, 10, excludeId = Some(0L))
      .collect().map(_.getLong(0))
    assert(got.toSeq == exact.toSeq,
      s"re-ranked pq == exact knn on separated clusters: $got vs $exact")
  }

  test("ivf+pq: full probe + full re-rank equals exact knn; probing prunes cell partitions") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count().toInt
    val query = emb.where(col("vec_id") === 0L).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val model = Pq.train(emb, m = 8, k = 16, iters = 3)
    val cents = Similarity.seedCentroids(emb, nCentroids = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfpqspec").toString
    try {
      Pq.encodeWithCells(emb, model, cents)
        .write.mode("overwrite").partitionBy("cell").parquet(dir)
      val codes = spark.read.parquet(dir)
      // full probe + rerank >= corpus: the learned quantization cannot
      // lose anything — output IS exact knn
      val full = Pq.searchCells(codes, emb, model, cents, query, k = 10,
        nProbe = 16, rerank = n, excludeId = Some(0L)).collect().map(_.getLong(0))
      val exact = Similarity.knnForVector(emb, query, 10, excludeId = Some(0L))
        .collect().map(_.getLong(0))
      assert(full.toSeq == exact.toSeq)
      // partial probe: high recall at a fraction of the touched cells
      val probed = Pq.searchCells(codes, emb, model, cents, query, k = 10,
        nProbe = 4, rerank = 50, excludeId = Some(0L)).collect().map(_.getLong(0)).toSet
      val recall = (probed & exact.toSet).size
      assert(recall >= 6, s"ivf+pq recall@10 with 4/16 cells = $recall/10")
      // the probe is plan-time partition pruning over the code table
      val probe = Similarity.probeCells(cents, query, 4)
      val (total, read) = graft.sources.Layout.pruningCounts(
        codes, codes.where(col("cell").isin(probe: _*)))
      assert(total >= 8 && read <= 4, s"probe must prune cell dirs: read $read of $total")
    } finally {
      scala.util.Try(graft.views.FsLists.walkDeepestFirst(
        java.nio.file.Paths.get(dir)).foreach(java.nio.file.Files.deleteIfExists))
    }
  }

  test("pq seed model: codebooks are the first-k subvectors by id, search stays recall-sane") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Pq.seedModel(emb, m = 8, k = 16)
    assert(model.m == 8 && model.subDim == 8 && model.codebooks.forall(_.length == 16))
    // codebook mi, cid c == subvector mi of the (c+1)-th vector by id
    val firstK = emb.orderBy("vec_id").limit(16).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toSeq)
    (0 until 8).foreach { mi =>
      model.codebooks(mi).foreach { case (cid, cv) =>
        assert(cv == firstK(cid).slice(mi * 8, mi * 8 + 8), s"book $mi cid $cid")
      }
    }
    val query = emb.where(col("vec_id") === 0L).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val codes = Pq.encode(emb, model)
    // with rerank >= corpus the seed quantization cannot lose anything
    val n = emb.count().toInt
    val full = Pq.search(codes, emb, model, query, k = 10, rerank = n, excludeId = Some(0L))
      .collect().map(_.getLong(0))
    val exact = Similarity.knnForVector(emb, query, 10, excludeId = Some(0L))
      .collect().map(_.getLong(0))
    assert(full.toSeq == exact.toSeq)
  }

  test("pq recall on the real corpus: top-10 after re-rank-50 covers the exact top-10") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val query = emb.where(col("vec_id") === 0L).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val model = Pq.train(emb, m = 8, k = 16, iters = 5)
    val codes = Pq.encode(emb, model)
    val pq = Pq.search(codes, emb, model, query, k = 10, rerank = 50, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    val exact = Similarity.knnForVector(emb, query, 10, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    val recall = (pq & exact).size
    assert(recall >= 7, s"pq recall@10 = $recall/10 (expected >= 7)")
  }

  test("semanticDedup drops planted twins, keeps originals, verdicts cover the corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()
    val corpus = emb.unionByName(emb.select(
      (col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), x => (x * lit(1.001)).cast("float")).as("embedding")))
    val r = Dedup.semanticDedup(corpus, nCells = 16, tau = 0.95).collect()
    assert(r.length === 2 * n, "one verdict per corpus vector")
    val kept = r.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    // every original survives (it is the lower id of its twin pair; the
    // corpus has no natural pair above cosine ~0.45), every twin drops —
    // a scalar multiple shares its source's cell under argmax cosine
    assert((0L until n).forall(kept.contains), "all originals kept")
    assert((0L until n).forall(id => !kept.contains(id + 10000)), "all twins dropped")
  }

  test("embeddingNearDupIncremental == one-shot restricted to the cross set; total planted recall") {
    import graft.ops.Dedup
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()
    val batch = emb.select((col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), x => (x * lit(1.001)).cast("float")).as("embedding"))
    val inc = Dedup.embeddingNearDupIncremental(batch, emb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // every re-encoded copy pairs with exactly its original at cos 1.0
    assert(inc.size === n, s"planted incremental recall ${inc.size}/$n")
    assert(inc.forall { case (a, b, c) => a == b + 10000L && c == 1.0 },
      s"only (copy, original) pairs at cos 1.0, got ${inc.take(5)}")
    // == the one-shot over the union, restricted to the cross set
    val oneShot = Dedup.embeddingNearDup(emb.unionByName(batch))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a < 10000L && b >= 10000L }
      .map { case (a, b, c) => (b, a, c) }.toSet
    assert(inc === oneShot, "incremental == one-shot cross set")
  }

  test("semanticDedup never compares across cells; oversize cells skip the prune") {
    // two orthogonal blobs -> two cells (seeds 0 and 1, one per blob).
    // tau = 0.9: within-blob vectors are near-parallel (drop), across
    // blobs cosine ~ 0 (blind)
    val pts = vecs(
      0L -> Seq(1.0, 0.0, 0.01), 1L -> Seq(0.0, 1.0, 0.01),
      2L -> Seq(1.0, 0.0, 0.02), 3L -> Seq(0.0, 1.0, 0.02),
      4L -> Seq(1.0, 0.0, 0.03))
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val r = Dedup.semanticDedup(pts, nCells = 2, tau = 0.9, maxCell = 10)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r === Map(0L -> true, 1L -> true, 2L -> false, 3L -> false, 4L -> false))
    // maxCell below the blob size: the pairwise stage is skipped for
    // every (hot) cell and the whole corpus survives — the capped-dedup
    // guard, same semantics as embeddingNearDup's maxBucket
    val capped = Dedup.semanticDedup(pts, nCells = 2, tau = 0.9, maxCell = 1)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(capped.values.forall(identity), "hot cells keep all members")
  }

  test("ivfSearchBatch at full probe equals exact knnBatch; partial probe is a subset chain") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val queries = emb.where(col("vec_id") < 5)
    def results(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val full = results(Similarity.ivfSearchBatch(emb, queries, 10, nCentroids = 8, nProbe = 8))
    val exact = results(Similarity.knnBatch(emb, queries, 10))
    assert(full === exact, "probing every cell must reduce to exact batch kNN")
    // partial probe: per-query results equal the single-vector ivfSearch
    val part = Similarity.ivfSearchBatch(emb, queries, 10, nCentroids = 8, nProbe = 2)
      .collect().groupBy(_.getLong(0)).map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
      }
    (0L until 5L).foreach { q =>
      val qv = emb.where(col("vec_id") === q).head()
        .getAs[scala.collection.Seq[Float]]("embedding").toSeq
      val solo = Similarity.ivfSearch(emb, qv, 10, nCentroids = 8, nProbe = 2,
          excludeId = Some(q))
        .collect().map(_.getLong(0)).toSeq
      assert(part(q) === solo, s"query $q: batch must equal single-vector ivfSearch")
    }
  }

  test("cellAssignJoined matches the literal cellAssign bit-for-bit, carries all columns") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.seedCentroids(emb, 16)
    val lit = emb.withColumn("cell", Similarity.cellAssign(col("embedding"), cents))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val joined = Similarity.cellAssignJoined(emb, cents, "vec_id", "embedding")
    // schema parity: every input column survives, plus the cell
    assert(joined.columns.toSet === (emb.columns.toSet + "cell"))
    val got = joined.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === lit, "joined argmax must equal the literal expression argmax")
    // carried non-key columns are the input row's values, not nulls
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    joined.select("vec_id", "label").collect()
      .foreach(r => assert(labels(r.getLong(0)) === r.getInt(1)))
  }

  test("KMeans.nearestJoined matches the literal argmin bit-for-bit, carries all columns") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), _.cast("double")).as("v"))
    // double-precision centroids, deterministic, with exact duplicates so
    // argmin TIES exist (equal dist → both paths must pick the lowest cid)
    val dim = emb.head().getAs[scala.collection.Seq[Double]]("v").length
    val cents: Seq[(Int, Seq[Double])] = (0 until 12).map { i =>
      val base = i % 8 // cids 8..11 duplicate 0..3 exactly
      (i, Seq.tabulate(dim)(j => ((base * 37 + j * 11) % 101) / 101.0 - 0.5))
    }
    // literal path (k = 12 <= CellAssignLiteralMax)
    val lit = KMeans.assignNearest(emb, cents, "vec_id", "v", "a")
      .select(col("vec_id"), col("a.cid"), col("a.dist")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    // joined path, same centroids, called directly
    val joined = KMeans.nearestJoined(emb, cents, "vec_id", "v", "a")
    assert(joined.columns.toSet === (emb.columns.toSet + "a"))
    val got = joined.select(col("vec_id"), col("a.cid"), col("a.dist")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(got === lit, "joined argmin must equal the literal argmin (dist bits + tie-break)")
    // ties actually exercised: every nearest cid must be < 8 (duplicate
    // copies 8..11 lose every tie to their lower-cid original)
    assert(got.values.forall(_._1 < 8), "ties must break to the lowest cid")
    // carried non-key columns are the input row's values
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    joined.select("vec_id", "label").collect()
      .foreach(r => assert(labels(r.getLong(0)) === r.getInt(1)))
  }

  test("KMeans.assignNearest strategy-switches at CellAssignLiteralMax") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    def hasJoin(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectFirst {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.nonEmpty
    val dim = emb.head().getAs[scala.collection.Seq[Double]]("v").length
    def mk(k: Int): Seq[(Int, Seq[Double])] = (0 until k).map(i =>
      (i, Seq.tabulate(dim)(j => ((i * 31 + j * 7) % 97) / 97.0 - 0.5)))
    assert(!hasJoin(KMeans.assignNearest(emb, mk(16), "vec_id", "v", "a")),
      "small k must stay a narrow literal expression")
    assert(hasJoin(KMeans.assignNearest(emb, mk(Similarity.CellAssignLiteralMax + 1), "vec_id", "v", "a")),
      "above the cap the training assignment must become a centroid-table join")
    // the switch is what fit/clusterSummary/assign route through: a
    // large-k fit must not blow up the expression tree (smoke: 1 iter)
    val model = KMeans.fit(emb.limit(40).select(col("vec_id"), col("v").as("embedding")),
      k = 20, iters = 1, vecCol = "embedding")
    assert(model.size === 20)
  }

  test("assignCells strategy-switches at CellAssignLiteralMax") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    def hasJoin(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectFirst {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.nonEmpty
    val small = Similarity.seedCentroids(emb, 16)
    assert(!hasJoin(Similarity.assignCells(emb, small, "vec_id", "embedding")),
      "small quantizer must stay a narrow literal expression")
    val dim = emb.head().getAs[scala.collection.Seq[Float]]("embedding").length
    val big = Array.tabulate(Similarity.CellAssignLiteralMax + 1)(i =>
      (i.toLong, Seq.tabulate(dim)(j => ((i * 31 + j * 7) % 97).toFloat / 97.0f - 0.5f)))
    assert(hasJoin(Similarity.assignCells(emb, big, "vec_id", "embedding")),
      "above the cap the assignment must become a centroid-table join")
  }

  test("pruned embedding verify: unknown (-1) seqs force the unpruned fallback - never bucket 0") {
    // `div` truncates toward zero, so -1 div bucketSize = 0: without the
    // explicit unknown-seq mapping the fence would prune the scan to
    // bucket 0 and silently LOSE the candidate's vector (a near-dup
    // would be admitted). The fence must hand the reader None instead.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").where(col("vec_id") < 50)
    val stored = emb.select(col("vec_id"),
      Similarity.hyperplaneSignature(col("embedding"), 32).as("sig"),
      lit(-1L).as("seq")) // legacy absorb: seq unknown
    val batch = emb.where(col("vec_id") === 7)
      .select((col("vec_id") + 1000).as("vec_id"),
        transform(col("embedding"), x => (x * lit(1.001)).cast("float")).as("embedding"))
    var handed: Option[Option[Seq[Long]]] = None
    val pairs = Dedup.embeddingNearDupIncrementalPruned(batch, stored, 16L,
      bs => { handed = Some(bs); emb })
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(handed === Some(None), s"unknown seqs must fall back to the full corpus read, got $handed")
    assert(pairs.contains((1007L, 7L)), s"the near-dup must still be found, got ${pairs.toSeq}")
  }
}
