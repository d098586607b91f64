package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (public Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search") — the memory-side ANN scale path,
  * complementing IVF (which prunes the SEARCH) by compressing the
  * STORAGE: the vector table a 100 TB corpus actually serves queries
  * from is `m` small integers per vector (m bytes at k ≤ 256) instead
  * of `4·dim` bytes of floats — 32× smaller at dim=64/m=8, usually the
  * difference between "codes fit in executor memory" and "every query
  * rescans parquet".
  *
  * - **train**: split each vector into `m` contiguous subspaces and run
  *   the deterministic [[KMeans]] per subspace over a single cached
  *   slice table — the model is `m × k × dim/m` driver doubles (a few
  *   KB), exactly the k-means scale shape, m times.
  * - **encode**: narrow map — per subspace argmin against the literal
  *   codebook (no join, no shuffle); the code table `(id, code)` is the
  *   stored artifact, written once per corpus.
  * - **search (ADC)**: the query is NOT quantized — the driver builds an
  *   `m × k` table of exact subspace distances to every centroid, folds
  *   it into the plan as a literal, and each row's approximate distance
  *   is `m` array lookups summed (asymmetric distance computation).
  *   Top-`rerank` by ADC is a `TakeOrderedAndProject` over the code
  *   table; the final exact-cosine re-rank touches only `rerank` full
  *   vectors via a broadcast semi-join — the corpus floats are read for
  *   a handful of rows, never scanned.
  */
object Pq {

  /** Trained PQ model: `codebooks(mi)` = the k `(cid, centroid)` pairs of
    * subspace `mi`, each centroid `dim/m` doubles. */
  final case class Model(m: Int, subDim: Int, codebooks: Seq[Seq[(Int, Seq[Double])]]) {
    require(codebooks.length == m)
  }

  /** Train per-subspace codebooks. `dim` must divide evenly into `m`
    * subspaces. One cached pass builds the slice table; each subspace
    * fit is the [[KMeans]] loop (narrow assign + one partial-agg shuffle
    * per iteration, driver state = model only). */
  def train(
      corpus: DataFrame,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Model = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val sliced = corpus.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("v")).persist()
    val books = (0 until m).map { mi =>
      val sub = sliced.select(col("id"), slice(col("v"), mi * subDim + 1, subDim).as("embedding"))
      KMeans.fit(sub, k, iters, idCol = "id", vecCol = "embedding")
    }
    sliced.unpersist(blocking = false)
    Model(m, subDim, books)
  }

  /** Deterministic, externally replayable codebooks: subspace `mi`'s `k`
    * codewords are the sub-vectors of the first `k` corpus vectors by id
    * (`cid` = rank in id order) — the PQ analog of
    * [[Similarity.seedCentroids]]. Recall trails [[train]]'s k-means
    * books, but the encode → ADC → re-rank pipeline and its cost shape
    * are identical, and the whole search becomes replayable by an
    * external oracle with no trained state.
    *
    * TAKEDOWN POLICY: these codewords are literal SUB-VECTOR COPIES of
    * the k lowest-id corpus vectors — takedown-bearing bytes, unlike
    * [[train]]'s k-means-refined codebooks (aggregates a takedown may
    * keep, with [[graft.ops.KMeans.fit]]'s two documented residual-copy
    * caveats). A seeded model's holder must re-derive it when any of
    * those k ids retracts: subscribe [[graft.core.FlumeDb.onRetract]]
    * and re-call this method — re-derivation is deterministic, so the
    * new model differs only where seeds left, and every stored code
    * table built with the old model must re-encode (codes are indices
    * into the books). */
  def seedModel(
      corpus: DataFrame,
      m: Int = 8,
      k: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Model = {
    val rows = corpus.orderBy(col(idCol)).limit(k)
      .select(transform(col(vecCol), _.cast("double")))
      .collect().map(_.getAs[scala.collection.Seq[Double]](0).toSeq)
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val books = (0 until m).map { mi =>
      rows.zipWithIndex.map { case (v, i) =>
        (i, v.slice(mi * subDim, (mi + 1) * subDim))
      }.toSeq
    }
    Model(m, subDim, books)
  }

  /** Per-subspace argmin code struct — the [[KMeans]] `nearest` shape. */
  private def subCode(sub: Column, book: Seq[(Int, Seq[Double])]): Column = {
    val carr = array(book.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), typedLit(cv).as("cvec"))
    }: _*)
    array_min(transform(carr, c =>
      struct(KMeans.l2sq(sub, c.getField("cvec")).as("dist"), c.getField("cid").as("cid"))))
      .getField("cid")
  }

  /** Encode the corpus to its `(id, code: array<int>)` table — the
    * compressed artifact. Narrow map, no shuffle. */
  def encode(
      corpus: DataFrame,
      model: Model,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), _.cast("double"))
    val codeCols = model.codebooks.zipWithIndex.map { case (book, mi) =>
      subCode(slice(v, mi * model.subDim + 1, model.subDim), book)
    }
    corpus.select(col(idCol).as("id"), array(codeCols: _*).as("code"))
  }

  /** [[encode]] plus the IVF coarse cell id — the composed IVF+PQ
    * artifact (the public FAISS `IVFPQ` shape): write it partitioned by
    * `cell` and a probe is DIRECTORY pruning over code files that are
    * already 32× smaller than the vectors. */
  def encodeWithCells(
      corpus: DataFrame,
      model: Model,
      cents: Array[(Long, Seq[Float])],
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    encode(corpus, model, idCol, vecCol)
      .join(Similarity.assignCells(
        corpus.select(col(idCol).as("id"), col(vecCol)), cents, "id", vecCol, "cell")
        .select("id", "cell"), Seq("id"))

  /** IVF+PQ search: probe the `nProbe` nearest coarse cells (driver-side
    * over the tiny centroid table — at cluster scale the `isin` on the
    * cell partition column is plan-time directory pruning), run ADC over
    * the probed cells' codes only, exact-cosine re-rank the shortlist.
    * With `nProbe = nCentroids` and `rerank >= |corpus|` this equals
    * exact kNN (asserted in EmbeddingOpsSpec) — the knob trades recall
    * for touched bytes exactly like [[Similarity.ivfSearch]], on a code
    * table a fraction of the vector table's size. */
  def searchCells(
      codes: DataFrame,
      corpus: DataFrame,
      model: Model,
      cents: Array[(Long, Seq[Float])],
      queryVec: Seq[Float],
      k: Int,
      nProbe: Int = 4,
      rerank: Int = 50,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      excludeId: Option[Long] = None): DataFrame = {
    val probe = Similarity.probeCells(cents, queryVec, nProbe)
    search(codes.where(col("cell").isin(probe: _*)), corpus, model, queryVec,
      k, rerank, idCol, vecCol, excludeId)
  }

  /** ADC top-`k` over a code table, with exact-cosine re-rank of the
    * top-`rerank` shortlist against `corpus` (must be the table `codes`
    * was encoded from). Output `(vec_id, cos)` sorted cos desc. */
  def search(
      codes: DataFrame,
      corpus: DataFrame,
      model: Model,
      queryVec: Seq[Float],
      k: Int,
      rerank: Int = 50,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      excludeId: Option[Long] = None): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    val qd = queryVec.map(_.toDouble)
    // exact subspace distances query→centroid, cid-indexed: tbl(mi)(cid)
    val tbl: Seq[Seq[Double]] = model.codebooks.zipWithIndex.map { case (book, mi) =>
      val qs = qd.slice(mi * model.subDim, (mi + 1) * model.subDim)
      book.sortBy(_._1).map { case (_, cv) =>
        qs.lazyZip(cv).map((a, b) => (a - b) * (a - b)).sum
      }
    }
    val adc = aggregate(
      zip_with(col("code"), typedLit(tbl), (c, row) => element_at(row, c + 1)),
      lit(0.0), (acc, x) => acc + x)
    val base = excludeId.fold(codes)(id => codes.where(col("id") =!= id))
    val shortlist = base.select(col("id"), adc.as("adist"))
      .orderBy(col("adist").asc, col("id")).limit(rerank)
    val q = array(queryVec.map(v => lit(v)): _*)
    corpus.join(broadcast(shortlist), corpus(idCol) === shortlist("id"), "left_semi")
      .select(col(idCol), round(Similarity.cosine(col(vecCol), q), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
