package graft

import graft.core._
import graft.ops.{Cluster, Decontaminate, Dedup, Multimodal, Packing, Similarity, TextAnalysis}
import graft.views._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding queries: ANN (IVF/LSH/PQ), kNN, k-means, quantization, SemDeDup, clustering (SURVEY §2.5).
  *
  * A pure round-8 relocation of [[SparkEntry]] catalog entries (r7
  * verdict #7) — zero renames, zero semantic changes; the driver
  * contract stays on [[SparkEntry.queries]]/[[SparkEntry.oracleSql]],
  * which merge the per-domain objects. Shared fixtures/caches live in
  * [[EntryHelpers]].
  */
private[graft] object EmbeddingQueries {
  import EntryHelpers._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_ivf" -> ((s, dir) =>
      // stored-cell IVF: the cell column is a parquet partition column,
      // so the nProbe probe is directory pruning, not a recomputed
      // assignment over the corpus (OpsSpec asserts = ivfSearch)
      ivfIndex(s, dir).search(queryVec(s, dir, 0L), 10, nProbe = 4, excludeId = Some(0L))
        .orderBy(col("cos").desc, col("vec_id"))),
    "q_cluster_survivors" -> ((s, dir) => {
      // which member of each duplicate cluster do we keep? the best by
      // (quality DESC, id ASC). Clusters come from the STORED assignment
      // table (clustered once per corpus, selected from many times — the
      // signatureTable pattern; q_dedup_clusters times the clustering
      // itself); quality is the shared rounded formula.
      val corpus = docsWithDupChain(s, dir)
      val quality = corpus.select(col("doc_id"),
        graft.ops.TextAnalysis.qualityCol(col("text")).as("score"))
      Cluster.survivors(storedClusters(s, dir), quality).orderBy("cluster_id")
    }),
    "q_embed_neardup" -> ((s, dir) =>
      Dedup.embeddingNearDup(embWithNearDups(s, dir), threshold = 0.95)
        .orderBy("id_a", "id_b")),
    "q_embed_neardup_incremental" -> ((s, dir) => {
      // the recurring form: a batch of re-encoded copies (ids +10000,
      // ×1.001) near-dup checks against the STORED originals — the
      // batch's band keys broadcast, the stored side never shuffles,
      // vectors join by id for candidates only, exact-cosine verify
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val batch = e.select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"), x => (x * lit(1.001)).cast("float")).as("embedding"))
      Dedup.embeddingNearDupIncremental(batch, e, threshold = 0.95)
        .orderBy("id_a", "id_b")
    }),
    "q_embed_neardup_stored" -> ((s, dir) => {
      // the stored-artifact form: ingest-time signatures from the
      // durable EmbeddingSigTableView (two deltas), vectors joined back
      // from the corpus — a physical rewrite sharing the incremental's
      // oracle
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val tmp = EntryHelpers.stableTmpDir("graftesig", dir)
      val v = new graft.views.EmbeddingSigTableView(s, s"$tmp/es", 1)
      // first rep absorbs both deltas; later reps reopen at parity
      if (v.since < 2L) {
        v.absorb(e.where(col("vec_id") < 200), 1L)
        v.absorb(e.where(col("vec_id") >= 200), 2L)
      }
      val batch = e.select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"), x => (x * lit(1.001)).cast("float")).as("embedding"))
      v.dedupBatch(batch, e).orderBy("id_a", "id_b")
    }),
    "q_knn_cosine" -> ((s, dir) =>
      Similarity.knnForVector(t(s, dir, "embeddings"), queryVec(s, dir, 0L), 10, excludeId = Some(0L))
        .orderBy(col("cos").desc, col("vec_id"))),
    "q_knn_batch" -> ((s, dir) =>
      Similarity.knnBatch(t(s, dir, "embeddings"),
          t(s, dir, "embeddings").where(col("vec_id") < 8), 5)
        .withColumn("rnk", col("rnk").cast("bigint"))
        .orderBy("query_id", "rnk")),
    "q_knn_quantized" -> ((s, dir) => {
      // kNN over the STORED int8-quantized table: cosine is per-vector
      // scale-invariant, so search runs on the compressed vectors (4x
      // smaller scan + memory at 100 TB) with no dequantization. The
      // integer dot/norm sums are exact in double, so the oracle
      // replays the quantize + cosine chain deterministically.
      val qv = graft.ops.Embeddings.quantizedVectors(t(s, dir, "embeddings"))
        .select(col("vec_id"), transform(col("q"), _.cast("float")).as("qv"))
      val q0 = qv.where(col("vec_id") === 0L).head().getAs[scala.collection.Seq[Float]]("qv")
      Similarity.knnForVector(qv, q0.toSeq, 10, vecCol = "qv", excludeId = Some(0L))
        .orderBy(col("cos").desc, col("vec_id"))
    }),
    "q_ann_lsh" -> ((s, dir) =>
      // signatures come from the STORED parquet table (written once per
      // corpus, like the minhash signatureTable / IVF cells): the
      // bit_count prefilter reads an 8-byte column off disk — no
      // per-query signature pass over the corpus
      Similarity.annForVector(storedAnnSignatures(s, dir), queryVec(s, dir, 0L), 10,
          maxHamming = 8, excludeId = Some(0L), sigCol = Some("sig"))
        .orderBy(col("cos").desc, col("vec_id"))),
    "q_ann_lsh_stored" -> ((s, dir) => {
      // ANN served from the runner-maintained EmbeddingSigTableView —
      // the SAME (vec_id, sig) artifact the incremental dedup consumes,
      // so ingest maintains one signature table for both near-dup
      // checks and similarity serving (32-bit sigs, two deltas)
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val tmp = EntryHelpers.stableTmpDir("graftannsig", dir)
      val v = new graft.views.EmbeddingSigTableView(s, s"$tmp/es", 1)
      // first rep absorbs both deltas; later reps reopen at parity
      if (v.since < 2L) {
        v.absorb(e.where(col("vec_id") < 200), 1L)
        v.absorb(e.where(col("vec_id") >= 200), 2L)
      }
      v.annSearch(queryVec(s, dir, 0L), e, 10, maxHamming = 16, excludeId = Some(0L))
        .orderBy(col("cos").desc, col("vec_id"))
    }),
    "q_ann_ivfpq" -> ((s, dir) => {
      // the composed production ANN: probe 4 of 16 cells (partition
      // pruning over the stored code table), ADC inside probed cells,
      // exact re-rank of the shortlist
      val (model, cents, codes) = storedIvfPqIndex(s, dir)
      graft.ops.Pq.searchCells(codes, t(s, dir, "embeddings"), model, cents,
          queryVec(s, dir, 0L), k = 10, nProbe = 4, rerank = 50, excludeId = Some(0L))
        .orderBy(col("cos").desc, col("vec_id"))
    }),
    "q_ann_pq" -> ((s, dir) => {
      // product-quantization ANN: ADC over the stored 8-byte code table,
      // exact-cosine re-rank of the top-50 shortlist only
      val (model, codes) = storedPqIndex(s, dir)
      graft.ops.Pq.search(codes, t(s, dir, "embeddings"), model,
          queryVec(s, dir, 0L), k = 10, rerank = 50, excludeId = Some(0L))
        .orderBy(col("cos").desc, col("vec_id"))
    }),
    "q_kmeans" -> ((s, dir) =>
      // distributed Lloyd: narrow literal-centroid assignment + one
      // partial-aggregated (cell, dim) shuffle per iteration; seeding,
      // ties and empty cells are all deterministic, so two iterations
      // replay exactly in the oracle's CTE chain
      graft.ops.KMeans.clusterSummary(t(s, dir, "embeddings"), k = 8, iters = 2)
        .orderBy("cell")),
    "q_embed_quantize" -> ((s, dir) =>
      graft.ops.Embeddings.quantizeInt8(t(s, dir, "embeddings"))
        .orderBy("vec_id")),
    "q_semdedup" -> ((s, dir) =>
      // SemDeDup over the planted-near-dup corpus: seed-centroid cells
      // (shared with the IVF family, so fully replayable), within-cell
      // cosine prune — per-vector keep/drop verdicts
      Dedup.semanticDedup(embWithNearDups(s, dir), nCells = 16, tau = 0.95)
        .orderBy("vec_id")),
    "q_ann_ivf_batch" -> ((s, dir) =>
      // the ANN-serving shape for a query FRAME: per-query probe cells
      // picked by a distributed window over the broadcast centroid
      // table, candidates via the (query, cell) x (corpus, cell)
      // equi-join, exact-cosine top-k per query — nothing driver-side
      Similarity.ivfSearchBatch(t(s, dir, "embeddings"),
          t(s, dir, "embeddings").where(col("vec_id") < 8), 5)
        .withColumn("rnk", col("rnk").cast("bigint"))
        .orderBy("query_id", "rnk")),
    "q_ann_ivf_batch_stored" -> ((s, dir) =>
      // the same batch search served from the STORED per-cell index:
      // the corpus scan is directory-pruned to the union of probed
      // cells before the per-query candidate join (PersistenceSpec
      // asserts the pruning; result == the one-shot batch search)
      ivfIndex(s, dir).searchBatch(
          t(s, dir, "embeddings").where(col("vec_id") < 8), 5)
        .withColumn("rnk", col("rnk").cast("bigint"))
        .orderBy("query_id", "rnk")),
    "q_semdedup_bigk" -> ((s, dir) =>
      // the published k ∝ N operating point in miniature: nCells above
      // CellAssignLiteralMax (256), so the assignment runs the
      // broadcast-centroid-join argmax (Similarity.cellAssignJoined)
      // end-to-end against the same oracle arithmetic — the r8 large-k
      // path proven oracle-correct, not just parity-tested
      Dedup.semanticDedup(embWithNearDups(s, dir), nCells = 300, tau = 0.95)
        .orderBy("vec_id")),
    "q_semdedup_incremental" -> ((s, dir) => {
      // the recurring form: a perturbed batch dedups against the STORED
      // IVF corpus — only the touched cell partitions are read
      val batch = t(s, dir, "embeddings").select(
        (col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"), x => (x * lit(1.001)).cast("float")).as("embedding"))
      ivfIndex(s, dir).dedupBatch(batch, tau = 0.95).orderBy("vec_id")
    }),
    "q_similar_topk" -> ((s, dir) =>
      // related-document retrieval: per-doc top-3 neighbors over the
      // EXACT prefix-filtered pair set; bounded-heap agg, no rank window
      Dedup.similarTopK(t(s, dir, "documents"), k = 3, threshold = 0.3)
        .orderBy("doc_id", "rnk")),
  )

  def oracles: Map[String, String] = Map(
    "q_ann_ivf" ->
      ("WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT 16), " +
        "q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), " +
        "probe AS (SELECT cid FROM c, q ORDER BY list_cosine_similarity(cvec::DOUBLE[], qv::DOUBLE[]) DESC, cid LIMIT 4), " +
        "assign AS (SELECT e.vec_id, e.embedding, (SELECT cid FROM c ORDER BY list_cosine_similarity(c.cvec::DOUBLE[], e.embedding::DOUBLE[]) DESC, cid DESC LIMIT 1) AS cell FROM embeddings e) " +
        "SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)::DOUBLE[]), 4) AS cos " +
        "FROM assign WHERE cell IN (SELECT cid FROM probe) AND vec_id <> 0 " +
        "ORDER BY cos DESC, vec_id LIMIT 10"),
    // PQ replay: the seed codebooks (first-16 subvectors, cid = id rank)
    // make encode -> ADC -> shortlist -> exact re-rank fully
    // deterministic SQL; arithmetic mirrors the Spark side op-for-op
    // (L2^2 sums in subspace order, shortlist tie-break (adist, vec_id)),
    "q_ann_pq" ->
      ("WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "q AS (SELECT v AS qv FROM emb WHERE vec_id = 0), " +
        "seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 16)), " +
        "seedsub AS (SELECT cid, j, v[j*8+1 : (j+1)*8] AS cv FROM seeds, range(8) t(j)), " +
        "qsub AS (SELECT j, qv[j*8+1 : (j+1)*8] AS qs FROM q, range(8) t(j)), " +
        "qdist AS (SELECT s.j, s.cid, list_sum(list_transform(list_zip(q2.qs, s.cv), x -> (x[1] - x[2]) * (x[1] - x[2]))) AS d FROM seedsub s JOIN qsub q2 ON s.j = q2.j), " +
        "sub AS (SELECT vec_id, j, v[j*8+1 : (j+1)*8] AS sv FROM emb, range(8) t(j)), " +
        "codes AS (SELECT vec_id, j, (SELECT cid FROM seedsub ss WHERE ss.j = sub.j ORDER BY list_sum(list_transform(list_zip(sub.sv, ss.cv), x -> (x[1] - x[2]) * (x[1] - x[2]))), cid LIMIT 1) AS cid FROM sub), " +
        "adc AS (SELECT c.vec_id, list_sum(list(d.d ORDER BY c.j)) AS adist FROM codes c JOIN qdist d ON c.j = d.j AND c.cid = d.cid WHERE c.vec_id <> 0 GROUP BY c.vec_id), " +
        "short AS (SELECT vec_id FROM adc ORDER BY adist, vec_id LIMIT 50) " +
        "SELECT e.vec_id, round(list_cosine_similarity(e.v, (SELECT qv FROM q)), 4) AS cos " +
        "FROM emb e JOIN short USING (vec_id) ORDER BY cos DESC, e.vec_id LIMIT 10"),
    "q_ann_ivfpq" ->
      ("WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "q AS (SELECT v AS qv FROM emb WHERE vec_id = 0), " +
        "cents AS (SELECT vec_id AS ccid, v AS cvec FROM emb ORDER BY vec_id LIMIT 16), " +
        "probe AS (SELECT ccid FROM cents, q ORDER BY list_cosine_similarity(cvec, qv) DESC, ccid LIMIT 4), " +
        "assign AS (SELECT e.vec_id, (SELECT ccid FROM cents c ORDER BY list_cosine_similarity(c.cvec, e.v) DESC, ccid DESC LIMIT 1) AS cell FROM emb e), " +
        "seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 16)), " +
        "seedsub AS (SELECT cid, j, v[j*8+1 : (j+1)*8] AS cv FROM seeds, range(8) t(j)), " +
        "qsub AS (SELECT j, qv[j*8+1 : (j+1)*8] AS qs FROM q, range(8) t(j)), " +
        "qdist AS (SELECT s.j, s.cid, list_sum(list_transform(list_zip(q2.qs, s.cv), x -> (x[1] - x[2]) * (x[1] - x[2]))) AS d FROM seedsub s JOIN qsub q2 ON s.j = q2.j), " +
        "sub AS (SELECT vec_id, j, v[j*8+1 : (j+1)*8] AS sv FROM emb, range(8) t(j) WHERE vec_id IN (SELECT a.vec_id FROM assign a WHERE a.cell IN (SELECT ccid FROM probe))), " +
        "codes AS (SELECT vec_id, j, (SELECT cid FROM seedsub ss WHERE ss.j = sub.j ORDER BY list_sum(list_transform(list_zip(sub.sv, ss.cv), x -> (x[1] - x[2]) * (x[1] - x[2]))), cid LIMIT 1) AS cid FROM sub), " +
        "adc AS (SELECT c.vec_id, list_sum(list(d.d ORDER BY c.j)) AS adist FROM codes c JOIN qdist d ON c.j = d.j AND c.cid = d.cid WHERE c.vec_id <> 0 GROUP BY c.vec_id), " +
        "short AS (SELECT vec_id FROM adc ORDER BY adist, vec_id LIMIT 50) " +
        "SELECT e.vec_id, round(list_cosine_similarity(e.v, (SELECT qv FROM q)), 4) AS cos " +
        "FROM emb e JOIN short USING (vec_id) ORDER BY cos DESC, e.vec_id LIMIT 10"),
    "q_cluster_survivors" ->
      // the clusters oracle (recursive-CTE transitive closure) extended
      // with the shared rounded quality formula and a per-cluster argmax
      ("WITH RECURSIVE corpus AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 10000, regexp_replace(text, '^\\S+\\s+', '') FROM documents " +
        "UNION ALL SELECT doc_id + 20000, regexp_replace(text, '^\\S+\\s+\\S+\\s+', '') FROM documents), " +
        "toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tk FROM corpus), " +
        "sh AS (SELECT doc_id, CASE WHEN len(tk) = 0 THEN [] WHEN len(tk) < 3 THEN list_distinct(tk) ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) END AS sh FROM toks), " +
        "counts AS (SELECT doc_id, len(sh) AS n FROM sh WHERE len(sh) > 0), " +
        "inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh), " +
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter FROM inv a JOIN inv b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "good AS (SELECT id_a, id_b FROM pairs JOIN counts ca ON ca.doc_id = id_a JOIN counts cb ON cb.doc_id = id_b WHERE round(inter::DOUBLE / (ca.n + cb.n - inter), 4) >= 0.5), " +
        "sym AS (SELECT id_a AS s, id_b AS d FROM good UNION SELECT id_b, id_a FROM good), " +
        "reach AS (SELECT doc_id AS id, doc_id AS r FROM corpus UNION SELECT sym.s, reach.r FROM sym JOIN reach ON sym.d = reach.id), " +
        "cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id), " +
        "qual AS (SELECT c.doc_id, round(least(len(t.tk)::DOUBLE / 50.0, 1.0) * 0.4 + least((len(list_filter(t.tk, x -> list_contains(['the','and','of','to','a','in','is','it','that','for'], x)))::DOUBLE / greatest(len(t.tk)::DOUBLE, 1.0)) * 5.0, 1.0) * 0.4 + greatest(1.0 - (length(regexp_replace(c.text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE / greatest(length(c.text), 1)) * 4.0, 0.0) * 0.2, 4) AS score FROM corpus c JOIN toks t USING (doc_id)), " +
        "j AS (SELECT cl.cluster_id, cl.doc_id, qual.score FROM cl JOIN qual USING (doc_id)), " +
        "r2 AS (SELECT cluster_id, doc_id, score, row_number() OVER (PARTITION BY cluster_id ORDER BY score DESC, doc_id) AS rn, count(*) OVER (PARTITION BY cluster_id) AS nm FROM j) " +
        "SELECT cluster_id, doc_id AS survivor_id, score AS survivor_score, nm::BIGINT AS n_members FROM r2 WHERE rn = 1 ORDER BY cluster_id"),
    "q_embed_neardup" ->
      // Oracle-safe because the pipeline's only stochastic stage — the
      // banded hyperplane bucketing — cannot change the answer on this
      // fixture: planted pairs are exact scalar multiples (identical
      // signs on every deterministic plane ⇒ co-bucketed in EVERY band)
      // and the corpus has no natural pair above cosine ~0.45, so the
      // exact-cosine ≥0.95 verify makes extra candidates irrelevant; no
      // band bucket approaches the maxBucket cap at these SFs. The
      // all-pairs SQL is the exhaustive form of the same predicate.
      ("WITH corpus AS (SELECT vec_id, embedding FROM embeddings UNION ALL SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x * 1.001 AS FLOAT)) FROM embeddings) " +
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos " +
        "FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id " +
        "WHERE round(list_cosine_similarity(a.embedding, b.embedding), 4) >= 0.95 ORDER BY id_a, id_b"),
    "q_embed_neardup_incremental" ->
      // the cross-set (batch × stored) half of q_embed_neardup's
      // exhaustive predicate — oracle-safe for the same reasons (exact
      // scalar multiples co-bucket in every band; natural pairs top out
      // near cosine 0.45, far from the 0.95 verify)
      ("WITH copies AS (SELECT vec_id + 10000 AS id_a, list_transform(embedding, x -> CAST(x * 1.001 AS FLOAT)) AS va FROM embeddings) " +
        "SELECT id_a, b.vec_id AS id_b, round(list_cosine_similarity(va, b.embedding), 4) AS cos " +
        "FROM copies, embeddings b " +
        "WHERE round(list_cosine_similarity(va, b.embedding), 4) >= 0.95 ORDER BY id_a, id_b"),
    "q_embed_neardup_stored" ->
      // the stored-signature form is a physical rewrite — same oracle
      ("WITH copies AS (SELECT vec_id + 10000 AS id_a, list_transform(embedding, x -> CAST(x * 1.001 AS FLOAT)) AS va FROM embeddings) " +
        "SELECT id_a, b.vec_id AS id_b, round(list_cosine_similarity(va, b.embedding), 4) AS cos " +
        "FROM copies, embeddings b " +
        "WHERE round(list_cosine_similarity(va, b.embedding), 4) >= 0.95 ORDER BY id_a, id_b"),
    "q_knn_cosine" ->
      "SELECT e.vec_id, round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS cos FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q WHERE e.vec_id <> 0 ORDER BY cos DESC, e.vec_id LIMIT 10",
    "q_knn_batch" ->
      "SELECT q.vec_id AS query_id, e.vec_id AS nbr_id, round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS cos, row_number() OVER (PARTITION BY q.vec_id ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) DESC, e.vec_id) AS rnk FROM embeddings e, embeddings q WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id QUALIFY rnk <= 5 ORDER BY query_id, rnk",
    "q_knn_quantized" ->
      ("WITH qv AS (SELECT vec_id, CASE WHEN list_max(list_transform(embedding, x -> abs(x::DOUBLE))) = 0 " +
        "THEN list_transform(embedding, x -> 0::DOUBLE) " +
        "ELSE list_transform(embedding, x -> floor(x::DOUBLE / (list_max(list_transform(embedding, y -> abs(y::DOUBLE))) / 127.0) + 0.5)) END AS q " +
        "FROM embeddings) " +
        "SELECT vec_id, round(list_cosine_similarity(q, (SELECT q FROM qv WHERE vec_id = 0)), 4) AS cos " +
        "FROM qv WHERE vec_id <> 0 ORDER BY cos DESC, vec_id LIMIT 10"),
    "q_semdedup" ->
      // Replays the whole pipeline: the planted corpus, the first-16
      // seed centroids, argmax-cosine cell assignment (ties to the
      // higher cid, as in q_ann_ivf), the >maxCell guard, and the
      // within-cell lower-id prune. Oracle-safe on this fixture for the
      // q_embed_neardup reasons: planted pairs are exact scalar
      // multiples (cos = 1), natural pairs top out near 0.45, so the
      // tau = 0.95 verdicts sit nowhere near a float boundary.
      ("WITH corpus AS (SELECT vec_id, embedding FROM embeddings UNION ALL SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x * 1.001 AS FLOAT)) FROM embeddings), " +
        "c AS (SELECT vec_id AS cid, embedding AS cvec FROM corpus ORDER BY vec_id LIMIT 16), " +
        "assign AS MATERIALIZED (SELECT e.vec_id, e.embedding, (SELECT cid FROM c ORDER BY list_cosine_similarity(c.cvec::DOUBLE[], e.embedding::DOUBLE[]) DESC, cid DESC LIMIT 1) AS cell FROM corpus e), " +
        "big AS (SELECT cell FROM assign GROUP BY cell HAVING count(*) > 4096), " +
        "small AS (SELECT * FROM assign WHERE cell NOT IN (SELECT cell FROM big)), " +
        "dropped AS (SELECT DISTINCT b.vec_id FROM small a JOIN small b ON a.cell = b.cell AND a.vec_id < b.vec_id " +
        "WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.95) " +
        "SELECT vec_id, cell, vec_id NOT IN (SELECT vec_id FROM dropped) AS kept FROM assign ORDER BY vec_id"),
    "q_ann_ivf_batch_stored" ->
      // identical answer to q_ann_ivf_batch: the stored layout is a
      // physical rewrite (directory pruning), never a semantic one
      ("WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT 16), " +
        "q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8), " +
        "pr AS (SELECT query_id, cid, row_number() OVER (PARTITION BY query_id ORDER BY list_cosine_similarity(cvec::DOUBLE[], qv::DOUBLE[]) DESC, cid) AS rn FROM q, c), " +
        "probe AS (SELECT query_id, cid FROM pr WHERE rn <= 4), " +
        "assign AS MATERIALIZED (SELECT e.vec_id, e.embedding, (SELECT cid FROM c ORDER BY list_cosine_similarity(c.cvec::DOUBLE[], e.embedding::DOUBLE[]) DESC, cid DESC LIMIT 1) AS cell FROM embeddings e), " +
        "cand AS (SELECT q.query_id, a.vec_id AS nbr_id, round(list_cosine_similarity(a.embedding::DOUBLE[], q.qv::DOUBLE[]), 4) AS cos " +
        "FROM probe p JOIN q ON q.query_id = p.query_id JOIN assign a ON a.cell = p.cid WHERE a.vec_id <> q.query_id), " +
        "r AS (SELECT query_id, nbr_id, cos, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rnk FROM cand) " +
        "SELECT query_id, nbr_id, cos, rnk FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"),
    "q_ann_ivf_batch" ->
      // q_ann_ivf's determinism argument per query: probe ties (cos
      // DESC, cid ASC), assignment ties (cos DESC, cid DESC), scores
      // rounded BEFORE ranking on both engines
      ("WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT 16), " +
        "q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8), " +
        "pr AS (SELECT query_id, cid, row_number() OVER (PARTITION BY query_id ORDER BY list_cosine_similarity(cvec::DOUBLE[], qv::DOUBLE[]) DESC, cid) AS rn FROM q, c), " +
        "probe AS (SELECT query_id, cid FROM pr WHERE rn <= 4), " +
        "assign AS MATERIALIZED (SELECT e.vec_id, e.embedding, (SELECT cid FROM c ORDER BY list_cosine_similarity(c.cvec::DOUBLE[], e.embedding::DOUBLE[]) DESC, cid DESC LIMIT 1) AS cell FROM embeddings e), " +
        "cand AS (SELECT q.query_id, a.vec_id AS nbr_id, round(list_cosine_similarity(a.embedding::DOUBLE[], q.qv::DOUBLE[]), 4) AS cos " +
        "FROM probe p JOIN q ON q.query_id = p.query_id JOIN assign a ON a.cell = p.cid WHERE a.vec_id <> q.query_id), " +
        "r AS (SELECT query_id, nbr_id, cos, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rnk FROM cand) " +
        "SELECT query_id, nbr_id, cos, rnk FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"),
    "q_semdedup_bigk" ->
      // q_semdedup's oracle at 300 seed centroids: the argmax arithmetic
      // is identical (float inputs widened to double, same accumulation
      // order in both engines), only the candidate count grows — the
      // Spark side meanwhile switches to the broadcast-join plan
      ("WITH corpus AS (SELECT vec_id, embedding FROM embeddings UNION ALL SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x * 1.001 AS FLOAT)) FROM embeddings), " +
        "c AS (SELECT vec_id AS cid, embedding AS cvec FROM corpus ORDER BY vec_id LIMIT 300), " +
        "assign AS MATERIALIZED (SELECT e.vec_id, e.embedding, (SELECT cid FROM c ORDER BY list_cosine_similarity(c.cvec::DOUBLE[], e.embedding::DOUBLE[]) DESC, cid DESC LIMIT 1) AS cell FROM corpus e), " +
        "big AS (SELECT cell FROM assign GROUP BY cell HAVING count(*) > 4096), " +
        "small AS (SELECT * FROM assign WHERE cell NOT IN (SELECT cell FROM big)), " +
        "dropped AS (SELECT DISTINCT b.vec_id FROM small a JOIN small b ON a.cell = b.cell AND a.vec_id < b.vec_id " +
        "WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.95) " +
        "SELECT vec_id, cell, vec_id NOT IN (SELECT vec_id FROM dropped) AS kept FROM assign ORDER BY vec_id"),
    "q_semdedup_incremental" ->
      // Same determinism argument as q_semdedup/q_ann_ivf: stored seeds
      // are the first-16 corpus vectors, both sides' assignments replay
      // as argmax-cosine CTEs, and the tau verdicts are far from any
      // float boundary on this fixture
      ("WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT 16), " +
        "corp AS MATERIALIZED (SELECT e.vec_id, e.embedding, (SELECT cid FROM c ORDER BY list_cosine_similarity(c.cvec::DOUBLE[], e.embedding::DOUBLE[]) DESC, cid DESC LIMIT 1) AS cell FROM embeddings e), " +
        "b AS (SELECT vec_id + 10000 AS vec_id, list_transform(embedding, x -> CAST(x * 1.001 AS FLOAT)) AS embedding FROM embeddings), " +
        "bat AS MATERIALIZED (SELECT b2.vec_id, b2.embedding, (SELECT cid FROM c ORDER BY list_cosine_similarity(c.cvec::DOUBLE[], b2.embedding::DOUBLE[]) DESC, cid DESC LIMIT 1) AS cell FROM b b2), " +
        "vsbase AS (SELECT bat.vec_id, min(corp.vec_id) AS d1 FROM bat JOIN corp ON bat.cell = corp.cell AND list_cosine_similarity(bat.embedding::DOUBLE[], corp.embedding::DOUBLE[]) >= 0.95 GROUP BY 1), " +
        "vsself AS (SELECT b2.vec_id, min(b1.vec_id) AS d2 FROM bat b1 JOIN bat b2 ON b1.cell = b2.cell AND b1.vec_id < b2.vec_id AND list_cosine_similarity(b1.embedding::DOUBLE[], b2.embedding::DOUBLE[]) >= 0.95 GROUP BY 1) " +
        "SELECT bat.vec_id, bat.cell, (d1 IS NULL AND d2 IS NULL) AS kept, least(d1, d2) AS dup_of " +
        "FROM bat LEFT JOIN vsbase USING (vec_id) LEFT JOIN vsself USING (vec_id) ORDER BY vec_id"),
    "q_kmeans" ->
      // two Lloyd iterations replayed as a CTE chain: seed = 8 lowest
      // ids, argmin ties to lowest cid, empty cells keep their previous
      // centroid (the LEFT JOIN coalesce), final labeling under the
      // twice-updated centroids
      ("WITH pts AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "c0 AS (SELECT (row_number() OVER (ORDER BY id))::INT - 1 AS cid, v AS cv FROM (SELECT id, v FROM pts ORDER BY id LIMIT 8)), " +
        "d1 AS (SELECT p.id, p.v, c.cid, list_sum(list_transform(range(1, 65), i -> (p.v[i] - c.cv[i]) * (p.v[i] - c.cv[i]))) AS d FROM pts p CROSS JOIN c0 c), " +
        "a1 AS (SELECT id, v, cid FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn FROM d1) WHERE rn = 1), " +
        "m1 AS (SELECT cid, list(m ORDER BY i) AS cv FROM (SELECT cid, i, avg(v[i]) AS m FROM a1 CROSS JOIN range(1, 65) t(i) GROUP BY cid, i) GROUP BY cid), " +
        "c1 AS (SELECT c0.cid, coalesce(m1.cv, c0.cv) AS cv FROM c0 LEFT JOIN m1 USING (cid)), " +
        "d2 AS (SELECT p.id, p.v, c.cid, list_sum(list_transform(range(1, 65), i -> (p.v[i] - c.cv[i]) * (p.v[i] - c.cv[i]))) AS d FROM pts p CROSS JOIN c1 c), " +
        "a2 AS (SELECT id, v, cid FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn FROM d2) WHERE rn = 1), " +
        "m2 AS (SELECT cid, list(m ORDER BY i) AS cv FROM (SELECT cid, i, avg(v[i]) AS m FROM a2 CROSS JOIN range(1, 65) t(i) GROUP BY cid, i) GROUP BY cid), " +
        "c2 AS (SELECT c1.cid, coalesce(m2.cv, c1.cv) AS cv FROM c1 LEFT JOIN m2 USING (cid)), " +
        "d3 AS (SELECT p.id, c.cid, list_sum(list_transform(range(1, 65), i -> (p.v[i] - c.cv[i]) * (p.v[i] - c.cv[i]))) AS d FROM pts p CROSS JOIN c2 c), " +
        "a3 AS (SELECT id, cid, d FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn FROM d3) WHERE rn = 1) " +
        "SELECT cid::BIGINT AS cell, count(*) AS n_members, min(id) AS min_id, round(avg(d), 4) AS avg_sqdist FROM a3 GROUP BY cid ORDER BY cell"),
    "q_embed_quantize" ->
      ("WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
        "m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM v), " +
        "q AS (SELECT vec_id, mx, CASE WHEN mx = 0 THEN list_transform(v, x -> 0::BIGINT) ELSE list_transform(v, x -> floor(x / (mx / 127.0) + 0.5)::BIGINT) END AS q FROM m) " +
        "SELECT vec_id, round(mx / 127.0, 6) AS scale, list_sum(q)::BIGINT AS q_sum, list_min(q)::BIGINT AS q_min, list_max(q)::BIGINT AS q_max, " +
        "len(list_filter(q, x -> abs(x) = 127))::BIGINT AS n_saturated FROM q ORDER BY vec_id"),
    "q_similar_topk" ->
      ("WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tk FROM documents), " +
        "sh AS (SELECT doc_id, CASE WHEN len(tk) = 0 THEN [] WHEN len(tk) < 3 THEN list_distinct(tk) ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) END AS sh FROM toks), " +
        "counts AS (SELECT doc_id, len(sh) AS n FROM sh WHERE len(sh) > 0), " +
        "inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh), " +
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter FROM inv a JOIN inv b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "j AS (SELECT id_a, id_b, round(inter::DOUBLE / (ca.n + cb.n - inter), 4) AS jaccard FROM pairs JOIN counts ca ON ca.doc_id = id_a JOIN counts cb ON cb.doc_id = id_b WHERE round(inter::DOUBLE / (ca.n + cb.n - inter), 4) >= 0.3), " +
        "sym AS (SELECT id_a AS doc_id, id_b AS nbr, jaccard FROM j UNION ALL SELECT id_b, id_a, jaccard FROM j), " +
        "r AS (SELECT doc_id, nbr, jaccard, row_number() OVER (PARTITION BY doc_id ORDER BY jaccard DESC, nbr) AS rnk FROM sym) " +
        "SELECT doc_id, rnk::BIGINT AS rnk, nbr, jaccard FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk"),
  )
}
