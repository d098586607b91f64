package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (or drop) training documents that
  * share at least one word n-gram with an evaluation set — the standard
  * guard against test-set leakage in a training corpus (the GPT-3 /
  * PaLM-style 8-to-13-gram overlap rule).
  *
  * Shuffle profile at 100 TB: both sides reduce to 8-byte n-gram hashes
  * before anything moves (one fused scan per side via
  * [[Dedup.hashedShinglesCol]] — no token or shingle strings are ever
  * materialized), the benchmark side is deduplicated and — being an
  * evaluation set, orders of magnitude smaller than the corpus —
  * broadcast by default, so the corpus is matched map-side with NO
  * shuffle of the training data at all. Set `broadcastBench = false`
  * for an unusually large benchmark; the join then shuffles 8-byte keys
  * and AQE handles skew.
  */
object Decontaminate {

  /** Documents sharing ≥1 distinct `w`-gram with the benchmark text set,
    * with the count of shared distinct n-grams: `(doc_id, shared_ngrams)`.
    * Documents shorter than `w` tokens fall back to token-level overlap
    * (each token its own "gram"), mirroring [[Dedup.hashedShinglesCol]];
    * apply a length floor upstream if token-level matching is too strict
    * for very short docs. */
  def sharedNgrams(
      docs: DataFrame,
      benchmark: DataFrame,
      w: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text",
      benchTextCol: String = "text",
      broadcastBench: Boolean = true): DataFrame = {
    val docGrams = docs.select(
      col(idCol).as("doc_id"),
      explode(Dedup.hashedShinglesCol(col(textCol), w)).as("g"))
    val benchGrams0 = benchmark
      .select(explode(Dedup.hashedShinglesCol(col(benchTextCol), w)).as("g"))
      .distinct()
    val benchGrams = if (broadcastBench) broadcast(benchGrams0) else benchGrams0
    // hashedShinglesCol emits DISTINCT grams per doc and the bench side is
    // deduplicated, so each shared gram contributes exactly one joined row:
    // count(*) == count of distinct shared n-grams, no second distinct agg
    docGrams.join(benchGrams, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("shared_ngrams"))
  }

  /** [[sharedNgrams]] with a Bloom prefilter — the middle of the scale
    * ladder. `broadcastBench = true` dies when the benchmark gram set
    * outgrows a broadcast hash table (~100M grams); the plain shuffle
    * join then moves EVERY corpus gram. A Bloom filter of the benchmark
    * grams costs ~10 bits per element (20-60× smaller than hashed rows),
    * still broadcasts long after the hash table cannot, and discards
    * non-matching corpus grams map-side — the exact join only receives
    * the survivors, so its shuffle is proportional to candidate hits,
    * not corpus size. False positives only add rows to the exact join;
    * false negatives do not exist, so the result is IDENTICAL to
    * [[sharedNgrams]] (asserted in DecontaminateSpec).
    * Built on `bloom_filter_agg` / `might_contain` (the same public
    * expressions Spark's runtime row-level filtering injects). */
  def sharedNgramsBloomed(
      docs: DataFrame,
      benchmark: DataFrame,
      w: Int = 8,
      expectedGrams: Long = 1L << 20,
      numBits: Long = 1L << 23,
      idCol: String = "doc_id",
      textCol: String = "text",
      benchTextCol: String = "text"): DataFrame = {
    val docGrams = docs.select(
      col(idCol).as("doc_id"),
      explode(Dedup.hashedShinglesCol(col(textCol), w)).as("g"))
    val benchGrams = benchmark
      .select(explode(Dedup.hashedShinglesCol(col(benchTextCol), w)).as("g"))
      .distinct()
    // The bloom is built distributed (one pass over the bench grams) and
    // collected to the driver — numBits/8 bytes, a model-sized artifact
    // like k-means centroids — then folded into the plan as a BINARY
    // literal for `might_contain` (a public catalyst expression, absent
    // from the SQL registry; it requires a constant bloom, which the
    // literal is — the plan ships it to executors like a broadcast var).
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val bf = benchGrams.stat.bloomFilter(col("g"), expectedGrams, numBits)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bf.writeTo(b); b.toByteArray }
    val candidates = docGrams
      .where(ColumnBridge.column(BloomFilterMightContain(
        ColumnBridge.expression(lit(bytes)), ColumnBridge.expression(col("g")))))
    candidates.join(benchGrams, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("shared_ngrams"))
  }

  /** The corpus with contaminated documents removed. */
  def clean(
      docs: DataFrame,
      benchmark: DataFrame,
      w: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text",
      benchTextCol: String = "text"): DataFrame = {
    val hits = sharedNgrams(docs, benchmark, w, idCol, textCol, benchTextCol)
      .select(col("doc_id").as("__contaminated_id"))
    docs.join(hits, docs(idCol) === col("__contaminated_id"), "left_anti")
  }
}
