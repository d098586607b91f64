package graft.views

import graft.core.{FlumeDb, FlumeView, ViewDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Durable, streaming-maintainable hyperplane-signature table — the
  * EMBEDDING rung of the stored-dedup ladder, completing the set
  * ([[SignatureTableView]] text, [[PhashTableView]] image,
  * [[AudioFingerprintTableView]] audio, [[FrameHashTableView]] video):
  * embedding rows append to the log, each absorbed batch lands its
  * `(vec_id, sig)` rows ([[graft.ops.Similarity.hyperplaneSignature]] —
  * the banded-LSH signature computed ONCE, at ingest, one codegen'd
  * pass) as a batch-atomic parquet delta, and every new embedding batch
  * near-dup checks against the whole stored corpus via
  * [[graft.ops.Dedup.embeddingNearDupIncrementalFromSigs]] — recurring
  * cost ∝ batch, never corpus. The table stores SIGNATURES only
  * (8 bytes per vector); the exact-cosine verify joins vectors by id
  * from the corpus the caller supplies, so the embeddings are never
  * duplicated into the artifact and move the wire only for candidates.
  *
  * Storage is the shared [[DeltaProtocol]] + [[CompactableDeltas]], so
  * it slots under [[graft.streaming.StreamingViewRunner]] with
  * exactly-once recovery like every other durable view. */
final class EmbeddingSigTableView(
    protected val spark: SparkSession,
    protected val dir: String,
    protected val protocolVersion: Int,
    idCol: String = "vec_id",
    vecCol: String = "embedding",
    bands: Int = 4,
    bitsPerBand: Int = 8,
    compactEvery: Int = 0) extends FlumeView with CompactableDeltas {

  override protected def autoCompactEvery: Int = compactEvery

  openProtocol()

  /** Absorb an embedding batch: signature here (each vector hashed
    * exactly once, at ingest), land the `(vec_id, sig)` delta. */
  def absorb(entries: DataFrame, upto: Long): Unit =
    absorbSigs(entries.select(col(idCol),
      graft.ops.Similarity.hyperplaneSignature(col(vecCol), bands * bitsPerBand).as("sig")),
      upto)

  /** Absorb a PRECOMPUTED `(vec_id, sig)` delta. */
  def absorbSigs(sigs: DataFrame, upto: Long): Unit = {
    sigs.select(idCol, "sig")
      .write.mode("overwrite").parquet(batchPath(upto).toString)
    sinceSeq = upto
    writeManifest()
    maybeCompact()
  }

  /** The accumulated `(vec_id, sig)` table. */
  def sigs: DataFrame = {
    val dirs = committedBatchDirs().map(_.toString)
    require(dirs.nonEmpty, "signature table empty — absorb a batch first")
    spark.read.parquet(dirs: _*)
  }

  /** Near-dup check of a new embedding batch against the stored
    * corpus; `storedVectors` supplies the verify join's embeddings
    * (the corpus table the signatures were built from). */
  def dedupBatch(newEmbeddings: DataFrame, storedVectors: DataFrame,
      threshold: Double = 0.95, maxBucket: Int = 1024): DataFrame =
    graft.ops.Dedup.embeddingNearDupIncrementalFromSigs(
      newEmbeddings, sigs, storedVectors, idCol, vecCol,
      bands, bitsPerBand, threshold, maxBucket)

  override def frameOption: Option[DataFrame] =
    if (committedBatchDirs().isEmpty) None else Some(sigs)
}

object EmbeddingSigTableView {
  def apply(dir: String, idCol: String = "vec_id", vecCol: String = "embedding",
      bands: Int = 4, bitsPerBand: Int = 8,
      version: Int = 1, compactEvery: Int = 0): ViewDef = {
    val v = version
    new ViewDef {
      def version: Int = v
      def create(db: FlumeDb, name: String) =
        new EmbeddingSigTableView(db.log.spark, s"$dir/$name", v,
          idCol, vecCol, bands, bitsPerBand, compactEvery)
    }
  }
}
