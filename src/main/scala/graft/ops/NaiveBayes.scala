package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the classic linear
  * bag-of-words scorer (the fastText-without-embeddings shape used by
  * quality/language filters in large-scale corpus curation: train a
  * cheap classifier on labeled docs, score the whole corpus, filter by
  * score). Training is ONE aggregation pass over the labeled split;
  * scoring is one join against the per-(class, term) log-probability
  * table — both fully distributed, both exactly replayable in SQL, so
  * the whole train-then-classify loop is oracle-checkable.
  *
  * Model (add-one smoothing):
  *   logP(t|c)   = ln((tf_{t,c} + 1) / (T_c + V))
  *   score(d, c) = ln(prior_c) + Σ_{t∈d} tf_d(t) · logP(t|c)
  * with V = |train vocabulary|, T_c = total train tokens in class c.
  * An unseen (t, c) combo falls back to ln(1 / (T_c + V)) — the same
  * smoothing mass, applied via coalesce after the left join.
  *
  * 100 TB shape: the model is aggregate-sized (classes × vocab rows) —
  * it broadcasts when small and shuffle-joins on `term` when not; the
  * test-side tf table is the one corpus-sized shuffle, pre-reduced
  * (doc, term) so a term repeated k times in a doc moves one row. The
  * per-doc class scores reduce by (doc, class) with map-side combine;
  * argmax is a per-doc window over exactly `classes` rows. No driver
  * state, no iteration — one linear pass each for train and score.
  *
  * TAKEDOWN POLICY: the model rows are corpus-wide term COUNTS per
  * class — aggregate statistics, never document copies, so a takedown
  * may keep a trained model. The residual risk is a degenerate class
  * trained on very few documents (its counts approach a term list of
  * those documents); holders with erasure obligations at that
  * granularity retrain on [[graft.core.FlumeDb.onRetract]] — training
  * is one linear pass, so the retrain costs one score-free epoch.
  */
object NaiveBayes {

  /** Train on `train`, score `test`; returns one row per test doc:
    * `(doc_id, label, pred, score)` where `score` is the winning
    * class's log-likelihood (rounded) and `pred` the argmax class
    * (score desc, class asc on near-ties — rounded to 6 decimals first
    * so rank order is stable across engines). */
  def trainAndClassify(
      train: DataFrame,
      test: DataFrame,
      labelCol: String = "lang",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val trainTf = train
      .select(col(labelCol).as("cls"), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("cls", "term").agg(count(lit(1)).as("tf"))
    // class totals + doc priors; V = distinct train terms (broadcast scalar)
    val vocab = trainTf.select(countDistinct("term").as("v"))
    val classTotals = trainTf.groupBy("cls").agg(sum("tf").as("t_c"))
    val priors = train.groupBy(col(labelCol).as("cls")).agg(count(lit(1)).as("n_c"))
    val nTrain = train.agg(count(lit(1)).as("n_train"))
    val classes = classTotals.join(priors, "cls")
      .crossJoin(broadcast(nTrain)).crossJoin(broadcast(vocab))
      .select(col("cls"),
        log(col("n_c").cast("double") / col("n_train")).as("logprior"),
        (col("t_c") + col("v")).cast("double").as("denom"))
    val termLogp = trainTf.join(classes.select("cls", "denom"), "cls")
      .select(col("cls"), col("term"),
        log((col("tf") + 1).cast("double") / col("denom")).as("logp"))

    val testTf = test
      .select(col(idCol).as("doc_id"), col(labelCol).as("label"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "label", "term").agg(count(lit(1)).as("tf"))
    // every (test term × class) row needs a log-prob: left join the
    // model, unseen combos take the smoothing floor ln(1/denom)
    val scored = testTf
      .crossJoin(broadcast(classes))
      .join(termLogp, Seq("cls", "term"), "left")
      .withColumn("lp", coalesce(col("logp"), log(lit(1.0) / col("denom"))))
      .groupBy("doc_id", "label", "cls")
      .agg((first("logprior") + sum(col("tf") * col("lp"))).as("score"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(round(col("score"), 6).desc, col("cls"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("label"), col("cls").as("pred"),
        round(col("score"), 4).as("score"))
  }
}
