package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val benchText = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"

  test("flags docs sharing an 8-gram with the benchmark, with exact shared counts") {
    val docs = Seq(
      // contains benchmark tokens 1..9 => shares 8-grams [1..8], [2..9] = 2
      (1L, "prefix alpha bravo charlie delta echo foxtrot golf hotel india suffix words here"),
      // contains all 10 benchmark tokens => shares all 3 8-grams
      (2L, s"intro $benchText outro"),
      // shares only 7 consecutive tokens => no 8-gram overlap
      (3L, "alpha bravo charlie delta echo foxtrot golf different tail tokens entirely now"),
      // unrelated
      (4L, "completely unrelated document text with many distinct tokens in it today")
    ).toDF("doc_id", "text")
    val bench = Seq(benchText).toDF("text")

    val got = Decontaminate.sharedNgrams(docs, bench)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 3L))
  }

  test("clean drops exactly the contaminated docs") {
    val docs = Seq(
      (1L, s"$benchText and more"),
      (2L, "nothing in common with the benchmark at all in this one")
    ).toDF("doc_id", "text")
    val bench = Seq(benchText).toDF("text")
    val kept = Decontaminate.clean(docs, bench).select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(2L))
  }

  test("short docs fall back to token-level overlap") {
    val docs = Seq((1L, "alpha zulu"), (2L, "yankee zulu xray")).toDF("doc_id", "text")
    val bench = Seq("alpha").toDF("text")
    val got = Decontaminate.sharedNgrams(docs, bench)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L))
  }

  test("bloom-prefiltered path is identical to the exact path on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // benchmark = 12-token slices of every 9th doc, so some docs hit
    val tk = graft.ops.TextAnalysis.tokens(col("text"))
    val bench = docs.where(col("doc_id") % 9 === 0)
      .select(concat_ws(" ", slice(tk, 3, 12)).as("text"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toMap
    val exact = key(Decontaminate.sharedNgrams(docs, bench))
    val bloomed = key(Decontaminate.sharedNgramsBloomed(docs, bench))
    assert(exact.nonEmpty, "fixture must plant contamination")
    assert(bloomed === exact, "bloom prefilter must not change the result")
    // the plan actually carries the bloom prefilter
    val plan = Decontaminate.sharedNgramsBloomed(docs, bench)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "expected might_contain in the plan")
  }
}
