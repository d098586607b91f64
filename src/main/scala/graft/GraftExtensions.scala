package graft

import graft.functions.{CosineSimilarity, HyperplaneSig, SigAgreement}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extensions entry point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` registers the engine's
  * native expressions in every session of the cluster — no per-session
  * registration code, SQL and DataFrame callers both see them. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("sig_agreement"),
      new ExpressionInfo(classOf[SigAgreement].getName, "sig_agreement"),
      (exprs: Seq[Expression]) => SigAgreement(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
      (exprs: Seq[Expression]) => HyperplaneSig(
        exprs.head,
        if (exprs.length > 1) exprs(1).eval().asInstanceOf[Number].intValue else 16)))
  }
}
