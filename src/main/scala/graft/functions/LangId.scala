package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Stopword-hit language ID as a native expression: one char-scan pass
  * per document with a token → languages hash lookup and an argmax on
  * (hits, lang). The classifier tables and kernel live in
  * `TextAnalysis.langIdKernel` (shared with the test-visible UDF twin);
  * this wrapper keeps the pass inside whole-stage codegen so the text
  * quality/feature projections it usually rides with stay in one span. */
case class LangId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lang_id requires string input, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    LangId.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LangId.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangId {

  /** Column wrapper: native codegen'd language ID. */
  def lang_id(text: Column): Column =
    ColumnBridge.column(LangId(ColumnBridge.expression(text)))

  def compute(text: UTF8String): UTF8String =
    UTF8String.fromString(graft.ops.TextAnalysis.langIdKernel(text.toString))
}
