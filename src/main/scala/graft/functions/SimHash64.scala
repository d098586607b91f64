package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text column in ONE pass: sign of the per-bit
  * weighted sum of token hashes, where tokens are the maximal [a-z0-9]+
  * runs of the ROOT-lowercased text — exactly `TextAnalysis.tokens`
  * (`split(lower(text), "[^a-z0-9]+")` minus empties), so the signature
  * is bit-identical to the UDF twin applied to that column
  * (`Dedup.simhash64Udf`, pinned by OpsSpec) while skipping the
  * `array<string>` token materialization AND the ScalaUDF wall.
  * Token hashing stays `MurmurHash3.stringHash` spread to 64 bits, so
  * stored signatures keep their values across the upgrade.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires string input, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    SimHash64.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash64.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  /** Column wrapper: native codegen'd 64-bit SimHash over raw text. */
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  /** Shared kernel for interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    // whole-string ROOT lowercase first (matching Spark's `lower()`),
    // then scan for token runs — per-char lowering would diverge on
    // one-to-many case mappings
    val t = text.toString.toLowerCase(java.util.Locale.ROOT)
    val acc = new Array[Int](64)
    var i = 0; val n = t.length; var start = -1
    while (i <= n) {
      val c = if (i < n) t.charAt(i) else ' '
      val inTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (inTok) { if (start < 0) start = i }
      else if (start >= 0) {
        var h = scala.util.hashing.MurmurHash3.stringHash(t.substring(start, i)).toLong & 0xffffffffL
        h = h * 0x9e3779b97f4a7c15L // spread to 64 bits
        var b = 0
        while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
        start = -1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}
