package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word w-shingles of a text column in ONE pass: lowercase
  * char-scan tokenization ([a-z0-9]+ runs), rolling 64-bit token hashes,
  * mixed w-token shingle hashes, sorted-distinct output — no token or
  * shingle strings are ever materialized.
  *
  * This is the dedup family's hottest text kernel (every MinHash/LSH,
  * incremental-dedup, n-gram and decontamination pass starts here). As a
  * Scala UDF it paid the ScalaUDF conversion wall per row: UTF8String →
  * String → closure → Seq[Long] → per-element boxing back to Catalyst.
  * As a native expression the kernel runs inside whole-stage codegen via
  * one static call, writing a primitive `long[]` straight into an
  * [[GenericArrayData]] — same pattern as [[HyperplaneSig]], which
  * justified the upgrade with a measured ≥5 µs/row UDF overhead.
  *
  * Output is bit-identical to the UDF it replaces (the OpsSpec twin
  * test pins this): same tokenizer, same mixing constants, same
  * short-doc rule (docs with fewer than `w` tokens emit each token hash
  * as its own "shingle"), sorted distinct hashes.
  */
case class HashedShingles(child: Expression, w: Int = 3) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_shingles requires string input, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    HashedShingles.compute(a.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashedShingles.compute($a, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedShingles {

  /** Column wrapper: native codegen'd hashed w-shingles. The coalesce
    * pins null-text behavior to the UDF twin's (empty array, not null) —
    * UnaryExpression null-propagates, the UDF body handled null itself. */
  def hashed_shingles(text: Column, w: Int = 3): Column =
    org.apache.spark.sql.functions.coalesce(
      ColumnBridge.column(HashedShingles(ColumnBridge.expression(text), w)),
      org.apache.spark.sql.functions.typedLit(Array.empty[Long]))

  /** The kernel, shared verbatim by interpreted eval and the generated
    * code (a static call keeps whole-stage codegen intact without
    * duplicating a 40-line tokenizer as a Java string). Works on the
    * UTF-16 view so `Character.toLowerCase` matches the String-based UDF
    * char-for-char. */
  def compute(text: UTF8String, w: Int): ArrayData = {
    val t = text.toString
    var tokens = new Array[Long](16)
    var m = 0
    var h = 0L; var inTok = false
    var i = 0; val n = t.length
    while (i <= n) {
      val c = if (i < n) Character.toLowerCase(t.charAt(i)) else ' '
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) { h = h * 31 + c; inTok = true }
      else if (inTok) {
        if (m == tokens.length) tokens = java.util.Arrays.copyOf(tokens, m * 2)
        tokens(m) = (h ^ (h >>> 17)) * 0x9e3779b97f4a7c15L
        m += 1
        h = 0L; inTok = false
      }
      i += 1
    }
    val out =
      if (m == 0) new Array[Long](0)
      else if (m < w) java.util.Arrays.copyOf(tokens, m) // short doc: token = shingle
      else {
        val sh = new Array[Long](m - w + 1)
        var j = 0
        while (j + w <= m) {
          var s = tokens(j)
          var k = 1
          while (k < w) { s = s * 0xc2b2ae3d27d4eb4fL + tokens(j + k); k += 1 }
          sh(j) = (s ^ (s >>> 29)) * 0xff51afd7ed558ccdL
          j += 1
        }
        sh
      }
    // sorted-distinct in place: set semantics are order-free, and sorted
    // arrays let the exact verify be a merge-count instead of set ops
    java.util.Arrays.sort(out)
    var r = 0; var q = 0
    while (q < out.length) {
      if (r == 0 || out(q) != out(r - 1)) { out(r) = out(q); r += 1 }
      q += 1
    }
    new GenericArrayData(if (r == out.length) out else java.util.Arrays.copyOf(out, r))
  }
}
