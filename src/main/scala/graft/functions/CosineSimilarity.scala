package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two `array<float>` columns.
  *
  * The composable form (`aggregate(zip_with(...))`) evaluates ~boxed
  * lambda calls per vector element; this expression runs a primitive
  * float loop and participates in whole-stage codegen, so the kNN / ANN /
  * near-dup kernels stay in one generated loop over the parquet batch.
  * Accumulation is double, left-to-right — bit-identical to the
  * higher-order-function formulation it replaces (and to the DuckDB
  * oracle's sequential accumulation).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toFloatArray()
    val ys = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(xs.length, ys.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += xs(i).toDouble * ys(i).toDouble
      na += xs(i).toDouble * xs(i).toDouble
      nb += ys(i).toDouble * ys(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      s"""
         |float[] $xs = $a.toFloatArray();
         |float[] $ys = $b.toFloatArray();
         |int $n = Math.min($xs.length, $ys.length);
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $xs[$i] * (double) $ys[$i];
         |  $na  += (double) $xs[$i] * (double) $xs[$i];
         |  $nb  += (double) $ys[$i] * (double) $ys[$i];
         |}
         |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Column wrapper: native codegen'd cosine similarity. */
  def cosine_native(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a.cast("array<float>")),
      ColumnBridge.expression(b.cast("array<float>"))))

  /** SQL registration: `SELECT cosine_similarity(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
}
