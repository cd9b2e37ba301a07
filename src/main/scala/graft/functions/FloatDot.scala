package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused float-vector dot product as a native codegen'd Expression.
  *
  * Replaces `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)),
  * 0d, +)` in the similarity operators: same value bit-for-bit
  * (sequential left-to-right double accumulation over float pairs) but
  * one tight loop over the two ArrayData buffers — no per-pair array
  * allocation, no lambda dispatch, stays inside whole-stage codegen.
  * This is the (b)-tier customization of SURVEY §4.2: a scalar
  * Expression, not a new operator.
  */
case class FloatDot(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  // session-exposed SQL surface: coerce/reject non-float arrays at
  // analysis time — getFloat over an unsafe double array would return
  // garbage silently
  // (AbstractDataType is private[sql]; the inferred Seq[ArrayType]
  // conforms covariantly)
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): FloatDot = copy(left = l, right = r)
}

object FloatDot {
  /** register `fdot(array<float>, array<float>) -> double` for expr()/SQL */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fdot", exprs => FloatDot(exprs(0), exprs(1)), "scala_udf")
}
