package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All random-hyperplane LSH table signatures of a float embedding in
  * one fused pass (q_sim_ann_lsh).
  *
  * Replaces the nested higher-order-function form (`transform` over
  * tables × `aggregate` over bits × `zip_with` over dims), whose
  * per-element lambda dispatch and per-plane array allocation dominated
  * the query's cost (VERDICT r3 plan audit) and made adding tables —
  * the recall lever — linearly expensive. Here the hyperplane matrix
  * rides along as a codegen reference object and the whole signature
  * set is two tight loops: same (b)-tier customization as
  * [[FloatDot]], stays inside whole-stage codegen.
  *
  * Output: array<int> of length `planes.length / bits` — element t is
  * table t's `bits`-bit sign signature.
  */
case class LshSignatures(child: Expression, planes: Array[Array[Double]],
    bits: Int) extends UnaryExpression with ImplicitCastInputTypes {

  // the session-exposed SQL surface must reject (or coerce) non-float
  // arrays at ANALYSIS time: reading an unsafe double array through
  // getFloat would return plausible-but-wrong signatures with no error
  override def inputTypes = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val tables = planes.length / bits

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](tables)
    var p = 0
    var t = 0
    while (t < tables) {
      var sig = 0
      var j = 0
      while (j < bits) {
        val hp = planes(p)
        val n = math.min(v.numElements(), hp.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += v.getFloat(i).toDouble * hp(i); i += 1 }
        if (acc >= 0) sig |= 1 << j
        j += 1; p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
      val out = ctx.freshName("out")
      val sig = ctx.freshName("sig")
      val acc = ctx.freshName("acc")
      val hp = ctx.freshName("hp")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      s"""
         |int[] $out = new int[$tables];
         |int $p = 0;
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $sig = 0;
         |  for (int $j = 0; $j < $bits; $j++, $p++) {
         |    double[] $hp = $planesRef[$p];
         |    int $n = java.lang.Math.min($v.numElements(), $hp.length);
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += ((double) $v.getFloat($i)) * $hp[$i];
         |    }
         |    if ($acc >= 0) $sig |= 1 << $j;
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): LshSignatures =
    copy(child = c)
}

object LshSignatures {
  /** register `lsh_sigs(array<float>) -> array<int>` with the plane set
    * baked in, for expr()/SQL use */
  def register(spark: SparkSession, name: String,
      planes: Array[Array[Double]], bits: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => LshSignatures(exprs(0), planes, bits), "scala_udf")
}
