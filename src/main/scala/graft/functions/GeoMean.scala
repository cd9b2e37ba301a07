package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Geometric mean as a typed Aggregator (SURVEY §2B q_agg_udaf_geomean).
  *
  * Buffer = (sum of logs, count): associative/commutative, so Spark runs
  * it as a partial+final two-phase aggregate — map-side combine, one
  * shuffle of 16-byte buffers, scale-safe at any cardinality.
  */
object GeoMean {

  final case class Buf(var sumLog: Double, var n: Long)

  // boxed input + null skip: every SQL aggregate (AVG, SUM) ignores
  // NULL rows — a primitive-Double encoder would instead fail the
  // whole query in the typed deserializer on the first NULL.
  // Boxed OUTPUT for the same reason: an empty/all-NULL group is NULL
  // (exactly what the equivalent EXP(AVG(LN(x))) yields — AVG over
  // nothing is NULL), never NaN, which would silently diverge from
  // SQL aggregate semantics in downstream comparisons and sorts.
  // Non-positive inputs follow IEEE math.log by design (log(0) = -inf
  // -> group result 0; log(<0) = NaN poisons the group), mirroring
  // the LN-based SQL form; the geometric mean is only defined for
  // positive values and the caller owns that domain.
  val aggregator: Aggregator[java.lang.Double, Buf, java.lang.Double] =
    new Aggregator[java.lang.Double, Buf, java.lang.Double] {
      override def zero: Buf = Buf(0.0, 0L)
      override def reduce(b: Buf, x: java.lang.Double): Buf = {
        if (x != null) { b.sumLog += math.log(x.doubleValue()); b.n += 1 }
        b
      }
      override def merge(a: Buf, b: Buf): Buf = {
        a.sumLog += b.sumLog; a.n += b.n; a
      }
      override def finish(b: Buf): java.lang.Double =
        if (b.n == 0) null
        else java.lang.Double.valueOf(math.exp(b.sumLog / b.n))
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[java.lang.Double] =
        Encoders.DOUBLE
    }

  /** column form: geomean(col) */
  def geomean(c: Column): Column = udaf(aggregator, Encoders.DOUBLE).apply(c)
}
