package graft.functions

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, udf}

/** KLL quantile sketch as a typed Aggregator — the fourth member of
  * the sketch family (HLL distincts, CMS frequencies, and now KLL
  * ranks/quantiles). What it adds over `percentile_approx`: the
  * sketch is a STORABLE, MERGEABLE aggregate. percentile_approx's
  * state is consumed inside one query; these byte-array sketches can
  * be computed once per (day, slice), persisted, and every coarser
  * quantile question afterwards is answered by merging the fixed-size
  * sketches — no second pass over raw rows. That is the pattern that
  * pays at 100 TB: per-partition sketches are a few KiB each, and the
  * merge is associative + commutative, so Spark runs it as a
  * partial+final two-phase aggregate whose shuffle carries sketches,
  * never values.
  *
  * k = 200 gives ~1.65% normalized rank error (single-sided, 99%
  * confidence — DataSketches' published bound for the default k);
  * AggSpec gates both the direct and the merged estimate against the
  * exact quantile by RANK distance, which is the error KLL actually
  * bounds (value distance is unbounded for heavy-tailed data).
  *
  * KLL compaction is randomized BY DESIGN — the algorithm's guarantee
  * is probabilistic, and DataSketches draws from a JVM-wide static
  * Random shared by all tasks, so estimates can differ across runs
  * (within the rank-error bound). This is the one declared query
  * family whose values are not bitwise run-stable; the contract it
  * keeps is the error bound, enforced by AggSpec on every run.
  *
  * The buffer rides Java serialization via [[KllHolder]] — the heap
  * sketch object lives across `reduce` calls (no per-row codec) and
  * converts to its compact byte form only at partial-aggregate
  * boundaries, exactly where Spark serializes any aggregation buffer.
  */
object KllQuantile {

  val K = 200

  /** Serializable envelope: DataSketches objects are not
    * java.io.Serializable by design (their wire form is
    * `toByteArray`), so the envelope writes that compact form. */
  final class KllHolder extends Serializable {
    @transient var sk: KllDoublesSketch = KllDoublesSketch.newHeapInstance(K)

    @throws[IOException]
    private def writeObject(out: ObjectOutputStream): Unit = {
      val b = sk.toByteArray
      out.writeInt(b.length)
      out.write(b)
    }

    @throws[IOException]
    private def readObject(in: ObjectInputStream): Unit = {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      sk = KllDoublesSketch.heapify(Memory.wrap(b))
    }
  }

  /** kll(value): double column -> compact sketch bytes. */
  val aggregator: Aggregator[java.lang.Double, KllHolder, Array[Byte]] =
    new Aggregator[java.lang.Double, KllHolder, Array[Byte]] {
      override def zero: KllHolder = new KllHolder
      override def reduce(h: KllHolder, v: java.lang.Double): KllHolder = {
        // NULLs are a no-op, matching aggregate-function semantics
        if (v != null) h.sk.update(v.doubleValue())
        h
      }
      override def merge(a: KllHolder, b: KllHolder): KllHolder = {
        a.sk.merge(b.sk)
        a
      }
      override def finish(h: KllHolder): Array[Byte] = h.sk.toByteArray
      override def bufferEncoder: Encoder[KllHolder] =
        Encoders.javaSerialization[KllHolder]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** kll_merge(sketch): re-aggregation — merge stored sketches into a
    * coarser one without touching raw rows. */
  val mergeAggregator: Aggregator[Array[Byte], KllHolder, Array[Byte]] =
    new Aggregator[Array[Byte], KllHolder, Array[Byte]] {
      override def zero: KllHolder = new KllHolder
      override def reduce(h: KllHolder, bytes: Array[Byte]): KllHolder = {
        if (bytes != null)
          h.sk.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
        h
      }
      override def merge(a: KllHolder, b: KllHolder): KllHolder = {
        a.sk.merge(b.sk)
        a
      }
      override def finish(h: KllHolder): Array[Byte] = h.sk.toByteArray
      override def bufferEncoder: Encoder[KllHolder] =
        Encoders.javaSerialization[KllHolder]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  def kll(c: Column): Column = udaf(aggregator).apply(c)

  def kllMerge(c: Column): Column = udaf(mergeAggregator).apply(c)

  /** Quantile estimate from sketch bytes, INCLUSIVE search criteria
    * (the DataSketches default: rank of v counts rows <= v).
    * Null-safe like [[ThetaSketch]]'s estimate: a NULL sketch (outer
    * join) or an EMPTY one (group whose values were all NULL —
    * getQuantile throws SketchesArgumentException on it) yields NULL,
    * matching what AVG/percentile_approx return for such a group,
    * instead of failing the query — and so do bytes that are not a
    * KLL sketch at all (the cms_estimate shape rule: a malformed
    * binary column degrades on the scalar surface, never
    * exception-storms every task; the AGGREGATE merge surfaces still
    * reject garbage loudly, because silently skipping inputs would
    * under-count). */
  def estimate(bytes: Array[Byte], q: Double): java.lang.Double =
    if (bytes == null) null
    else try {
      val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
      if (sk.isEmpty) null
      else java.lang.Double.valueOf(
        sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE))
    } catch { case scala.util.control.NonFatal(_) => null }

  private val estimateUdf =
    udf((bytes: Array[Byte], q: Double) => estimate(bytes, q))

  def kllEstimate(sketch: Column, q: Column): Column =
    estimateUdf(sketch, q)

  /** Exact n retained by the sketch (total stream weight) — lets
    * callers sanity-check coverage without a second aggregate.
    * NULL sketch -> NULL (an empty sketch legitimately reports 0). */
  private val countUdf = udf((bytes: Array[Byte]) =>
    if (bytes == null) null
    else try java.lang.Long.valueOf(
      KllDoublesSketch.heapify(Memory.wrap(bytes)).getN)
    catch { case scala.util.control.NonFatal(_) => null })

  def kllCount(sketch: Column): Column = countUdf(sketch)
}
