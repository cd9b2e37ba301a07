package graft.functions

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Frequent-items (heavy hitters) sketch — the sixth sketch family
  * member, and the one that ENUMERATES: HLL/theta answer "how many
  * distinct", KLL answers "what quantile", count-min answers "how
  * often does THIS item occur" (a point query needing candidates from
  * elsewhere); the Misra-Gries-style ItemsSketch answers "WHICH items
  * are frequent" from the sketch alone — the top-talkers / hot-keys /
  * trending-tokens question, with no candidate list to carry.
  *
  * maxMapSize = 256 ⇒ a priori error ≤ 3.5/256 ≈ 1.4% of the stream
  * weight; below ~0.75·256 distinct items the sketch never purges and
  * every estimate is EXACT (the fixture vocabulary is 31 tokens, so
  * the contract query runs in the exact regime — AggSpec pins that,
  * and gates the estimation regime on a synthetic forced-purge stream
  * where lb ≤ truth ≤ ub and the NO_FALSE_NEGATIVES list covers every
  * truly-heavy item). Merge is associative/commutative, so the
  * aggregate runs partial+final and the shuffle carries ≤ ~few-KiB
  * sketches, never token streams.
  *
  * Caveat stated up front: in the estimation regime the RETAINED set
  * (not the guarantees) depends on merge order — like KLL, the
  * contract is the error bound, not bitwise stability; unlike KLL
  * there is no RNG, so a FIXED partitioning replays identically.
  */
object FreqItems {

  val MaxMapSize = 256

  private val serde = new ArrayOfStringsSerDe

  /** Serializable envelope: ships as the sketch's compact wire form. */
  final class FiHolder extends Serializable {
    @transient var sk: ItemsSketch[String] =
      new ItemsSketch[String](MaxMapSize)

    @throws[IOException]
    private def writeObject(out: ObjectOutputStream): Unit = {
      val b = sk.toByteArray(serde)
      out.writeInt(b.length)
      out.write(b)
    }

    @throws[IOException]
    private def readObject(in: ObjectInputStream): Unit = {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      sk = ItemsSketch.getInstance(Memory.wrap(b), serde)
    }
  }

  /** Build a sketch over string items; emits the compact wire form. */
  val sketchAgg: Aggregator[String, FiHolder, Array[Byte]] =
    new Aggregator[String, FiHolder, Array[Byte]] {
      override def zero: FiHolder = new FiHolder
      override def reduce(h: FiHolder, v: String): FiHolder = {
        if (v != null) h.sk.update(v)
        h
      }
      override def merge(a: FiHolder, b: FiHolder): FiHolder = {
        a.sk.merge(b.sk)
        a
      }
      override def finish(h: FiHolder): Array[Byte] =
        h.sk.toByteArray(serde)
      override def bufferEncoder: Encoder[FiHolder] =
        Encoders.javaSerialization[FiHolder]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  def sketchColumn(items: Column): Column = udaf(sketchAgg).apply(items)

  def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  /** Heavy hitters from the wire form: (item, estimate, lb, ub),
    * sorted (estimate desc, item asc) for deterministic consumption.
    * `noFalsePositives = true` returns only items PROVEN frequent
    * (lb > threshold); false returns every possibly-frequent item
    * (no false negatives). */
  def heavyHitters(bytes: Array[Byte], noFalsePositives: Boolean)
      : Seq[(String, Long, Long, Long)] = {
    // NULL sketch (outer join / never-aggregated group) -> NULL result,
    // the package's sketch-surface rule — not an NPE-ed task; and so
    // do MALFORMED bytes (the cms_estimate shape rule on every scalar
    // sketch surface — aggregates still reject garbage loudly)
    if (bytes == null) return null
    try {
      val sk = deserialize(bytes)
      val et = if (noFalsePositives) ErrorType.NO_FALSE_POSITIVES
               else ErrorType.NO_FALSE_NEGATIVES
      sk.getFrequentItems(et).toSeq
        .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
        .sortBy { case (item, est, _, _) => (-est, item) }
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Column form: array of (item, est, lb, ub) structs, proven-frequent
    * items only (NO_FALSE_POSITIVES), ordered (est desc, item asc).
    * The udf is cached in a val like the sibling sketch surfaces
    * (CountMin/KllQuantile/ThetaSketch) — constructing it per call
    * re-derives the tuple-seq encoder every time. */
  private val hittersUdf =
    org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
      heavyHitters(b, noFalsePositives = true))

  def hitters(sketch: Column): Column = hittersUdf.apply(sketch)
}
