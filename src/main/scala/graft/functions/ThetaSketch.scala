package graft.functions

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{Intersection, SetOperation, Sketches, Union}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, udf}

/** Theta sketches: distinct counting with FULL SET ALGEBRA.
  *
  * The fifth member of the sketch family, and the one that answers the
  * question HLL structurally cannot: HLL registers only union — "how
  * many distinct users in segment A AND segment B" has no HLL answer
  * short of re-scanning raw rows. A theta sketch retains an actual
  * sample of the hashed key space (the k smallest 64-bit hashes, with
  * theta = the inclusion threshold), so union, INTERSECTION, and
  * A-NOT-B are all closed operations on the sketches themselves. At
  * 100 TB that is the difference between answering segment-overlap
  * questions from KiB-sized per-segment summaries and re-reading the
  * corpus per question.
  *
  * lgK = 12 (nominal 4096 retained hashes, ~1.6% relative standard
  * error in estimation mode; EXACT below 4096 distincts — AggSpec
  * pins the exact regime at sf0.01 and gates the estimation regime).
  * Intersection error is bounded in terms of the INTERSECTION's own
  * cardinality (can exceed 1.6% when the overlap is tiny relative to
  * the inputs) — the published caveat, gated empirically in AggSpec.
  *
  * Determinism: theta hashing (MurmurHash3 with the library's default
  * seed) has no RNG; the retained set is "the k smallest hashes of
  * the input SET", which is order-independent, so unlike KLL these
  * sketches and their estimates are bitwise run-stable and
  * merge-order-stable (PropertySpec pins that).
  *
  * All aggregators run partial+final: reduce/merge are associative and
  * commutative, the shuffle carries compact sketches (~32 KiB max),
  * never keys.
  */
object ThetaSketch {

  val LgK = 12

  private def newUnion(): Union =
    SetOperation.builder().setLogNominalEntries(LgK).buildUnion()

  /** Serializable envelope for a theta Union — DataSketches objects
    * ship as their compact wire form (toByteArray), like [[KllQuantile.KllHolder]]. */
  final class UnionHolder extends Serializable {
    @transient var u: Union = newUnion()

    @throws[IOException]
    private def writeObject(out: ObjectOutputStream): Unit = {
      val b = u.getResult().toByteArray
      out.writeInt(b.length)
      out.write(b)
    }

    @throws[IOException]
    private def readObject(in: ObjectInputStream): Unit = {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      u = newUnion()
      u.union(Memory.wrap(b))
    }
  }

  /** Intersection envelope. A fresh Intersection is the identity (the
    * "universe"); hasResult distinguishes it — intersecting nothing
    * must not annihilate the other operand in merge(). */
  final class IntersectHolder extends Serializable {
    @transient var it: Intersection =
      SetOperation.builder().buildIntersection()

    @throws[IOException]
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.writeBoolean(it.hasResult)
      if (it.hasResult) {
        val b = it.getResult().toByteArray
        out.writeInt(b.length)
        out.write(b)
      }
    }

    @throws[IOException]
    private def readObject(in: ObjectInputStream): Unit = {
      it = SetOperation.builder().buildIntersection()
      if (in.readBoolean()) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        it.intersect(Sketches.heapifyCompactSketch(Memory.wrap(b)))
      }
    }
  }

  /** theta(key): long column -> compact ordered sketch bytes. */
  val aggregator: Aggregator[java.lang.Long, UnionHolder, Array[Byte]] =
    new Aggregator[java.lang.Long, UnionHolder, Array[Byte]] {
      override def zero: UnionHolder = new UnionHolder
      override def reduce(h: UnionHolder, v: java.lang.Long): UnionHolder = {
        if (v != null) h.u.update(v.longValue())
        h
      }
      override def merge(a: UnionHolder, b: UnionHolder): UnionHolder = {
        a.u.union(b.u.getResult())
        a
      }
      override def finish(h: UnionHolder): Array[Byte] =
        h.u.getResult().toByteArray
      override def bufferEncoder: Encoder[UnionHolder] =
        Encoders.javaSerialization[UnionHolder]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** theta_union(sketch): re-aggregate stored sketches by union. */
  val unionAggregator: Aggregator[Array[Byte], UnionHolder, Array[Byte]] =
    new Aggregator[Array[Byte], UnionHolder, Array[Byte]] {
      override def zero: UnionHolder = new UnionHolder
      override def reduce(h: UnionHolder, bytes: Array[Byte]): UnionHolder = {
        if (bytes != null) h.u.union(Memory.wrap(bytes))
        h
      }
      override def merge(a: UnionHolder, b: UnionHolder): UnionHolder = {
        a.u.union(b.u.getResult())
        a
      }
      override def finish(h: UnionHolder): Array[Byte] =
        h.u.getResult().toByteArray
      override def bufferEncoder: Encoder[UnionHolder] =
        Encoders.javaSerialization[UnionHolder]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** theta_intersect(sketch): re-aggregate stored sketches by set
    * INTERSECTION — the operation that motivates theta over HLL.
    * Null on empty input (an intersection of zero sets has no
    * finite representation), matching aggregate null semantics. */
  val intersectAggregator: Aggregator[Array[Byte], IntersectHolder, Array[Byte]] =
    new Aggregator[Array[Byte], IntersectHolder, Array[Byte]] {
      override def zero: IntersectHolder = new IntersectHolder
      override def reduce(h: IntersectHolder, bytes: Array[Byte]): IntersectHolder = {
        if (bytes != null)
          h.it.intersect(Sketches.heapifyCompactSketch(Memory.wrap(bytes)))
        h
      }
      override def merge(a: IntersectHolder, b: IntersectHolder): IntersectHolder = {
        if (b.it.hasResult) a.it.intersect(b.it.getResult())
        a
      }
      override def finish(h: IntersectHolder): Array[Byte] =
        if (h.it.hasResult) h.it.getResult().toByteArray else null
      override def bufferEncoder: Encoder[IntersectHolder] =
        Encoders.javaSerialization[IntersectHolder]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  def theta(c: Column): Column = udaf(aggregator).apply(c)

  def thetaUnion(c: Column): Column = udaf(unionAggregator).apply(c)

  def thetaIntersect(c: Column): Column = udaf(intersectAggregator).apply(c)

  def estimate(bytes: Array[Byte]): Double =
    Sketches.heapifyCompactSketch(Memory.wrap(bytes)).getEstimate

  private val estimateUdf = udf((bytes: Array[Byte]) =>
    if (bytes == null) null
    else try java.lang.Double.valueOf(estimate(bytes))
    catch { case scala.util.control.NonFatal(_) => null })

  /** Estimate from sketch bytes; null-safe (null or MALFORMED sketch
    * -> NULL — the scalar-surface shape rule; aggregates still reject
    * garbage loudly). */
  def thetaEstimate(sketch: Column): Column = estimateUdf(sketch)

  private val aNotBUdf = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) null
    else try SetOperation.builder().buildANotB()
      .aNotB(Sketches.heapifyCompactSketch(Memory.wrap(a)),
        Sketches.heapifyCompactSketch(Memory.wrap(b)))
      .toByteArray
    catch { case scala.util.control.NonFatal(_) => null })

  /** theta_a_not_b(a, b): scalar set difference on sketch bytes. */
  def thetaAnotB(a: Column, b: Column): Column = aNotBUdf(a, b)
}
