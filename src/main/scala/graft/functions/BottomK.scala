package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact-k deterministic sampling as a bounded bottom-k aggregate.
  *
  * "Give me EXACTLY k documents per language, stably across reruns and
  * engines" is the pipeline primitive rate-gates (q_sample_stratified /
  * q_sample_pps) cannot deliver — a rate keeps k only in expectation.
  * The deterministic construction is order statistics on a content-free
  * hash: keep the k rows with the smallest (hash, id); any engine that
  * sorts by the same hash picks the identical set.
  *
  * The naive plan is a per-group window sort (rank <= k) — a full sort
  * of every group, the known window-skew hazard at 100 TB. This
  * Aggregator is the scale path: a bounded max-heap of (hash, id,
  * weight) triples per group, O(k) state, O(log k) per row. reduce
  * drops any row whose hash sorts after the current k-th immediately;
  * merge folds one heap into the other keeping the k smallest. Both
  * are associative, commutative, and DETERMINISTIC (the kept SET is a
  * pure function of the inputs — heap internals may differ, the
  * selected triples cannot), so Spark runs it partial+final and the
  * shuffle carries k triples per group, never the corpus.
  *
  * finish() emits [n_kept, sum(id), sum(weight)] — enough for the
  * oracle to pin the exact selected set (the id-sum over a
  * hash-selected subset is a set fingerprint the window-rank SQL
  * reproduces) without hauling k ids into the result row.
  */
object BottomK {

  /** Max-heap on (h, id) of capacity k — the root is the WORST kept
    * row, so admission is one root compare. Serializable: the arrays
    * are the state. */
  final class Heap(val k: Int) extends Serializable {
    val hs = new Array[Long](k)
    val ids = new Array[Long](k)
    val ws = new Array[Long](k)
    var n = 0

    private def worse(i: Int, j: Int): Boolean =
      hs(i) > hs(j) || (hs(i) == hs(j) && ids(i) > ids(j))

    private def swap(i: Int, j: Int): Unit = {
      val h = hs(i); hs(i) = hs(j); hs(j) = h
      val d = ids(i); ids(i) = ids(j); ids(j) = d
      val w = ws(i); ws(i) = ws(j); ws(j) = w
    }

    private def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0 && worse(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    }

    private def siftDown(): Unit = {
      var i = 0
      var go = true
      while (go) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && worse(l, m)) m = l
        if (r < n && worse(r, m)) m = r
        if (m == i) go = false else { swap(i, m); i = m }
      }
    }

    def offer(h: Long, id: Long, w: Long): Unit = {
      if (n < k) {
        hs(n) = h; ids(n) = id; ws(n) = w; n += 1; siftUp(n - 1)
      } else if (h < hs(0) || (h == hs(0) && id < ids(0))) {
        hs(0) = h; ids(0) = id; ws(0) = w; siftDown()
      } // else: sorts after the current k-th — dropped immediately
    }
  }

  val K = 100

  // boxed fields + null skip: a NULL in any of the three inputs means
  // the row cannot be ranked — skip it like every SQL aggregate does,
  // instead of failing the query in the tuple deserializer
  val aggregator: Aggregator[(java.lang.Long, java.lang.Long, java.lang.Long),
      Heap, Array[Long]] =
    new Aggregator[(java.lang.Long, java.lang.Long, java.lang.Long),
        Heap, Array[Long]] {
      override def zero: Heap = new Heap(K)
      override def reduce(b: Heap,
          in: (java.lang.Long, java.lang.Long, java.lang.Long)): Heap = {
        if (in._1 != null && in._2 != null && in._3 != null)
          b.offer(in._1.longValue(), in._2.longValue(), in._3.longValue())
        b
      }
      override def merge(a: Heap, b: Heap): Heap = {
        var i = 0
        while (i < b.n) { a.offer(b.hs(i), b.ids(i), b.ws(i)); i += 1 }
        a
      }
      override def finish(b: Heap): Array[Long] = {
        var idSum = 0L; var wSum = 0L
        var i = 0
        while (i < b.n) { idSum += b.ids(i); wSum += b.ws(i); i += 1 }
        Array(b.n.toLong, idSum, wSum)
      }
      override def bufferEncoder: Encoder[Heap] =
        Encoders.javaSerialization[Heap]
      override def outputEncoder: Encoder[Array[Long]] =
        ExpressionEncoderHelp.longArray
    }

  /** bottomK(hash, id, weight) -> array(n_kept, id_sum, weight_sum) */
  def bottomK(h: Column, id: Column, w: Column): Column =
    udaf(aggregator,
        Encoders.tuple(Encoders.LONG, Encoders.LONG, Encoders.LONG))
      .apply(h, id, w)
}
