package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Unit laws of the shared gap-split fold — the pure core both
  * sessionization state APIs (GroupState timeout and
  * transformWithState timers) run per batch. */
class SessionFoldSpec extends AnyFunSuite {

  test("gap-split fold keeps open-session bounds monotone under disorder") {
    import SessionTimeout.{fold, gapUs}
    val m = 60L * 1000 * 1000 // one minute in micros
    // a cross-batch out-of-order event inside the open span must not
    // shrink `last`: with state last = 10:00, a batch of (9:35, 10:20)
    // is ONE continuing session (sorted truth: gaps 25 and 20 min); a
    // fold that reset last = 9:35 would spuriously split at 10:20
    val open = Some((540L * m, 600L * m, 3L)) // 9:00..10:00, 3 events
    val (closed, cur) = fold(7L, open, Array(575L * m, 620L * m))
    assert(closed.isEmpty, s"no session may close: $closed")
    assert(cur == ((540L * m, 620L * m, 5L)),
      s"last advances to 10:20, start stays 9:00: $cur")
    // an in-span event alone must leave `last` at the observed max —
    // the timeout/timer expiry derives from it, and shrinking it lets
    // an already-armed stale timer seal a live session
    val (c2, cur2) = fold(7L, open, Array(575L * m))
    assert(c2.isEmpty && cur2 == ((540L * m, 600L * m, 4L)),
      s"in-span event must not move last backward: $cur2")
    // a genuinely-past-gap event still splits
    val (c3, cur3) = fold(7L, open, Array((600L + gapUs / m + 1L) * m))
    assert(c3 == Seq((7L, 540L * m, 3L)) && cur3._3 == 1L,
      s"past-gap event must close the open session: $c3 / $cur3")
  }

  test("event earlier than start - gap forms its own closed session") {
    import SessionTimeout.fold
    val m = 60L * 1000 * 1000
    // open 9:00..10:00; an admissible straggler at 8:00 is a FULL GAP
    // before the session start — `t - last <= gap` is vacuously true
    // for any early t, so a naive guard would absorb it and corrupt
    // start_us to 8:00; the truth is a separate, already-sealed session
    val open = Some((540L * m, 600L * m, 3L))
    val (closed, cur) = fold(7L, open, Array(480L * m))
    assert(closed == Seq((7L, 480L * m, 1L)),
      s"the 8:00 straggler seals alone: $closed")
    assert(cur == ((540L * m, 600L * m, 3L)),
      s"the open session must be untouched: $cur")
    // two early stragglers within one gap of EACH OTHER are ONE closed
    // session, not two singletons
    val (c2, cur2) = fold(7L, open, Array(480L * m, 490L * m))
    assert(c2 == Seq((7L, 480L * m, 2L)) && cur2 == open.get,
      s"early events gap-merge among themselves: $c2 / $cur2")
    // early events CHAINING up to the open session merge into it:
    // 8:35 -> 8:50 (15 min) -> 9:00 (10 min) is one session from 8:35
    val (c3, cur3) = fold(7L, open, Array(515L * m, 530L * m))
    assert(c3.isEmpty && cur3 == ((515L * m, 600L * m, 5L)),
      s"a chain bridging into the open span extends start: $cur3")
  }

  test("the open interval can bridge two otherwise-split runs") {
    import SessionTimeout.fold
    val m = 60L * 1000 * 1000
    // runs end 8:50 / start 9:40 (50 min apart — split on their own),
    // but the open 9:00..9:20 is within a gap of BOTH: all three fuse
    val open = Some((540L * m, 560L * m, 2L))
    val (closed, cur) = fold(7L, open, Array(530L * m, 580L * m))
    assert(closed.isEmpty && cur == ((530L * m, 580L * m, 4L)),
      s"open interval bridges the runs: $closed / $cur")
    // and a batch run strictly inside the open span just counts in
    val (c2, cur2) = fold(7L, open, Array(545L * m, 550L * m))
    assert(c2.isEmpty && cur2 == ((540L * m, 560L * m, 4L)),
      s"in-span run merges without moving bounds: $cur2")
  }

  test("fold equals the sorted-truth gap split for any in-order batch split") {
    // property law over random event sets (raw Gen + fixed seeds, the
    // PropertySpec convention): (1) one batch from empty state must
    // equal the plain gap split of the sorted events; (2) the same
    // events as two IN-ORDER batches with state carried between must
    // produce the same closed sessions + open session — the
    // cross-batch law both state stores rely on
    import SessionTimeout.{fold, gapUs}
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val step = gapUs / 3 // events land 0..20 gaps apart in thirds
    val evGen = Gen.listOfN(24, Gen.chooseNum(0L, 60L)).map(
      _.map(_ * step).distinct.sorted.toArray).suchThat(_.nonEmpty)
    def gapSplit(ts: Array[Long]): Seq[(Long, Long, Long)] =
      ts.foldLeft(Vector.empty[(Long, Long, Long)]) { (acc, t) =>
        acc.lastOption match {
          case Some((s, l, n)) if t - l <= gapUs =>
            acc.init :+ ((s, t, n + 1))
          case _ => acc :+ ((t, t, 1L))
        }
      }
    val cases = (0 until 12).flatMap(i =>
      evGen.apply(Gen.Parameters.default, Seed(1789L + i)))
    assert(cases.size >= 10, "generator must yield cases")
    cases.foreach { ts =>
      val truth = gapSplit(ts)
      // law 1: single batch from empty state
      val (closed, open) = fold(9L, None, ts)
      assert(closed.map(c => (c._2, c._3)) ==
        truth.init.map(s => (s._1, s._3)) && open == truth.last,
        s"single-batch fold diverges from gap split on ${ts.toSeq}")
      // law 2: any in-order two-batch split agrees with one batch
      (1 until ts.length).foreach { cut =>
        val (b1, b2) = ts.splitAt(cut)
        val (c1, o1) = fold(9L, None, b1)
        val (c2, o2) = fold(9L, Some(o1), b2)
        assert((c1 ++ c2).map(c => (c._2, c._3)) ==
          truth.init.map(s => (s._1, s._3)) && o2 == truth.last,
          s"two-batch fold diverges at cut $cut on ${ts.toSeq}")
      }
    }
  }
}
