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
}
