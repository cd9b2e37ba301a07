package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native AsOfJoin operator must match the declarative join+agg
  * formulation (q_join_asof's oracle-checked plan) and plan with
  * co-partitioning exchanges + local sorts, no shuffle of pairs. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def viaOperator(sf: String) = {
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    graft.plans.AsOf.join(p, c, "user_id", "ts", "c_user", "c_ts")
      .select(col("event_id"), col("asof_ts"))
      .orderBy(col("event_id"))
  }

  test("native as-of join equals the declarative formulation (sf0.01)") {
    // the declarative arm is built HERE, not via SparkEntry.queries
    // (q_join_asof itself runs the operator since r2, so referencing it
    // would compare the operator against itself — ADVICE r2)
    val ev = Tables.events(spark, TestSpark.sf001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val declarative = p
      .join(c, col("user_id") === col("c_user") && col("c_ts") < col("ts"),
        "left")
      .groupBy(col("event_id"))
      .agg(max(col("c_ts")).as("asof_ts"))
      .orderBy(col("event_id")).collect().map(_.toString).toSeq
    val native = viaOperator(TestSpark.sf001)
      .collect().map(_.toString).toSeq
    assert(native == declarative)
  }

  test("plan: AsOfJoinExec with hash exchanges and per-partition sorts") {
    val p = viaOperator(TestSpark.sf0001).queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p) // exec node prints without the Exec suffix
    assert(p.contains("hashpartitioning"), p)
    assert(p.contains("Sort "), p)
    assert(p.contains("PushedFilters: [IsNotNull(event_type)"), p)
  }

  test("string columns survive downstream buffering (no row aliasing)") {
    import spark.implicits._
    val l = (1 to 200).map(i =>
        (i.toLong, (i % 7).toLong, s"payload_$i",
          new java.sql.Timestamp(1700000000000L + i * 60000L)))
      .toDF("event_id", "user_id", "tag", "ts")
    val r = (1 to 50).map(i =>
        ((i % 7).toLong, new java.sql.Timestamp(1700000000000L + i * 90000L)))
      .toDF("c_user", "c_ts")
    val out = graft.plans.AsOf.join(l, r, "user_id", "ts", "c_user", "c_ts")
      .orderBy(col("event_id"))  // forces buffering above the operator
      .collect()
    assert(out.length == 200)
    out.zipWithIndex.foreach { case (row, i) =>
      assert(row.getString(2) == s"payload_${i + 1}",
        s"row $i: tag=${row.getString(2)} — aliased/corrupted buffer") }
  }

  test("PushFilterThroughAsOf restores parquet pushdown above the join") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val filtered = graft.plans.AsOf
      .join(p, c, "user_id", "ts", "c_user", "c_ts")
      .filter(col("event_id") < 100) // left-side-only predicate ON TOP
    val plan = filtered.queryExecution.executedPlan.toString
    // the predicate must reach the left scan below the custom operator
    assert(plan.contains("LessThan(event_id,100)"),
      s"filter not pushed through AsOfJoin:\n$plan")
    // and equal the filter-below-join formulation
    val below = graft.plans.AsOf
      .join(p.filter(col("event_id") < 100), c,
        "user_id", "ts", "c_user", "c_ts")
      .orderBy(col("event_id")).collect().map(_.toString).toSeq
    assert(filtered.orderBy(col("event_id")).collect()
      .map(_.toString).toSeq == below)
  }

  test("PruneColumnsThroughAsOf narrows both scans to referenced columns") {
    // full-width events on BOTH sides — no manual select before the join
    val ev = Tables.events(spark, TestSpark.sf0001)
    val r = ev.withColumnRenamed("user_id", "c_user")
      .withColumnRenamed("ts", "c_ts")
    val narrow = graft.plans.AsOf.join(ev, r, "user_id", "ts", "c_user", "c_ts")
      .select(col("event_id"), col("asof_ts")) // left prune trigger
    val plan = narrow.queryExecution.executedPlan.toString
    // neither scan may read the wide columns: right is pruned to its join
    // keys unconditionally, left to {event_id, user_id, ts} by the Project
    assert(!plan.contains("props"), s"props survived pruning:\n$plan")
    assert(!plan.contains("value"), s"value survived pruning:\n$plan")
    // and the pruned plan returns the same rows as pre-projected inputs
    val pre = graft.plans.AsOf.join(
        ev.select(col("event_id"), col("user_id"), col("ts")),
        ev.select(col("user_id").as("c_user"), col("ts").as("c_ts")),
        "user_id", "ts", "c_user", "c_ts")
      .select(col("event_id"), col("asof_ts"))
      .orderBy(col("event_id")).collect().map(_.toString).toSeq
    assert(narrow.orderBy(col("event_id")).collect()
      .map(_.toString).toSeq == pre)
  }

  test("left prune also fires through a residual filter (Project over Filter)") {
    // the shape PushFilterThroughAsOf itself produces: a conjunct
    // referencing asof_ts stays ABOVE the join, so the Project never
    // sits directly on the custom node — pruning must see through the
    // residual Filter or the wide left scan silently returns
    val ev = Tables.events(spark, TestSpark.sf0001)
    val r = ev.withColumnRenamed("user_id", "c_user")
      .withColumnRenamed("ts", "c_ts")
    val narrow = graft.plans.AsOf.join(ev, r, "user_id", "ts", "c_user", "c_ts")
      .filter(col("asof_ts").isNotNull) // non-pushable: references asof_ts
      .select(col("event_id"), col("asof_ts"))
    val plan = narrow.queryExecution.executedPlan.toString
    assert(!plan.contains("props"), s"props survived pruning:\n$plan")
    assert(!plan.contains("value"), s"value survived pruning:\n$plan")
    val pre = graft.plans.AsOf.join(
        ev.select(col("event_id"), col("user_id"), col("ts")),
        ev.select(col("user_id").as("c_user"), col("ts").as("c_ts")),
        "user_id", "ts", "c_user", "c_ts")
      .filter(col("asof_ts").isNotNull)
      .select(col("event_id"), col("asof_ts"))
      .orderBy(col("event_id")).collect().map(_.toString).toSeq
    assert(narrow.orderBy(col("event_id")).collect()
      .map(_.toString).toSeq == pre)
  }

  test("duplicate and case-variant column names resolve like Spark, not first-wins") {
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    // duplicate name on the probe side (the post-join shape): binding
    // the FIRST match silently keys on the wrong column — must be loud
    val dup = ev.join(
      ev.select(col("user_id"), col("ts").as("ts2")), "user_id")
      .withColumnRenamed("ts2", "ts") // two columns literally named ts
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(dup, r, "user_id", "ts", "c_user", "c_ts")
    }
    assert(e.getMessage.contains("ambiguous"), s"got: $e")
    // default case-insensitive resolution accepts a case-variant name
    val out = graft.plans.AsOf
      .join(ev, r, "USER_ID", "TS", "c_user", "c_ts")
      .limit(5).collect()
    assert(out.nonEmpty)
  }

  test("forward direction equals the declarative min-later formulation") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val native = graft.plans.AsOf
      .join(p, c, "user_id", "ts", "c_user", "c_ts", "forward")
      .select(col("event_id"), col("asof_ts"))
      .orderBy(col("event_id")).collect().map(_.toString).toSeq
    val declarative = p
      .join(c, col("user_id") === col("c_user") && col("c_ts") > col("ts"),
        "left")
      .groupBy(col("event_id"))
      .agg(min(col("c_ts")).as("asof_ts"))
      .orderBy(col("event_id")).collect().map(_.toString).toSeq
    assert(native == declarative)
  }

  test("nearest picks the closer side; ties and bounds are strict") {
    import spark.implicits._
    def ts(s: String) = s"2024-01-01 $s:00"
    val l = Seq(
        (1L, 10L, ts("10:00")), // bwd 09:00 (60m) vs fwd 10:30 (30m) -> fwd
        (2L, 20L, ts("10:00")), // bwd 09:30 vs fwd 10:30 tie -> backward
        (3L, 30L, ts("10:00"))) // only an equal-ts row -> NULL (strict)
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp($"s")).drop("s")
    val r = Seq(
        (10L, ts("09:00")), (10L, ts("10:30")),
        (20L, ts("09:30")), (20L, ts("10:30")),
        (30L, ts("10:00")))
      .toDF("c_user", "s")
      .withColumn("c_ts", to_timestamp($"s")).drop("s")
    val out = graft.plans.AsOf
      .join(l, r, "user_id", "ts", "c_user", "c_ts", "nearest")
      .select(col("event_id"), col("asof_ts"))
      .orderBy(col("event_id")).collect()
    assert(out(0).getTimestamp(1).toString.startsWith("2024-01-01 10:30"))
    assert(out(1).getTimestamp(1).toString.startsWith("2024-01-01 09:30"))
    assert(out(2).isNullAt(1), "equal-ts right row must not match (strict)")
  }

  test("forward consuming an equal-ts row keeps it as a later backward candidate") {
    import spark.implicits._
    def ts(s: String) = s"2024-01-01 $s:00"
    // user 10: left rows at 10:00 then 11:00; right rows at 10:00, 12:00.
    // nearest at 10:00 -> 12:00 (equal row excluded); at 11:00 the 10:00
    // row (consumed while processing the first left row) must still win
    // as the backward candidate (60m) over forward 12:00 (60m tie -> bwd)
    val l = Seq((1L, 10L, ts("10:00")), (2L, 10L, ts("11:00")))
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp($"s")).drop("s")
    val r = Seq((10L, ts("10:00")), (10L, ts("12:00")))
      .toDF("c_user", "s")
      .withColumn("c_ts", to_timestamp($"s")).drop("s")
    val out = graft.plans.AsOf
      .join(l, r, "user_id", "ts", "c_user", "c_ts", "nearest")
      .select(col("event_id"), col("asof_ts"))
      .orderBy(col("event_id")).collect()
    assert(out(0).getTimestamp(1).toString.startsWith("2024-01-01 12:00"))
    assert(out(1).getTimestamp(1).toString.startsWith("2024-01-01 10:00"))
  }

  test("broadcast build equals the co-partitioned merge in all directions") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    for (dir <- Seq("backward", "forward", "nearest")) {
      val shuffled = graft.plans.AsOf
        .join(p, c, "user_id", "ts", "c_user", "c_ts", dir)
        .orderBy(col("event_id")).collect().map(_.toString).toSeq
      val bcast = graft.plans.AsOf
        .join(p, broadcast(c), "user_id", "ts", "c_user", "c_ts", dir)
        .orderBy(col("event_id")).collect().map(_.toString).toSeq
      assert(bcast == shuffled, s"direction=$dir")
    }
  }

  test("NULL keys and times never match and never alias key/time 0") {
    // null.asInstanceOf[Long] is 0L — without explicit guards a
    // NULL-keyed right row becomes a user-0 match and a NULL-keyed
    // left row matches user 0's rows. The fixture is built so the
    // buggy unboxing produces DIFFERENT answers than the correct
    // skip-null semantics (pandas merge_asof's): right (null, 90)
    // would pollute user 0's backward candidates, right (0, null)
    // would add candidate ts=0, left (null, …) would match user 0,
    // left (1, null) would take user 1's forward min.
    import java.sql.Timestamp
    def ts(s: Long): Timestamp = new Timestamp(s * 1000)
    import spark.implicits._
    val left = Seq(
      (1L, Option(1L), Option(ts(100))),
      (2L, Option.empty[Long], Option(ts(100))),
      (3L, Option(1L), Option.empty[Timestamp]),
      (4L, Option(0L), Option(ts(100))))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Option(1L), Option(ts(50))), (Option(1L), Option(ts(150))),
      (Option.empty[Long], Option(ts(90))),
      (Option(0L), Option.empty[Timestamp]),
      (Option(0L), Option(ts(70))))
      .toDF("c_user", "c_ts")
    val expect = Map(
      "backward" -> Seq((1L, Some(ts(50))), (2L, None), (3L, None),
        (4L, Some(ts(70)))),
      "forward" -> Seq((1L, Some(ts(150))), (2L, None), (3L, None),
        (4L, None)),
      // |100-50| = |150-100| → tie goes backward
      "nearest" -> Seq((1L, Some(ts(50))), (2L, None), (3L, None),
        (4L, Some(ts(70)))))
    for (dir <- Seq("backward", "forward", "nearest")) {
      def got(r: org.apache.spark.sql.DataFrame) = graft.plans.AsOf
        .join(left, r, "user_id", "ts", "c_user", "c_ts", dir)
        .select(col("event_id"), col("asof_ts"))
        .orderBy(col("event_id")).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getTimestamp(1)))).toSeq
      assert(got(right) == expect(dir), s"merge exec, direction=$dir")
      assert(got(broadcast(right)) == expect(dir),
        s"broadcast exec, direction=$dir")
    }
  }

  test("broadcast build plans without shuffling or sorting the probe side") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val plan = graft.plans.AsOf
      .join(p, broadcast(c), "user_id", "ts", "c_user", "c_ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("hashpartitioning"),
      s"probe side must keep its partitioning:\n$plan")
    assert(!plan.contains("Sort "),
      s"broadcast build needs no sort on either side:\n$plan")
  }

  test("wrong-typed key/time columns fail at analysis, not per task") {
    import spark.implicits._
    // an INT key (or a non-TIMESTAMP time) would otherwise surface as
    // a ClassCastException inside every executor task — the MinHash
    // rule: coerce/reject at analysis time with one clear error
    val l = Seq((1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "ts") // k is INT, not the required LONG
    val r = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("rk", "rts")
    val e = intercept[IllegalArgumentException](
      graft.plans.AsOf.join(l, r, "k", "ts", "rk", "rts"))
    assert(e.getMessage.contains("k must be LongType"), e.getMessage)
    val l2 = Seq((1L, 5L)).toDF("k", "ts") // LONG time, not TIMESTAMP
    val e2 = intercept[IllegalArgumentException](
      graft.plans.AsOf.join(l2, r, "k", "ts", "rk", "rts"))
    assert(e2.getMessage.contains("ts must be TimestampType"),
      e2.getMessage)
  }

  test("TIMESTAMP_NTZ time columns join like TIMESTAMP; mixing flavors is rejected") {
    import spark.implicits._
    // both flavors are micros-as-Long to the physical operators, so a
    // session reading NTZ parquet (or spark.sql.timestampType=NTZ)
    // must not be rejected at analysis — but an instant joined against
    // a wall-clock time is not a comparable quantity, so MIXED flavors
    // still fail with one clear driver-side error
    val l = Seq((10L, "2024-01-01 10:00:00"), (10L, "2024-01-01 12:00:00"))
      .toDF("user_id", "s")
      .withColumn("ts", $"s".cast("timestamp_ntz")).drop("s")
    val r = Seq((10L, "2024-01-01 09:30:00"), (10L, "2024-01-01 11:00:00"))
      .toDF("c_user", "s")
      .withColumn("c_ts", $"s".cast("timestamp_ntz")).drop("s")
    val out = graft.plans.AsOf.join(l, r, "user_id", "ts", "c_user", "c_ts")
      .orderBy("ts").select("asof_ts").collect()
    assert(out.map(_.get(0).toString) ===
      Array("2024-01-01T09:30", "2024-01-01T11:00"),
      out.mkString(","))
    // asof_ts carries the right side's flavor
    val schema = graft.plans.AsOf
      .join(l, r, "user_id", "ts", "c_user", "c_ts").schema
    assert(schema("asof_ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType, schema.treeString)
    val rTz = Seq((10L, java.sql.Timestamp.valueOf("2024-01-01 09:30:00")))
      .toDF("c_user", "c_ts")
    val e = intercept[IllegalArgumentException](
      graft.plans.AsOf.join(l, rTz, "user_id", "ts", "c_user", "c_ts"))
    assert(e.getMessage.contains("right time column c_ts must be"),
      e.getMessage)
  }

  test("all directions × both physical forms match a brute-force oracle on random data") {
    // differential law over random timestamp sets (raw Gen + fixed
    // seeds): dense duplicate timestamps on both sides, equal left and
    // right times (strictness boundaries), users present on only one
    // side — the co-partitioned merge AND the broadcast build must
    // both reproduce a per-row brute-force scan in every direction
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = Gen.listOfN(30,
      Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 19L)))
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    def brute(left: Seq[(Long, Long)], right: Seq[(Long, Long)],
        dir: String): Seq[Option[Long]] =
      left.map { case (u, t) =>
        val mine = right.collect { case (`u`, rt) => rt }
        val back = mine.filter(_ < t).maxOption
        val fwd = mine.filter(_ > t).minOption
        dir match {
          case "backward" => back
          case "forward" => fwd
          case "nearest" => (back, fwd) match {
            case (Some(b), Some(f)) => Some(if (f - t < t - b) f else b)
            case (b, f) => b.orElse(f)
          }
        }
      }
    (0 until 4).flatMap(i => Gen.zip(rowGen, rowGen)
      .apply(Gen.Parameters.default, Seed(4242L + i)))
      .foreach { case (lRaw, rRaw) =>
        val l = lRaw.zipWithIndex
          .map { case ((u, t), i) => (i.toLong, u, ts(t)) }
          .toDF("event_id", "user_id", "ts")
        val r = rRaw.map { case (u, t) => (u, ts(t)) }.toDF("c_user", "c_ts")
        Seq("backward", "forward", "nearest").foreach { dir =>
          val want = brute(lRaw, rRaw, dir).map(_.map(ts).orNull)
          Seq(r, broadcast(r)).zip(Seq("merge", "broadcast")).foreach {
            case (rhs, form) =>
              val got = graft.plans.AsOf
                .join(l, rhs, "user_id", "ts", "c_user", "c_ts", dir)
                .orderBy("event_id").select("asof_ts")
                .collect().map(row => row.get(0)).toSeq
              assert(got == want,
                s"$dir/$form diverges from brute force on " +
                  s"left=$lRaw right=$rRaw")
          }
        }
      }
  }

  test("rows with no earlier click get NULL asof_ts") {
    import spark.implicits._
    val l = Seq((1L, 10L, "2024-01-01 10:00:00"))
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp($"s")).drop("s")
    val r = Seq((10L, "2024-01-01 11:00:00"), (99L, "2024-01-01 09:00:00"))
      .toDF("c_user", "s")
      .withColumn("c_ts", to_timestamp($"s")).drop("s")
    val out = graft.plans.AsOf.join(l, r, "user_id", "ts", "c_user", "c_ts")
      .select("asof_ts").head
    assert(out.isNullAt(0), "only later/foreign clicks -> NULL")
  }
}
