package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.BitmapDistinct

/** Laws for the exact bitmap distinct-count aggregate
  * (functions/BitmapDistinct.scala): exactness against a Set oracle,
  * canonical serialization (equal sets ⇒ byte-equal payloads whatever
  * the insertion/growth path), and two-level reaggregation (bitmap OR
  * over per-subgroup bitmaps = distinct over the union). */
class BitmapDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // raw Gen + fixed seeds — no scalatestplus bridge in the offline cache
  private def cases[A](g: Gen[A], n: Int = 12): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(421L + i)))

  test("bitmap cardinality is exact vs Set oracle (property)") {
    cases(Gen.listOf(Gen.chooseNum(0L, 4096L))).foreach { keys =>
      val bm = new BitmapDistinct.Bitmap
      keys.foreach(bm.set)
      assert(bm.cardinality == keys.toSet.size)
    }
  }

  test("serialization is canonical: insertion order and growth path do not matter") {
    cases(Gen.nonEmptyListOf(Gen.chooseNum(0L, 100000L))).foreach { keys =>
      val a = new BitmapDistinct.Bitmap
      keys.foreach(a.set)
      val b = new BitmapDistinct.Bitmap
      keys.reverse.foreach(b.set)
      // force a different growth path on c: largest key first
      val c = new BitmapDistinct.Bitmap
      keys.sorted.reverse.foreach(c.set)
      assert(java.util.Arrays.equals(a.toBytes, b.toBytes))
      assert(java.util.Arrays.equals(a.toBytes, c.toBytes))
    }
  }

  test("keys outside the dense domain are rejected loudly") {
    val bm = new BitmapDistinct.Bitmap
    intercept[IllegalArgumentException](bm.set(-1L))
    intercept[IllegalArgumentException](bm.set(1L << 26))
  }

  test("two-level reaggregation equals direct distinct on the grouped frame") {
    import spark.implicits._
    val rows = (0 until 2000).map { i =>
      (s"g${i % 3}", s"s${i % 5}", (i * 37 % 443).toLong)
    }.toDF("g", "sub", "key")
    val twoLevel = rows
      .groupBy($"g", $"sub")
      .agg(BitmapDistinct.bitmapOf($"key").as("bm"))
      .groupBy($"g")
      .agg(BitmapDistinct.bitmapCardinality($"bm").as("ndv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = rows.groupBy($"g")
      .agg(countDistinct($"key").as("ndv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoLevel == direct)
  }

  test("NULL keys and NULL stored bitmaps are skipped like COUNT(DISTINCT)") {
    import spark.implicits._
    val rows = Seq(Option(1L), None, Option(2L), Option(1L), None)
      .toDF("key")
    // null keys skip — exactly COUNT(DISTINCT key)'s treatment
    assert(rows.agg(BitmapDistinct.bitmapOf($"key").as("bm"))
      .select(length($"bm")).head.getInt(0) > 0)
    val viaBitmap = rows
      .agg(BitmapDistinct.bitmapOf($"key").as("bm"))
      .agg(BitmapDistinct.bitmapCardinality($"bm"))
      .head.getLong(0)
    assert(viaBitmap == 2L)
    // a NULL stored bitmap (e.g. from an outer join) skips at the
    // reaggregation level too, instead of NPE-ing the task
    val bms = rows.filter($"key".isNotNull)
      .agg(BitmapDistinct.bitmapOf($"key").as("bm"))
      .select($"bm")
      .unionByName(Seq(1).toDF("x")
        .select(lit(null).cast("binary").as("bm")))
    assert(bms.agg(BitmapDistinct.bitmapCardinality($"bm"))
      .head.getLong(0) == 2L)
  }
}
