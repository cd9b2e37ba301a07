package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws of the dedup/upsert/set operators over ScalaCheck-
  * generated data (SURVEY §5.2 ring 3). Raw Gen + fixed seeds (no
  * scalatestplus bridge in the offline cache): deterministic, 8 cases
  * per law. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cases[A](g: Gen[A], n: Int = 8): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val rowsGen: Gen[List[(Long, Long, Long)]] = Gen.listOfN(60,
    Gen.zip(Gen.chooseNum(1L, 20L), Gen.chooseNum(1L, 5L),
      Gen.chooseNum(0L, 1000L)))

  test("window dedup is idempotent: f(f(x)) = f(x)") {
    import spark.implicits._
    cases(rowsGen).foreach { rows =>
      val df = rows.toDF("key", "sub", "ord")
      def dedup(d: org.apache.spark.sql.DataFrame) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"key").orderBy($"ord", $"sub")
        d.withColumn("rn", row_number().over(w))
          .filter($"rn" === 1).drop("rn")
      }
      val once = dedup(df).collect().map(_.toString).sorted.toSeq
      val twice = dedup(dedup(df)).collect().map(_.toString).sorted.toSeq
      assert(once == twice)
    }
  }

  test("upsert of already-present staging is a no-op (idempotence)") {
    import spark.implicits._
    cases(rowsGen, 4).foreach { rows =>
      val target = rows.toDF("key", "sub", "ord").dropDuplicates("key")
      val staging = target.sample(withReplacement = false, 0.5, seed = 7)
      val merged = graft.etl.MicMacEtl.getOrCreate(target, staging, Seq("key"))
      assert(merged.count() == target.count())
    }
  }

  test("set algebra: (A except B) union (A intersect B) = distinct A") {
    import spark.implicits._
    val pairGen = Gen.zip(Gen.listOf(Gen.chooseNum(0, 30)),
      Gen.listOf(Gen.chooseNum(0, 30)))
    cases(pairGen).foreach { case (xs, ys) =>
      val a = xs.toDF("v")
      val b = ys.toDF("v")
      val lhs = a.except(b).union(a.intersect(b))
        .collect().map(_.getInt(0)).sorted.toSeq
      val rhs = a.distinct().collect().map(_.getInt(0)).sorted.toSeq
      assert(lhs == rhs)
    }
  }

  test("affine compose: identity laws and associativity (exact on ints)") {
    import spark.implicits._
    val id = Seq(1d, 0d, 0d, 0d, 0d, 1d, 0d, 0d, 0d, 0d, 1d, 0d)
    val matGen: Gen[List[Double]] =
      Gen.listOfN(12, Gen.chooseNum(-3, 3).map(_.toDouble))
    cases(Gen.zip(matGen, matGen, matGen)).foreach { case (a, b, c) =>
      val df = Seq((a, b, c, id)).toDF("a", "b", "c", "id")
      def fg = graft.etl.FrameGraph
      val r = df.select(
        fg.compose(col("id"), col("a")).as("li"),
        fg.compose(col("a"), col("id")).as("ri"),
        fg.compose(fg.compose(col("a"), col("b")), col("c")).as("ab_c"),
        fg.compose(col("a"), fg.compose(col("b"), col("c"))).as("a_bc"))
        .collect()(0)
      assert(r.getSeq[Double](0) == a, "identity ∘ a = a")
      assert(r.getSeq[Double](1) == a, "a ∘ identity = a")
      // integer-valued entries: float products are exact, so
      // associativity must hold bit-for-bit
      assert(r.getSeq[Double](2) == r.getSeq[Double](3),
        s"(a∘b)∘c != a∘(b∘c) for $a $b $c")
    }
  }

  test("minhash signature of a superset is elementwise <= (unsigned)") {
    import spark.implicits._
    graft.functions.MinHash.register(spark)
    val toksGen = Gen.listOfN(30, Gen.identifier)
    cases(toksGen, 4).foreach { toks =>
      def sig(ts: Seq[String]): Seq[Long] =
        ts.toDF("t").selectExpr("xxhash64(t) AS h")
          .agg(expr("minhash128(h)")).head.getSeq[Long](0)
      val s1 = sig(toks)
      val s2 = sig(toks ++ toks.map(_ + "_extra"))
      assert(s1.zip(s2).forall { case (a, b) =>
        java.lang.Long.compareUnsigned(b, a) <= 0 })
    }
  }
}
