package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_dedup_pipeline's exact-verification stage has two size-selected
  * plans (r17): CARRY-SETS (shingle sets ride the per-doc aggregate's
  * exchange; the graded-SF default) and INVERTED-INDEX (sketch-only
  * exchange payload; selected above
  * `spark.graft.dedup.invertedVerifyMinBytes`, default 1 GiB — the
  * 100 TB posture where the exchange must not carry the corpus). The
  * plan choice must be INVISIBLE in the result: this spec runs the
  * whole declared query on both branches, on two fixtures, and pins
  * row-for-row equality. The DuckDB oracle independently gates the
  * default branch; this spec extends that gate across the switch.
  */
class DedupVerifyEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val conf = "spark.graft.dedup.invertedVerifyMinBytes"

  private def runBoth(sfDir: String): (Seq[String], Seq[String]) = {
    val fn = SparkEntry.queries("q_dedup_pipeline")
    def collect(): Seq[String] =
      fn(spark, sfDir).collect().map(_.toString).toSeq
    spark.conf.unset(conf)
    val carrySets = collect() // default threshold ⇒ carry-sets at test SFs
    spark.conf.set(conf, "0") // force the inverted-index branch
    val inverted =
      try collect() finally spark.conf.unset(conf)
    (carrySets, inverted)
  }

  // GRAFT_EQ_EXTRA_SF names an additional fixture dir (e.g. the
  // /tmp/graft_sf1 ScaleUp fixture) so the branch equality can be
  // proven at scales the default suite doesn't pay for.
  private val fixtures = Seq(TestSpark.sf0001, TestSpark.sf001) ++
    sys.env.get("GRAFT_EQ_EXTRA_SF").toSeq

  for (sf <- fixtures) {
    test(s"both verify branches produce identical results on $sf") {
      val (carrySets, inverted) = runBoth(sf)
      assert(carrySets.nonEmpty)
      assert(carrySets == inverted,
        "the verify-plan switch changed the declared query's result")
    }
  }

  test("an unparseable threshold fails loudly instead of defaulting") {
    spark.conf.set(conf, "lots")
    try {
      val e = intercept[Exception] {
        SparkEntry.queries("q_dedup_pipeline")(spark, TestSpark.sf0001)
          .collect()
      }
      assert(e.getMessage.contains("invertedVerifyMinBytes"))
    } finally spark.conf.unset(conf)
  }
}
