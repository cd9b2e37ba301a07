package graft

import org.scalatest.funsuite.AnyFunSuite

/** Quantized similarity gate: q_sim_quantized is oracle-checked for its
  * own exact int8 contract, but the reason to quantize is serving the
  * SAME neighbors 8x cheaper — so this spec measures recall@5 of the
  * quantized ranking against the float-exact top-k on sf0.01.
  */
class QuantizedSimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("int8 quantized top-5 recalls >= 0.9 of the float-exact top-5") {
    def topsOf(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, TestSpark.sf001)
        .collect()
        .groupBy(_.getAs[Long]("qid"))
        .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val exact = topsOf("q_sim_cosine_topk")
    val quant = topsOf("q_sim_quantized")
    assert(exact.keySet == quant.keySet)
    val recalls = exact.map { case (qid, ex) =>
      (ex intersect quant(qid)).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    info(f"quantized recall@5 = $mean%.3f over ${recalls.size} probes")
    assert(mean >= 0.9,
      f"int8 quantization lost too much ranking fidelity: $mean%.3f")
  }
}
