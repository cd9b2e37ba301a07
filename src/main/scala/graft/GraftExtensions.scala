package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.etl.AutocalTransfos
import graft.functions.{FloatDot, LshSignatures, MinHashAgg}
import graft.queries.AnnLsh

/** Spark-native packaging of graft's custom Catalyst surfaces
  * (SURVEY §4.2): install once via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`) and the
  * functions resolve in SQL and expr() everywhere — no per-query
  * registration.
  *
  *  - fdot(array<float>, array<float>): codegen'd fused dot product
  *  - minhash128(bigint): 128-permutation MinHash sketch aggregate
  *  - autocal_transfos(...): calibration -> transfo-rows Generator
  *  - lsh_sigs(array<float>): fused 16-table hyperplane LSH signatures
  *
  * Query code still self-registers defensively (createOrReplace is
  * idempotent) so the driver's plain SparkSession works unchanged.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")
    e.injectFunction((FunctionIdentifier("fdot"),
      info("fdot", "fdot(a, b) - fused float-vector dot product"),
      (exprs: Seq[Expression]) => FloatDot(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("minhash128"),
      info("minhash128", "minhash128(h) - 128-permutation MinHash sketch"),
      (exprs: Seq[Expression]) => MinHashAgg(exprs.head)))
    e.injectFunction((FunctionIdentifier("autocal_transfos"),
      info("autocal_transfos",
        "autocal_transfos(f, pp, cdist, coeff) - explode calibration into transfos"),
      (exprs: Seq[Expression]) => AutocalTransfos(exprs)))
    e.injectFunction((FunctionIdentifier("lsh_sigs"),
      info("lsh_sigs",
        "lsh_sigs(embedding) - per-table random-hyperplane LSH signatures"),
      (exprs: Seq[Expression]) =>
        LshSignatures(exprs.head, AnnLsh.hyperplanes, AnnLsh.bits)))
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOf)
    e.injectOptimizerRule(_ => graft.plans.PruneColumnsThroughAsOf)
  }
}
