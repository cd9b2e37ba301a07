package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-parity ETL checks (SURVEY §2A, §5.1-analog golden fixtures):
  * hand-written MicMac-shaped XML -> entity DataFrames with hand-computed
  * expected matrices. */
class MicMacEtlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val res = "src/test/resources/micmac"

  test("autocal: calibration -> sensor + 3 referentials + 3 transfos") {
    val out = graft.etl.MicMacEtl.importAutocal(spark, s"$res/autocal_sample.xml")
    assert(out("sensors").count() == 1)
    assert(out("referentials").count() == 3)
    val ts = out("transfos").collect()
      .map(r => r.getString(1) -> r.getSeq[Double](5)).toMap
    assert(ts.keySet == Set("projection", "distortion", "pixel"))
    assert(ts("projection") == Seq(3041.5, 1523.4, 1011.25))
    // distortion params = CDist ++ CoeffDist
    assert(ts("distortion") == Seq(1536.0, 1024.0,
      -0.000125, 0.0000000375, -0.00000000000211))
  }

  test("blinis: rig -> N cameras with [R|t] mat4x3 row-major") {
    val out = graft.etl.MicMacEtl.importBlinis(spark, s"$res/blinis_sample.xml")
    assert(out("sensors").count() == 1)
    // base + 2 cameras
    assert(out("referentials").count() == 3)
    val m = out("transfos").collect()
      .map(r => r.getString(2) -> r.getSeq[Double](4)).toMap
    assert(m("cam_00") == Seq(
      1.0, 0.0, 0.0, 0.1,
      0.0, 1.0, 0.0, 0.2,
      0.0, 0.0, 1.0, 0.3))
    assert(m("cam_01") == Seq(
      0.0, -1.0, 0.0, -0.5,
      1.0, 0.0, 0.0, 0.25,
      0.0, 0.0, 1.0, 1.5))
  }

  test("orimatis: quaternion pose -> rotation matrix + intrinsics") {
    val out = graft.etl.MicMacEtl.importOrimatis(spark, s"$res/orimatis_sample.xml")
    val ts = out("transfos").collect()
      .map(r => r.getString(2) -> r.getSeq[Double](4)).toMap
    // q = (0,0,sin45,cos45) = 90° about z: R = [[0,-1,0],[1,0,0],[0,0,1]]
    val m = ts("affine_mat4x3")
    val exp = Seq(
      0.0, -1.0, 0.0, 651200.25,
      1.0, 0.0, 0.0, 6861500.5,
      0.0, 0.0, 1.0, 120.75)
    m.zip(exp).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12, s"$m vs $exp") }
    assert(ts("projective_pinhole") == Seq(3050.25, 1536.5, 1024.5))
    assert(out("referentials").count() == 3)
  }

  test("get_or_create upsert is idempotent and key-stable (A5/A6)") {
    import spark.implicits._
    val existing = Seq(("s1", 1), ("s2", 2)).toDF("name", "id")
    val staging = Seq("s2", "s3").toDF("name")
      .withColumn("id", lit(3))
    val once = graft.etl.MicMacEtl.getOrCreate(existing, staging, Seq("name"))
    assert(once.count() == 3) // s2 matched, s3 created
    val twice = graft.etl.MicMacEtl.getOrCreate(once, staging, Seq("name"))
    assert(twice.collect().map(_.toString).sorted.toSeq
      == once.collect().map(_.toString).sorted.toSeq)
  }
}
