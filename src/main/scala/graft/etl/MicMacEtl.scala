package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reference-parity ETL: MicMac photogrammetry XML -> li3ds-shaped
  * entity DataFrames (SURVEY §2A A1–A8; upstream micmac_li3ds
  * autocal.py / blinis.py / orimatis.py / api.py [unverified — empty
  * reference mount, grep anchors per SURVEY §1.2]).
  *
  * Spark-first shape: `spark.read.option("wholetext", true).text(glob)`
  * scans the files (A1), `from_xml` parses them with an explicit schema
  * (A2), column expressions derive matrices (A3), a custom Catalyst
  * `Generator` explodes one calibration into its N transfos (A4 — the
  * UDTF surface), dense_rank assigns deterministic surrogate keys (A6),
  * and get-or-create upsert is a left-anti union on the natural key
  * (A5). Sinks: parquet via Verify, JDBC via q_etl_jdbc_sink (A7).
  * Missing mandatory tags fail the non-null checks (A8).
  */
object MicMacEtl {

  /** space-separated float leaf -> array<double> */
  private def vec(c: Column): Column =
    transform(split(trim(c), "\\s+"), x => x.cast(DoubleType))

  // ---------------------------------------------------------------- autocal

  val autocalSchema: StructType = StructType(Seq(
    StructField("CalibrationInternConique", StructType(Seq(
      StructField("KnownConv", StringType),
      StructField("PP", StringType),
      StructField("F", DoubleType),
      StructField("SzIm", StringType),
      StructField("CalibDistortion", StructType(Seq(
        StructField("ModRad", StructType(Seq(
          StructField("CDist", StringType),
          StructField("CoeffDist", ArrayType(DoubleType)))))))))))))

  /** one calibration file -> (sensor, referentials, transfos) */
  def importAutocal(spark: SparkSession, glob: String): Map[String, DataFrame] = {
    AutocalTransfos.register(spark)
    val parsed = spark.read.option("wholetext", "true").text(glob)
      .withColumn("file", input_file_name())
      .withColumn("x", from_xml(col("value"), autocalSchema))
      .select(col("file"), col("x.CalibrationInternConique").as("c"))
      .select(col("file"),
        col("c.F").as("focal"), vec(col("c.PP")).as("pp"),
        vec(col("c.SzIm")).as("sz_im"),
        vec(col("c.CalibDistortion.ModRad.CDist")).as("cdist"),
        col("c.CalibDistortion.ModRad.CoeffDist").as("coeff"))
    // A8: mandatory tags
    val checked = parsed.filter(
      assert_true(col("focal").isNotNull && size(col("pp")) === 2
        && size(col("sz_im")) === 2).isNull)
    val sensors = checked.select(col("file"),
      lit("camera").as("sensor_type"),
      map_from_arrays(array(lit("image_size")), array(col("sz_im")))
        .as("specifications"))
    val referentials = checked.select(col("file"), explode(array(
      lit("camera"), lit("rawImage"), lit("undistortedImage")))
      .as("referential"))
    val transfos = checked.select(col("file"),
      expr("autocal_transfos(focal, pp, cdist, coeff)"))
    Map("sensors" -> sensors, "referentials" -> referentials,
      "transfos" -> transfos)
  }

  // ---------------------------------------------------------------- blinis

  val blinisSchema: StructType = StructType(Seq(
    StructField("KeyIm2TimeCam", StringType),
    StructField("LiaisonsSHC", StructType(Seq(
      StructField("ParamOrientSHC", ArrayType(StructType(Seq(
        StructField("IdGrp", StringType),
        StructField("Vecteur", StringType),
        StructField("Rot", StructType(Seq(
          StructField("CodageMatr", StructType(Seq(
            StructField("L1", StringType),
            StructField("L2", StringType),
            StructField("L3", StringType))))))))))))))))

  /** one rig file -> base + per-camera referentials with affine mat4x3
    * transfos ([R|t] row-major, 12 doubles — blinis.py A3/A4 analog) */
  def importBlinis(spark: SparkSession, glob: String): Map[String, DataFrame] = {
    val parsed = spark.read.option("wholetext", "true").text(glob)
      .withColumn("file", input_file_name())
      .withColumn("x", from_xml(col("value"), blinisSchema))
      .select(col("file"), col("x.KeyIm2TimeCam").as("rig"),
        explode(col("x.LiaisonsSHC.ParamOrientSHC")).as("p"))
      .select(col("file"), col("rig"),
        col("p.IdGrp").as("cam"),
        vec(col("p.Vecteur")).as("t"),
        vec(col("p.Rot.CodageMatr.L1")).as("r1"),
        vec(col("p.Rot.CodageMatr.L2")).as("r2"),
        vec(col("p.Rot.CodageMatr.L3")).as("r3"))
    val mat43 = concat(
      col("r1"), slice(col("t"), 1, 1),
      col("r2"), slice(col("t"), 2, 1),
      col("r3"), slice(col("t"), 3, 1))
    val transfos = parsed.select(col("file"), col("rig"), col("cam"),
      lit("affine_mat4x3").as("transfo_type"), mat43.as("mat4x3"))
    val referentials = parsed.select(col("file"), col("rig"), col("cam"))
      .unionByName(parsed.select(col("file"), col("rig"),
        lit("base").as("cam")).distinct())
    val sensors = parsed.select(col("file"), col("rig")).distinct()
      .withColumn("sensor_type", lit("group"))
    Map("sensors" -> sensors, "referentials" -> referentials,
      "transfos" -> transfos)
  }

  // --------------------------------------------------------------- orimatis

  val orimatisSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("geometry", StructType(Seq(
      StructField("intrinseque", StructType(Seq(
        StructField("sensor", StructType(Seq(
          StructField("name", StringType),
          StructField("image_size", StructType(Seq(
            StructField("width", IntegerType),
            StructField("height", IntegerType)))),
          StructField("ppa", StructType(Seq(
            StructField("c", DoubleType),
            StructField("l", DoubleType),
            StructField("focale", DoubleType)))))))))),
      StructField("extrinseque", StructType(Seq(
        StructField("systeme", StringType),
        StructField("sommet", StructType(Seq(
          StructField("easting", DoubleType),
          StructField("northing", DoubleType),
          StructField("altitude", DoubleType)))),
        StructField("rotation", StructType(Seq(
          StructField("Image2Ground", BooleanType),
          StructField("quaternion", StructType(Seq(
            StructField("x", DoubleType), StructField("y", DoubleType),
            StructField("z", DoubleType), StructField("w", DoubleType)))))))))))))))

  /** one orientation file -> pose (quaternion->mat3x3) + intrinsics */
  def importOrimatis(spark: SparkSession, glob: String): Map[String, DataFrame] = {
    val parsed = spark.read.option("wholetext", "true").text(glob)
      .withColumn("file", input_file_name())
      .withColumn("x", from_xml(col("value"), orimatisSchema))
      .select(col("file"),
        col("x.geometry.intrinseque.sensor.name").as("sensor_name"),
        col("x.geometry.intrinseque.sensor.image_size.width").as("width"),
        col("x.geometry.intrinseque.sensor.image_size.height").as("height"),
        col("x.geometry.intrinseque.sensor.ppa.c").as("ppa_c"),
        col("x.geometry.intrinseque.sensor.ppa.l").as("ppa_l"),
        col("x.geometry.intrinseque.sensor.ppa.focale").as("focal"),
        col("x.geometry.extrinseque.systeme").as("srid_name"),
        col("x.geometry.extrinseque.sommet.easting").as("px"),
        col("x.geometry.extrinseque.sommet.northing").as("py"),
        col("x.geometry.extrinseque.sommet.altitude").as("pz"),
        col("x.geometry.extrinseque.rotation.quaternion.x").as("qx"),
        col("x.geometry.extrinseque.rotation.quaternion.y").as("qy"),
        col("x.geometry.extrinseque.rotation.quaternion.z").as("qz"),
        col("x.geometry.extrinseque.rotation.quaternion.w").as("qw"))
    // quaternion -> rotation matrix, row-major (orimatis.py A3 analog),
    // pure column arithmetic — codegen'd, no UDF
    def q(n: String) = col(n)
    val r = Seq(
      lit(1) - lit(2) * (q("qy") * q("qy") + q("qz") * q("qz")),
      lit(2) * (q("qx") * q("qy") - q("qz") * q("qw")),
      lit(2) * (q("qx") * q("qz") + q("qy") * q("qw")),
      lit(2) * (q("qx") * q("qy") + q("qz") * q("qw")),
      lit(1) - lit(2) * (q("qx") * q("qx") + q("qz") * q("qz")),
      lit(2) * (q("qy") * q("qz") - q("qx") * q("qw")),
      lit(2) * (q("qx") * q("qz") - q("qy") * q("qw")),
      lit(2) * (q("qy") * q("qz") + q("qx") * q("qw")),
      lit(1) - lit(2) * (q("qx") * q("qx") + q("qy") * q("qy")))
    val pose = parsed.withColumn("mat4x3", array(
      r(0), r(1), r(2), col("px"),
      r(3), r(4), r(5), col("py"),
      r(6), r(7), r(8), col("pz")))
    val transfos = pose.select(col("file"), col("sensor_name"),
      lit("affine_mat4x3").as("transfo_type"), col("srid_name"),
      col("mat4x3"))
      .unionByName(pose.select(col("file"), col("sensor_name"),
        lit("projective_pinhole").as("transfo_type"), col("srid_name"),
        array(col("focal"), col("ppa_c"), col("ppa_l")).as("mat4x3")))
    val sensors = parsed.select(col("file"), col("sensor_name"),
      lit("camera").as("sensor_type"), col("width"), col("height"))
    val referentials = parsed.select(col("file"), col("sensor_name"),
      explode(array(lit("world"), lit("camera"), lit("image")))
        .as("referential"))
    Map("sensors" -> sensors, "referentials" -> referentials,
      "transfos" -> transfos)
  }

  // ------------------------------------------------- surrogate keys + upsert

  /** A6: deterministic surrogate ids over the natural key */
  def withSurrogateIds(df: DataFrame, naturalKey: Seq[String]): DataFrame =
    df.withColumn("id", dense_rank().over(
      Window.orderBy(naturalKey.map(col): _*)))

  /** A5 get_or_create: rows of `staging` whose natural key is absent from
    * `existing` are appended; matched rows reuse the existing id. */
  def getOrCreate(existing: DataFrame, staging: DataFrame,
      naturalKey: Seq[String]): DataFrame = {
    val fresh = staging.join(existing, naturalKey, "left_anti")
    existing.unionByName(fresh, allowMissingColumns = false)
  }
}

/** Custom Catalyst Generator (the A4 exploder): one calibration struct ->
  * three transfo rows (projective pinhole, radial distortion, pixel
  * frame) — the same multi-emit micmac_li3ds/autocal.py performs
  * imperatively [unverified upstream]. Generator = Spark's UDTF surface;
  * CodegenFallback is fine off the hot path. */
case class AutocalTransfos(children: Seq[Expression])
  extends Expression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("transfo_name", StringType, nullable = false),
    StructField("transfo_type", StringType, nullable = false),
    StructField("source_ref", StringType, nullable = false),
    StructField("target_ref", StringType, nullable = false),
    StructField("parameters", ArrayType(DoubleType), nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val focal = children(0).eval(input).asInstanceOf[Double]
    val pp = children(1).eval(input).asInstanceOf[ArrayData].toDoubleArray()
    val cdist = children(2).eval(input).asInstanceOf[ArrayData].toDoubleArray()
    val coeff = children(3).eval(input).asInstanceOf[ArrayData].toDoubleArray()
    def row(n: String, t: String, s: String, g: String, p: Array[Double]) =
      InternalRow(UTF8String.fromString(n), UTF8String.fromString(t),
        UTF8String.fromString(s), UTF8String.fromString(g),
        new GenericArrayData(p))
    Seq(
      row("projection", "projective_pinhole", "camera", "idealImage",
        Array(focal, pp(0), pp(1))),
      row("distortion", "poly_radial", "idealImage", "rawImage",
        cdist ++ coeff),
      row("pixel", "affine_mat3x2", "rawImage", "image",
        Array(1, 0, 0, 0, 1, 0)))
  }

  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): AutocalTransfos = copy(children = c)
}

object AutocalTransfos {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "autocal_transfos", exprs => AutocalTransfos(exprs), "scala_udf")
}
