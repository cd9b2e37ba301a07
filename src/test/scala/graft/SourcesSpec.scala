package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond parquet (SURVEY §2A A1/A7): CSV
  * and JSON round trips with explicit schemas (never inference — the
  * same discipline as Tables), and the binaryFile source for opaque
  * payloads. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def eventsSubset = Tables.events(spark, TestSpark.sf0001)
    .select("event_id", "user_id", "event_type", "value")

  test("CSV round trip with explicit schema preserves rows") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val src = eventsSubset
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("header", "true").csv(dir)
    assert(back.orderBy("event_id").collect().map(_.toString).toSeq ==
      src.orderBy("event_id").collect().map(_.toString).toSeq)
  }

  test("JSON lines round trip with explicit schema preserves rows") {
    val dir = Files.createTempDirectory("graft_json").toString
    val src = eventsSubset
    src.write.mode("overwrite").json(dir)
    val back = spark.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
      .json(dir)
    assert(back.orderBy("event_id").collect().map(_.toString).toSeq ==
      src.orderBy("event_id").collect().map(_.toString).toSeq)
  }

  test("binaryFile source reads opaque payloads with metadata") {
    val df = spark.read.format("binaryFile")
      .load("src/test/resources/micmac/*.xml")
    val rows = df.select(col("path"), length(col("content")).as("len"))
      .collect()
    // count derived from the fixture dir, not hardcoded: new golden
    // XMLs must not break the source test
    val expected = Files.list(java.nio.file.Paths.get(
        "src/test/resources/micmac")).iterator().asScala
      .count(_.toString.endsWith(".xml"))
    assert(rows.length == expected && expected >= 3)
    assert(rows.forall(_.getInt(1) > 100))
  }
}
