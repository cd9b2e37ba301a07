package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift guard: the driver regenerates /root/testdata between
  * rounds and the PHYSICAL parquet types are not stable (r7: events.ts
  * silently moved TIMESTAMP(NANOS) → TIMESTAMP(MICROS); under the old
  * nanos-only read path every event timestamp would have collapsed to
  * 1970 — deterministically, so only the DuckDB oracle would notice).
  * This spec sniffs every table's footer at ALL THREE scale factors and
  * fails loudly the moment any column's physical type, logical
  * annotation, or nesting drifts from FIXTURES.md, turning the next
  * silent regeneration into a red test instead of a correctness gamble.
  *
  * events.ts is special-cased: both footer units the driver has ever
  * produced are accepted, and Tables.eventsTsIsNanos must AGREE with
  * the footer — the unit-normalization path itself is what the r7
  * incident proved must stay footer-driven.
  */
class FixturesSpec extends AnyFunSuite {

  private def footerCols(file: String): Seq[String] = {
    val conf = TestSpark.spark.sparkContext.hadoopConfiguration
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    try {
      reader.getFooter.getFileMetaData.getSchema.getColumns.asScala.toSeq
        .map { cd =>
          val prim = cd.getPrimitiveType
          val ann = Option(prim.getLogicalTypeAnnotation)
            .map(_.toString).getOrElse("-")
          s"${cd.getPath.mkString(".")}:${prim.getPrimitiveTypeName}:$ann"
        }
    } finally reader.close()
  }

  private val tsMicros = "TIMESTAMP(MICROS,false)"
  private val tsNanos = "TIMESTAMP(NANOS,false)"

  /** Expected physical columns per table (path:primitive:annotation),
    * events.ts excluded (checked separately against both legal units). */
  private val expected: Map[String, Seq[String]] = Map(
    "region" -> Seq(
      "r_regionkey:INT32:-", "r_name:BINARY:STRING"),
    "nation" -> Seq(
      "n_nationkey:INT32:-", "n_name:BINARY:STRING",
      "n_regionkey:INT32:-"),
    "customer" -> Seq(
      "c_custkey:INT64:-", "c_name:BINARY:STRING",
      "c_nationkey:INT32:-", "c_acctbal:DOUBLE:-",
      "c_mktsegment:BINARY:STRING"),
    "supplier" -> Seq(
      "s_suppkey:INT64:-", "s_name:BINARY:STRING",
      "s_nationkey:INT32:-", "s_acctbal:DOUBLE:-"),
    "part" -> Seq(
      "p_partkey:INT64:-", "p_name:BINARY:STRING",
      "p_brand:BINARY:STRING", "p_type:BINARY:STRING",
      "p_size:INT32:-", "p_retailprice:DOUBLE:-"),
    "orders" -> Seq(
      "o_orderkey:INT64:-", "o_custkey:INT64:-",
      "o_orderstatus:BINARY:STRING", "o_totalprice:DOUBLE:-",
      s"o_orderdate:INT64:$tsMicros", "o_orderpriority:BINARY:STRING"),
    "lineitem" -> Seq(
      "l_orderkey:INT64:-", "l_partkey:INT64:-", "l_suppkey:INT64:-",
      "l_linenumber:INT32:-", "l_quantity:DOUBLE:-",
      "l_extendedprice:DOUBLE:-", "l_discount:DOUBLE:-",
      "l_tax:DOUBLE:-", "l_returnflag:BINARY:STRING",
      "l_linestatus:BINARY:STRING", s"l_shipdate:INT64:$tsMicros"),
    "events" -> Seq(
      "event_id:INT64:-", /* ts checked separately */
      "user_id:INT64:-", "event_type:BINARY:STRING",
      "value:DOUBLE:-", "props:BINARY:STRING"),
    "documents" -> Seq(
      "doc_id:INT64:-", "text:BINARY:STRING", "lang:BINARY:STRING",
      "source:BINARY:STRING", "n_chars:INT64:-"),
    "embeddings" -> Seq(
      "vec_id:INT64:-", "embedding.list.element:FLOAT:-",
      "label:INT32:-"))

  private val sfDirs =
    Seq(TestSpark.sf0001, TestSpark.sf001, TestSpark.sf01)

  for (dir <- sfDirs; (table, want) <- expected.toSeq.sortBy(_._1))
    test(s"$dir/$table.parquet physical types match FIXTURES.md") {
      val cols = footerCols(s"$dir/$table.parquet")
      if (table == "events") {
        val (ts, rest) = cols.partition(_.startsWith("ts:"))
        assert(rest == want,
          s"events drifted: got $rest, want $want")
        assert(ts.size == 1 &&
          (ts.head == s"ts:INT64:$tsMicros" || ts.head == s"ts:INT64:$tsNanos"),
          s"events.ts unit drifted to a THIRD representation: $ts — " +
            "extend Tables.eventsRaw before trusting any events query")
      } else
        assert(cols == want, s"$table drifted: got $cols, want $want")
    }

  // The multimodal codec pipeline's oracle formulas lean on three
  // corpus facts the physical-type sniff above cannot see (ADVICE r15:
  // "pure-ASCII corpus" was cited but never asserted): text is
  // non-NULL and non-empty (Flac.encode requires frames > 0 — the
  // UDF guards it, but the oracle only mirrors the guard at
  // n_chars = 0), pure ASCII (FLAC PCM code points == bytes; Scala's
  // UTF-16 .length == DuckDB's character length), and n_chars equals
  // the character length the oracles recompute. A regenerated corpus
  // that breaks any of these turns into a red test here instead of a
  // hash mismatch three stages downstream.
  for (dir <- sfDirs)
    test(s"$dir/documents corpus contract: non-empty ASCII, n_chars") {
      import org.apache.spark.sql.functions._
      val d = TestSpark.spark.read.parquet(s"$dir/documents.parquet")
      val bad = d.filter(
        col("text").isNull || length(col("text")) === 0 ||
          col("n_chars") =!= length(col("text")) ||
          !col("text").rlike("^[\\x00-\\x7F]*$")).count()
      assert(bad == 0,
        s"$bad documents violate the non-empty/ASCII/n_chars contract " +
          "the multimodal oracle formulas assume — re-derive the " +
          "imageDims/FLAC units before trusting q_multimodal_pipeline")
    }

  for (dir <- sfDirs)
    test(s"eventsTsIsNanos agrees with the $dir footer") {
      val ts = footerCols(s"$dir/events.parquet").find(_.startsWith("ts:")).get
      val sniffed = Tables.eventsTsIsNanos(TestSpark.spark, dir)
      assert(sniffed == (ts == s"ts:INT64:$tsNanos"),
        s"unit sniff ($sniffed) disagrees with footer ($ts)")
    }
}
