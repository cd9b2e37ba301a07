package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Table loaders with explicit schemas (FIXTURES.md — never infer).
  *
  * Schemas mirror the driver-generated parquet exactly; explicit
  * StructTypes keep type drift (INT32 vs INT64, timestamp unit) from
  * silently breaking the DuckDB oracle hash-compare.
  *
  * Scale design note: each table is a plain parquet scan, so Catalyst
  * pushes filters/column pruning into the file source; at 100 TB these
  * would be partitioned/bucketed paths, but the loader surface is the
  * same.
  */
object Tables {

  val regionSchema = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** events.parquet's timestamp unit has drifted across driver-generated
    * data rounds: TIMESTAMP(NANOS) through r6 (which Spark's reader
    * rejects as TimestampType — we read raw int64 nanos via the legacy
    * nanosAsLong flag and truncate to micros exactly as DuckDB does),
    * TIMESTAMP(MICROS) from r7 (a plain TimestampType read). The unit is
    * detected from the file footer once per directory (eventsTsIsNanos)
    * and every events reader — batch and streaming — normalizes through
    * it, so a future regeneration in either unit keeps the oracle green. */
  val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** events schema when the file stores TIMESTAMP(MICROS) natively. */
  val eventsMicrosSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Logical schemas as the ENGINE sees them — events carries the
    * normalized TimestampType ts (whatever unit the file stores, every
    * events reader normalizes to micros), so generic consumers and
    * sink round-trip read-backs can never apply the raw int64 form to
    * a TIMESTAMP file. The raw form lives only inside eventsRaw. */
  val schemas: Map[String, StructType] = Map(
    "region" -> regionSchema,
    "nation" -> nationSchema,
    "customer" -> customerSchema,
    "supplier" -> supplierSchema,
    "part" -> partSchema,
    "orders" -> ordersSchema,
    "lineitem" -> lineitemSchema,
    "events" -> eventsMicrosSchema,
    "documents" -> documentsSchema,
    "embeddings" -> embeddingsSchema)

  /** events routes through eventsRaw so the footer-detected timestamp
    * unit can never be bypassed by the generic path. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") eventsRaw(spark, sfDir)
    else spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")

  /** Column subset of a table schema, in the given order — the single
    * source of truth for sink round-trip read-back schemas (inline
    * StructType copies would silently diverge if a fixture type ever
    * changed). */
  def subSchema(tableName: String, names: String*): StructType =
    StructType(names.map(schemas(tableName)(_)))

  private val tsUnitCache =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]

  /** True when $sfDir/events.parquet stores ts as TIMESTAMP(NANOS).
    * With nanosAsLong on, a schema-less read surfaces a NANOS column as
    * LongType and a MICROS column as TimestampType — one footer read,
    * cached per (directory, file mtime) so an in-place regeneration
    * within one JVM re-sniffs instead of trusting a stale unit. The
    * nanosAsLong conf is restored after the sniff (the NANOS read
    * paths set it themselves); a MICROS fixture never leaves the
    * session-wide legacy flag flipped. */
  def eventsTsIsNanos(spark: SparkSession, sfDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/events.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val key = s"$sfDir@${fs.getFileStatus(p).getModificationTime}"
    tsUnitCache.getOrElseUpdate(key, {
      val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val isNanos =
        try spark.read.parquet(s"$sfDir/events.parquet")
          .schema("ts").dataType == LongType
        catch { case t: Throwable =>
          prev match {
            case Some(v) =>
              spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
            case None =>
              spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
          }
          throw t
        }
      // restore the flag only for a MICROS verdict: on a NANOS fixture
      // the flag must stay SET session-wide — every lazy NANOS events
      // scan needs it at ACTION time, and an unconditional restore
      // here opens a window where a concurrent sniff (another suite's
      // first events read) unsets it under a mid-plan NANOS scan
      if (!isNanos) prev match {
        case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
      isNanos
    })
  }

  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame =
    if (eventsTsIsNanos(spark, sfDir)) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.schema(eventsRawSchema).parquet(s"$sfDir/events.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else
      spark.read.schema(eventsMicrosSchema).parquet(s"$sfDir/events.parquet")

  /** Streaming source over events.parquet with ts normalized to
    * TimestampType micros, whichever unit the file stores — the single
    * entry point for every q_stream_* readStream. The path handling
    * matches the batch reader for BOTH fixture layouts: a single
    * `events.parquet` FILE streams via a leaf-name glob on the parent
    * directory, while an `events.parquet` DIRECTORY (a multi-part
    * regeneration) streams from the directory itself — the glob form
    * alone would match no leaf file there and every streaming query
    * would silently drain empty. */
  def eventsReadStream(s: SparkSession, sfDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/events.parquet")
    val isDir = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .getFileStatus(p).isDirectory
    def src(schema: StructType): DataFrame = {
      val r = s.readStream.schema(schema)
      if (isDir) r.parquet(p.toString)
      else r.option("pathGlobFilter", "events.parquet").parquet(sfDir)
    }
    if (eventsTsIsNanos(s, sfDir)) {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      src(eventsRawSchema)
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else src(eventsMicrosSchema)
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
