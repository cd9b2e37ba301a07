package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation operators (SURVEY §2B q_agg_*).
  *
  * Float parity strategy (SURVEY §2C, verified on this data): every money
  * column holds exact 2-decimal values, so `CAST(x AS DECIMAL)` is exact
  * and `SUM` over decimals is exact integer arithmetic in both Spark and
  * DuckDB. Final metrics are emitted as DOUBLE via a cast of the exact
  * decimal — both engines produce the identical nearest double, so even
  * un-rounded averages (exact-sum / count, one IEEE division) hash-match.
  *
  * Scale: all aggregations here are two-phase hash aggregates (partial
  * map-side combine + final after a key shuffle) — the plan Spark picks
  * for groupBy().agg(); no driver-side collection.
  */
object Aggs extends QueryGroup {

  private def dec(c: Column, p: Int = 14, s: Int = 2): Column =
    c.cast(DecimalType(p, s))

  /** exact decimal sum surfaced as double (identical bits on both engines) */
  private def dsum(c: Column): Column = sum(c).cast(DoubleType)

  val pricingSummary: (SparkSession, String) => DataFrame = (s, d) => {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
    val qty = dec(col("l_quantity"), 12, 2)
    val price = dec(col("l_extendedprice"), 14, 2)
    val disc = dec(col("l_discount"), 4, 2)
    val tax = dec(col("l_tax"), 4, 2)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(qty).as("sum_qty"),
        dsum(price).as("sum_base_price"),
        dsum(price * (lit(1) - disc)).as("sum_disc_price"),
        dsum(price * (lit(1) - disc) * (lit(1) + tax)).as("sum_charge"),
        (dsum(qty) / count(lit(1))).as("avg_qty"),
        (dsum(price) / count(lit(1))).as("avg_price"),
        (dsum(disc) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val pricingSummaryOracle: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      | CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      | COUNT(*)::BIGINT AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_agg_pricing_summary", pricingSummary, Some(pricingSummaryOracle))
  )
}
