package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator from SURVEY.md §2B: the Spark plan plus (when
  * SQL-expressible) the DuckDB oracle SQL that must hash-match it.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryGroup {
  def defs: Seq[QueryDef]
}
