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

/** Scoped session-conf overrides (the r12 deferred cleanup: the
  * streaming queries each hand-copied a save/set/try/restore block,
  * and the copies drifted — two of them built eager state between the
  * `set` and the `try`, leaking shuffle.partitions=4 session-wide on a
  * throw). The overrides are applied INSIDE the protected region, so a
  * mid-list failure still restores the prefix already applied, and the
  * previous state is restored faithfully — set back, or unset if the
  * key had no explicit value. */
object Confs {
  def withConfs[A](s: SparkSession, kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
    try {
      kvs.foreach { case (k, v) => s.conf.set(k, v) }
      body
    } finally prev.reverse.foreach { case (k, was) =>
      // a restore failure may not be silent: the override would stay
      // active session-wide (e.g. a leaked noDataMicroBatches=false
      // starves every later watermark query) with nothing pointing at
      // this conf — same loudness rule as Verify's stale-output sweep
      try was match {
        case Some(v) => s.conf.set(k, v)
        case None => s.conf.unset(k)
      } catch {
        case e: Exception => System.err.println(
          s"[confs] FAILED to restore $k -> ${was.getOrElse("<unset>")}: " +
            s"${e.getMessage}; the override is LEAKED session-wide")
      }
    }
  }
}
