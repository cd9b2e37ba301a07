package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the gate a training-data pipeline
  * runs before trusting a new drop of a table (the Deequ-shaped
  * primitive, re-expressed Spark-first).
  *
  * The API is a list of constraint declarations; `audit` compiles them
  * into the MINIMAL number of passes by evaluation strategy, which is
  * the property that matters at 100 TB:
  *
  *  - every row-local check (not-null, range, set membership) fuses
  *    into ONE aggregate over ONE scan — `sum(case when violated)` per
  *    check, all map-side combinable, so auditing 50 row-local
  *    constraints costs exactly one pass, not 50;
  *  - each uniqueness check is one hash aggregate on its key (the
  *    shuffle is irreducible — duplicate detection is a global
  *    property of the key);
  *  - each foreign-key check is one LEFT ANTI join against the
  *    referenced keys (null FKs are NOT violations, per SQL semantics
  *    — declare a separate NotNull if nulls are illegal).
  *
  * The report is one row per declared check: (chk, n_bad), total rows
  * = number of checks — metadata-sized whatever the table size.
  */
object DataChecks {

  sealed trait Check { def label: String }

  /** Violated by rows where `col` IS NULL. */
  final case class NotNull(colName: String) extends Check {
    def label = s"not_null($colName)"
  }

  /** Violated by non-null values outside [lo, hi]. NULL passes —
    * range semantics on unknown is unknown, not failure. */
  final case class InRange(colName: String, lo: Double, hi: Double)
      extends Check {
    def label = s"in_range($colName)"
  }

  /** Violated by non-null values not in `values`. A NULL in `values`
    * is rejected at declaration: under three-valued logic `x IN
    * (..., NULL)` is NULL for every non-member, `!NULL` is NULL, and
    * the violation counter would silently report 0 for EVERY bad row
    * — SQL's NULL never equals anything, so it cannot be a set
    * member either. */
  final case class InSet(colName: String, values: Seq[String])
      extends Check {
    require(!values.contains(null),
      s"in_set($colName): NULL is not a legal set member — it would " +
        "null the IN predicate and count every violation as passing; " +
        "use a separate NotNull/nullable policy instead")
    def label = s"in_set($colName)"
  }

  /** Violated once per key VALUE that occurs more than once (n_bad
    * counts duplicated keys, not duplicated rows — the actionable
    * number: how many entities need repair). NULL policy, stated
    * because it differs from SQL's UNIQUE constraint: NULL counts as
    * a key value, so two NULL-keyed rows ARE one duplicated key. An
    * audit exists to surface suspect entities, and a pile of
    * null-keyed rows is exactly that (same posture as FrameGraph's
    * null_key edge kind); callers wanting ANSI multiple-NULLs-allowed
    * semantics should pre-filter the frame on key IS NOT NULL. */
  final case class Unique(colNames: Seq[String]) extends Check {
    def label = s"unique(${colNames.mkString(",")})"
  }

  /** Violated by rows whose non-null `colName` has no match in
    * `dim.dimCol`. */
  final case class ForeignKey(colName: String, dim: DataFrame,
      dimCol: String) extends Check {
    def label = s"fk($colName)"
  }

  /** Compile the checks and run them. Returns (chk STRING,
    * n_bad BIGINT), one row per check, unordered — callers sort. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    // the report is unordered and keyed by label: two checks sharing a
    // label (e.g. two InRange on one column) would return two
    // indistinguishable rows the caller cannot join back to intent
    val dup = checks.groupBy(_.label).collect { case (l, cs) if cs.size > 1 => l }
    require(dup.isEmpty,
      s"audit: duplicate check labels ${dup.mkString(", ")} — the " +
        "unordered report cannot distinguish them; merge or split the " +
        "declarations")

    val rowLocal: Seq[(String, org.apache.spark.sql.Column)] =
      checks.collect {
        case c: NotNull => c.label -> col(c.colName).isNull
        case c: InRange => c.label ->
          (col(c.colName).isNotNull &&
            (col(c.colName) < c.lo || col(c.colName) > c.hi))
        case c: InSet => c.label ->
          (col(c.colName).isNotNull && !col(c.colName).isin(c.values: _*))
      }

    val branches = Seq.newBuilder[DataFrame]

    if (rowLocal.nonEmpty) {
      // one aggregate, one scan, N fused violation counters
      val sums = rowLocal.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(pred, 1L).otherwise(0L)).as(s"_c$i")
      }
      val agged = df.agg(sums.head, sums.tail: _*)
      val kvs = rowLocal.zipWithIndex.map { case ((label, _), i) =>
        struct(lit(label).as("chk"),
          coalesce(col(s"_c$i"), lit(0L)).as("n_bad"))
      }
      branches += agged
        .select(explode(array(kvs: _*)).as("kv"))
        .select(col("kv.chk").as("chk"), col("kv.n_bad").as("n_bad"))
    }

    checks.foreach {
      case c: Unique =>
        branches += df.groupBy(c.colNames.map(col): _*)
          .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
          .agg(count(lit(1)).as("n_bad"))
          .select(lit(c.label).as("chk"), col("n_bad"))
      case c: ForeignKey =>
        branches += df.filter(col(c.colName).isNotNull)
          .join(c.dim.select(col(c.dimCol).as("_ref")),
            col(c.colName) === col("_ref"), "left_anti")
          .agg(count(lit(1)).as("n_bad"))
          .select(lit(c.label).as("chk"), col("n_bad"))
      case _ => // row-local, already fused above
    }

    branches.result().reduce(_ unionByName _)
  }
}
