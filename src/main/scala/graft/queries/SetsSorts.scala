package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Sorts, limits and set operations (SURVEY §2B q_sort_*, q_topk_limit,
  * q_set_*).
  *
  * Scale notes: a global ORDER BY is a range-partitioned sort (sampled
  * boundaries, no single-node funnel); ORDER BY + LIMIT collapses to
  * TakeOrderedAndProject — per-partition top-k then a k-row merge on the
  * driver, which is the right plan at any scale.
  */
object SetsSorts extends QueryGroup {

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_sort_multi",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_returnflag").asc, col("l_extendedprice").desc,
          col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(100),
      Some("""SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber
        |FROM lineitem
        |ORDER BY l_returnflag ASC, l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin)),

    QueryDef(
      "q_topk_limit",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    QueryDef(
      "q_set_union",
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(col("c_nationkey").as("nationkey"), lit("c").as("src"))
        val su = Tables.supplier(s, d)
          .select(col("s_nationkey").as("nationkey"), lit("s").as("src"))
        c.unionByName(su)
          .groupBy(col("nationkey"))
          .agg(count(lit(1)).as("n_all"), countDistinct(col("src")).as("n_src"))
          .orderBy(col("nationkey"))
      },
      Some("""SELECT nationkey, COUNT(*)::BIGINT AS n_all, COUNT(DISTINCT src)::BIGINT AS n_src
        |FROM (SELECT c_nationkey AS nationkey, 'c' AS src FROM customer
        |      UNION ALL
        |      SELECT s_nationkey AS nationkey, 's' AS src FROM supplier)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin)),

    QueryDef(
      "q_set_intersect",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey")),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin)),

    QueryDef(
      "q_set_except",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey")),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin)),

    QueryDef(
      // MULTISET set ops (added r7): INTERSECT ALL / EXCEPT ALL — the
      // bag-semantics twins of the three distinct-set ops above, and a
      // different operator entirely under the hood (multiplicity
      // bookkeeping: intersect-all keeps min(m_left, m_right) copies,
      // except-all max(0, m_left - m_right) — Spark plans both as
      // count-compare aggregates, not joins). Occurrence rows roll up
      // per key so the contract output is the multiplicity table
      // itself — exactly the numbers the distinct forms erase.
      "q_set_multiset",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        val su = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
        val ia = c.intersectAll(su).groupBy(col("nationkey"))
          .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
        val ea = c.exceptAll(su).groupBy(col("nationkey"))
          .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
        ia.unionByName(ea)
          .select(col("op"), col("nationkey"), col("n"))
          .orderBy(col("op"), col("nationkey"))
      },
      Some("""SELECT 'intersect_all' AS op, nationkey, COUNT(*)::BIGINT AS n
        |FROM (SELECT c_nationkey AS nationkey FROM customer
        |      INTERSECT ALL
        |      SELECT s_nationkey FROM supplier)
        |GROUP BY 2
        |UNION ALL
        |SELECT 'except_all', nationkey, COUNT(*)::BIGINT
        |FROM (SELECT c_nationkey AS nationkey FROM customer
        |      EXCEPT ALL
        |      SELECT s_nationkey FROM supplier)
        |GROUP BY 2
        |ORDER BY op, nationkey""".stripMargin))
  )
}
