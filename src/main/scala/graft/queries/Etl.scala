package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ETL analogs of the reference's import pipeline (SURVEY §2A A5/A6 →
  * §2B q_etl_*): deterministic surrogate keys (the batch analog of the
  * li3ds server assigning ids, micmac_li3ds/api.py `get_or_create`
  * [unverified upstream path]) and idempotent upsert-dedup (re-importing
  * a staging slice must not duplicate — the importer's idempotence
  * contract).
  *
  * Scale: surrogate keys via dense_rank over a tiny distinct dimension
  * (shuffles only the dimension); upsert-dedup via per-key window, which
  * shuffles on the natural key — both scale with key cardinality, no
  * driver-side sequence.
  */
object Etl extends QueryGroup {

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_etl_surrogate_keys",
      (s, d) => {
        val dim = Tables.events(s, d).select(col("event_type")).distinct()
          .withColumn("sid", dense_rank().over(
            Window.orderBy(col("event_type"))))
        Tables.events(s, d).select(col("event_type"))
          .join(broadcast(dim), Seq("event_type"))
          .groupBy(col("sid"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("sid"))
      },
      Some("""SELECT sid, event_type, COUNT(*)::BIGINT AS n
        |FROM events
        |JOIN (SELECT event_type,
        |        DENSE_RANK() OVER (ORDER BY event_type)::INTEGER AS sid
        |      FROM (SELECT DISTINCT event_type FROM events)) dim
        |  USING (event_type)
        |GROUP BY sid, event_type ORDER BY sid""".stripMargin)),

    QueryDef(
      "q_etl_upsert_dedup",
      (s, d) => {
        val target = Tables.events(s, d)
        val staging = target.filter(col("event_id") % 3 === 0)
        val w = Window.partitionBy(col("event_id"))
          .orderBy(col("ts"), col("event_id"))
        target.unionByName(staging)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*)::BIGINT AS n
        |FROM (SELECT event_type,
        |        ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, event_id) AS rn
        |      FROM (SELECT * FROM events
        |            UNION ALL
        |            SELECT * FROM events WHERE event_id % 3 = 0))
        |WHERE rn = 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_etl_jdbc_sink",
      (s, d) => {
        // reference A7: POST to REST->PostgreSQL; here: real JDBC round
        // trip through embedded Derby (the only DB in this offline env)
        val url = "jdbc:derby:memory:graftdb;create=true"
        val props = new java.util.Properties()
        props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderdate"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)
          .write.mode("overwrite").jdbc(url, "orders_sink", props)
        s.read.jdbc(url, "orders_sink", props)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin))
  )
}
