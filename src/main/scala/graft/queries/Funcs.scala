package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function surfaces, pivot/unpivot, UDF and generator queries
  * (SURVEY §2B q_*_funcs, q_pivot, q_unpivot, q_udf_scalar,
  * q_udtf_explode_tokens).
  *
  * All built-ins here are codegen'd Catalyst expressions; the one Scala
  * UDF (q_udf_scalar) exists to exercise the UDF surface itself. Array
  * math uses higher-order functions (transform/aggregate) — no UDF, no
  * serialization boundary in the hot path.
  */
object Funcs extends QueryGroup {

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_str_funcs",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("name_u"),
          substring(col("p_type"), 1, 3).as("type3"),
          length(col("p_name")).as("name_len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_brand"), "#(\\d+)", 1)
            .cast(IntegerType).as("brand_num"))
        .orderBy(col("p_partkey")).limit(200),
      Some("""SELECT p_partkey, upper(p_name) AS name_u,
        | substring(p_type, 1, 3) AS type3,
        | length(p_name)::INTEGER AS name_len,
        | concat_ws('-', p_brand, p_type) AS brand_type,
        | regexp_extract(p_brand, '#(\d+)', 1)::INTEGER AS brand_num
        |FROM part ORDER BY p_partkey LIMIT 200""".stripMargin)),

    QueryDef(
      // Error-safe arithmetic (added r7): the try_* family — at 100 TB
      // one malformed row must NOT kill the job (ANSI mode's default
      // throw), and silently-wrong wraparound (ANSI off) is worse;
      // try_divide/try_cast return NULL exactly where the strict op
      // would error, making bad rows COUNTABLE. Outcomes are tallied
      // as exact integers (sums of nullable doubles would reintroduce
      // float-order drift): division nulls appear exactly where
      // l_quantity = 10; the cast probe mixes always-parsable digits
      // with never-parsable letters by line-number parity.
      //
      // Perf (r10): Spark 4's TRY-mode cast takes the ANSI throw path
      // internally, so every unparsable row throws AND catches a Java
      // exception — the dominant cost of this query (~2.9 s of a 3.3 s
      // plan at sf0.1, measured with the noop sink). The probe is
      // therefore branch-split and regex-guarded: the always-parsable
      // even branch is a direct INT copy, and the stringy branch only
      // reaches try_cast when the value LOOKS numeric (so the
      // exception path fires only for numeric-looking overflow, never
      // for the common garbage case). Values are identical — try_cast
      // of a non-numeric-looking string is NULL either way (the guard
      // is conservative only on exotic non-\s control-char padding,
      // which ANSI trimAll would strip; returns NULL there, matching
      // no realistic input). 2.9 s → 0.33 s warm at sf0.1.
      "q_try_funcs",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          expr("try_divide(l_extendedprice, l_quantity - 10.0D)").as("dv"),
          expr("""CASE WHEN l_linenumber % 2 = 0 THEN l_linenumber
                 | WHEN l_returnflag RLIKE '^\\s*[+-]?[0-9]+\\s*$'
                 | THEN try_cast(l_returnflag AS INT)
                 | ELSE CAST(NULL AS INT) END""".stripMargin)
            .as("cv"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("dv").isNull, 1L).otherwise(0L)).as("n_div_null"),
          sum(when(col("cv").isNull, 1L).otherwise(0L)).as("n_cast_null"),
          sum(col("cv")).as("sum_cast"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, COUNT(*)::BIGINT AS n,
        |  SUM(CASE WHEN l_quantity = 10 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_div_null,
        |  SUM(CASE WHEN cv IS NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS n_cast_null,
        |  SUM(cv)::BIGINT AS sum_cast
        |FROM (SELECT l_returnflag, l_quantity,
        |        TRY_CAST(CASE WHEN l_linenumber % 2 = 0
        |                 THEN l_linenumber::VARCHAR
        |                 ELSE l_returnflag END AS INT) AS cv
        |      FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      // Collation-aware grouping (added r7): Spark 4's COLLATE surface
      // — case-insensitive semantics declared on the COLUMN, not
      // hand-lowered at every use site (the difference matters once
      // joins/aggs/sorts all need the same rule). The fixture is
      // uppercase-only, so mixed case is minted by key parity; the
      // UTF8_LCASE group key merges variants, and the output restates
      // the key as lower() so both engines render one canonical text
      // (the collated key's surviving representative is
      // engine-internal). The oracle states the same semantics the
      // portable way: GROUP BY lower().
      "q_str_collation",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"),
          when(col("c_custkey") % 2 === 0, lower(col("c_mktsegment")))
            .otherwise(col("c_mktsegment")).as("seg_mixed"))
        .groupBy(expr("collate(seg_mixed, 'UTF8_LCASE')").as("seg_ci"))
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast(DecimalType(14, 2)))
            .cast(DoubleType).as("sum_bal"))
        .select(lower(col("seg_ci")).as("segment"), col("n"),
          col("sum_bal"))
        .orderBy(col("segment")),
      Some("""SELECT lower(seg_mixed) AS segment, COUNT(*)::BIGINT AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS sum_bal
        |FROM (SELECT CASE WHEN c_custkey % 2 = 0
        |        THEN lower(c_mktsegment) ELSE c_mktsegment END AS seg_mixed,
        |        c_acctbal
        |      FROM customer)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "q_date_funcs",
      (s, d) => {
        val iso = (dayofweek(col("o_orderdate")) + lit(5)) % 7 + lit(1)
        Tables.orders(s, d)
          .select(year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"),
            date_trunc("month", col("o_orderdate")).cast(DateType)
              .as("month_start"),
            iso.as("dow_iso"),
            datediff(to_date(lit("1998-09-02")), to_date(col("o_orderdate")))
              .as("days_to"))
          .groupBy(col("y"), col("m"), col("month_start"))
          .agg(count(lit(1)).as("n"),
            count(when(col("dow_iso") === 1, 1)).as("n_mondays"),
            max(col("days_to")).as("max_days_to"))
          .orderBy(col("y"), col("m"))
      },
      Some("""SELECT year(o_orderdate)::INTEGER AS y,
        | month(o_orderdate)::INTEGER AS m,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        | COUNT(*)::BIGINT AS n,
        | COUNT(*) FILTER (isodow(o_orderdate) = 1)::BIGINT AS n_mondays,
        | MAX(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-09-02'))::INTEGER AS max_days_to
        |FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin)),

    QueryDef(
      "q_math_funcs",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(sum(sqrt(col("l_quantity"))), 2).as("s_sqrt"),
          round(sum(pow(col("l_discount"), 2)), 4).as("s_pow"),
          round(sum(abs(col("l_quantity"))
            + ceil(col("l_tax") * 10) + floor(col("l_discount") * 10)), 2)
            .as("s_mix"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        | ROUND(SUM(sqrt(l_quantity)), 2) AS s_sqrt,
        | ROUND(SUM(pow(l_discount, 2)), 4) AS s_pow,
        | ROUND(SUM(abs(l_quantity) + ceil(l_tax * 10) + floor(l_discount * 10)), 2) AS s_mix
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QueryDef(
      "q_array_funcs",
      (s, d) => Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).cast(DoubleType).as("e1"),
          round(sqrt(expr(
            """aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)),
              | cast(0 as double), (acc, x) -> acc + x)""".stripMargin)), 4)
            .as("l2_norm"))
        .orderBy(col("vec_id")).limit(100),
      Some("""SELECT vec_id, len(embedding)::INTEGER AS dim,
        | embedding[1]::DOUBLE AS e1,
        | ROUND(sqrt(list_aggregate(list_transform(embedding,
        |   x -> x::DOUBLE * x::DOUBLE), 'sum')), 4) AS l2_norm
        |FROM embeddings ORDER BY vec_id LIMIT 100""".stripMargin)),

    QueryDef(
      "q_json_funcs",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
        | SUM(k)::BIGINT AS sum_k, MAX(k)::BIGINT AS max_k
        |FROM (SELECT event_type,
        |        regexp_extract(props, '"k": (\d+)', 1)::BIGINT AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      // Spark 4 VARIANT path (added r7): the engine's binary
      // semi-structured type beside q_json_funcs' string-path twin —
      // parse_json materializes the variant encoding ONCE, then typed
      // extraction (variant_get) and schema introspection
      // (schema_of_variant) run on the binary form, the plan
      // production uses when the same JSON column feeds many
      // extractions (string re-parsing per path is the anti-pattern).
      // n_schemas proves the corpus is structurally uniform via
      // introspection (engines render schema strings differently, so
      // the compare is the COUNT, never the text). Map-only until the
      // per-type aggregate — one shuffle on event_type.
      "q_json_variant",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"), expr("parse_json(props)").as("v"))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'long')").as("k"),
          expr("schema_of_variant(v)").as("sch"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          countDistinct(col("sch")).as("n_schemas"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, COUNT(*)::BIGINT AS n,
        | SUM(k)::BIGINT AS sum_k, MIN(k)::BIGINT AS min_k,
        | MAX(k)::BIGINT AS max_k,
        | COUNT(DISTINCT sch)::BIGINT AS n_schemas
        |FROM (SELECT event_type,
        |        json_extract(props, '$.k')::BIGINT AS k,
        |        json_structure(props::JSON)::VARCHAR AS sch
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "q_pivot",
      (s, d) => {
        val types = Seq("click", "view", "purchase", "signup", "error")
        val p = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("d"))
          .pivot("event_type", types).count()
        p.select(col("d") +: types.map(t =>
            coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
          .orderBy(col("d"))
      },
      Some("""SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
        | COUNT(*) FILTER (event_type = 'click')::BIGINT AS n_click,
        | COUNT(*) FILTER (event_type = 'view')::BIGINT AS n_view,
        | COUNT(*) FILTER (event_type = 'purchase')::BIGINT AS n_purchase,
        | COUNT(*) FILTER (event_type = 'signup')::BIGINT AS n_signup,
        | COUNT(*) FILTER (event_type = 'error')::BIGINT AS n_error
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "q_unpivot",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          col("o_totalprice").as("price"),
          col("o_custkey").cast(DoubleType).as("custkey"))
        .unpivot(Array(col("o_orderkey")),
          Array(col("price"), col("custkey")),
          "metric_name", "metric_value")
        .orderBy(col("o_orderkey"), col("metric_name")).limit(500),
      Some("""SELECT o_orderkey, metric_name, metric_value FROM (
        | SELECT o_orderkey, 'price' AS metric_name, o_totalprice AS metric_value FROM orders
        | UNION ALL
        | SELECT o_orderkey, 'custkey', o_custkey::DOUBLE FROM orders)
        |ORDER BY o_orderkey, metric_name LIMIT 500""".stripMargin)),

    QueryDef(
      "q_udf_scalar",
      (s, d) => {
        val prioDigit = udf((p: String) => p.substring(0, 1).toInt)
        Tables.orders(s, d)
          .groupBy(prioDigit(col("o_orderpriority")).as("digit"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("digit"))
      },
      Some("""SELECT substring(o_orderpriority, 1, 1)::INTEGER AS digit,
        | COUNT(*)::BIGINT AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "q_udtf_explode_tokens",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("lang"),
            explode(split(lower(col("text")), " ")).as("token"))
          .groupBy(col("lang"), col("token"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("token").asc)
        toks.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 20)
          .select(col("lang"), col("rank"), col("token"), col("n"))
          .orderBy(col("lang"), col("rank"))
      },
      Some("""SELECT lang, rank, token, n FROM (
        | SELECT lang, token, n,
        |   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token ASC) AS rank
        | FROM (SELECT lang, token, COUNT(*)::BIGINT AS n
        |       FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS token
        |             FROM documents)
        |       GROUP BY lang, token))
        |WHERE rank <= 20 ORDER BY lang, rank""".stripMargin))
  )
}
