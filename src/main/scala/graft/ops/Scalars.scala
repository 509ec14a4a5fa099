package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** Scalar-function battery: string / date / math / JSON (SURVEY.md §2c
  * "string functions", "date / math / array / map / JSON scalar fns").
  * The reference's only scalar ops are `std::string::find`/`compare`
  * (SearchMRC.cpp:87,30-32); everything here is the Catalyst built-in
  * surface a user of that model needs. All functions chosen are
  * whole-stage-codegen'd, and all are cross-engine exact (no libm
  * transcendentals in oracle-checked output; sqrt IS exact per IEEE-754).
  */
object Scalars {

  val queries: Map[String, Q] = Map(
    "q_string_funcs" -> ((s, dir) => {
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          lower(col("p_brand")).as("lbrand"),
          length(col("p_name")).as("name_len"),
          split(col("p_name"), " ").getItem(0).as("first_tok"),
          substring(col("p_name"), 1, 5).as("prefix5"),
          regexp_replace(col("p_name"), "widget", "gadget").as("replaced"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          instr(col("p_name"), "o").as("pos_o"),
          col("p_name").like("%bolt%").as("is_bolt"),
          lpad(col("p_brand"), 12, "#").as("padded"),
          reverse(col("p_type")).as("rev_type"),
          trim(lit("  x  ")).as("trimmed"))
        .orderBy("p_partkey")
    }),

    "q_date_funcs" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          dayofweek(col("o_orderdate")).as("dow"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_trunc("quarter", col("o_orderdate")).as("q_start"),
          last_day(col("o_orderdate")).as("month_end"),
          datediff(lit("2002-01-01").cast("timestamp"), col("o_orderdate"))
            .as("days_to_2002"))
        .orderBy("o_orderkey")
    }),

    "q_math_funcs" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_orderkey") < 500)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_extendedprice") - 50000).as("abs_dev"),
          ceil(col("l_quantity") / 7).as("ceil_q7"),
          floor(col("l_quantity") / 7).as("floor_q7"),
          round(col("l_extendedprice") / 1000, 2).as("price_k"),
          sqrt(col("l_quantity")).as("sqrt_q"),
          (col("l_orderkey") % 7).as("mod7"),
          greatest(col("l_discount"), col("l_tax")).as("max_rate"),
          least(col("l_discount"), col("l_tax")).as("min_rate"),
          signum(col("l_extendedprice") - 50000).as("sign_dev"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Array + map function battery over the token array (higher-order
    // functions run inside whole-stage codegen — no UDF, no shuffle).
    "q_array_funcs" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(
          col("doc_id"),
          size(col("t")).as("n_tok"),
          concat_ws(" ", slice(col("t"), 1, 3)).as("first3"),
          array_contains(col("t"), "select").as("has_select"),
          array_min(col("t")).as("min_tok"),
          array_max(col("t")).as("max_tok"),
          size(array_distinct(col("t"))).as("n_uniq"),
          array_position(col("t"), "from").as("pos_from"),
          expr("map('len', size(t), 'uniq', size(array_distinct(t)))['uniq']")
            .as("map_uniq"))
        .orderBy("doc_id")
    }),

    // JSON extraction from the events.props payload column.
    "q_json" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k").cast("long")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    }))

  val oracles: Map[String, String] = Map(
    "q_string_funcs" -> """
      SELECT p_partkey,
        upper(p_name) AS uname,
        lower(p_brand) AS lbrand,
        CAST(length(p_name) AS INT) AS name_len,
        string_split(p_name, ' ')[1] AS first_tok,
        substring(p_name, 1, 5) AS prefix5,
        regexp_replace(p_name, 'widget', 'gadget') AS replaced,
        concat_ws('|', p_brand, p_type) AS brand_type,
        CAST(instr(p_name, 'o') AS INT) AS pos_o,
        p_name LIKE '%bolt%' AS is_bolt,
        lpad(p_brand, 12, '#') AS padded,
        reverse(p_type) AS rev_type,
        trim('  x  ') AS trimmed
      FROM part ORDER BY p_partkey""",
    "q_date_funcs" -> """
      SELECT o_orderkey,
        CAST(year(o_orderdate) AS INT) AS yr,
        CAST(month(o_orderdate) AS INT) AS mo,
        CAST(dayofmonth(o_orderdate) AS INT) AS dom,
        CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        date_trunc('month', o_orderdate) AS month_start,
        date_trunc('quarter', o_orderdate) AS q_start,
        last_day(o_orderdate) AS month_end,
        CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_2002
      FROM orders ORDER BY o_orderkey""",
    "q_math_funcs" -> """
      SELECT l_orderkey, l_linenumber,
        abs(l_extendedprice - 50000) AS abs_dev,
        CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil_q7,
        CAST(floor(l_quantity / 7) AS BIGINT) AS floor_q7,
        round(l_extendedprice / 1000, 2) AS price_k,
        sqrt(l_quantity) AS sqrt_q,
        l_orderkey % 7 AS mod7,
        greatest(l_discount, l_tax) AS max_rate,
        least(l_discount, l_tax) AS min_rate,
        CAST(sign(l_extendedprice - 50000) AS DOUBLE) AS sign_dev
      FROM lineitem WHERE l_orderkey < 500
      ORDER BY l_orderkey, l_linenumber""",
    "q_array_funcs" -> """
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      SELECT doc_id,
        CAST(len(t) AS INT) AS n_tok,
        array_to_string(t[1:3], ' ') AS first3,
        list_contains(t, 'select') AS has_select,
        list_min(t) AS min_tok,
        list_max(t) AS max_tok,
        CAST(len(list_distinct(t)) AS INT) AS n_uniq,
        CAST(list_position(t, 'from') AS BIGINT) AS pos_from,
        (map(['len', 'uniq'],
             [CAST(len(t) AS INT), CAST(len(list_distinct(t)) AS INT)])['uniq'])[1]
          AS map_uniq
      FROM d ORDER BY doc_id""",
    "q_json" -> """
      SELECT event_type, count(*) AS n,
        CAST(sum(k) AS BIGINT) AS sum_k,
        min(k) AS min_k, max(k) AS max_k
      FROM (SELECT event_type,
              CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events)
      GROUP BY event_type ORDER BY event_type""")
}
