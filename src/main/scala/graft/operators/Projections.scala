package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.3 — projections / scalar functions: the AQL `SELECT` expression
  * surface (arithmetic, CASE, JSON payload access, string/date/math/array
  * functions, string interpolation, multi-emission via explode).
  *
  * Everything here is built-in Catalyst expressions — fully codegen'd, no
  * UDFs — so whole-stage codegen fuses scan→project→sort into one pipeline.
  */
object Projections {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // + - * / % — ConstantFolding collapses the literal parts.
    // floor() before the int cast: Spark CAST(double AS int) truncates
    // while DuckDB rounds, so align on floor (quantities are integral).
    // net_price rounds to 6 (not 4): the product of three 2-decimal
    // factors has exactly 6 decimal digits, so round-4 hits exact .5
    // halfway points where Spark (decimal HALF_UP) and DuckDB (binary
    // double) disagree; round-6 lands on the value's own grid.
    "q20_proj_arith" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("net_price"),
          (floor(col("l_quantity")).cast("long") % 7).as("qty_mod"))
        .orderBy("l_orderkey", "l_linenumber", "net_price", "qty_mod")),

    // CASE … => … ENDCASE
    "q21_proj_case" -> ((s, d) =>
      Tables.events(s, d)
        .select(
          when(col("value") < 50, "small")
            .when(col("value") < 150, "mid")
            .otherwise("large").as("tier"),
          col("value"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .orderBy("tier")),

    // payload access _.k as a typed value, aggregated per tag
    "q22_proj_json" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(sum("k").cast("long").as("sum_k"), round(avg("k"), 4).as("avg_k"))
        .orderBy("event_type")),

    // dynamic-object access: props as MapType, histogram of ['k']
    "q23_json_map" -> ((s, d) =>
      Tables.events(s, d)
        .select(from_json(col("props"), lit("map<string,int>")).getItem("k").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k")),

    "q24_str_funcs" -> ((s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_name")).as("lo"),
          substring(col("c_name"), 1, 5).as("prefix"),
          trim(col("c_name")).as("trimmed"),
          length(col("c_name")).cast("long").as("name_len"),
          concat(col("c_name"), lit("-"), col("c_mktsegment")).as("tagged"))
        .orderBy("c_custkey")),

    // AQL `{…}` string interpolation ("<name> from <nation>")
    "q25_str_interp" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .select(col("c_custkey"), concat(col("c_name"), lit(" from "), col("n_name")).as("label"))
        .orderBy("c_custkey")
    }),

    // datetime family over o_orderdate (TimestampType µs on both engines).
    // DuckDB dayofweek is Sunday=0; Spark dayofweek is Sunday=1 → SQL adds 1.
    "q26_date_funcs" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"),
          unix_micros(date_trunc("month", col("o_orderdate"))).as("month_start_us"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"))
        .orderBy("o_orderkey")),

    "q27_math_funcs" -> ((s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          round(col("value"), 2).as("r2"),
          round(abs(col("value") - 100), 4).as("abs_c"),
          ceil(col("value")).cast("long").as("ce"),
          floor(col("value")).cast("long").as("fl"),
          round(sqrt(col("value")), 4).as("sq"),
          round(log(col("value") + 1), 4).as("ln1p"),
          round(pow(col("value"), 2), 4).as("p2"))
        .orderBy("event_id")),

    "q28_array_funcs" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          split(col("text"), " ").as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          array_contains(col("toks"), "join").as("has_join"),
          array_join(slice(col("toks"), 1, 3), " ").as("first3"),
          array_min(col("toks")).as("min_tok"))
        .orderBy("doc_id")),

    // UDTF-shape multi-emission: explode part-name tokens, top-20.
    "q29_explode_words" -> ((s, d) =>
      Tables.part(s, d)
        .select(explode(split(col("p_name"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20))
  )

  val oracle: Map[String, String] = Map(
    "q20_proj_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS net_price,
        |  CAST(floor(l_quantity) AS BIGINT) % 7 AS qty_mod
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price, qty_mod""".stripMargin,
    "q21_proj_case" ->
      """SELECT CASE WHEN value < 50 THEN 'small' WHEN value < 150 THEN 'mid'
        |            ELSE 'large' END AS tier,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1 ORDER BY tier""".stripMargin,
    "q22_proj_json" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q23_json_map" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,
    "q24_str_funcs" ->
      """SELECT c_custkey, upper(c_name) AS up, lower(c_name) AS lo,
        |  substring(c_name, 1, 5) AS prefix, trim(c_name) AS trimmed,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  c_name || '-' || c_mktsegment AS tagged
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q25_str_interp" ->
      """SELECT c_custkey, c_name || ' from ' || n_name AS label
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin,
    "q26_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |  epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
        |  CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q27_math_funcs" ->
      """SELECT event_id, round(value, 2) AS r2, round(abs(value - 100), 4) AS abs_c,
        |  CAST(ceil(value) AS BIGINT) AS ce, CAST(floor(value) AS BIGINT) AS fl,
        |  round(sqrt(value), 4) AS sq, round(ln(value + 1), 4) AS ln1p,
        |  round(pow(value, 2), 4) AS p2
        |FROM events ORDER BY event_id""".stripMargin,
    "q28_array_funcs" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  list_contains(string_split(text, ' '), 'join') AS has_join,
        |  array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
        |  list_min(string_split(text, ' ')) AS min_tok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q29_explode_words" ->
      """SELECT token, count(*) AS cnt
        |FROM (SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin
  )
}
