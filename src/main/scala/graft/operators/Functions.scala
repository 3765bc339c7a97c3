package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.8 F1–F9 + §2.11 X1–X3: scalar function surface (string,
  * regexp, date, math, array, JSON, hash) and the Hive UDF/UDAF/UDTF
  * extension points mapped to Spark (`udf`, `Aggregator`, `posexplode`).
  *
  * All functions here are Catalyst built-ins (whole-stage-codegen'd); the UDF
  * queries exist to cover Hive's extension surface, with the note that
  * built-in expressions are always preferred in hot paths (SURVEY §4.2).
  * Transcendentals (ln/exp/pow) are rounded to 6 decimals in both engines —
  * libm implementations differ by ≤1 ulp between JVM and DuckDB.
  */
object Functions {

  val queries: Map[String, Q] = Map(
    // F1: core string functions.
    "q_str_funcs" -> ((s, dir) => {
      T.customer(s, dir).select(
        col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        substring(col("c_name"), 10, 9).as("id_part"),
        length(col("c_name")).as("len"),
        concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cat"),
        regexp_replace(col("c_name"), lit("Customer"), lit("Cust")).as("repl"),
        lpad(col("c_custkey").cast("string"), 6, "0").as("padded"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"),
        // joined to a string (not a raw array) so the driver's pandas-based
        // hash compare can sort the column.
        array_join(split(col("c_name"), "#"), "|").as("parts"))
    }),

    // F2: regexp extract / match / replace (POSIX-overlap patterns only).
    "q_regexp" -> ((s, dir) => {
      T.customer(s, dir).select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "Customer#(\\d+)", 1).as("digits"),
        col("c_name").rlike("00$").as("ends_00"),
        regexp_replace(col("c_name"), "0+", "0").as("squeezed"))
    }),

    // F3: date/time functions.
    "q_date_funcs" -> ((s, dir) => {
      val o = T.orders(s, dir).withColumn("od", col("o_orderdate").cast("date"))
      o.select(
        col("o_orderkey"),
        year(col("od")).as("y"),
        month(col("od")).as("m"),
        dayofmonth(col("od")).as("d"),
        quarter(col("od")).as("q"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        date_add(col("od"), 30).as("plus30"),
        datediff(col("od"), lit("1995-01-01").cast("date")).as("days_since"))
    }),

    // F4: math functions (sqrt is IEEE-exact; ln/exp/pow rounded).
    "q_math_funcs" -> ((s, dir) => {
      T.lineitem(s, dir).filter(col("l_orderkey") < 100).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        ceil(col("l_extendedprice")).as("ceil_p"),
        floor(col("l_extendedprice")).as("floor_p"),
        (col("l_orderkey") % 7).as("mod7"),
        round(pow(col("l_quantity"), 2), 6).as("qty_sq"),
        sqrt(col("l_extendedprice")).as("sqrt_p"),
        round(log(col("l_extendedprice")), 6).as("ln_p"),
        round(exp(col("l_discount")), 6).as("exp_d"))
    }),

    // F5: array functions over the embedding column.
    "q_array_funcs" -> ((s, dir) => {
      T.embeddings(s, dir).select(
        col("vec_id"),
        size(col("embedding")).as("n_dims"),
        element_at(col("embedding"), 1).as("first_v"),
        element_at(col("embedding"), 64).as("last_v"),
        array_min(col("embedding")).as("min_v"),
        array_max(col("embedding")).as("max_v"))
    }),

    // F7: JSON extraction from string columns.
    "q_json_funcs" -> ((s, dir) => {
      T.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"))
    }),

    // F7b: the same extractions through Spark 4's VARIANT type — parse the
    // JSON text ONCE into the binary variant encoding, then typed
    // variant_get paths. At 100 TB the parse-once + shredded-binary layout
    // is the semi-structured scale path (vs re-parsing text per extraction,
    // as get_json_object does).
    "q_variant" -> ((s, dir) => {
      T.events(s, dir)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k_int"),
          expr("variant_get(v, '$.k', 'string')").as("k_str"))
    }),

    // F6: map functions, oracle-checked — the map is DERIVED in-query from
    // document columns (testdata carries no map column), then every major
    // map op (map_keys, element_at, map_contains_key, size, map_concat,
    // map_filter, transform_values, map_entries) lands in a deterministic
    // scalar that DuckDB re-derives with ITS map type. Per-row codegen'd
    // expressions, zero shuffle.
    "q_map_funcs" -> ((s, dir) => {
      val m = map(
        lit("lang"), col("lang"),
        lit("src"), col("source"),
        lit("n"), col("n_chars").cast("string"))
      T.documents(s, dir).select(
        col("doc_id"),
        array_join(array_sort(map_keys(m)), ",").as("keys"),
        element_at(m, "lang").as("lang_v"),
        map_contains_key(m, "src").cast("int").as("has_src"),
        size(m).cast("int").as("n_keys"),
        element_at(transform_values(m, (_, v) => upper(v)), "src")
          .as("upper_src"),
        array_join(array_sort(
          map_keys(map_filter(m, (k, _) => k =!= "n"))), ",").as("keep_keys"),
        element_at(map_concat(m, map(lit("extra"), lit("x"))), "extra")
          .as("merged"),
        array_join(array_sort(transform(map_entries(m),
          e => concat(e.getField("key"), lit(":"), e.getField("value")))),
          "|").as("entries"))
    }),

    // F9: cryptographic/hash functions (md5/sha2 shared with DuckDB).
    "q_hash_funcs" -> ((s, dir) => {
      T.customer(s, dir).select(
        col("c_custkey"),
        md5(col("c_name")).as("md5_name"),
        sha2(col("c_name"), 256).as("sha256_name"))
    }),

    // X1: scalar UDF surface (Hive UDF → Spark udf); oracle inlines formula.
    "q_udf_scalar" -> ((s, dir) => {
      val marginCents = udf((p: Double, d: Double) =>
        math.floor((p * (1.0 - d)) * 100).toLong)
      T.lineitem(s, dir).filter(col("l_orderkey") < 100).select(
        col("l_orderkey"), col("l_linenumber"),
        marginCents(col("l_extendedprice"), col("l_discount")).as("margin_c"))
    }),

    // X2: UDAF surface (Hive UDAF → typed Aggregator, see functions.GeoMean).
    "q_udaf_geomean" -> ((s, dir) => {
      val geomean = udaf(graft.functions.GeoMean)
      T.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(round(geomean(col("l_quantity")), 6).as("geo_qty"))
    }),

    // X3: UDTF/generator surface — posexplode of an array column.
    "q_explode" -> ((s, dir) => {
      T.embeddings(s, dir).filter(col("vec_id") < 5)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT c_custkey,
        |  upper(c_name) AS up, lower(c_mktsegment) AS lo,
        |  substr(c_name, 10, 9) AS id_part,
        |  CAST(length(c_name) AS INTEGER) AS len,
        |  c_name || '-' || c_mktsegment AS cat,
        |  replace(c_name, 'Customer', 'Cust') AS repl,
        |  lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS padded,
        |  trim('  ' || c_mktsegment || '  ') AS trimmed,
        |  array_to_string(string_split(c_name, '#'), '|') AS parts
        |FROM customer ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_regexp" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, 'Customer#(\d+)', 1) AS digits,
        |  regexp_matches(c_name, '00$') AS ends_00,
        |  regexp_replace(c_name, '0+', '0', 'g') AS squeezed
        |FROM customer ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS abs_d,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
        |  l_orderkey % 7 AS mod7,
        |  round(pow(l_quantity, 2), 6) AS qty_sq,
        |  sqrt(l_extendedprice) AS sqrt_p,
        |  round(ln(l_extendedprice), 6) AS ln_p,
        |  round(exp(l_discount), 6) AS exp_d
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS n_dims,
        |  embedding[1] AS first_v,
        |  embedding[64] AS last_v,
        |  list_aggregate(embedding, 'min') AS min_v,
        |  list_aggregate(embedding, 'max') AS max_v
        |FROM embeddings ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
        |FROM events ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  json_extract_string(props, '$.k') AS k_str
        |FROM events ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_map_funcs" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    MAP(['lang', 'src', 'n'],
        |        [lang, source, CAST(n_chars AS VARCHAR)]) AS m
        |  FROM documents)
        |SELECT doc_id,
        |  array_to_string(list_sort(map_keys(m)), ',') AS keys,
        |  m['lang'][1] AS lang_v,
        |  CAST(CASE WHEN len(map_extract(m, 'src')) > 0 THEN 1 ELSE 0 END AS INTEGER) AS has_src,
        |  CAST(cardinality(m) AS INTEGER) AS n_keys,
        |  upper(m['src'][1]) AS upper_src,
        |  array_to_string(list_sort(list_filter(map_keys(m), k -> k != 'n')), ',') AS keep_keys,
        |  map_concat(m, MAP(['extra'], ['x']))['extra'][1] AS merged,
        |  array_to_string(list_sort(list_transform(map_entries(m),
        |    e -> e.key || ':' || e.value)), '|') AS entries
        |FROM d ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_hash_funcs" ->
      """SELECT c_custkey, md5(c_name) AS md5_name, sha256(c_name) AS sha256_name
        |FROM customer ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_udf_scalar" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(FLOOR((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT) AS margin_c
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_udaf_geomean" ->
      """SELECT l_returnflag, round(exp(avg(ln(l_quantity))), 6) AS geo_qty
        |FROM lineitem GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_explode" ->
      """SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos, embedding[i] AS val
        |FROM embeddings, generate_series(1, 64) t(i)
        |WHERE vec_id < 5 ORDER BY ALL NULLS FIRST""".stripMargin
  )
}
