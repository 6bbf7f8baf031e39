package graft.operators

import graft.core._
import graft.core.Casts._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function families — SURVEY.md §2.8 rows F1–F6 (string, date,
  * math, array, map, JSON). One showcase query per family; every function
  * is codegen'd builtin (no UDFs anywhere — SURVEY §4).
  *
  * Cross-engine notes baked in:
  *  - DuckDB `year()` returns BIGINT → Spark side casts to long;
  *  - Spark `dayofweek` is 1-based (Sun=1), DuckDB `dayofweek` 0-based;
  *  - `date_trunc` returns DATE in DuckDB → use Spark `trunc` (also DATE);
  *  - double `round` is half-away-from-zero in both;
  *  - transcendentals (ln/exp on arbitrary doubles) are libm-dependent →
  *    only exact cases (power of 2) appear in oracled outputs.
  */
object FnOps extends QueryModule {

  /** F1: string family over part names. */
  val f1String = QueryDef(
    "f1_string_family",
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("name_lc"),
          upper(col("p_brand")).as("brand_uc"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_name"), 1, 4).as("name_head"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("name_devowel"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          split(col("p_name"), " ").getItem(1).as("second_word"),
          levenshtein(col("p_name"), col("p_type")).cast("long").as("lev_to_type"),
        )
        .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey,
        lower(p_name) AS name_lc,
        upper(p_brand) AS brand_uc,
        CAST(length(p_name) AS BIGINT) AS name_len,
        substring(p_name, 1, 4) AS name_head,
        concat_ws('|', p_brand, p_type) AS brand_type,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devowel,
        regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        string_split(p_name, ' ')[2] AS second_word,
        CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev_to_type
      FROM part
      ORDER BY p_partkey
    """.stripMargin.trim),
  )

  /** F1b: second string batch — padding, translate, search, repetition. */
  val f1bStringMore = QueryDef(
    "f1b_string_extended",
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("brand_lpad"),
          rpad(col("p_type"), 10, ".").as("type_rpad"),
          translate(col("p_type"), "AEO", "aeo").as("type_translated"),
          instr(col("p_name"), "o").cast("long").as("first_o"),
          repeat(lit("-"), (col("p_size") % 5 + 1).cast("int")).as("dashes"),
          reverse(col("p_name")).as("name_rev"),
          substring(col("p_name"), 1, 2).as("name_left2"),
        )
        .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey,
        lpad(p_brand, 12, '*') AS brand_lpad,
        rpad(p_type, 10, '.') AS type_rpad,
        translate(p_type, 'AEO', 'aeo') AS type_translated,
        CAST(instr(p_name, 'o') AS BIGINT) AS first_o,
        repeat('-', CAST(p_size % 5 + 1 AS INTEGER)) AS dashes,
        reverse(p_name) AS name_rev,
        left(p_name, 2) AS name_left2
      FROM part
      ORDER BY p_partkey
    """.stripMargin.trim),
  )

  /** F2b: second date batch — calendar boundaries and ordinals. */
  val f2bDatetimeMore = QueryDef(
    "f2b_datetime_extended",
    (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          last_day(col("o_orderdate")).cast(TimestampNTZType).as("month_end"),
          weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          (col("o_orderdate") + expr("INTERVAL 45 DAY")).as("plus_45d"),
          (col("o_orderdate") - expr("INTERVAL 1 WEEK")).as("minus_1w"),
        )
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
        CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
        weekofyear(o_orderdate) AS iso_week,
        dayofyear(o_orderdate) AS doy,
        o_orderdate + INTERVAL 45 DAY AS plus_45d,
        o_orderdate - INTERVAL 1 WEEK AS minus_1w
      FROM orders
      ORDER BY o_orderkey
    """.stripMargin.trim),
  )

  /** F2: date/time family over order dates (NTZ end-to-end, R4). */
  val f2Datetime = QueryDef(
    "f2_datetime_family",
    (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          col("o_orderdate"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          dayofweek(col("o_orderdate")).cast("long").as("dow1"),
          // NTZ cast like f2b's last_day: Spark's date_trunc returns
          // session-local TIMESTAMP (LTZ), the registry's lone raw LTZ
          // output — its dump schema depended on which parquet physical
          // type erases the tz flag, which is exactly what broke r17
          // when a staged write's INT64-micros conf leaked (verdict #1).
          // Values are unchanged (session tz is UTC end to end).
          date_trunc("month", col("o_orderdate")).cast(TimestampNTZType).as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01 00:00:00").cast(TimestampNTZType)).cast("long").as("days_since_epoch95"),
          (col("o_orderdate") + expr("INTERVAL 3 MONTH")).as("plus_3mo"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"),
        )
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
        o_orderdate,
        year(o_orderdate) AS yr,
        month(o_orderdate) AS mo,
        quarter(o_orderdate) AS qtr,
        dayofweek(o_orderdate) + 1 AS dow1,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch95,
        o_orderdate + INTERVAL 3 MONTH AS plus_3mo,
        strftime(o_orderdate, '%Y-%m-%d') AS iso_day
      FROM orders
      ORDER BY o_orderkey
    """.stripMargin.trim),
  )

  /** F3: math family — decimal round (exact), IEEE-exact sqrt, integer
    * power. */
  val f3Math = QueryDef(
    "f3_math_family",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(dec2("l_extendedprice") * lit(7), 1).cast("double").as("price7_r1"),
          abs(dec2("l_quantity") - lit(25)).cast("double").as("qty_dev"),
          ceil(col("l_quantity")).cast("long").as("qty_ceil"),
          floor(col("l_quantity") / 2).cast("long").as("qty_half_floor"),
          sqrt(col("l_quantity")).as("qty_sqrt"),
          signum(col("l_discount") - lit(0.05)).cast("long").as("disc_sign"),
          pow(lit(2.0), col("l_linenumber")).as("pow2_line"),
        )
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_linenumber,
        CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * 7, 1) AS DOUBLE) AS price7_r1,
        CAST(abs(CAST(l_quantity AS DECIMAL(12,2)) - 25) AS DOUBLE) AS qty_dev,
        CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        CAST(floor(l_quantity / 2) AS BIGINT) AS qty_half_floor,
        sqrt(l_quantity) AS qty_sqrt,
        CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign,
        power(2.0, l_linenumber) AS pow2_line
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber
    """.stripMargin.trim),
  )

  /** F4: array family — tokenized document text, projected to scalars so
    * the compare hashes plain columns. */
  val f4Array = QueryDef(
    "f4_array_family",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).cast("long").as("n_toks"),
          array_join(slice(col("toks"), 1, 3), "_").as("head3"),
          array_contains(col("toks"), "data").as("has_data"),
          element_at(array_sort(col("toks")), 1).as("first_sorted"),
          array_join(transform(slice(col("toks"), 1, 2), x => upper(x)), "+").as("head2_uc"),
        )
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        array_to_string(list_slice(string_split(text, ' '), 1, 3), '_') AS head3,
        list_contains(string_split(text, ' '), 'data') AS has_data,
        list_sort(string_split(text, ' '))[1] AS first_sorted,
        array_to_string(list_transform(list_slice(string_split(text, ' '), 1, 2), x -> upper(x)), '+') AS head2_uc
      FROM documents
      ORDER BY doc_id
    """.stripMargin.trim),
  )

  /** F4b: array set-algebra family — union/intersect/except/flatten/
    * sequence over tokenized text, projected to scalars (list-typed
    * outputs hash differently per engine). */
  val f4bArraySets = QueryDef(
    "f4b_array_sets",
    (s, d) => {
      val toksA = array_distinct(split(col("text"), " "))
      val stop = array(lit("a"), lit("the"))
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(array_union(toksA, stop)).cast("long").as("n_union_stop"),
          size(array_intersect(toksA, stop)).cast("long").as("n_stop_present"),
          size(array_except(toksA, stop)).cast("long").as("n_content"),
          size(flatten(array(toksA, stop))).cast("long").as("n_flat"),
          size(sequence(lit(1), col("n_chars") % 10 + 1)).cast("long").as("n_seq"),
        )
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, n_chars, list_distinct(string_split(text, ' ')) AS toks
        FROM documents
      )
      SELECT doc_id,
        CAST(len(list_distinct(list_concat(toks, ['a','the']))) AS BIGINT) AS n_union_stop,
        CAST(len(list_intersect(toks, ['a','the'])) AS BIGINT) AS n_stop_present,
        CAST(len(list_filter(toks, x -> NOT list_contains(['a','the'], x))) AS BIGINT) AS n_content,
        CAST(len(toks) + 2 AS BIGINT) AS n_flat,
        CAST(len(generate_series(1, n_chars % 10 + 1)) AS BIGINT) AS n_seq
      FROM t
      ORDER BY doc_id
    """.stripMargin.trim),
  )

  /** F5: map family — per-user map of event_type→count built with
    * map_from_entries, then element_at lookups. The map is internal;
    * the output is scalar so it oracles cleanly. */
  val f5Map = QueryDef(
    "f5_map_family",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("n")))).as("m"))
        .select(
          col("user_id"),
          // try_element_at: plain element_at throws on a missing key under
          // Spark 4's default ANSI mode — a user with no clicks must yield 0
          coalesce(expr("try_element_at(m, 'click')"), lit(0L)).as("n_click"),
          coalesce(expr("try_element_at(m, 'purchase')"), lit(0L)).as("n_purchase"),
          size(map_keys(col("m"))).cast("long").as("n_types"),
        )
        .orderBy("user_id"),
    Some("""
      SELECT user_id,
        count(*) FILTER (WHERE event_type = 'click') AS n_click,
        count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        count(DISTINCT event_type) AS n_types
      FROM events
      GROUP BY user_id
      ORDER BY user_id
    """.stripMargin.trim),
  )

  /** F6: JSON — extract `props.k` from the events payload, aggregate per
    * event type. */
  val f6Json = QueryDef(
    "f6_json",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(
          sum(col("k")).as("sum_k"),
          count(col("k")).as("n_with_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
        )
        .orderBy("event_type"),
    Some("""
      SELECT event_type,
        CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
        min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """.stripMargin.trim),
  )

  /** F7: null-handling family — nullif to introduce nulls, coalesce /
    * conditional fallbacks to absorb them, null-aware counts. */
  val f7Null = QueryDef(
    "f7_null_family",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_returnflag"), lit("N")).as("flag_or_null"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_filled"),
          when(col("l_quantity") > 25, col("l_quantity")).otherwise(lit(null)).cast("double").as("big_qty_or_null"),
          (nullif(col("l_returnflag"), lit("N")).isNull).as("was_nulled"),
        )
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_linenumber,
        nullif(l_returnflag, 'N') AS flag_or_null,
        coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_filled,
        CASE WHEN l_quantity > 25 THEN l_quantity ELSE NULL END AS big_qty_or_null,
        nullif(l_returnflag, 'N') IS NULL AS was_nulled
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber
    """.stripMargin.trim),
  )

  /** F8: HIGHER-ORDER FUNCTIONS as a first-class family — the lambda
    * surface (`transform`/`filter`/`exists`/`forall`/`aggregate`/
    * `zip_with`) that replaces per-row UDFs with codegen'd array
    * kernels; the whole pipeline below runs inside one projection with
    * no explode/shuffle and would map over a 100 TB corpus unchanged.
    * All reductions are INTEGER (token lengths cast long before any
    * product/sum) so both engines agree bit-for-bit. DuckDB twins:
    * list_transform / list_filter / list_reduce / list_zip. */
  val f8HigherOrder = QueryDef(
    "f8_higher_order",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("lens", transform(col("toks"), x => length(x).cast("long")))
        .select(
          col("doc_id"),
          size(col("toks")).cast("long").as("n_toks"),
          size(filter(col("lens"), _ > 5L)).cast("long").as("n_long"),
          exists(col("toks"), _.rlike("[0-9]")).as("has_digit"),
          forall(col("lens"), _ < 50L).as("all_short"),
          aggregate(col("lens"), lit(0L), (acc, x) => acc + x).as("total_chars"),
          aggregate(zip_with(col("lens"), reverse(col("lens")), _ * _),
            lit(0L), (acc, x) => acc + x).as("mirror_dot"),
        )
        .orderBy("doc_id"),
    Some("""
      WITH t AS (
        SELECT doc_id, list_transform(string_split(text, ' '), x -> CAST(len(x) AS BIGINT)) AS lens,
               string_split(text, ' ') AS toks
        FROM documents
      )
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_toks,
        CAST(len(list_filter(lens, x -> x > 5)) AS BIGINT) AS n_long,
        len(list_filter(toks, x -> regexp_matches(x, '[0-9]'))) > 0 AS has_digit,
        len(list_filter(lens, x -> x >= 50)) = 0 AS all_short,
        CAST(list_reduce(list_prepend(0, lens), (a, b) -> a + b) AS BIGINT) AS total_chars,
        CAST(list_reduce(list_prepend(0,
          list_transform(list_zip(lens, list_reverse(lens)), p -> p[1] * p[2])),
          (a, b) -> a + b) AS BIGINT) AS mirror_dot
      FROM t
      ORDER BY doc_id
    """.stripMargin.trim),
  )

  def defs: Seq[QueryDef] = Seq(f1String, f1bStringMore, f2Datetime, f2bDatetimeMore, f3Math, f4Array, f4bArraySets, f5Map, f6Json, f7Null, f8HigherOrder)
}
