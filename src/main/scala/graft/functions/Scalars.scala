package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.8 — scalar function families (string/date/math/array/json/
  * map), one query per family, every function oracle-checked against DuckDB.
  *
  * All of these are built-in codegen'd Catalyst expressions — each query is a
  * single whole-stage-codegen span over the scan, no shuffle except the
  * final order/aggregate. Transcendentals (ln/pow) are rounded to 6 decimals
  * because libm implementations may differ in the last ulp across engines.
  */
object Scalars {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_scalar_string" -> ((s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("u"),
          lower(col("p_type")).as("lo"),
          substring(col("p_name"), 1, 10).as("sub"),
          trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trimmed"),
          concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
          length(col("p_name")).as("len"),
          regexp_replace(col("p_name"), " ", "_").as("rep"),
          element_at(split(col("p_name"), " "), 1).as("tok1"),
          // lower() first: p_type is all-uppercase, so extracting from the
          // raw column would match nothing and never exercise the regex path
          regexp_extract(lower(col("p_type")), "([a-z]+)$", 1).as("last_word"),
          col("p_name").like("%red%").as("has_red"))
        .orderBy("p_partkey")),

    "q_scalar_date" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .as("days_since"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          last_day(col("o_orderdate")).as("eom"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey")),

    "q_scalar_math" -> ((s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          round(col("p_retailprice"), 0).as("r0"),
          floor(col("p_retailprice")).as("fl"),
          ceil(col("p_retailprice")).as("ce"),
          abs(col("p_retailprice") - lit(950.0)).as("ab"),
          round(sqrt(col("p_retailprice")), 6).as("sq"),
          round(log(col("p_retailprice")), 6).as("lg"),
          round(pow(col("p_size"), lit(1.5)), 6).as("pw"),
          signum(col("p_retailprice") - lit(950.0)).as("sg"),
          greatest(col("p_size"), lit(25)).as("gr"),
          least(col("p_size"), lit(25)).as("le"),
          when(col("p_size") > 25, "big").otherwise("small").as("bucket"))
        .orderBy("p_partkey")),

    // Array outputs are serialized to fixed-format strings (%.4f joined by
    // ',') — the driver's pandas comparator cannot hash raw array cells
    // (round-1 red row), and a pinned printf format sidesteps float32
    // repr differences between Spark's to_json and DuckDB's VARCHAR cast.
    // Every array function stays exercised; only the output shape changes.
    "q_scalar_array" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          (round(expr(
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), 0D, (a, x) -> a + x)"),
            4) + 0.0).as("sum_all"),
          // round() BEFORE %.4f: a raw float32 can sit exactly on a 4dp
          // half-tie (any odd/32 value), where Java half-up and C printf
          // half-even disagree; after round(x,4) the double is within 1 ulp
          // of a 4dp decimal so the format step has no ties left.
          // "+ 0.0" AFTER round kills the signed zero: Spark's round goes
          // through BigDecimal (no -0.0 exists, tiny negatives format as
          // "0.0000") while DuckDB's C round keeps the sign ("-0.0000");
          // IEEE -0.0 + 0.0 = +0.0 normalizes both (first hit at sf0.1).
          expr("array_join(transform(slice(embedding, 1, 3), " +
            "x -> format_string('%.4f', round(CAST(x AS DOUBLE), 4) + 0.0D)), ',')").as("first3"),
          expr("array_join(transform(sort_array(slice(embedding, 1, 5)), " +
            "x -> format_string('%.4f', round(CAST(x AS DOUBLE), 4) + 0.0D)), ',')").as("sorted5"),
          expr("array_join(transform(slice(embedding, 1, 3), " +
            "x -> format_string('%.4f', round(CAST(-x AS DOUBLE), 4) + 0.0D)), ',')").as("neg3"),
          (round(element_at(col("embedding"), 1).cast("double"), 6) + 0.0).as("e1"),
          array_contains(array(lit(1), lit(2), lit(3)), col("label")).as("label_low"))
        .orderBy("vec_id")),

    // Regex family over free text: extract-all (list + count + slice),
    // single-group extract, replace-all, and match-test. Patterns stay in
    // the char-class subset where Java regex (Spark) and RE2 (DuckDB) agree.
    "q_scalar_regex" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(
          col("doc_id"),
          size(expr("regexp_extract_all(text, '[a-z]{8,}', 0)")).as("n_long"),
          expr("array_join(slice(regexp_extract_all(text, '[a-z]{8,}', 0), 1, 5), ',')")
            .as("first5"),
          regexp_extract(col("text"), "([a-z]{8,})", 1).as("first_long"),
          length(regexp_replace(col("text"), "[aeiou]", "")).as("len_novowel"),
          col("text").rlike("ing ").as("has_ing"))
        .orderBy("doc_id")),

    // r19: fanOut before the per-row JSON parses — the single-row-group
    // events scan otherwise parses all rows in ONE task (guide §2).
    "q_scalar_json" -> ((s, d) =>
      Tables.fanOut(Tables.events(s, d).select("event_id", "props"))
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          expr("from_json(props, 'k INT').k").as("k_int"))
        .orderBy("event_id")),

    // Bitwise family over integer keys: and/or/xor/shifts/bit_count —
    // the primitives the engine's own simhash banding and salting build on.
    "q_scalar_bitwise" -> ((s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          (col("p_partkey").bitwiseAND(255)).as("lo_byte"),
          (col("p_partkey").bitwiseOR(16)).as("or16"),
          (col("p_partkey").bitwiseXOR(col("p_size"))).as("xr"),
          shiftleft(col("p_partkey"), 3).as("shl"),
          shiftright(col("p_partkey"), 2).as("shr"),
          bit_count(col("p_partkey")).as("bits"))
        .orderBy("p_partkey")),

    // Conditional family: CASE chains, coalesce/nullif/nvl2-style logic,
    // greatest/least over mixed expressions.
    "q_scalar_conditional" -> ((s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          when(col("p_size") < 10, "small")
            .when(col("p_size") < 30, "medium")
            .otherwise("large").as("size_class"),
          coalesce(expr("nullif(p_brand, 'Brand#11')"), lit("SUPPRESSED")).as("brand_vis"),
          when(expr("nullif(p_size, 25)").isNull, lit("exactly25"))
            .otherwise(lit("other")).as("is25"),
          greatest(col("p_size") * 2, col("p_partkey") % 100).as("g"),
          least(col("p_size") * 2, col("p_partkey") % 100).as("l"))
        .orderBy("p_partkey")),

    // VARIANT (Spark 4): parse once into the binary semi-structured type,
    // then typed path extraction — the open-schema column format that
    // replaces string-JSON re-parsing per access. At scale the parse cost
    // is paid once per row, and Variant's shredded binary beats repeated
    // get_json_object string scans. DuckDB oracle reads the same paths with
    // its native JSON type.
    // r19: fanOut before parse_json (same single-task-scan reason as
    // q_scalar_json)
    "q_scalar_variant" -> ((s, d) =>
      Tables.fanOut(Tables.events(s, d).select("event_id", "props"))
        .withColumn("v", parse_json(col("props")))
        .select(
          col("event_id"),
          expr("CAST(variant_get(v, '$.k', 'int') AS INT)").as("k_int"),
          expr("variant_get(v, '$.k', 'string')").as("k_str"),
          expr("variant_get(v, '$.missing', 'string')").as("absent"))
        .orderBy("event_id")),

    // Map construction: lang -> doc count per source, serialized as
    // key-sorted JSON so DuckDB can rebuild the identical string.
    "q_scalar_map" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
        .groupBy("source")
        .agg(
          to_json(map_from_entries(sort_array(collect_list(struct(col("lang"), col("cnt"))))))
            .as("lang_counts"),
          count(lit(1)).as("n_langs"))
        .orderBy("source")))

  val oracles: Map[String, String] = Map(
    "q_scalar_bitwise" ->
      ("SELECT p_partkey, p_partkey & 255 AS lo_byte, p_partkey | 16 AS or16, " +
        "xor(p_partkey, CAST(p_size AS BIGINT)) AS xr, " +
        "p_partkey << 3 AS shl, p_partkey >> 2 AS shr, " +
        "CAST(bit_count(p_partkey) AS INTEGER) AS bits " +
        "FROM part ORDER BY p_partkey"),
    "q_scalar_conditional" ->
      ("SELECT p_partkey, " +
        "CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium' ELSE 'large' END AS size_class, " +
        "COALESCE(nullif(p_brand, 'Brand#11'), 'SUPPRESSED') AS brand_vis, " +
        "CASE WHEN nullif(p_size, 25) IS NULL THEN 'exactly25' ELSE 'other' END AS is25, " +
        "greatest(p_size * 2, p_partkey % 100) AS g, " +
        "least(p_size * 2, p_partkey % 100) AS l " +
        "FROM part ORDER BY p_partkey"),
    "q_scalar_variant" ->
      ("SELECT event_id, CAST(json_extract_string(CAST(props AS JSON), '$.k') AS INTEGER) AS k_int, " +
        "json_extract_string(CAST(props AS JSON), '$.k') AS k_str, " +
        "json_extract_string(CAST(props AS JSON), '$.missing') AS absent " +
        "FROM events ORDER BY event_id"),
    "q_scalar_regex" ->
      ("SELECT doc_id, " +
        "CAST(len(regexp_extract_all(text, '[a-z]{8,}')) AS INTEGER) AS n_long, " +
        // [1:5] on an empty DuckDB list yields NULL (Spark's slice+join gives
        // ''); coalesce pins the no-match case to the same empty string
        "coalesce(array_to_string(regexp_extract_all(text, '[a-z]{8,}')[1:5], ','), '') AS first5, " +
        "regexp_extract(text, '([a-z]{8,})', 1) AS first_long, " +
        "CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS INTEGER) AS len_novowel, " +
        "regexp_matches(text, 'ing ') AS has_ing " +
        "FROM documents WHERE doc_id < 100 ORDER BY doc_id"),
    "q_scalar_string" ->
      ("SELECT p_partkey, upper(p_name) AS u, lower(p_type) AS lo, " +
        "substring(p_name, 1, 10) AS sub, trim('  ' || p_brand || '  ') AS trimmed, " +
        "p_brand || '|' || p_type AS cw, CAST(length(p_name) AS INTEGER) AS len, " +
        "replace(p_name, ' ', '_') AS rep, split_part(p_name, ' ', 1) AS tok1, " +
        "regexp_extract(lower(p_type), '([a-z]+)$', 1) AS last_word, " +
        "p_name LIKE '%red%' AS has_red FROM part ORDER BY p_partkey"),
    "q_scalar_date" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS y, " +
        "CAST(month(o_orderdate) AS INTEGER) AS m, " +
        "CAST(day(o_orderdate) AS INTEGER) AS dom, " +
        "CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start, " +
        "CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since, " +
        "CAST(o_orderdate AS DATE) + 30 AS plus30, " +
        "last_day(CAST(o_orderdate AS DATE)) AS eom, " +
        "epoch_us(o_orderdate) // 1000000 AS epoch_s " +
        "FROM orders ORDER BY o_orderkey"),
    "q_scalar_math" ->
      ("SELECT p_partkey, round(p_retailprice, 0) AS r0, " +
        "CAST(floor(p_retailprice) AS BIGINT) AS fl, " +
        "CAST(ceil(p_retailprice) AS BIGINT) AS ce, " +
        "abs(p_retailprice - 950.0) AS ab, " +
        "round(sqrt(p_retailprice), 6) AS sq, " +
        "round(ln(p_retailprice), 6) AS lg, " +
        "round(pow(p_size, 1.5), 6) AS pw, " +
        "CAST(sign(p_retailprice - 950.0) AS DOUBLE) AS sg, " +
        "CAST(greatest(p_size, 25) AS INTEGER) AS gr, " +
        "CAST(least(p_size, 25) AS INTEGER) AS le, " +
        "CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END AS bucket " +
        "FROM part ORDER BY p_partkey"),
    "q_scalar_array" ->
      ("SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim, " +
        "round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4) + 0.0 AS sum_all, " +
        "array_to_string(list_transform(embedding[1:3], x -> printf('%.4f', round(CAST(x AS DOUBLE), 4) + 0.0)), ',') AS first3, " +
        "array_to_string(list_transform(list_sort(embedding[1:5]), x -> printf('%.4f', round(CAST(x AS DOUBLE), 4) + 0.0)), ',') AS sorted5, " +
        "array_to_string(list_transform(embedding[1:3], x -> printf('%.4f', round(CAST(-x AS DOUBLE), 4) + 0.0)), ',') AS neg3, " +
        "round(CAST(embedding[1] AS DOUBLE), 6) + 0.0 AS e1, list_contains([1, 2, 3], label) AS label_low " +
        "FROM embeddings ORDER BY vec_id"),
    "q_scalar_json" ->
      ("SELECT event_id, json_extract_string(props, '$.k') AS k_str, " +
        "CAST(json_extract(props, '$.k') AS INTEGER) AS k_int " +
        "FROM events ORDER BY event_id"),
    "q_scalar_map" ->
      ("SELECT source, '{' || string_agg('\"' || lang || '\":' || CAST(cnt AS VARCHAR), ',' ORDER BY lang) || '}' AS lang_counts, " +
        "count(*) AS n_langs FROM " +
        "(SELECT source, lang, count(*) AS cnt FROM documents GROUP BY source, lang) " +
        "GROUP BY source ORDER BY source"))
}
