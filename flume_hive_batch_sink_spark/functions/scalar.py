"""2.F — Scalar function families.

One registered query per family, each exercising several functions with
column aliases mirrored in the oracle SQL. Everything here is JVM-side
whole-stage-codegen expression work — zero UDFs, zero shuffles beyond
the scan itself.

Cross-engine gotchas handled: Spark `substring`/DuckDB `substr` are both
1-based; Spark `ceil/floor` return BIGINT while DuckDB returns DOUBLE
(cast both); DuckDB `regexp_replace` needs the 'g' flag to match Spark's
replace-all default; Spark `round` is HALF_UP vs DuckDB HALF_EVEN (inputs
chosen away from exact .5 ties at the rounded digit — doubles from
arithmetic essentially never land exactly on a decimal midpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_uc,
           lower(p_brand) AS brand_lc,
           trim(p_type) AS type_trim,
           substr(p_name, 1, 8) AS name_pfx,
           replace(p_name, ' ', '_') AS name_us,
           CAST(length(p_name) AS BIGINT) AS name_len,
           lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_pad,
           CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
           regexp_replace(p_name, '[aeiou]', '#', 'g') AS name_mask,
           concat(p_brand, ':', p_type) AS brand_type
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_uc"),
        F.lower("p_brand").alias("brand_lc"),
        F.trim("p_type").alias("type_trim"),
        F.substring("p_name", 1, 8).alias("name_pfx"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.length("p_name").cast("long").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 5, "0").alias("size_pad"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
        F.regexp_replace("p_name", "[aeiou]", "#").alias("name_mask"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(month(l_shipdate) AS INT) AS ship_month,
           CAST(day(l_shipdate) AS INT) AS ship_day,
           CAST(dayofweek(l_shipdate) AS INT) AS ship_dow,
           CAST(date_trunc('month', l_shipdate) AS VARCHAR)
             AS ship_month_start,
           CAST(CAST(l_shipdate AS DATE) + 90 AS VARCHAR) AS due_date,
           CAST(date_diff('day', CAST('2000-01-01' AS DATE),
                          CAST(l_shipdate AS DATE)) AS INT) AS days_since_y2k,
           CAST(last_day(CAST(l_shipdate AS DATE)) AS VARCHAR) AS month_end
    FROM lineitem
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1 — aligned by
    subtracting 1 on the Spark side."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
        F.dayofmonth("l_shipdate").alias("ship_day"),
        (F.dayofweek("l_shipdate") - 1).alias("ship_dow"),
        F.date_trunc("month", "l_shipdate")
        .cast("date")
        .cast("string")
        .alias("ship_month_start"),
        # DATE outputs travel as ISO strings: pandas bridges render a bare
        # DATE as midnight-timestamp on one engine and datetime.date on the
        # other, which would sabotage the value hash.
        F.date_add(F.col("l_shipdate").cast("date"), 90)
        .cast("string")
        .alias("due_date"),
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("2000-01-01").cast("date"))
        .alias("days_since_y2k"),
        F.last_day(F.col("l_shipdate").cast("date")).cast("string").alias("month_end"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           ROUND(POW(l_quantity, 2), 4) AS qty_sq,
           ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(LOG10(l_extendedprice), 6) AS price_log10,
           l_partkey % 7 AS pk_mod,
           CAST(SIGN(l_discount - 0.05) AS INT) AS disc_sign
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    price, disc, tax, qty = (
        F.col("l_extendedprice"),
        F.col("l_discount"),
        F.col("l_tax"),
        F.col("l_quantity"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round to 6, not 2: the exact decimal product has ≤6 fractional
        # digits, so 6-digit rounding never sits on a tie — 2-digit
        # rounding diverges on .xx5 (Spark HALF_UP vs DuckDB HALF_EVEN).
        F.round(price * (1 - disc) * (1 + tax), 6).alias("charge"),
        F.abs(disc - 0.05).alias("disc_dev"),
        F.ceil(qty).alias("qty_ceil"),
        F.floor(qty).alias("qty_floor"),
        F.round(F.pow(qty, 2), 4).alias("qty_sq"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.round(F.log10(price), 6).alias("price_log10"),
        (F.col("l_partkey") % 7).alias("pk_mod"),
        F.signum(disc - 0.05).cast("int").alias("disc_sign"),
    )


@query(
    "fn_cond",
    oracle="""
    SELECT event_id,
           CASE WHEN value >= 400 THEN 'high' WHEN value >= 100 THEN 'mid'
                ELSE 'low' END AS tier,
           coalesce(NULLIF(event_type, 'error'), 'n/a') AS type_or_na,
           ROUND(greatest(value, 50.0), 2) AS val_floor50,
           ROUND(least(value, 450.0), 2) AS val_cap450,
           CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS uid_parity
    FROM events
    """,
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.when(v >= 400, "high").when(v >= 100, "mid").otherwise("low").alias("tier"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("n/a")).alias(
            "type_or_na"
        ),
        F.round(F.greatest(v, F.lit(50.0)), 2).alias("val_floor50"),
        F.round(F.least(v, F.lit(450.0)), 2).alias("val_cap450"),
        F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd").alias("uid_parity"),
    )


@query(
    "fn_cast",
    oracle="""
    SELECT event_id,
           CAST(trunc(value) AS INT) AS value_int,  -- duckdb CAST rounds; spark truncates
           CAST(value AS VARCHAR) AS value_str,
           CAST(event_id AS DOUBLE) AS id_dbl,
           TRY_CAST(event_type AS INT) AS type_as_int,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date
    FROM events
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts under ANSI mode: TRY_CAST for anything that can fail.
    Spark CAST(double AS INT) truncates toward zero; DuckDB rounds —
    the oracle wraps with trunc() to match."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("value").cast("int").alias("value_int"),
        F.col("value").cast("string").alias("value_str"),
        F.col("event_id").cast("double").alias("id_dbl"),
        F.col("event_type").try_cast("int").alias("type_as_int"),
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_num"),
        F.col("ts").cast("date").cast("string").alias("event_date"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT)
             AS n_distinct_tokens,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',')
             AS vocab,
           CAST(list_contains(string_split(text, ' '), 'data') AS BOOLEAN) AS has_data
    FROM documents
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.array_join(F.array_sort(F.array_distinct(toks)), ",").alias("vocab"),
        F.array_contains(toks, "data").alias("has_data"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           (MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)})['type'][1]
             AS type_from_map,
           array_to_string(map_keys(
             MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}), ',')
             AS key_list,
           CAST(cardinality(MAP {'type': event_type,
                                 'uid': CAST(user_id AS VARCHAR)}) AS INT) AS n_keys
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map build/keys/lookup. DuckDB map extraction returns a LIST — the
    oracle indexes `[1]` to unwrap (SURVEY.md §2 drift note)."""
    ev = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("uid"),
        F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        m.getItem("type").alias("type_from_map"),
        F.array_join(F.map_keys(m), ",").alias("key_list"),
        F.size(m).alias("n_keys"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           json_extract_string(props, '$.missing') AS absent
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_val"),
        (k.cast("bigint") % 10).alias("k_bucket"),
        F.get_json_object("props", "$.missing").alias("absent"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           md5(lower(trim(text))) AS content_key
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressing hashes — the building block for exact dedup
    (llm_exact_dedup). xxhash64 exists Spark-side for cheap shuffles but
    has no DuckDB twin, so the oracle covers md5/sha256."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(F.lower(F.trim("text"))).alias("content_key"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT o_orderkey,
           regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS prio_num,
           regexp_matches(o_orderpriority, 'URGENT|HIGH') AS is_hot,
           CAST(len(regexp_extract_all(o_orderpriority, '[A-Z]+')) AS INT)
             AS n_upper_runs,
           regexp_replace(o_orderpriority, '[^A-Z]', '', 'g') AS letters_only
    FROM orders
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: group extraction, boolean match, match counting via
    extract-all, and character-class stripping. Patterns are RE2/Java
    compatible; DuckDB's regexp_replace takes the 'g' flag to match
    Spark's replace-all default."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"^([0-9]+)", 1).alias("prio_num"),
        F.col("o_orderpriority").rlike("URGENT|HIGH").alias("is_hot"),
        # idx 0 = whole match: Spark defaults to group 1, DuckDB to 0
        F.size(F.regexp_extract_all("o_orderpriority", F.lit(r"[A-Z]+"), 0))
        .cast("int")
        .alias("n_upper_runs"),
        F.regexp_replace("o_orderpriority", r"[^A-Z]", "").alias("letters_only"),
    )


@query(
    "fn_struct",
    oracle="""
    SELECT c_custkey,
           struct_pack(k := c_custkey, seg := c_mktsegment).seg AS seg_field,
           struct_pack(k := c_custkey, seg := c_mktsegment).k + 1
             AS key_plus_one,
           struct_pack(a := least(c_custkey, c_nationkey),
                       b := greatest(c_custkey, c_nationkey)).a AS lo_field
    FROM customer
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access (the nested-type surface of the
    serializer schema mapping, SURVEY.md §1.2). Structs are built and
    immediately field-accessed so the hash gate sees scalars — struct
    wire formats differ between engines, field values don't."""
    c = load(spark, sf_dir, "customer")
    s = F.struct(F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("seg"))
    s2 = F.struct(
        F.least("c_custkey", F.col("c_nationkey").cast("long")).alias("a"),
        F.greatest("c_custkey", F.col("c_nationkey").cast("long")).alias("b"),
    )
    return c.select(
        "c_custkey",
        s.getField("seg").alias("seg_field"),
        (s.getField("k") + 1).alias("key_plus_one"),
        s2.getField("a").alias("lo_field"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS and_mask,
           o_orderkey | 4096 AS or_flag,
           xor(o_orderkey, 1023) AS xor_k,
           o_orderkey << 2 AS shifted_l,
           o_orderkey >> 3 AS shifted_r,
           CAST(bit_count(o_orderkey) AS INT) AS popcount
    FROM orders
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor masks, shifts, popcount — the bit
    tricks hash partitioners and bloom/bitmap structures are built
    from. All stay in codegen as single JVM instructions."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("and_mask"),
        k.bitwiseOR(F.lit(4096)).alias("or_flag"),
        k.bitwiseXOR(F.lit(1023)).alias("xor_k"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
        F.bit_count(k).cast("int").alias("popcount"),
    )


@query(
    "fn_url_normalize",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
             || '://'
             || (CASE WHEN doc_id % 2 = 0 THEN upper(source)
                      ELSE source END)
             || '.Example.com'
             || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
             || '/docs//' || doc_id
             || '?v=' || n_chars || '&lang=' || lang
             || '#sec' || (doc_id % 5) AS url
      FROM documents
    ), parts AS (
      SELECT doc_id, url,
             lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
             lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS hostport,
             regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
             regexp_extract(url, '\\?([^#]*)', 1) AS qs
      FROM u
    ), norm AS (
      SELECT doc_id, scheme,
             regexp_replace(hostport, ':(443|80)$', '') AS host,
             regexp_replace(path, '//+', '/', 'g') AS npath,
             array_to_string(list_sort(string_split(qs, '&')), '&') AS nqs
      FROM parts
    )
    SELECT doc_id,
           scheme || '://' || host || npath || '?' || nqs AS url_norm,
           host,
           CAST(len(string_split(nqs, '&')) AS INT) AS n_params
    FROM norm
    """,
)
def fn_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the normalization pass that must run
    BEFORE any URL-keyed dedup or host aggregation (llm_url_host_filter
    counts hosts; this makes textually-different URLs of the same
    resource compare equal): lowercase scheme+host, strip default
    ports (:443/:80), collapse duplicate path slashes, SORT query
    parameters, drop fragments. The fixture synthesizes deliberately
    messy URLs (mixed case, optional default port, unsorted params,
    fragment) from (source, lang, doc_id). Everything is JVM-side
    regexp/array codegen — no UDF — so at 100 TB this is a free
    map-side stage fused into the scan."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, "HTTPS").otherwise("https"),
        F.lit("://"),
        F.when(F.col("doc_id") % 2 == 0, F.upper("source")).otherwise(
            F.col("source")
        ),
        F.lit(".Example.com"),
        F.when(F.col("doc_id") % 3 == 0, ":443").otherwise(""),
        F.lit("/docs//"),
        F.col("doc_id").cast("string"),
        F.lit("?v="),
        F.col("n_chars").cast("string"),
        F.lit("&lang="),
        F.col("lang"),
        F.lit("#sec"),
        (F.col("doc_id") % 5).cast("string"),
    )
    parts = d.select(
        "doc_id",
        url.alias("url"),
    ).select(
        "doc_id",
        F.lower(F.regexp_extract("url", r"^([A-Za-z]+)://", 1)).alias("scheme"),
        F.lower(
            F.regexp_extract("url", r"^[A-Za-z]+://([^/?#]+)", 1)
        ).alias("hostport"),
        F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1).alias(
            "path"
        ),
        F.regexp_extract("url", r"\?([^#]*)", 1).alias("qs"),
    )
    norm = parts.select(
        "doc_id",
        "scheme",
        F.regexp_replace("hostport", r":(443|80)$", "").alias("host"),
        F.regexp_replace("path", r"//+", "/").alias("npath"),
        F.array_join(F.array_sort(F.split("qs", "&")), "&").alias("nqs"),
    )
    return norm.select(
        "doc_id",
        F.concat(
            F.col("scheme"), F.lit("://"), F.col("host"), F.col("npath"),
            F.lit("?"), F.col("nqs"),
        ).alias("url_norm"),
        "host",
        F.size(F.split("nqs", "&")).alias("n_params"),
    )


@query(
    "fn_ip_cidr",
    oracle="""
    WITH ip AS (
      SELECT event_id, user_id,
             CAST((user_id * 2654435761 + event_id) % 4294967296 AS BIGINT)
               AS addr
      FROM events
    ), parts AS (
      SELECT event_id, addr,
             addr // 16777216 AS o1,
             (addr // 65536) % 256 AS o2,
             (addr // 256) % 256 AS o3,
             addr % 256 AS o4
      FROM ip
    )
    SELECT event_id,
           CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.'
             || CAST(o3 AS VARCHAR) || '.' || CAST(o4 AS VARCHAR) AS ip_str,
           CAST(addr // 65536 AS BIGINT) AS subnet16,
           (addr // 16777216 = 10) AS in_10_8,
           (addr // 1048576 = 2753) AS in_ac10_12,
           CAST(o1 AS INT) AS octet1
    FROM parts
    """,
)
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 address family: synthesize a deterministic 32-bit address
    per event (no IP column ships in the fixture), render dotted-quad,
    extract the /16 subnet id, and test CIDR membership (10.0.0.0/8
    and 172.16.0.0/12) — the log-enrichment functions every
    clickstream pipeline applies at ingest. CIDR containment is pure
    integer division (addr >> (32-prefix) == net >> (32-prefix)), so
    membership is codegen integer compare — never string matching —
    and the /16 key is what a geo/abuse join would shuffle on (a
    64k-value key space: compact, skew-bounded). All integer
    arithmetic, bit-identical across engines."""
    ev = load(spark, sf_dir, "events")
    addr = (
        (F.col("user_id") * F.lit(2654435761)) + F.col("event_id")
    ) % F.lit(4294967296)
    ip = ev.select("event_id", addr.cast("long").alias("addr"))
    o1 = (F.col("addr") / 16777216).cast("long")
    o2 = ((F.col("addr") / 65536) % 256).cast("long")
    o3 = ((F.col("addr") / 256) % 256).cast("long")
    o4 = (F.col("addr") % 256).cast("long")
    return ip.select(
        "event_id",
        F.concat_ws(
            ".",
            o1.cast("string"), o2.cast("string"),
            o3.cast("string"), o4.cast("string"),
        ).alias("ip_str"),
        (F.col("addr") / 65536).cast("long").alias("subnet16"),
        ((F.col("addr") / 16777216).cast("long") == 10).alias("in_10_8"),
        ((F.col("addr") / 1048576).cast("long") == 2753).alias("in_ac10_12"),
        o1.cast("int").alias("octet1"),
    )


@query(
    "fn_geo_haversine",
    oracle="""
    WITH pts AS (
      SELECT event_id,
             -60 + (user_id * 37 % 120) + (event_id % 100) / 100.0 AS lat1,
             -170 + (user_id * 53 % 340) + (event_id % 97) / 97.0 AS lon1,
             -60 + (user_id * 71 % 120) + (event_id % 89) / 89.0 AS lat2,
             -170 + (user_id * 89 % 340) + (event_id % 83) / 83.0 AS lon2
      FROM events
    ), hav AS (
      SELECT event_id, lat1, lon1, lat2, lon2,
             sin(radians(lat2 - lat1) / 2) * sin(radians(lat2 - lat1) / 2)
             + cos(radians(lat1)) * cos(radians(lat2))
               * sin(radians(lon2 - lon1) / 2) * sin(radians(lon2 - lon1) / 2)
               AS a
      FROM pts
    )
    SELECT event_id,
           CAST(ROUND(lat1, 4) AS DOUBLE) AS lat1,
           CAST(ROUND(lon1, 4) AS DOUBLE) AS lon1,
           CAST(ROUND(12742.0 * asin(sqrt(a)), 2) AS DOUBLE) AS dist_km,
           (ROUND(6371.0 * 2 * asin(sqrt(a)), 9) < 100.0) AS within_100km
    FROM hav
    """,
)
def fn_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial distance family: haversine great-circle km between
    two deterministic synthesized points per event (no geo columns
    ship in the fixture) plus a radius predicate — the geofence /
    proximity-join primitive. All trig is JVM/libm double math in
    codegen; the oracle computes the IDENTICAL formula text, and
    outputs round to 2-4 decimals (~10 m) so a last-ulp sin/cos
    divergence between libms cannot flip the hash. At 100 TB the
    radius predicate pairs with a geohash/S2-cell blocking key —
    same gate-the-pairs pattern as join_fuzzy_levenshtein — so
    proximity joins never go n^2."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        (-60 + (F.col("user_id") * 37 % 120) + (F.col("event_id") % 100) / 100.0).alias("lat1"),
        (-170 + (F.col("user_id") * 53 % 340) + (F.col("event_id") % 97) / 97.0).alias("lon1"),
        (-60 + (F.col("user_id") * 71 % 120) + (F.col("event_id") % 89) / 89.0).alias("lat2"),
        (-170 + (F.col("user_id") * 89 % 340) + (F.col("event_id") % 83) / 83.0).alias("lon2"),
    )
    dlat2 = F.radians(F.col("lat2") - F.col("lat1")) / 2
    dlon2 = F.radians(F.col("lon2") - F.col("lon1")) / 2
    a = (
        F.sin(dlat2) * F.sin(dlat2)
        + F.cos(F.radians("lat1")) * F.cos(F.radians("lat2"))
        * F.sin(dlon2) * F.sin(dlon2)
    )
    hav = pts.withColumn("a", a)
    return hav.select(
        "event_id",
        F.round("lat1", 4).alias("lat1"),
        F.round("lon1", 4).alias("lon1"),
        F.round(F.lit(12742.0) * F.asin(F.sqrt("a")), 2).alias("dist_km"),
        # round-before-compare on BOTH engines (repo convention): a
        # last-ulp libm divergence at the 100 km boundary must not
        # flip the predicate.
        (F.round(F.lit(6371.0) * 2 * F.asin(F.sqrt("a")), 9) < 100.0).alias(
            "within_100km"
        ),
    )


@query(
    "fn_uuid_deterministic",
    oracle="""
    WITH h AS (
      SELECT doc_id, md5('doc:' || CAST(doc_id AS VARCHAR)) AS hx
      FROM documents
    )
    SELECT doc_id,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-'
           || '5' || substr(hx, 14, 3) || '-'
           || '8' || substr(hx, 18, 3) || '-' || substr(hx, 21, 12)
             AS uuid5,
           (length(substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-'
           || '5' || substr(hx, 14, 3) || '-'
           || '8' || substr(hx, 18, 3) || '-' || substr(hx, 21, 12)) = 36)
             AS len_ok
    FROM h
    """,
)
def fn_uuid_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic name-based UUIDs (the UUIDv5 pattern: hash a
    namespace + name, stamp version/variant nibbles, format 8-4-4-4-12)
    — the content-addressed row identity every idempotent pipeline
    needs (Spark's uuid() is random and repartition-unstable, exactly
    what an exactly-once sink cannot use; this is the dedup_replay /
    split_train_test identity discipline surfaced as a function
    family). Pure codegen string ops over md5 — identical across
    engines, no UDF, no state."""
    d = load(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("doc:"), F.col("doc_id").cast("string")))
    parts = F.concat(
        F.substring(hx, 1, 8), F.lit("-"),
        F.substring(hx, 9, 4), F.lit("-"),
        F.lit("5"), F.substring(hx, 14, 3), F.lit("-"),
        F.lit("8"), F.substring(hx, 18, 3), F.lit("-"),
        F.substring(hx, 21, 12),
    )
    return d.select(
        "doc_id",
        parts.alias("uuid5"),
        (F.length(parts) == 36).alias("len_ok"),
    )


@query(
    "fn_encoding_roundtrip",
    oracle="""
    WITH src AS (
      SELECT doc_id, substr(text, 1, 24) AS s FROM documents
    )
    SELECT doc_id,
           base64(encode(s)) AS b64,
           lower(hex(encode(s))) AS hexed,
           decode(from_base64(base64(encode(s)))) = s AS b64_roundtrip,
           CAST(length(base64(encode(s))) AS INT) AS b64_len,
           CAST(length(hex(encode(s))) AS INT) AS hex_len
    FROM src
    """,
)
def fn_encoding_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-encoding function family: base64 and hex of UTF-8 text
    with a decode round-trip certificate — the serialization layer of
    every header-carrying event pipeline (the reference moves opaque
    byte bodies; these are the codecs that make them printable). All
    JVM codegen (base64/unbase64/hex string ops); both engines emit
    RFC-4648 base64 and matching hex (lowercased — Spark hex() is
    upper, DuckDB lower; the operator normalizes, a real
    cross-engine trap pinned here). Map-only, fused into the scan."""
    d = load(spark, sf_dir, "documents")
    src = d.select("doc_id", F.substring("text", 1, 24).alias("s"))
    sb = F.col("s").cast("binary")
    return src.select(
        "doc_id",
        F.base64(sb).alias("b64"),
        F.lower(F.hex(sb)).alias("hexed"),
        (F.unbase64(F.base64(sb)).cast("string") == F.col("s")).alias(
            "b64_roundtrip"
        ),
        F.length(F.base64(sb)).alias("b64_len"),
        F.length(F.hex(sb)).alias("hex_len"),
    )


@query(
    "fn_data_mask",
    oracle="""
    SELECT c_custkey,
           concat('Customer#', repeat('*', len(c_name) - 13),
                  substr(c_name, len(c_name) - 3, 4)) AS name_masked,
           substr(md5('pseudo-v1:' || CAST(c_custkey AS VARCHAR)), 1, 12)
             AS pseudonym,
           CAST(ROUND(FLOOR(c_acctbal / 1000) * 1000, 0) AS DOUBLE)
             AS acctbal_bucket,
           c_mktsegment,
           md5('pseudo-v1:' || CAST(c_custkey AS VARCHAR))
             = md5('pseudo-v1:' || CAST(c_custkey AS VARCHAR))
             AS join_preserved
    FROM customer
    """,
)
def fn_data_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-production data masking — the transform every compliant
    lower-environment copy runs: identifier names keep only their
    last 4 characters (format-preserving star padding), the join key
    is replaced by a SALTED deterministic pseudonym (same input →
    same token, so referential integrity and join cardinalities
    survive masking — the property that keeps masked data useful for
    query testing), and the monetary balance generalizes to a
    1000-unit bucket (k-anonymity-style coarsening) instead of
    leaking exact values. Complements llm_pii_redact (free-text
    scrubbing) with the STRUCTURED-column masking policy.

    Everything is codegen string/arithmetic work in one projection —
    no shuffle at all; masking 100 TB is exactly one map-side pass,
    which is why masked copies are cheap to refresh nightly. The
    salt versions the pseudonym space: rotating it re-keys every
    environment copy at once."""
    c = load(spark, sf_dir, "customer")
    ln = F.length("c_name")
    pseudo = F.md5(
        F.concat(F.lit("pseudo-v1:"), F.col("c_custkey").cast("string"))
    )
    return c.select(
        "c_custkey",
        F.concat(
            F.lit("Customer#"),
            F.repeat(F.lit("*"), (ln - 13).cast("int")),
            F.expr("substr(c_name, length(c_name) - 3, 4)"),
        ).alias("name_masked"),
        F.substring(pseudo, 1, 12).alias("pseudonym"),
        F.round(F.floor(F.col("c_acctbal") / 1000) * 1000, 0)
        .cast("double")
        .alias("acctbal_bucket"),
        "c_mktsegment",
        (pseudo == pseudo).alias("join_preserved"),
    )


@query(
    "fn_luhn_checksum",
    oracle="""
    WITH d AS (
      SELECT c_custkey, c_mktsegment,
             list_transform(
               string_split_regex(reverse(CAST(c_custkey AS VARCHAR)), ''),
               x -> CAST(x AS BIGINT)) AS digits
      FROM customer
    ),
    s AS (
      SELECT c_custkey, c_mktsegment,
             list_sum(list_transform(range(1, len(digits) + 1),
               i -> CASE WHEN i % 2 = 0
                         THEN CASE WHEN digits[i] > 4
                                   THEN 2 * digits[i] - 9
                                   ELSE 2 * digits[i] END
                         ELSE digits[i] END)) AS luhn_sum
      FROM d
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_luhn_valid,
           CAST(ROUND(SUM(CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END)
                      / CAST(count(*) AS DOUBLE), 6) AS DOUBLE)
             AS valid_rate
    FROM s GROUP BY c_mktsegment
    """,
)
def fn_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn mod-10 check-digit validation (ISO/IEC 7812 — the card
    and account-number checksum), run as a DQ screen over the
    customer-key column: digits taken right-to-left, every second one
    doubled with the 2d−9 digit-sum fold, valid iff the total ≡ 0
    (mod 10). A payments feed whose valid-rate drops below ~100% is
    shipping corrupted or truncated account numbers; on synthetic
    sequential keys the expected rate is ~10% — the key's value here
    is the bit-exact portable implementation of the fold.

    Plan: the whole checksum is an in-row array fold (split → reverse
    → positional transform → sum) inside codegen, then one small
    grouped rollup — zero shuffles before the 5-key aggregate at any
    scale."""
    c = load(spark, sf_dir, "customer")
    digits = F.expr(
        "transform(split(reverse(CAST(c_custkey AS STRING)), ''), "
        "x -> CAST(x AS BIGINT))"
    )
    luhn_sum = F.expr(
        "aggregate(zip_with("
        "  transform(split(reverse(CAST(c_custkey AS STRING)), ''), "
        "            x -> CAST(x AS BIGINT)),"
        "  sequence(1, length(CAST(c_custkey AS STRING))),"
        "  (d, i) -> CASE WHEN i % 2 = 0 THEN "
        "    CASE WHEN d > 4 THEN 2 * d - 9 ELSE 2 * d END ELSE d END),"
        " 0L, (acc, x) -> acc + x)"
    )
    s = c.select("c_mktsegment", luhn_sum.alias("luhn_sum"))
    valid = F.sum(F.when(F.col("luhn_sum") % 10 == 0, 1).otherwise(0))
    return s.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        valid.alias("n_luhn_valid"),
        F.round(valid / F.count("*").cast("double"), 6).alias("valid_rate"),
    )
