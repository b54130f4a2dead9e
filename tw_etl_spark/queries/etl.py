"""ETL-facade queries: the reference's dataflow patterns (R2/R8/R12/R15)
as oracle-verified relational queries over the driver tables.

Inputs are derived deterministically from the synthetic tables (both
engines derive them identically), so the cleanse/parse/route logic — the
actual operator under test — is hash-verified end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table as _t
from tw_etl_spark.pipeline import cleanse_streamlists, compression_metric, tiered_routing
from tw_etl_spark.queries import register
from tw_etl_spark.queries.dedup import _comp_cte


@register(
    "p1_filename_parse",
    oracle="""
    WITH files AS (
        SELECT concat(
            's', CAST(o_custkey % 50 AS VARCHAR), '_',
            CASE WHEN o_totalprice >= 300000 THEN '720p60'
                 WHEN o_totalprice >= 100000 THEN '360p'
                 ELSE 'audio_only' END, '_',
            strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S'), '_',
            CAST(o_orderkey % 5 AS VARCHAR), '.mkv') AS fname
        FROM orders
    )
    SELECT
        regexp_extract(fname, '^(.+)_(audio_only|[0-9]+p[0-9]*)_', 2) AS quality,
        CAST(count(*) AS BIGINT)                                      AS n_files,
        CAST(count(DISTINCT regexp_extract(fname, '^(.+)_(audio_only|[0-9]+p[0-9]*)_', 1)) AS BIGINT) AS n_streams
    FROM files
    GROUP BY quality
    ORDER BY quality
    """,
    doc="R2: filename-encoded facts round-trip — build '{stream}_{qid}_"
    "{ISO}_{retry}.mkv' names, regex-parse them back, aggregate "
    "(convert.sh:38-42, manager.py:271).",
    tags=("etl", "regex"),
)
def p1(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    fname = F.concat(
        F.lit("s"),
        (F.col("o_custkey") % 50).cast("string"),
        F.lit("_"),
        F.when(F.col("o_totalprice") >= 300000, "720p60")
        .when(F.col("o_totalprice") >= 100000, "360p")
        .otherwise("audio_only"),
        F.lit("_"),
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit("_"),
        (F.col("o_orderkey") % 5).cast("string"),
        F.lit(".mkv"),
    )
    rx = r"^(.+)_(audio_only|[0-9]+p[0-9]*)_"
    return (
        o.select(fname.alias("fname"))
        .select(
            F.regexp_extract("fname", rx, 2).alias("quality"),
            F.regexp_extract("fname", rx, 1).alias("stream"),
        )
        .groupBy("quality")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.countDistinct("stream").alias("n_streams"),
        )
        .orderBy("quality")
    )


@register(
    "p2_cleanse_union_distinct",
    oracle="""
    WITH l1 AS (SELECT c_name AS stream_id FROM customer),
    l2 AS (
        SELECT CASE WHEN c_custkey % 7 = 0 THEN concat('#', c_name)
                    WHEN c_custkey % 11 = 0 THEN '   '
                    ELSE concat('  ', c_name, ' ') END AS stream_id
        FROM customer
    ),
    cleaned AS (
        SELECT DISTINCT lower(trim(regexp_replace(stream_id, '^#', ''))) AS stream_id
        FROM (SELECT * FROM l1 UNION ALL SELECT * FROM l2)
        WHERE lower(trim(regexp_replace(stream_id, '^#', ''))) <> ''
    )
    SELECT CAST(count(*) AS BIGINT) AS n_streams,
           min(stream_id)           AS first_stream,
           max(stream_id)           AS last_stream
    FROM cleaned
    """,
    doc="R15: union of raw stream lists + '#'-strip + trim + drop-empty "
    "+ distinct (manager.py:134-158).",
    tags=("etl", "cleanse"),
)
def p2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    l1 = c.select(F.col("c_name").alias("stream_id"))
    l2 = c.select(
        F.when(F.col("c_custkey") % 7 == 0, F.concat(F.lit("#"), F.col("c_name")))
        .when(F.col("c_custkey") % 11 == 0, F.lit("   "))
        .otherwise(F.concat(F.lit("  "), F.col("c_name"), F.lit(" ")))
        .alias("stream_id")
    )
    cleaned = cleanse_streamlists([l1, l2])
    return cleaned.agg(
        F.count(F.lit(1)).alias("n_streams"),
        F.min("stream_id").alias("first_stream"),
        F.max("stream_id").alias("last_stream"),
    )


@register(
    "p3_compression_metric",
    oracle="""
    SELECT
        l_returnflag,
        round(avg(round(100 * (1 - (l_extendedprice * (1 - l_discount)) / l_extendedprice), 3)), 6) AS avg_reduction_pct,
        CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_extendedprice > 0
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="R8: per-artifact size-reduction %% at scale 3 (convert.sh:101-106) "
    "aggregated per group.",
    tags=("etl", "metric"),
)
def p3(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    new_size = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pct = compression_metric(F.col("l_extendedprice"), new_size)
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.avg(pct), 6).alias("avg_reduction_pct"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "p4_tiered_routing",
    oracle="""
    WITH artifacts AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'mkv'
                               WHEN 1 THEN 'json'
                               ELSE 'json.gz' END AS suffix,
               concat('tw/', md5(concat(source, '/', CAST(doc_id AS VARCHAR)))) AS key
        FROM documents
    )
    SELECT
        CASE WHEN suffix = 'json.gz' THEN 'DEEP_ARCHIVE'
             WHEN suffix = 'json'    THEN 'STANDARD_IA'
             WHEN suffix = 'mkv'     THEN 'DEEP_ARCHIVE'
             ELSE 'STANDARD' END AS storage_class,
        suffix,
        CAST(count(*) AS BIGINT)          AS n_objects,
        CAST(count(DISTINCT key) AS BIGINT) AS n_keys
    FROM artifacts
    GROUP BY 1, 2
    ORDER BY storage_class, suffix
    """,
    doc="R12: artifact-type → storage-tier routing under hashed key "
    "prefix 'tw/' (s3-sync.sh:40-67).",
    tags=("etl", "sink"),
)
def p4(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    suffix = (
        F.when(F.col("doc_id") % 3 == 0, "mkv")
        .when(F.col("doc_id") % 3 == 1, "json")
        .otherwise("json.gz")
    )
    key = F.concat(
        F.lit("tw/"),
        F.md5(
            F.concat(
                F.col("source"), F.lit("/"), F.col("doc_id").cast("string")
            ).cast("binary")
        ),
    )
    return (
        d.select(suffix.alias("suffix"), key.alias("key"))
        .select("suffix", "key", tiered_routing(F.col("suffix")).alias("storage_class"))
        .groupBy("storage_class", "suffix")
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            F.countDistinct("key").alias("n_keys"),
        )
        .orderBy("storage_class", "suffix")
    )


@register(
    "io1_ingest_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT)                 AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT)  AS n_users,
           round(sum(value), 2)                     AS sum_value,
           min(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f')) AS first_ts,
           max(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f')) AS last_ts,
           CAST((SELECT least(4, count(*)) FROM events) AS BIGINT) AS n_src_files
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="R4 ingestion surface, driver-scored: export events as gzipped "
    "JSONL (identity + ISO timestamp, exactly 4 files) and headered "
    "CSV (measures), read both back through sources.readers with "
    "explicit schemas (no inference pass), equi-join on event_id, and "
    "aggregate. The oracle computes the same aggregate straight from "
    "the parquet view, so a hash match proves the JSONL.gz and CSV "
    "round-trips preserved every value — type fidelity of the readers "
    "is the operator under test (reference: JSON sidecars "
    "convert.sh:58-65, CSV/text logs convert.sh:12-15). n_src_files "
    "comes from sources.readers.with_file_metadata over the JSONL "
    "read (distinct _metadata paths), scoring the directory-listing "
    "surface (R1, manager.py:369) against the writer's fan-out — "
    "least(4, n_rows), since round-robin repartition(4) leaves a "
    "partition (hence a row-bearing file) empty only when there are "
    "fewer rows than partitions.",
    tags=("io", "sources", "etl"),
)
def io1(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from tw_etl_spark.sources.readers import read_csv, read_json, with_file_metadata

    # Deterministic scratch dir per source (overwrite mode keeps reruns
    # idempotent); the read-back plan stays lazy, so files must outlive
    # this callable — they cannot be a mkdtemp cleaned up here.
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"tw_etl_spark_io1_{tag}")
    jpath, cpath = os.path.join(base, "events_jsonl"), os.path.join(base, "events_csv")

    e = _t(spark, sf_dir, "events")
    iso_ts = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts_iso")
    (
        e.select("event_id", "user_id", "event_type", iso_ts)
        .repartition(4)  # known writer fan-out, asserted via _metadata below
        .write.mode("overwrite")
        .option("compression", "gzip")
        .json(jpath)
    )
    (
        e.select("event_id", "value")
        .write.mode("overwrite")
        .option("header", True)
        .csv(cpath)
    )

    j = read_json(
        spark,
        jpath,
        schema="event_id BIGINT, user_id BIGINT, event_type STRING, ts_iso STRING",
    )
    c = read_csv(spark, cpath, schema="event_id BIGINT, value DOUBLE")
    # Directory-listing surface: count the writer's files through the
    # _metadata column (no driver-side os.listdir). A bounded action —
    # one distinct over file paths, not data.
    n_files = with_file_metadata(j).select("file_path").distinct().count()
    return (
        j.join(c, "event_id")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("ts_iso").alias("first_ts"),
            F.max("ts_iso").alias("last_ts"),
        )
        .withColumn("n_src_files", F.lit(n_files).cast("bigint"))
        .orderBy("event_type")
    )


@register(
    "io2_columnar_roundtrip",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT)                    AS n_rows,
           round(sum(l_quantity), 2)                   AS sum_qty,
           round(sum(l_extendedprice), 2)              AS sum_price,
           round(sum(o_totalprice), 2)                 AS sum_total,
           CAST(count(DISTINCT o_custkey) AS BIGINT)   AS n_custs,
           strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS first_ship,
           strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS last_ship
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '2001-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Columnar write-side surface, driver-scored: export a lineitem "
    "slice as Hive-partitioned ORC (partition column round-trips "
    "through directory names; BIGINT/DOUBLE/TIMESTAMP through the ORC "
    "encoder) and orders as z-ordered parquet (write_zordered's range "
    "shuffle + within-file sort must preserve row content exactly), "
    "read both back through sources.readers, equi-join and aggregate. "
    "The oracle computes the same aggregate straight from the parquet "
    "views, so a hash match proves both sinks are value-faithful — "
    "layout is the only thing they may change (reference: tiered "
    "columnar archive s3-sync.sh:27-67).",
    tags=("io", "sources", "etl"),
)
def io2(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from tw_etl_spark.operators.zorder import write_zordered
    from tw_etl_spark.sources.readers import read_orc, write_orc

    # Same scratch discipline as io1: deterministic per-sf dir,
    # overwrite mode, files must outlive this callable (lazy read-back).
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"tw_etl_spark_io2_{tag}")
    opath, zpath = os.path.join(base, "li_orc"), os.path.join(base, "orders_z")

    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    write_orc(
        li.select(
            "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice", "l_shipdate"
        ),
        opath,
        partition_cols=["l_returnflag"],
    )
    write_zordered(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        zpath,
        "o_custkey",
        "o_totalprice",
        num_files=4,
    )

    li_back = read_orc(spark, opath)
    o_back = spark.read.parquet(zpath)
    return (
        li_back.join(o_back, li_back.l_orderkey == o_back.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
            F.countDistinct("o_custkey").alias("n_custs"),
            F.date_format(F.min("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("first_ship"),
            F.date_format(F.max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("last_ship"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "x1_training_data_pipeline",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, lang, text,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
        WHERE n_chars BETWEEN 20 AND 100000 AND lang IN ('en', 'de', 'fr')
    ),
    keep_exact AS (
        SELECT min(doc_id) AS doc_id FROM base GROUP BY md5(text)
    ),
    b2 AS (
        SELECT b.doc_id, b.lang, list_distinct(b.toks) AS toks, len(b.toks) AS n_tok
        FROM base b JOIN keep_exact k ON b.doc_id = k.doc_id
    ),
    ex AS (SELECT doc_id AS doc, unnest(toks) AS tk FROM b2),
    sizes AS (SELECT doc_id AS doc, len(toks) AS n FROM b2),
    -- Component-equivalent edge reduction (VERDICT r11 #3): the old
    -- all-pairs shared-token self-join was quadratic in hot-token df
    -- and exhausted the box's disk at sf1; this fixture family is
    -- tiny-vocabulary, so EVERY token is hot and plain prefix
    -- filtering degenerates too (measured: 160M prefix candidates at
    -- sf1 even over distinct-set representatives). Three EXACT tiers
    -- compose — J = i/u >= 0.95 and u > i force i >= 19*(u-i), so a
    -- qualifying pair has (u-i = 0) identical sets, (u-i = 1, i>=19)
    -- sets differing by exactly one element, or (u-i>=2) i >= 38,
    -- i.e. BOTH sides hold >= 38 distinct tokens:
    -- (A) identical sets: group docs by canonical set key; STAR edges
    --     to the group min are component-equivalent to the quadratic
    --     within-group pair listing;
    -- (B) one-element difference: B = A minus one token — join A's
    --     1-DELETION keys against B's full key over distinct-set
    --     representatives (J(x,y) = J(rep_x, rep_y)); |B| >= 19 is
    --     the exact threshold test, no shared-count needed;
    -- (C) u-i >= 2: both n >= 38 — the PPJoin prefix-filtered
    --     candidate join (lossless under any global token order) +
    --     length gate + exact shared-count verify, restricted to
    --     n >= 38 representatives (empty at these fixtures, kept so
    --     the oracle stays exact for arbitrary corpora).
    setkey AS (
        SELECT doc_id AS doc,
               md5(array_to_string(list_sort(toks), chr(1))) AS sk
        FROM b2
    ),
    grp AS (SELECT sk, min(doc) AS rep FROM setkey GROUP BY sk),
    star AS (
        SELECT g.rep AS id_a, s.doc AS id_b
        FROM setkey s JOIN grp g USING (sk)
        WHERE s.doc <> g.rep
    ),
    rsets AS (
        SELECT g.rep AS doc, list_sort(b.toks) AS st, len(b.toks) AS n
        FROM grp g JOIN b2 b ON b.doc_id = g.rep
    ),
    fullkey AS (
        SELECT doc, n, md5(array_to_string(st, chr(1))) AS k FROM rsets
    ),
    delpos AS (
        SELECT doc, n, st, unnest(generate_series(1, n)) AS j FROM rsets
    ),
    delk AS (
        SELECT doc, n,
               md5(array_to_string(
                   list_concat(st[1:j - 1], st[j + 1:len(st)]), chr(1)
               )) AS k
        FROM delpos
    ),
    contain AS (
        SELECT least(f.doc, d.doc) AS id_a,
               greatest(f.doc, d.doc) AS id_b
        FROM fullkey f
        JOIN delk d ON f.k = d.k AND f.doc <> d.doc
        WHERE f.n >= 19
    ),
    rex AS (
        SELECT e.doc, e.tk
        FROM ex e
        JOIN grp g ON g.rep = e.doc
        JOIN sizes z ON z.doc = e.doc
        WHERE z.n >= 38
    ),
    df_rank AS (SELECT tk, count(*) AS df FROM rex GROUP BY tk),
    ranked AS (
        SELECT e.doc, e.tk,
               row_number() OVER (
                   PARTITION BY e.doc ORDER BY d.df, e.tk
               ) AS rn
        FROM rex e JOIN df_rank d USING (tk)
    ),
    pre AS (
        SELECT r.doc, r.tk
        FROM ranked r JOIN sizes s ON s.doc = r.doc
        WHERE r.rn <= s.n - ceil(0.95 * s.n) + 1
    ),
    cand AS (
        SELECT c.id_a, c.id_b
        FROM (
            SELECT a.doc AS id_a, b.doc AS id_b
            FROM pre a JOIN pre b ON a.tk = b.tk AND a.doc < b.doc
            GROUP BY 1, 2
        ) c
        JOIN sizes sa ON sa.doc = c.id_a
        JOIN sizes sb ON sb.doc = c.id_b
        WHERE least(sa.n, sb.n) >= ceil(0.95 * greatest(sa.n, sb.n))
    ),
    shared AS (
        SELECT c.id_a, c.id_b, count(*) AS sh
        FROM cand c
        JOIN rex ea ON ea.doc = c.id_a
        JOIN rex eb ON eb.doc = c.id_b AND eb.tk = ea.tk
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM shared
        JOIN sizes sa ON id_a = sa.doc
        JOIN sizes sb ON id_b = sb.doc
        WHERE (CASE WHEN (sh) < 0 THEN -(((abs(sh)::BIGINT * 1000000) // ((sa.n + sb.n - sh)::BIGINT)) + CASE WHEN 2 * ((abs(sh)::BIGINT * 1000000) % ((sa.n + sb.n - sh)::BIGINT)) >= ((sa.n + sb.n - sh)::BIGINT) THEN 1 ELSE 0 END) ELSE (((abs(sh)::BIGINT * 1000000) // ((sa.n + sb.n - sh)::BIGINT)) + CASE WHEN 2 * ((abs(sh)::BIGINT * 1000000) % ((sa.n + sb.n - sh)::BIGINT)) >= ((sa.n + sb.n - sh)::BIGINT) THEN 1 ELSE 0 END) END / 1000000.0) >= 0.95
    ),
    und AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
        UNION SELECT id_a, id_b FROM star
        UNION SELECT id_b, id_a FROM star
        UNION SELECT id_a, id_b FROM contain
        UNION SELECT id_b, id_a FROM contain
    ),
    {_comp_cte()},
    survivors AS (
        SELECT * FROM b2
        WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM survivors GROUP BY lang ORDER BY lang
    """,
    doc="End-to-end training-data curation: quality/lang gate -> exact "
    "dedup (keep min id per md5) -> near-dup collapse (Jaccard>=0.95 "
    "pairs -> connected components -> survivor anti-join) -> per-lang "
    "corpus stats. One composed DataFrame plan; every stage is the "
    "library operator it demos.",
    tags=("pipeline", "dedup", "ext"),
)
def x1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.dedup import (
        dedup_by_components,
        exact_dedup,
        exact_jaccard_components,
    )
    from tw_etl_spark.operators.text import tokens_expr

    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("n_chars").between(20, 100000))
        .filter(F.col("lang").isin("en", "de", "fr"))
    )
    d = exact_dedup(d, content_col="text", id_col="doc_id")
    labels = exact_jaccard_components(d, threshold=0.95)
    survivors = dedup_by_components(d, labels=labels).withColumn(
        "n_tok", F.size(tokens_expr(F.col("text")))
    )
    return (
        survivors.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .orderBy("lang")
    )


_MIX_RATES = {"en": 0.5, "de": 0.25}
_BUCKET_SQL = (
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " % 10000"
)


@register(
    "x4_stratified_mix",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_in,
           CAST(count(*) FILTER (bucket <
               CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500
                         ELSE 10000 END) AS BIGINT) AS n_kept
    FROM (SELECT lang, {_BUCKET_SQL} AS bucket FROM documents)
    GROUP BY lang ORDER BY lang
    """,
    doc="Deterministic stratified downsampling (domain mixing): keep "
    "50% of en, 25% of de, 100% of other languages, decided by "
    "md5(doc_id) bucket — map-only, reproducible across engines and "
    "partitionings. Output: per-language in/kept counts.",
    tags=("pipeline", "sampling", "ext"),
)
def x4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents")
    kept = stratified_sample(d, "lang", _MIX_RATES, id_col="doc_id")
    tot = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_in"))
    k = kept.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    return (
        tot.join(k, "lang", "left")
        .select("lang", "n_in", F.coalesce("n_kept", F.lit(0)).alias("n_kept"))
        .orderBy("lang")
    )


@register(
    "x5_benchmark_decontaminate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    ),
    grams AS (
        SELECT doc_id, lang,
               CASE WHEN len(toks) >= 3 THEN
                   list_transform(generate_series(1, len(toks) - 2),
                       i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
               ELSE [] END AS tg
        FROM toks
    ),
    bench AS (
        SELECT DISTINCT unnest(tg) AS g FROM grams WHERE doc_id % 97 = 0
    ),
    corpus AS (SELECT * FROM grams WHERE doc_id % 97 <> 0),
    dirty AS (
        SELECT DISTINCT doc_id
        FROM (SELECT doc_id, unnest(tg) AS g FROM corpus)
        WHERE g IN (SELECT g FROM bench)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (doc_id IN (SELECT doc_id FROM dirty))
                AS BIGINT) AS n_contaminated
    FROM corpus GROUP BY lang ORDER BY lang
    """,
    doc="Benchmark decontamination: flag corpus docs sharing any token "
    "trigram with a held-out benchmark slice (doc_id %% 97 == 0). The "
    "benchmark reduces to a broadcast set of distinct n-gram hashes, so "
    "the corpus-side membership test runs inside the scan stage with no "
    "shuffle of exploded n-grams.",
    tags=("pipeline", "dedup", "contamination", "ext"),
)
def x5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.dedup import ngram_decontaminate

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    marked = ngram_decontaminate(corpus, bench, n=3, mark_only=True)
    return (
        marked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_if(F.col("contaminated")).cast("bigint").alias("n_contaminated"),
        )
        .orderBy("lang")
    )


@register(
    "x11_bloom_decontaminate",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               CASE WHEN len(toks) >= 3 THEN
                   list_transform(generate_series(1, len(toks) - 2),
                       i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
               ELSE [] END AS tg
        FROM toks
    ),
    bench AS (SELECT DISTINCT unnest(tg) AS g FROM grams WHERE doc_id % 97 = 0),
    corpus AS (SELECT * FROM grams WHERE doc_id % 97 <> 0),
    pos AS (
        SELECT DISTINCT (('0x' || substr(md5(i.range::VARCHAR || ':' || g),
                          1, 8))::BIGINT % 65536) AS p
        FROM bench CROSS JOIN range(3) i
    ),
    bm AS (
        SELECT p // 64 AS w, bit_or(1::UBIGINT << (p % 64)::INT) AS bits
        FROM pos GROUP BY 1
    ),
    bmap AS (
        -- dense 1024-word bitmap, identical to the literal array the
        -- Spark side folds into its expression
        SELECT list(coalesce(b.bits, 0::UBIGINT) ORDER BY r.range) AS bits
        FROM range(1024) r LEFT JOIN bm b ON b.w = r.range
    ),
    ghit AS (
        SELECT doc_id,
               ((bits[((('0x' || substr(md5('0:' || g), 1, 8))::BIGINT % 65536) // 64) + 1] >> ((('0x' || substr(md5('0:' || g), 1, 8))::BIGINT % 65536) % 64)::INT) & 1) = 1
               AND ((bits[((('0x' || substr(md5('1:' || g), 1, 8))::BIGINT % 65536) // 64) + 1] >> ((('0x' || substr(md5('1:' || g), 1, 8))::BIGINT % 65536) % 64)::INT) & 1) = 1
               AND ((bits[((('0x' || substr(md5('2:' || g), 1, 8))::BIGINT % 65536) // 64) + 1] >> ((('0x' || substr(md5('2:' || g), 1, 8))::BIGINT % 65536) % 64)::INT) & 1) = 1 AS hit,
               g IN (SELECT g FROM bench) AS exact
        FROM (SELECT doc_id, unnest(tg) AS g FROM corpus), bmap
    ),
    hits AS (
        SELECT doc_id,
               count(*) AS n_g,
               count(*) FILTER (hit) AS n_hit,
               bool_or(exact) AS dirty
        FROM ghit GROUP BY doc_id
    )
    SELECT c.doc_id,
           coalesce(h.n_g, 0)::BIGINT AS n_grams,
           coalesce(h.n_hit, 0)::BIGINT AS n_bloom_hits,
           coalesce(h.dirty, FALSE) AS contaminated
    FROM corpus c LEFT JOIN hits h USING (doc_id)
    ORDER BY c.doc_id
    """,
    doc="Bloom-prefiltered decontamination — the 100 TB tier of x5, "
    "with the FILTER ITSELF under the hash oracle: the benchmark "
    "slice's trigrams build a 65536-bit / 3-hash md5-derived Bloom "
    "bitmap that both engines reconstruct bit for bit, so the per-doc "
    "Bloom hit counts (INCLUDING false positives) hash-match, not just "
    "the exact verdict. Spark folds the 1024-long bitmap into the "
    "corpus expression as literals (8 KiB in the task binary): the "
    "membership test is a zero-shuffle narrow map over the n-gram "
    "array, and only Bloom-passing grams explode into the exact "
    "broadcast semi-join — Bloom pushdown exactly as warehouse engines "
    "apply it, cutting the explode/join volume by the false-positive "
    "rate. contaminated equals x5's exact verdict bit for bit.",
    tags=("pipeline", "dedup", "contamination", "bloom", "ext"),
)
def x11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.dedup import bloom_decontaminate

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    return bloom_decontaminate(
        corpus, bench, n=3, m_bits=65536, k_hashes=3
    ).orderBy("doc_id")


@register(
    "x6_deterministic_shuffle",
    oracle="""
    SELECT doc_id,
           md5(concat(CAST(doc_id AS VARCHAR), 'r1')) AS shuffle_key,
           CAST(row_number() OVER (
                ORDER BY md5(concat(CAST(doc_id AS VARCHAR), 'r1')), doc_id)
                AS BIGINT) AS pos
    FROM documents
    ORDER BY pos
    """,
    doc="Deterministic global corpus permutation (the training-data "
    "shuffle): order = md5(doc_id + salt), a pure function of content — "
    "reproducible across engines, runs, and cluster sizes. Scale path is "
    "a range-partitioned sort (repartitionByRange on the uniform hash "
    "key), not a global row_number; pos here exists to hash-verify the "
    "permutation against the oracle.",
    tags=("pipeline", "shuffle", "ext"),
)
def x6(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from tw_etl_spark.operators.sampling import deterministic_shuffle

    d = _t(spark, sf_dir, "documents")
    out = deterministic_shuffle(d, "doc_id", salt="r1")
    w = Window.orderBy("shuffle_key", "doc_id")
    return out.select(
        "doc_id",
        "shuffle_key",
        F.row_number().over(w).cast("bigint").alias("pos"),
    ).orderBy("pos")


@register(
    "x7_document_chunking",
    oracle="""
    WITH starts AS (
        SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text), 1), 150))
                   AS chunk_start
        FROM documents
    )
    SELECT doc_id,
           CAST((chunk_start - 1) // 150 AS BIGINT) AS chunk_id,
           CAST(chunk_start AS BIGINT) AS chunk_start,
           md5(substring(text, CAST(chunk_start AS INTEGER), 200)) AS chunk_md5,
           CAST(length(substring(text, CAST(chunk_start AS INTEGER), 200))
                AS BIGINT) AS chunk_len
    FROM starts
    ORDER BY doc_id, chunk_id
    """,
    doc="Context-window chunking for LLM training: 200-char chunks, "
    "stride 150 (50 overlap), via sequence()+explode+substring — one "
    "generate inside the scan stage, no shuffle, no Python. Chunks are "
    "md5'd so the oracle hash-verifies every chunk's exact content.",
    tags=("pipeline", "text", "ext"),
)
def x7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.text import chunk_documents

    d = _t(spark, sf_dir, "documents")
    c = chunk_documents(d, id_col="doc_id", text_col="text", size=200, stride=150)
    return c.select(
        "doc_id",
        "chunk_id",
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.md5("chunk_text").alias("chunk_md5"),
        F.length("chunk_text").cast("bigint").alias("chunk_len"),
    ).orderBy("doc_id", "chunk_id")


@register(
    "x8_merge_upsert",
    oracle="""
    WITH base AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
    updates AS (
        SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               o_totalprice + 1000.0 AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    merged AS (
        SELECT * FROM updates
        UNION ALL
        SELECT b.* FROM base b
        WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM updates)
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="SCD-1 merge/upsert: fold a CDC-style delta (every 3rd order, "
    "repriced +1000 — an IEEE-exact update so both engines agree "
    "bit-for-bit; x*1.1 would land on half-cent midpoints where "
    "Spark's string-based and DuckDB's binary-based decimal casts "
    "disagree — status 'U') into a snapshot (orders minus every 7th). "
    "Implemented as broadcast ANTI JOIN + UNION so the 100 TB snapshot "
    "side never shuffles (operators/merge.py); verified by per-status "
    "row/key/price totals.",
    tags=("pipeline", "merge", "etl"),
)
def x8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.merge import merge_upsert

    o = _t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 7 != 0)
    updates = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    merged = merge_upsert(base, updates, ["o_orderkey"])
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("o_orderkey").cast("bigint").alias("n_keys"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "x9_temperature_mix",
    oracle=f"""
    WITH c AS (
        SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY lang
    ), r AS (
        SELECT lang, n, pow((SELECT min(n) FROM c) / n, 0.5) AS rate FROM c
    )
    SELECT d.lang,
           CAST(r.n AS BIGINT)                                  AS n_in,
           CAST(count(*) FILTER ({_BUCKET_SQL} <
                CAST(floor(r.rate * 10000) AS BIGINT)) AS BIGINT) AS n_kept,
           round(r.rate, 6)                                      AS keep_rate
    FROM documents d JOIN r ON d.lang = r.lang
    GROUP BY d.lang, r.n, r.rate
    ORDER BY d.lang
    """,
    doc="Temperature-based domain re-mixing (p_d ∝ n_d^0.5): the rarest "
    "language keeps everything, dominant languages are md5-bucket "
    "downsampled toward uniform. One bounded counting aggregate + a "
    "literal-folded narrow-map filter; alpha=0.5 keeps the rate "
    "arithmetic (sqrt of a quotient) bit-identical across engines.",
    tags=("pipeline", "sampling", "ext"),
)
def x9(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.sampling import temperature_mix

    d = _t(spark, sf_dir, "documents")
    kept, rates = temperature_mix(d, "lang", id_col="doc_id", alpha=0.5)
    tot = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_in"))
    k = kept.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    rate_col: F.Column | None = None
    for lang, r in rates.items():
        c = F.col("lang") == lang
        rate_col = F.when(c, F.lit(r)) if rate_col is None else rate_col.when(c, F.lit(r))
    return (
        tot.join(k, "lang", "left")
        .select(
            "lang",
            "n_in",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.round(rate_col, 6).alias("keep_rate"),
        )
        .orderBy("lang")
    )


@register(
    "x10_scd2_merge",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_totalprice, o_orderdate AS effective_from,
               CAST(NULL AS DATE) AS effective_to, true AS is_current
        FROM orders WHERE o_orderkey % 7 <> 0
    ), upd AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 9 = 0 THEN o_totalprice
                    ELSE o_totalprice + 1000.0 END AS o_totalprice,
               DATE '1998-12-01' AS effective_from
        FROM orders WHERE o_orderkey % 3 = 0
    ), changed AS (
        SELECT b.o_orderkey, b.o_totalprice AS old_p, b.effective_from AS old_f,
               u.o_totalprice AS new_p, u.effective_from AS ch
        FROM base b JOIN upd u USING (o_orderkey)
        WHERE b.o_totalprice <> u.o_totalprice
    ), final AS (
        SELECT * FROM base
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changed)
        UNION ALL
        SELECT o_orderkey, old_p, old_f, ch, false FROM changed
        UNION ALL
        SELECT o_orderkey, new_p, ch, CAST(NULL AS DATE), true FROM changed
        UNION ALL
        SELECT u.o_orderkey, u.o_totalprice, u.effective_from,
               CAST(NULL AS DATE), true
        FROM upd u WHERE u.o_orderkey NOT IN (SELECT o_orderkey FROM base)
    )
    SELECT is_current,
           (effective_to IS NOT NULL)                      AS closed,
           CAST(count(*) AS BIGINT)                        AS n_rows,
           CAST(count(DISTINCT o_orderkey) AS BIGINT)      AS n_keys,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM final
    GROUP BY is_current, closed
    ORDER BY is_current, closed
    """,
    doc="SCD-2 history-preserving merge: changed keys get their current "
    "version closed (effective_to = change date) plus a new current "
    "version; equal-payload updates are no-ops; unseen keys insert as "
    "first versions. The 100 TB base streams through two shuffle-free "
    "broadcast joins (operators/merge.py scd2_merge; closed+replacement "
    "rows emitted in ONE pass via array+explode). Update prices use "
    "+1000.0 (IEEE-exact) per the cross-engine decimal-cast contract.",
    tags=("pipeline", "merge", "scd2", "etl"),
)
def x10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.merge import scd2_merge

    o = _t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderdate").alias("effective_from"),
        F.lit(None).cast("date").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    upd = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 9 == 0, F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice") + 1000.0)
        .alias("o_totalprice"),
        F.lit("1998-12-01").cast("date").alias("effective_from"),
    )
    merged = scd2_merge(
        base, upd, keys=["o_orderkey"], payload_cols=["o_totalprice"]
    )
    return (
        merged.groupBy(
            "is_current", F.col("effective_to").isNotNull().alias("closed")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("o_orderkey").cast("bigint").alias("n_keys"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("is_current", "closed")
    )


# The DSIR weight derivation, shared verbatim by the x12 oracle and
# the x14 resample oracle (which consumes wd's w_micro downstream).
_DSIR_WITH = """
    WITH tok AS (
        SELECT doc_id, lang,
               list_filter(string_split(text, ' '), t -> t <> '') AS tk
        FROM documents
    ), posed AS (
        SELECT doc_id, lang, tk, unnest(range(1, len(tk))) AS i
        FROM tok WHERE len(tk) >= 2
    ), bg AS (
        SELECT doc_id, lang = 'en' AS is_t,
               ('0x' || substr(md5(tk[i] || ' ' || tk[i + 1]), 1, 8))::BIGINT
                   % 1024 AS b
        FROM posed
    ), dc AS (
        SELECT doc_id, is_t, b, count(*)::BIGINT AS c
        FROM bg GROUP BY doc_id, is_t, b
    ), bc AS (
        SELECT b, sum(c)::BIGINT AS s_g,
               coalesce(sum(c) FILTER (WHERE is_t), 0)::BIGINT AS t_g
        FROM dc GROUP BY b
    ), tot AS (
        SELECT sum(s_g)::BIGINT AS s_tot, sum(t_g)::BIGINT AS t_tot FROM bc
    ), lr AS (
        SELECT b,
               CAST(round((ln((t_g + 1.0) / (t_tot + 1024.0))
                         - ln((s_g + 1.0) / (s_tot + 1024.0))) * 1000000)
                    AS BIGINT) AS lr_micro
        FROM bc, tot
    ), wd AS (
        SELECT doc_id, sum(c)::BIGINT AS n_bigrams,
               sum(c * lr_micro)::BIGINT AS w_micro
        FROM dc JOIN lr USING (b) GROUP BY doc_id
    )"""


@register(
    "x12_dsir_weights",
    oracle=_DSIR_WITH
    + """
    SELECT d.doc_id,
           coalesce(w.n_bigrams, 0)::BIGINT AS n_bigrams,
           coalesce(w.w_micro, 0)::BIGINT AS w_micro,
           coalesce(w.w_micro, 0)::BIGINT / 1000000.0 AS dsir_w
    FROM documents d LEFT JOIN wd w USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc="DSIR hashed importance weights (Xie et al. 2023, "
    "arXiv:2302.03169): per-doc log importance of the lang='en' target "
    "vs the raw corpus over 1024 md5-hashed bigram buckets, Laplace "
    "smoothed. The per-bucket log-ratio is rounded ONCE to integer "
    "micro-units, per-doc accumulation is an exact BIGINT sum (the "
    "round-9 determinism discipline for transcendental folds), and "
    "the oracle replays bucket hash, smoothing, and fold verbatim — "
    "the data-SELECTION signal itself sits under the hash oracle.",
    tags=("mixing", "sampling", "dsir", "ext"),
)
def x12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.sampling import dsir_importance_weights

    d = _t(spark, sf_dir, "documents")
    return dsir_importance_weights(
        d, target=F.col("lang") == "en", buckets=1024
    ).orderBy("doc_id")


from tw_etl_spark.functions.rounding import sql_floor_div, sql_round_ratio_long

_TOKS_SQL = "list_filter(string_split(text, ' '), t -> t <> '')"

_X13_SCORE = sql_round_ratio_long("a.s", "a.n")
_X13_BIN = sql_floor_div("(score - lo) * 64", "hi - lo")


@register(
    "x13_quantile_quality_gate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tk FROM documents
    ), feats AS (
        SELECT doc_id,
               (('0x' || substr(md5('w:' ||
                     (('0x' || substr(md5(tk), 1, 4))::BIGINT % 1024)::VARCHAR
                   ), 1, 8))::BIGINT % 2001 - 1000) AS w_milli
        FROM toks
    ), agg AS (
        SELECT doc_id, sum(w_milli)::BIGINT AS s, count(*)::BIGINT AS n
        FROM feats GROUP BY doc_id
    ), scored AS (
        SELECT d.doc_id, coalesce({_X13_SCORE}, 0)::BIGINT AS score
        FROM documents d LEFT JOIN agg a USING (doc_id)
    ), stats AS (
        SELECT min(score) AS lo, max(score) AS hi, count(*)::BIGINT AS total
        FROM scored
    ), binned AS (
        SELECT doc_id, score,
               (CASE WHEN hi = lo THEN 0
                     ELSE least(63, {_X13_BIN}) END)::BIGINT AS bin_idx
        FROM scored, stats
    ), hist AS (
        SELECT bin_idx, count(*)::BIGINT AS cnt FROM binned GROUP BY bin_idx
    ), cum AS (
        SELECT bin_idx, sum(cnt) OVER (ORDER BY bin_idx)::BIGINT AS cum
        FROM hist
    ), thr AS (
        SELECT min(bin_idx)::BIGINT AS thr_idx FROM cum, stats
        WHERE cum * 100 >= 70 * total
    )
    SELECT b.doc_id, b.score, b.bin_idx, t.thr_idx,
           b.bin_idx > t.thr_idx AS kept
    FROM binned b, thr t
    ORDER BY b.doc_id
    """,
    doc="FineWeb-style keep-the-top-quality-slice gate (Penedo et al. "
    "2024, arXiv:2406.17557): the t15 hashed-classifier score as an "
    "exact BIGINT (round-half-away milli-mean), a 64-bin mergeable "
    "histogram (the a13 tier: 64 longs of shuffle at any corpus size), "
    "integer crossing test 100*cum >= 70*total, and a strictly-above-"
    "the-crossing-bin keep rule — the global-threshold selection "
    "pattern every quality-filtered pretraining corpus runs, decided "
    "entirely in integer space so the threshold is engine-exact. Two "
    "scan-speed passes, zero data-sized shuffle (plan-asserted).",
    tags=("sampling", "quality", "quantile", "ext"),
)
def x13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.quality import milli_score_col
    from tw_etl_spark.operators.sampling import quantile_gate

    d = _t(spark, sf_dir, "documents")
    return quantile_gate(
        d, milli_score_col(F.col("text")), bins=64, pct=70
    ).orderBy("doc_id")


_X14_SHIFT = sql_floor_div("w_micro", "16")


@register(
    "x14_importance_resample",
    oracle=_DSIR_WITH
    + f""",
    w AS (
        SELECT d.doc_id, coalesce(wd.w_micro, 0)::BIGINT AS w_micro
        FROM documents d LEFT JOIN wd USING (doc_id)
    ), rs AS (
        SELECT doc_id, w_micro,
               (('0x' || substr(md5('rs:' || doc_id::VARCHAR), 1, 12))::BIGINT
                   % 1000000)::BIGINT AS u_micro,
               least(1000000::BIGINT,
                     greatest(0::BIGINT,
                              500000 + {_X14_SHIFT}))::BIGINT AS accept_micro
        FROM w
    )
    SELECT doc_id, w_micro, u_micro, accept_micro,
           u_micro < accept_micro AS kept
    FROM rs
    ORDER BY doc_id
    """,
    doc="DSIR selection step (Xie et al. 2023 \u00a73) as a deterministic "
    "importance-weighted Bernoulli resample: the x12 micro-unit log "
    "weights through a clamped-linear acceptance curve (integer-exact "
    "stand-in for exp acceptance \u2014 monotone, saturating, no libm in "
    "the keep decision), against a portable md5-derived uniform. "
    "Membership is a pure per-row predicate: map-only, no RNG state, "
    "partitioning-independent \u2014 reproducible forever at 100 TB.",
    tags=("sampling", "dsir", "ext"),
)
def x14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.sampling import (
        dsir_importance_weights,
        importance_resample,
    )

    d = _t(spark, sf_dir, "documents")
    w = dsir_importance_weights(d, target=F.col("lang") == "en", buckets=1024)
    return (
        importance_resample(w.select("doc_id", "w_micro"))
        .select("doc_id", "w_micro", "u_micro", "accept_micro", "kept")
        .orderBy("doc_id")
    )


@register(
    "io5_schema_evolution_read",
    oracle="""
    SELECT CASE WHEN o_orderkey % 2 = 1 THEN
                CASE WHEN o_custkey % 2 = 0 THEN 'web' ELSE 'app' END
                ELSE 'legacy' END AS channel,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY 1
    ORDER BY channel
    """,
    doc="Schema-drift ingestion surface: generation 1 of a feed "
    "(o_orderkey even — no channel column) and generation 2 (odd — "
    "adds channel) land as parquet in ONE directory; the read uses "
    "mergeSchema=true so the union schema resolves per file footer and "
    "gen-1 rows surface the added column as NULL (coalesced to "
    "'legacy'). The oracle recomputes from the source table, so the "
    "hash match proves the merged read lost no rows and attributed "
    "the evolved column correctly. At 100 TB schema drift across "
    "months of feed generations is the normal case, not the "
    "exception — this is the read posture that survives it.",
    tags=("io", "schema-evolution", "ext"),
)
def io5(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"tw_etl_spark_io5_{tag}")
    shutil.rmtree(root, ignore_errors=True)

    o = _t(spark, sf_dir, "orders")
    gen1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    gen2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_custkey") % 2 == 0, "web")
        .otherwise("app")
        .alias("channel"),
    )
    gen1.write.parquet(os.path.join(root, "gen=1"))
    gen2.write.parquet(os.path.join(root, "gen=2"))

    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "gen=1"), os.path.join(root, "gen=2")
    )
    return (
        merged.groupBy(
            F.coalesce(F.col("channel"), F.lit("legacy")).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("channel")
    )


@register(
    "x15_weighted_sample",
    oracle="""
    WITH w AS (SELECT doc_id, n_chars::BIGINT AS w FROM documents),
    keyed AS (
      SELECT doc_id, w,
             (('0x' || substr(md5('ws:' || doc_id::VARCHAR), 1, 12))::BIGINT
                 % 1000000)::BIGINT AS u_micro
      FROM w
    ), scored AS (
      SELECT doc_id, w, u_micro,
             round(ln((u_micro + 1)::DOUBLE / 1000001.0::DOUBLE)
                   * 1e9 / w, 0)::BIGINT AS key_nano
      FROM keyed
    ), ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY key_nano DESC, doc_id) AS rank,
             w, u_micro, key_nano
      FROM scored
    )
    SELECT doc_id, rank, w, u_micro, key_nano
    FROM ranked WHERE rank <= 50 ORDER BY rank
    """,
    doc="Weighted sampling WITHOUT replacement, exactly n rows in ONE "
    "pass (Efraimidis & Spirakis 2006): rank by u^(1/w) — here in log "
    "space, ln(u)/w, avoiding cross-engine pow — and take the top-n. "
    "The complement of x14's Bernoulli resample: x14 keeps each row "
    "with probability accept(w) (variable size); this answers 'give "
    "me exactly n, heavier rows proportionally more likely' — the "
    "sample-10M-of-10B-proportional-to-quality selection a curation "
    "pipeline runs. u is the portable md5 uniform (RNG-free, "
    "partitioning-independent), the key is quantized to integer NANO "
    "units with id tie-break, so selection AND order hash-match "
    "DuckDB. Scale shape: one scan -> narrow map -> "
    "TakeOrderedAndProject (per-partition heaps); no shuffle, no RNG "
    "state, no second pass. Fixture weights = document length.",
    tags=("sampling", "weighted", "ext"),
)
def x15(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.sampling import weighted_sample_topn

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("w")
    )
    return weighted_sample_topn(d, 50).orderBy("rank")
