"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on a synthetic
transcripts table (the engine's true input shape per
BASELINE.json:input_hint — payloads are deterministic fixture pages,
so no external data is involved).

``queries()`` exposes one entry per implemented operator from
SURVEY.md §2 plus the training-data extras (dedup / similarity / text
stats / multimodal); ``oracle_sql()`` provides exact DuckDB
equivalents for everything SQL-expressible.  Kernel-driven extraction
queries (pandas-UDF cascade) have no SQL equivalent and rely on the
pytest golden gate (tests/test_goldens.py) — they appear here with
rows-only checks.

Hash-portability contract: every cross-checked hash is md5-based
(functions/text.portable_hash64) and every float is round(x, 6), so
Spark and DuckDB produce bit-identical values.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from webtext_extraction_spark import rules
from webtext_extraction_spark.operators import dedup, relational, similarity, textstats
from webtext_extraction_spark.operators.dedup import (
    MINHASH_PRIME,
    TOKEN_SPACE,
    _perm_params,
)
from webtext_extraction_spark.functions import text as textfn

# ---------------------------------------------------------------------------
# shared synthetic columns (rendered identically on both engines)
# ---------------------------------------------------------------------------

# a URL column synthesized from documents, with excludable rows mixed
# in — shaped to hit several reference exclusion patterns (yahoo
# search + ?rs=4, resource suffix, bare `privacy` substring)
_URL_SQL = (
    "case when doc_id % 7 = 0 then "
    "concat('https://search.yahoo.co.jp/search/doc/', cast(doc_id as varchar), '?rs=4') "
    "when doc_id % 11 = 0 then "
    "concat('https://', source, '.example.com/doc/', cast(doc_id as varchar), '/style.css') "
    "when doc_id % 13 = 0 then "
    "concat('https://', source, '.example.com/privacy/', cast(doc_id as varchar)) "
    "else concat('https://', source, '.example.com/doc/', cast(doc_id as varchar), '/page') end"
)
_URL_SPARK = _URL_SQL.replace("as varchar", "as string")

_NAVTEXT_SPARK = (
    "case when doc_id % 5 = 0 then 'ログイン' when doc_id % 5 = 1 then 'ab' "
    "else substring(text, 1, 24) end"
)
_NAVTEXT_SQL = (
    "case when doc_id % 5 = 0 then 'ログイン' when doc_id % 5 = 1 then 'ab' "
    "else substr(text, 1, 24) end"
)

_TIMEOUT = rules.TIMEOUT_MARKER
_TEMPLATE0 = rules.FAILURE_TEMPLATES_WITH_URL[3]  # すべての抽出方法で…: {}
_ERRPAT = rules.ERROR_PATTERNS[1]  # ERR_TIMED_OUT

# text column with failure templates / timeout markers mixed in
_FTEXT_SPARK = (
    "case when doc_id % 10 = 0 then concat('"
    + _TEMPLATE0.replace("{}", "', url, '")
    + "') when doc_id % 10 = 1 then '"
    + _TIMEOUT
    + "' when doc_id % 10 = 2 then concat(text, ' "
    + _ERRPAT
    + "') else text end"
)
_FTEXT_SQL = _FTEXT_SPARK  # identical syntax in DuckDB

_NAV_PHRASES = ["key", "value", "table", "spark"]

# committed golden pinning entry()'s exact output (tests/gen_flagship_golden.py)
# — the DuckDB-readable oracle for the non-SQL-expressible kernel cascade
_FLAGSHIP_GOLDEN = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tests", "goldens", "flagship.parquet"
)


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline over a synthetic transcripts
    table (FIXTURES.md §1), stable (conv_id, turn_idx) output."""
    from webtext_extraction_spark.plans.pipeline import extraction_pipeline
    from webtext_extraction_spark.sources.transcripts import synth_transcripts

    transcripts = synth_transcripts(spark, num_conversations=40)
    out = extraction_pipeline(transcripts, salt_hot_keys=False)
    return out.select(
        "conv_id", "turn_idx", "role", "tool", "extracted_text", "strategy", "status"
    ).orderBy("conv_id", "turn_idx")


# ---------------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------------


def _q_extract_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return entry(spark)


def _q_extract_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webtext_extraction_spark.plans.pipeline import (
        extraction_pipeline,
        extraction_summary,
    )
    from webtext_extraction_spark.sources.transcripts import synth_transcripts

    out = extraction_pipeline(
        synth_transcripts(spark, num_conversations=40), salt_hot_keys=False
    )
    return extraction_summary(out)


def _docs_with_url(spark, sf_dir):
    return _load(spark, sf_dir, "documents").withColumn("url", F.expr(_URL_SPARK))


def _q_f1_url_exclusion(spark, sf_dir):
    docs = _docs_with_url(spark, sf_dir)
    return (
        relational.url_exclusion_filter(docs, "url")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("kept"))
        .orderBy("source")
    )


def _q_f3_nav_text_filter(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents").withColumn("anchor", F.expr(_NAVTEXT_SPARK))
    return (
        relational.nav_text_filter(docs, "anchor")
        .select("doc_id", "anchor")
        .orderBy("doc_id")
    )


def _q_f4_success_threshold(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return (
        relational.success_threshold(docs, "text")
        .groupBy("extraction_ok")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("extraction_ok")
    )


def _q_f5_failure_templates(spark, sf_dir):
    docs = _docs_with_url(spark, sf_dir).withColumn("ftext", F.expr(_FTEXT_SPARK))
    template_match = F.col("ftext") == F.concat(
        F.lit(_TEMPLATE0.split("{}")[0]), F.col("url"), F.lit(_TEMPLATE0.split("{}")[1])
    )
    is_failure = template_match & (F.col("ftext") != _TIMEOUT)
    return (
        docs.filter(~is_failure)
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("kept"))
        .orderBy("source")
    )


def _q_f6_error_patterns(spark, sf_dir):
    docs = _docs_with_url(spark, sf_dir).withColumn("ftext", F.expr(_FTEXT_SPARK))
    hit = None
    for p in rules.ERROR_PATTERNS:
        c = F.col("ftext").contains(p)
        hit = c if hit is None else (hit | c)
    return (
        docs.withColumn("is_error", hit)
        .groupBy("source", "is_error")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("source", "is_error")
    )


def _q_a5_nav_char_ratio(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        relational.nav_char_ratio(docs, "text", _NAV_PHRASES)
        .select("doc_id", "nav_ratio")
        .orderBy("doc_id")
    )


def _q_a1_ordered_distinct(spark, sf_dir):
    events = _load(spark, sf_dir, "events")
    return (
        dedup.ordered_distinct(
            events.withColumn("_ord", F.struct("ts", "event_id")), "user_id", "_ord"
        )
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    )


def _q_a4_topk_per_group(spark, sf_dir):
    events = _load(spark, sf_dir, "events")
    return (
        relational.topk_per_group(events, "event_type", "value", 3, "event_id")
        .select("event_type", "event_id", F.round("value", 6).alias("value"), "rank")
        .orderBy("event_type", "rank")
    )


def _q_a6_metrics_rollup(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("rows"),
            F.sum("n_chars").cast("long").alias("chars"),
            F.sum(F.length("text")).cast("long").alias("bytes_measured"),
        )
        .orderBy("source")
    )


def _q_j2_anti_join(spark, sf_dir):
    customer = _load(spark, sf_dir, "customer")
    big_orders = (
        _load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        relational.anti_join_completed(customer, big_orders, "c_custkey")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def _q_j3_broadcast_rule_lookup(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    rules_df = spark.createDataFrame(
        [("src0", "keep"), ("src1", "flag"), ("src2", "drop")],
        ["rule_source", "action"],
    )
    return (
        relational.broadcast_rule_lookup(docs, "source", rules_df, "rule_source")
        .withColumn("action", F.coalesce(F.col("action"), F.lit("none")))
        .groupBy("action")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("action")
    )


def _q_j4_lag_window(spark, sf_dir):
    events = _load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    lagged = relational.lag_over(
        events.withColumn("_o", F.struct("ts", "event_id")), "user_id", "_o", "value"
    )
    return lagged.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.coalesce(F.col("prev_value"), F.lit(0.0)), 6).alias(
            "delta"
        ),
    ).orderBy("user_id", "event_id")


def _q_o1_stable_topn(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.orderBy("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", F.round("l_quantity", 6).alias("qty"))
        .limit(1000)
    )


def _q_u2_union_sources(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "n_chars")
    b = docs.filter(F.col("n_chars") > 300).select("doc_id", "n_chars")
    return (
        relational.union_sources(a, b, "even", "long")
        .groupBy("source_name")
        .agg(F.count("*").cast("long").alias("n"), F.sum("n_chars").cast("long").alias("chars"))
        .orderBy("source_name")
    )


def _q_u3_set_difference(spark, sf_dir):
    cust = _load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k")).distinct()
    users = _load(spark, sf_dir, "events").select(F.col("user_id").alias("k")).distinct()
    return cust.exceptAll(cust.join(users, "k", "left_semi")).orderBy("k")


def _q_c1_url_strip(spark, sf_dir):
    docs = _docs_with_url(spark, sf_dir).withColumn(
        "wtext", F.concat(F.lit("see "), F.col("url"), F.lit(" mid www.x.example/y end "), F.col("text"))
    )
    return docs.select(
        "doc_id", textfn.strip_urls(F.col("wtext")).alias("cleaned")
    ).orderBy("doc_id")


def _q_c3_blank_collapse(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents").withColumn(
        "ntext", F.regexp_replace("text", " table ", "\n\n\n\n")
    )
    return docs.select(
        "doc_id", textfn.collapse_blank3(F.col("ntext")).alias("collapsed")
    ).orderBy("doc_id")


def _q_c6_domain_extract(spark, sf_dir):
    docs = _docs_with_url(spark, sf_dir)
    return (
        docs.select(textfn.domain_of(F.col("url")).alias("domain"))
        .groupBy("domain")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("domain")
    )


def _q_c8_filename_sanitize(spark, sf_dir):
    part = _load(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    raw = F.concat(F.lit('a<b>:"c/d\\e|f?g*'), F.col("p_name"))
    return part.select(
        "p_partkey", textfn.sanitize_filename(raw).alias("fname")
    ).orderBy("p_partkey")


def _q_s5_payload_kind(spark, sf_dir):
    # S5 — content-kind dispatch as a vectorized predicate on the
    # payload itself (W:353-370 → engine: magic-prefix dispatch)
    docs = _load(spark, sf_dir, "documents").withColumn(
        "payload",
        F.expr(
            "case when doc_id % 4 = 0 then concat('%PDF-SYNTH', chr(10), text) "
            "when doc_id % 4 = 1 then concat('<html><body>', text, '</body></html>') "
            "when doc_id % 4 = 2 then concat('Title: x', chr(10), text) "
            "else text end"
        ),
    )
    kind = (
        F.when(F.col("payload").startswith("%PDF-SYNTH"), "pdf")
        .when(F.col("payload").startswith("<html"), "html")
        .when(F.col("payload").rlike(r"^(Title|URL Source|Markdown Content):"), "markdown")
        .otherwise("text")
    )
    return (
        docs.withColumn("kind", kind)
        .groupBy("kind")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("kind")
    )


def _q_c2_markdown_cleanup(spark, sf_dir):
    # C2 — the reader-output markdown strip chain as JVM regexp_replace
    # steps (W:89-106), order-exact
    docs = _load(spark, sf_dir, "documents").withColumn(
        "md",
        F.concat(
            F.lit("Title: Page\nURL Source: https://r.example/x\nMarkdown Content:\n"),
            F.col("text"),
            F.lit(" [link](https://a.example/b) tail ![img](https://c.example/i.png)"),
        ),
    )
    out = F.col("md")
    for pattern in [
        r"(?m)^Title:.*\n?",
        r"(?m)^URL Source:.*\n?",
        r"(?m)^Published Time:.*\n?",
        r"(?m)^Markdown Content:\n?",
        r"\[!\[[^\]]*\]\([^)]*\)\]\([^)]*\)\s*",
        r"!\[[^\]]*\]\([^)]*\)\s*",
        r"\[[^\]]*\]\([^)]*\)\s*",
    ]:
        out = F.regexp_replace(out, pattern, "")
    return docs.select("doc_id", F.trim(out).alias("cleaned")).orderBy("doc_id")


def _q_d13_ping_decode(spark, sf_dir):
    # D13 — ping-wrapped URL decode (yahoo_url_search.py:166-209)
    docs = _load(spark, sf_dir, "documents").withColumn(
        "wrapped",
        F.expr(
            "concat('https://ord.yahoo.co.jp/ping/*-https%3A%2F%2F', source, "
            "'.example.com%2Fdoc%2F', cast(doc_id as string), '%3Fq%3Dx%26r%3D1')"
        ),
    )
    return docs.select(
        "doc_id", textfn.ping_decode(F.col("wrapped")).alias("decoded")
    ).orderBy("doc_id")


def _q_dedup_exact(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents").withColumn(
        "dtext",
        F.when(F.col("doc_id") % 10 < 2, F.lit("CANONICAL DUPLICATE BODY")).otherwise(
            F.col("text")
        ),
    )
    return dedup.exact_duplicates(docs, "doc_id", "dtext").orderBy("content_hash")


def _q_dedup_minhash_lsh(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=8, bands=4, jaccard_threshold=0.7
    ).orderBy("id_a", "id_b")


def _q_dedup_simhash(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        dedup.with_simhash(docs, "text")
        .select("doc_id", "simhash")
        .orderBy("doc_id")
    )


def _q_dedup_simhash_pairs(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return dedup.simhash_near_duplicates(docs, "doc_id", "text", max_hamming=8).orderBy(
        "id_a", "id_b"
    )


def _q_dedup_ngram_jaccard(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.3, window=5
    ).orderBy("id_a", "id_b")


def _q_text_profile(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return textstats.text_profile(docs, "doc_id", "text").orderBy("doc_id")


def _q_sim_cosine_topk(spark, sf_dir):
    emb = _load(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, query_ids=[0, 1, 2], k=5).orderBy(
        "query_id", "rank"
    )


def _q_sim_lsh_ann_topk(spark, sf_dir):
    emb = _load(spark, sf_dir, "embeddings")
    return similarity.lsh_ann_topk(emb, query_ids=[0, 1, 2], k=5).orderBy(
        "query_id", "rank"
    )


def _q_sim_ivf_ann_topk(spark, sf_dir):
    emb = _load(spark, sf_dir, "embeddings")
    return similarity.ivf_ann_topk(emb, query_ids=[0, 1, 2], k=5, n_cells=8).orderBy(
        "query_id", "rank"
    )


def _q_sim_ivf_ann_multiprobe(spark, sf_dir):
    emb = _load(spark, sf_dir, "embeddings")
    return similarity.ivf_ann_topk(
        emb, query_ids=[0, 1, 2], k=5, n_cells=8, n_probe=2
    ).orderBy("query_id", "rank")


def _q_sim_ivf_kmeans_topk(spark, sf_dir):
    emb = _load(spark, sf_dir, "embeddings")
    return similarity.ivf_ann_topk(
        emb, query_ids=[0, 1, 2], k=5, n_cells=8, kmeans_iters=2
    ).orderBy("query_id", "rank")


def _q_sim_embedding_neardup(spark, sf_dir):
    emb = _load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return similarity.embedding_near_duplicates(emb, threshold=0.3).orderBy(
        "id_a", "id_b"
    )


def _q_multimodal_features(spark, sf_dir):
    """Gate-checkable shape: scalar columns only (the driver's
    canonicalizer cannot hash array cells).  The float features coming
    out of the mapInPandas UDF are u16/65535 float32s, so
    round(f*65535) recovers the exact integers the oracle rebuilds
    from the md5 hexdigest."""
    from webtext_extraction_spark.operators.multimodal import (
        extract_media_features,
        synth_media,
    )

    media = synth_media(spark, n=64)
    feats = extract_media_features(media)
    u16_strs = F.transform(
        F.col("feature"), lambda x: F.round(x * 65535).cast("int").cast("string")
    )
    return feats.select(
        "media_id",
        "modality",
        "n_bytes",
        F.md5(F.concat_ws(",", u16_strs)).alias("feature_hash"),
    ).orderBy("media_id")


def _q_multimodal_frame_sample(spark, sf_dir):
    from webtext_extraction_spark.operators.multimodal import (
        frame_sample_plan,
        synth_media,
    )

    media = synth_media(spark, n=64)
    return frame_sample_plan(media, every_n=10).orderBy("media_id", "frame_idx")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_flagship": _q_extract_flagship,
        "extract_summary": _q_extract_summary,
        "f1_url_exclusion": _q_f1_url_exclusion,
        "f3_nav_text_filter": _q_f3_nav_text_filter,
        "f4_success_threshold": _q_f4_success_threshold,
        "f5_failure_templates": _q_f5_failure_templates,
        "f6_error_patterns": _q_f6_error_patterns,
        "a5_nav_char_ratio": _q_a5_nav_char_ratio,
        "a1_ordered_distinct": _q_a1_ordered_distinct,
        "a4_topk_per_group": _q_a4_topk_per_group,
        "a6_metrics_rollup": _q_a6_metrics_rollup,
        "j2_anti_join": _q_j2_anti_join,
        "j3_broadcast_rule_lookup": _q_j3_broadcast_rule_lookup,
        "j4_lag_window": _q_j4_lag_window,
        "o1_stable_topn": _q_o1_stable_topn,
        "u2_union_sources": _q_u2_union_sources,
        "u3_set_difference": _q_u3_set_difference,
        "c1_url_strip": _q_c1_url_strip,
        "c3_blank_collapse": _q_c3_blank_collapse,
        "c6_domain_extract": _q_c6_domain_extract,
        "c8_filename_sanitize": _q_c8_filename_sanitize,
        "s5_payload_kind": _q_s5_payload_kind,
        "c2_markdown_cleanup": _q_c2_markdown_cleanup,
        "d13_ping_decode": _q_d13_ping_decode,
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash_lsh": _q_dedup_minhash_lsh,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_simhash_pairs": _q_dedup_simhash_pairs,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "text_profile": _q_text_profile,
        "sim_cosine_topk": _q_sim_cosine_topk,
        "sim_lsh_ann_topk": _q_sim_lsh_ann_topk,
        "sim_ivf_ann_topk": _q_sim_ivf_ann_topk,
        "sim_ivf_ann_multiprobe": _q_sim_ivf_ann_multiprobe,
        "sim_ivf_kmeans_topk": _q_sim_ivf_kmeans_topk,
        "sim_embedding_neardup": _q_sim_embedding_neardup,
        "multimodal_features": _q_multimodal_features,
        "multimodal_frame_sample": _q_multimodal_frame_sample,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_PHASH = "(('0x' || substr(md5({x}),1,15))::BIGINT)"
_WORDS = "list_filter(string_split_regex({x}, '\\s+'), w -> w <> '')"
_WORDSET = "list_distinct(" + _WORDS + ")"
_URL_EXCL = "|".join(f"(?:{p})" for p in rules.URL_EXCLUDE_PATTERNS)
_NAV_EXCL = "|".join(rules.NAV_TEXT_WORDS)


def _minhash_sql(text_expr: str, num_hashes: int) -> str:
    params = _perm_params(num_hashes)
    hashes = f"list_transform({_WORDSET.format(x=text_expr)}, w -> {_PHASH.format(x='w')} % {TOKEN_SPACE})"
    sigs = ", ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {MINHASH_PRIME}))"
        for a, b in params
    )
    return hashes, f"[{sigs}]"


def _simhash_banded_sql(bits: int, max_hamming: int) -> str:
    """Pigeonhole (block, key) buckets over ``sh(_id, simhash)`` —
    mirrors dedup.simhash_blocks exactly."""
    return " UNION ALL ".join(
        f"SELECT _id, simhash, {i} AS block, "
        f"(simhash >> {off}) & {(1 << width) - 1} AS key FROM sh"
        for i, (off, width) in enumerate(dedup.simhash_blocks(bits, max_hamming))
    )


def _simhash_sql(bits: int = 32) -> str:
    terms = " + ".join(
        f"(case when list_sum(list_transform(hs, h -> case when (h >> {b}) & 1 = 1 "
        f"then 1 else -1 end)) > 0 then {1 << b}::BIGINT else 0::BIGINT end)"
        for b in range(bits)
    )
    return terms


_COSINE = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)


def _kmeans_iter_sql(prev: str, nxt: str, dim: int = 64) -> str:
    """One unrolled Lloyd round over CTE ``e(vec_id, embedding)``:
    assign to nearest ``prev`` centroid (squared-L2 argmin ≡
    list_distance order, cid tie-break), per-cell elementwise mean
    rounded to 6 dp, empty cells keep their previous centroid —
    mirrors similarity.kmeans_centroids exactly."""
    return f"""
            a_{nxt} AS (
              SELECT e.vec_id, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(e.embedding, c.cvec), c.cid) AS rn
              FROM e, {prev} c),
            m_{nxt} AS (
              SELECT a.cid, p.pos, round(avg(e.embedding[p.pos]), 6) AS m
              FROM e JOIN a_{nxt} a ON e.vec_id = a.vec_id AND a.rn = 1,
                   (SELECT unnest(generate_series(1, {dim})) AS pos) p
              GROUP BY a.cid, p.pos),
            {nxt} AS (
              SELECT c.cid, coalesce(l.vec, c.cvec) AS cvec
              FROM {prev} c LEFT JOIN
                (SELECT cid, list(m ORDER BY pos) AS vec
                 FROM m_{nxt} GROUP BY cid) l
                ON c.cid = l.cid)"""


def _planes_sql(num_planes: int = 4, dim: int = 64) -> list[str]:
    planes = similarity._plane_weights(num_planes, dim)
    return ["[" + ", ".join(repr(w) for w in row) + "]" for row in planes]


def _bucket_sql(vec: str, num_planes: int = 4, dim: int = 64) -> str:
    parts = []
    for i, plane in enumerate(_planes_sql(num_planes, dim)):
        parts.append(
            f"(case when list_dot_product({vec}, {plane}) > 0 then {1 << i} else 0 end)"
        )
    return " + ".join(parts)


def oracle_sql() -> dict[str, str]:
    hs_expr, sig_expr = _minhash_sql("text", 8)
    stop_list = ", ".join(f"'{w}'" for w in textstats.EN_STOPWORDS)
    err_contains = " OR ".join(
        f"contains(ftext, '{p}')" for p in rules.ERROR_PATTERNS
    )
    nav_sum = " + ".join(
        f"(case when contains(text, '{p}') then {len(p)} else 0 end)"
        for p in _NAV_PHRASES
    )
    bucket4 = _bucket_sql("embedding")
    cos_ab = _COSINE.format(a="a.embedding", b="b.embedding")
    cos_qb = _COSINE.format(a="q.embedding", b="b.embedding")

    return {
        "extract_flagship": f"""
            SELECT conv_id, turn_idx, role, tool, extracted_text, strategy, status
            FROM read_parquet('{_FLAGSHIP_GOLDEN}')
            ORDER BY conv_id, turn_idx
        """,
        "extract_summary": f"""
            SELECT status, strategy, count(*)::BIGINT AS rows,
                   sum(length(extracted_text))::BIGINT AS bytes_out
            FROM read_parquet('{_FLAGSHIP_GOLDEN}')
            GROUP BY status, strategy ORDER BY status, strategy
        """,
        "f1_url_exclusion": f"""
            SELECT source, count(*)::BIGINT AS kept
            FROM (SELECT source, {_URL_SQL} AS url FROM documents)
            WHERE NOT regexp_matches(url, '{_URL_EXCL}')
            GROUP BY source ORDER BY source
        """,
        "f3_nav_text_filter": f"""
            SELECT doc_id, anchor
            FROM (SELECT doc_id, {_NAVTEXT_SQL} AS anchor FROM documents)
            WHERE length(anchor) > 2 AND NOT regexp_matches(anchor, '{_NAV_EXCL}')
            ORDER BY doc_id
        """,
        "f4_success_threshold": """
            SELECT (length(trim(text)) >= 100) AS extraction_ok, count(*)::BIGINT AS n
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "f5_failure_templates": f"""
            WITH d AS (SELECT *, {_URL_SQL} AS url FROM documents),
            f AS (SELECT *, {_FTEXT_SQL} AS ftext FROM d)
            SELECT source, count(*)::BIGINT AS kept FROM f
            WHERE NOT (ftext = concat('{_TEMPLATE0.split("{}")[0]}', url,
                       '{_TEMPLATE0.split("{}")[1]}') AND ftext <> '{_TIMEOUT}')
            GROUP BY source ORDER BY source
        """,
        "f6_error_patterns": f"""
            WITH d AS (SELECT *, {_URL_SQL} AS url FROM documents),
            f AS (SELECT *, {_FTEXT_SQL} AS ftext FROM d)
            SELECT source, ({err_contains}) AS is_error, count(*)::BIGINT AS n
            FROM f GROUP BY source, is_error ORDER BY source, is_error
        """,
        "a5_nav_char_ratio": f"""
            SELECT doc_id,
                   round(({nav_sum}) * 1.0 / greatest(length(trim(text)), 1), 6)::DOUBLE
                     AS nav_ratio
            FROM documents WHERE doc_id < 100 ORDER BY doc_id
        """,
        "a1_ordered_distinct": """
            SELECT user_id, event_id, event_type FROM (
              SELECT user_id, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
              FROM events) WHERE rn = 1 ORDER BY user_id
        """,
        "a4_topk_per_group": """
            SELECT event_type, event_id, round(value, 6)::DOUBLE AS value, rank FROM (
              SELECT event_type, event_id, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id ASC)::INT AS rank
              FROM events) WHERE rank <= 3 ORDER BY event_type, rank
        """,
        "a6_metrics_rollup": """
            SELECT source, count(*)::BIGINT AS rows, sum(n_chars)::BIGINT AS chars,
                   sum(length(text))::BIGINT AS bytes_measured
            FROM documents GROUP BY source ORDER BY source
        """,
        "j2_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
            ORDER BY c_custkey
        """,
        "j3_broadcast_rule_lookup": """
            SELECT coalesce(action, 'none') AS action, count(*)::BIGINT AS n FROM documents
            LEFT JOIN (VALUES ('src0','keep'),('src1','flag'),('src2','drop'))
              r(rule_source, action) ON source = rule_source
            GROUP BY 1 ORDER BY 1
        """,
        "j4_lag_window": """
            SELECT user_id, event_id,
                   round(value - coalesce(lag(value) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 6)::DOUBLE AS delta
            FROM events WHERE user_id < 50 ORDER BY user_id, event_id
        """,
        "o1_stable_topn": """
            SELECT l_orderkey, l_linenumber, round(l_quantity, 6)::DOUBLE AS qty
            FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000
        """,
        "u2_union_sources": """
            WITH u AS (
              SELECT 'even' AS source_name, doc_id, n_chars FROM documents WHERE doc_id % 2 = 0
              UNION ALL
              SELECT 'long' AS source_name, doc_id, n_chars FROM documents WHERE n_chars > 300)
            SELECT source_name, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
            FROM u GROUP BY source_name ORDER BY source_name
        """,
        "u3_set_difference": """
            SELECT DISTINCT c_custkey AS k FROM customer
            WHERE c_custkey NOT IN (SELECT user_id FROM events)
            ORDER BY k
        """,
        "c1_url_strip": f"""
            SELECT doc_id,
                   regexp_replace(regexp_replace(
                     concat('see ', {_URL_SQL}, ' mid www.x.example/y end ', text),
                     'https?://\\S+', '', 'g'), 'www\\.\\S+', '', 'g') AS cleaned
            FROM documents ORDER BY doc_id
        """,
        "c3_blank_collapse": """
            SELECT doc_id,
                   regexp_replace(replace(text, ' table ', chr(10)||chr(10)||chr(10)||chr(10)),
                                  '\\n\\s*\\n\\s*\\n+', chr(10)||chr(10), 'g') AS collapsed
            FROM documents ORDER BY doc_id
        """,
        "c6_domain_extract": f"""
            SELECT regexp_extract({_URL_SQL}, 'https?://(?:www\\.)?([^/]+)', 1) AS domain,
                   count(*)::BIGINT AS n
            FROM documents GROUP BY domain ORDER BY domain
        """,
        "c8_filename_sanitize": """
            SELECT p_partkey,
                   translate(concat('a<b>:"c/d\\e|f?g*', p_name),
                             '<>:"/\\|?*', '_________') AS fname
            FROM part WHERE p_partkey < 200 ORDER BY p_partkey
        """,
        "s5_payload_kind": """
            WITH d AS (SELECT doc_id,
              case when doc_id % 4 = 0 then concat('%PDF-SYNTH', chr(10), text)
                   when doc_id % 4 = 1 then concat('<html><body>', text, '</body></html>')
                   when doc_id % 4 = 2 then concat('Title: x', chr(10), text)
                   else text end AS payload
              FROM documents)
            SELECT (case when starts_with(payload, '%PDF-SYNTH') then 'pdf'
                         when starts_with(payload, '<html') then 'html'
                         when regexp_matches(payload, '^(Title|URL Source|Markdown Content):')
                           then 'markdown'
                         else 'text' end) AS kind,
                   count(*)::BIGINT AS n
            FROM d GROUP BY kind ORDER BY kind
        """,
        "c2_markdown_cleanup": """
            WITH d AS (SELECT doc_id,
              concat('Title: Page', chr(10), 'URL Source: https://r.example/x',
                     chr(10), 'Markdown Content:', chr(10), text,
                     ' [link](https://a.example/b) tail ![img](https://c.example/i.png)')
                AS md FROM documents)
            SELECT doc_id, trim(
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              regexp_replace(regexp_replace(regexp_replace(md,
                '(?m)^Title:.*\\n?', '', 'g'),
                '(?m)^URL Source:.*\\n?', '', 'g'),
                '(?m)^Published Time:.*\\n?', '', 'g'),
                '(?m)^Markdown Content:\\n?', '', 'g'),
                '\\[!\\[[^\\]]*\\]\\([^)]*\\)\\]\\([^)]*\\)\\s*', '', 'g'),
                '!\\[[^\\]]*\\]\\([^)]*\\)\\s*', '', 'g'),
                '\\[[^\\]]*\\]\\([^)]*\\)\\s*', '', 'g')) AS cleaned
            FROM d ORDER BY doc_id
        """,
        "d13_ping_decode": """
            WITH d AS (SELECT doc_id,
              concat('https://ord.yahoo.co.jp/ping/*-https%3A%2F%2F', source,
                     '.example.com%2Fdoc%2F', cast(doc_id as varchar),
                     '%3Fq%3Dx%26r%3D1') AS wrapped
              FROM documents)
            SELECT doc_id,
                   replace(replace(replace(replace(replace(
                     regexp_extract(wrapped, '/\\*-(.*)', 1),
                     '%3A', ':'), '%2F', '/'), '%3F', '?'), '%3D', '='),
                     '%26', '&') AS decoded
            FROM d ORDER BY doc_id
        """,
        "dedup_exact": """
            WITH d AS (SELECT doc_id,
                   case when doc_id % 10 < 2 then 'CANONICAL DUPLICATE BODY' else text end
                     AS dtext FROM documents)
            SELECT md5(dtext) AS content_hash, count(*)::BIGINT AS n_dups,
                   min(doc_id)::BIGINT AS keeper_id
            FROM d GROUP BY content_hash HAVING count(*) >= 2 ORDER BY content_hash
        """,
        "dedup_minhash_lsh": f"""
            WITH base AS (
              SELECT doc_id AS _id, text AS _text, {hs_expr} AS hs
              FROM documents WHERE doc_id < 60),
            sigs AS (SELECT _id, _text, {sig_expr} AS minhash FROM base),
            banded AS (
              SELECT _id, _text, band,
                     array_to_string(minhash[band*2+1 : band*2+2], '-') AS bucket
              FROM sigs, (SELECT unnest([0,1,2,3]) AS band)),
            cand AS (
              SELECT DISTINCT l._id AS id_a, r._id AS id_b,
                              l._text AS text_a, r._text AS text_b
              FROM banded l JOIN banded r
                ON l.band = r.band AND l.bucket = r.bucket AND l._id < r._id),
            scored AS (
              SELECT id_a, id_b,
                round(len(list_intersect({_WORDSET.format(x='text_a')},
                                         {_WORDSET.format(x='text_b')})) * 1.0 /
                      len(list_distinct(list_concat({_WORDSET.format(x='text_a')},
                                        {_WORDSET.format(x='text_b')}))), 6)::DOUBLE AS jaccard
              FROM cand)
            SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.7
            ORDER BY id_a, id_b
        """,
        "dedup_simhash": f"""
            WITH base AS (
              SELECT doc_id, list_transform({_WORDSET.format(x='text')},
                     w -> {_PHASH.format(x='w')}) AS hs
              FROM documents WHERE doc_id < 100)
            SELECT doc_id, ({_simhash_sql(32)}) AS simhash FROM base ORDER BY doc_id
        """,
        "dedup_simhash_pairs": f"""
            WITH base AS (
              SELECT doc_id, list_transform({_WORDSET.format(x='text')},
                     w -> {_PHASH.format(x='w')}) AS hs
              FROM documents WHERE doc_id < 100),
            sh AS (SELECT doc_id AS _id, ({_simhash_sql(32)}) AS simhash FROM base),
            banded AS ({_simhash_banded_sql(32, 8)}),
            cand AS (
              SELECT DISTINCT a._id AS id_a, b._id AS id_b,
                              a.simhash AS sa, b.simhash AS sb
              FROM banded a JOIN banded b
                ON a.block = b.block AND a.key = b.key AND a._id < b._id)
            SELECT id_a, id_b, bit_count(xor(sa, sb))::INT AS hamming
            FROM cand WHERE bit_count(xor(sa, sb)) <= 8
            ORDER BY id_a, id_b
        """,
        "dedup_ngram_jaccard": """
            WITH base AS (
              SELECT doc_id AS _id,
                     list_distinct(list_transform(
                       generate_series(0, greatest(length(text) - 3, 0)),
                       i -> substr(text, i + 1, 3))) AS _sh
              FROM documents WHERE doc_id < 80)
            SELECT a._id AS id_a, b._id AS id_b,
                   round(len(list_intersect(a._sh, b._sh)) * 1.0 /
                         len(list_distinct(list_concat(a._sh, b._sh))), 6)::DOUBLE AS jaccard
            FROM base a JOIN base b ON b._id > a._id AND b._id <= a._id + 5
            WHERE round(len(list_intersect(a._sh, b._sh)) * 1.0 /
                        len(list_distinct(list_concat(a._sh, b._sh))), 6) >= 0.3
            ORDER BY id_a, id_b
        """,
        "text_profile": f"""
            WITH base AS (
              SELECT doc_id, text, {_WORDS.format(x='text')} AS ws
              FROM documents WHERE doc_id < 200),
            m AS (SELECT doc_id, text, ws,
                   (length(text) - length(regexp_replace(text, '[ぁ-んァ-ヶ一-龯ー]', '', 'g')))
                     AS jp,
                   greatest(length(text), 1) AS total,
                   len(list_filter(ws, w -> list_contains([{stop_list}], lower(w)))) AS stop_hits,
                   greatest(len(ws), 1) AS n_words,
                   (length(text) - length(regexp_replace(text, '[A-Za-z ]', '', 'g'))) * 1.0
                     / greatest(length(text), 1) AS alpha_ratio,
                   (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0
                     / greatest(length(text), 1) AS punct_ratio
                  FROM base)
            SELECT doc_id,
              (case when jp * 1.0 / total > 0.2 then 'ja'
                    when alpha_ratio > 0.7 OR stop_hits * 1.0 / n_words > 0.05 then 'en'
                    else 'unknown' end) AS lang_pred,
              round(0.4 * least(length(text) / 500.0, 1.0)
                  + 0.2 * (case when punct_ratio < 0.2 then 1.0
                           else greatest(0.0, 1.0 - (punct_ratio - 0.2) * 2.0) end)
                  + 0.2 * least(stop_hits * 5.0 / n_words, 1.0)
                  + 0.2 * (case when length(text) * 1.0 / n_words >= 3.0
                                 and length(text) * 1.0 / n_words <= 12.0
                            then 1.0 else 0.5 end), 6)::DOUBLE AS quality,
              len(ws)::INT AS ws_tokens,
              len(regexp_extract_all(text, '{textstats.BPE_TOKEN_PATTERN}'))::INT AS bpe_tokens,
              list_reduce(list_prepend(0::BIGINT, list_transform(ws,
                w -> {_PHASH.format(x='w')} % {textstats.FP_TOKEN_MOD})),
                (acc, h) -> (acc * 31 + h) % {textstats.FP_MOD}) AS fingerprint
            FROM m ORDER BY doc_id
        """,
        "sim_cosine_topk": f"""
            WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> x::DOUBLE) AS embedding
                 FROM embeddings),
            q AS (SELECT vec_id AS query_id, embedding FROM e
                       WHERE vec_id IN (0,1,2)),
            scored AS (
              SELECT q.query_id, b.vec_id AS neighbor_id, {cos_qb} AS cos
              FROM q, e b WHERE b.vec_id <> q.query_id),
            ranked AS (SELECT query_id, neighbor_id, cos,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id ASC)::INT AS rank
                       FROM scored)
            SELECT query_id, neighbor_id, cos::DOUBLE AS cos, rank FROM ranked
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "sim_lsh_ann_topk": f"""
            WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> x::DOUBLE) AS embedding
                 FROM embeddings),
            bucketed AS (
              SELECT vec_id, embedding, ({bucket4}) AS bucket FROM e),
            q AS (SELECT vec_id AS query_id, embedding, bucket AS q_bucket
                  FROM bucketed WHERE vec_id IN (0,1,2)),
            scored AS (
              SELECT q.query_id, b.vec_id AS neighbor_id, {cos_qb} AS cos
              FROM q JOIN bucketed b ON q.q_bucket = b.bucket
              WHERE b.vec_id <> q.query_id),
            ranked AS (SELECT query_id, neighbor_id, cos,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id ASC)::INT AS rank
                       FROM scored)
            SELECT query_id, neighbor_id, cos::DOUBLE AS cos, rank FROM ranked
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "sim_ivf_ann_topk": f"""
            WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> x::DOUBLE) AS embedding
                 FROM embeddings),
            cent AS (SELECT vec_id AS cid, embedding AS cvec FROM e WHERE vec_id < 8),
            assign AS (
              SELECT e.vec_id, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(e.embedding, c.cvec), c.cid) AS rn
              FROM e, cent c),
            celled AS (
              SELECT e.vec_id, e.embedding, a.cid AS cell
              FROM e JOIN assign a ON e.vec_id = a.vec_id AND a.rn = 1),
            q AS (SELECT vec_id AS query_id, embedding, cell AS q_cell
                  FROM celled WHERE vec_id IN (0,1,2)),
            scored AS (
              SELECT q.query_id, b.vec_id AS neighbor_id, {cos_qb} AS cos
              FROM q JOIN celled b ON q.q_cell = b.cell
              WHERE b.vec_id <> q.query_id),
            ranked AS (SELECT query_id, neighbor_id, cos,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id ASC)::INT AS rank
                       FROM scored)
            SELECT query_id, neighbor_id, cos::DOUBLE AS cos, rank FROM ranked
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "sim_ivf_ann_multiprobe": f"""
            WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> x::DOUBLE) AS embedding
                 FROM embeddings),
            cent AS (SELECT vec_id AS cid, embedding AS cvec FROM e WHERE vec_id < 8),
            assign AS (
              SELECT e.vec_id, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(e.embedding, c.cvec), c.cid) AS rn
              FROM e, cent c),
            celled AS (
              SELECT e.vec_id, e.embedding, a.cid AS cell
              FROM e JOIN assign a ON e.vec_id = a.vec_id AND a.rn = 1),
            q AS (SELECT e.vec_id AS query_id, e.embedding, a.cid AS q_cell
                  FROM e JOIN assign a ON e.vec_id = a.vec_id AND a.rn <= 2
                  WHERE e.vec_id IN (0,1,2)),
            scored AS (
              SELECT q.query_id, b.vec_id AS neighbor_id, {cos_qb} AS cos
              FROM q JOIN celled b ON q.q_cell = b.cell
              WHERE b.vec_id <> q.query_id),
            ranked AS (SELECT query_id, neighbor_id, cos,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id ASC)::INT AS rank
                       FROM scored)
            SELECT query_id, neighbor_id, cos::DOUBLE AS cos, rank FROM ranked
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "sim_ivf_kmeans_topk": f"""
            WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> x::DOUBLE) AS embedding
                 FROM embeddings),
            c0 AS (SELECT vec_id AS cid, embedding AS cvec FROM e WHERE vec_id < 8),
            {_kmeans_iter_sql("c0", "c1")},
            {_kmeans_iter_sql("c1", "c2")},
            assign AS (
              SELECT e.vec_id, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(e.embedding, c.cvec), c.cid) AS rn
              FROM e, c2 c),
            celled AS (
              SELECT e.vec_id, e.embedding, a.cid AS cell
              FROM e JOIN assign a ON e.vec_id = a.vec_id AND a.rn = 1),
            q AS (SELECT vec_id AS query_id, embedding, cell AS q_cell
                  FROM celled WHERE vec_id IN (0,1,2)),
            scored AS (
              SELECT q.query_id, b.vec_id AS neighbor_id, {cos_qb} AS cos
              FROM q JOIN celled b ON q.q_cell = b.cell
              WHERE b.vec_id <> q.query_id),
            ranked AS (SELECT query_id, neighbor_id, cos,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id ASC)::INT AS rank
                       FROM scored)
            SELECT query_id, neighbor_id, cos::DOUBLE AS cos, rank FROM ranked
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "sim_embedding_neardup": f"""
            WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> x::DOUBLE) AS embedding
                 FROM embeddings WHERE vec_id < 200),
            bucketed AS (
              SELECT vec_id, embedding, ({bucket4}) AS bucket FROM e)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos_ab}::DOUBLE AS cos
            FROM bucketed a JOIN bucketed b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE {cos_ab} >= 0.3
            ORDER BY id_a, id_b
        """,
        # rebuilds synth_media's ASCII payloads + _fake_feature's
        # md5→uint16-LE derivation entirely in SQL (multimodal.py:60-85)
        "multimodal_features": """
            WITH ids AS (SELECT unnest(generate_series(0, 63)) AS i),
            p AS (SELECT i,
              substr(repeat(md5('media' || i::VARCHAR), 3 + i % 8),
                     1, 32 + (i % 5) * 16) AS payload
              FROM ids),
            h AS (SELECT i, length(payload) AS n_bytes, md5(payload) AS fh FROM p)
            SELECT i::BIGINT AS media_id,
              (case when i % 3 = 0 then 'image'
                    when i % 3 = 1 then 'audio' else 'video' end) AS modality,
              n_bytes::INT AS n_bytes,
              md5(array_to_string(list_transform(generate_series(0, 7), k ->
                (('0x' || substr(fh, 4*k+1, 2))::INT
                 + 256 * ('0x' || substr(fh, 4*k+3, 2))::INT)::VARCHAR), ',')) AS feature_hash
            FROM h ORDER BY media_id
        """,
        "multimodal_frame_sample": """
            WITH ids AS (SELECT unnest(generate_series(0, 63)) AS i)
            SELECT i::BIGINT AS media_id, f.frame_idx::INT AS frame_idx,
                   10 AS sample_every, 'fake' AS meta_codec
            FROM ids, (SELECT unnest([0, 1, 2, 3]) AS frame_idx) f
            WHERE i % 3 = 2 ORDER BY media_id, frame_idx
        """,
    }
