"""Portable column-function helpers (JVM-side, codegen-friendly).

``portable_hash64`` is the engine's cross-system string hash: the
first 15 hex digits of md5 as a bigint.  Unlike xxhash64/murmur it is
bit-identical in Spark, DuckDB, and Python, which is what lets the
dedup/fingerprint operators be oracle-checked exactly.  (For pure
partitioning, xxhash64 stays the choice — cheaper, and no cross-system
contract needed: see operators/partitioning.py.)
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F

MERSENNE_61 = (1 << 61) - 1


def portable_hash64(col) -> Column:
    """First 60 bits of md5(col) as bigint — identical in DuckDB via
    ``('0x' || substr(md5(x),1,15))::BIGINT`` and in Python via
    ``int(hashlib.md5(x).hexdigest()[:15], 16)``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def portable_hash64_py(value: str) -> int:
    return int(hashlib.md5(value.encode("utf-8")).hexdigest()[:15], 16)


def words(col) -> Column:
    """Whitespace tokenization with empties dropped — matches
    DuckDB ``list_filter(string_split_regex(x, '\\s+'), w -> w != '')``."""
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


def word_set(col) -> Column:
    return F.array_distinct(words(col))


def hashed_word_set(col) -> Column:
    """Distinct word tokens hashed to int64 (``portable_hash64``) —
    the shuffle-narrow representation of a document's word set: 8-byte
    ints ride the shuffle instead of full word strings, and Jaccard
    over the hashed sets equals Jaccard over the words themselves
    modulo md5-60-bit collisions (~n²/2^61 per document pair).  DuckDB
    replays it via
    ``list_distinct(list_transform(words, w -> phash(w)))``."""
    return F.array_distinct(F.transform(words(col), lambda w: portable_hash64(w)))


def ngrams_of_words(ws: Column, n: int) -> Column:
    """Sliding space-joined word-n-gram array over a word-array column,
    empty when the document has fewer than n words.  The single gram
    constructor shared by dedup.boilerplate_ngrams,
    textstats.repetition_profile, and contamination.decontaminate —
    endpoint/empty-word semantics must stay identical across all three
    and their DuckDB oracles."""
    if n < 1:
        raise ValueError(f"n-gram size must be >= 1, got {n}")
    return F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def strip_urls(col) -> Column:
    """C1 — the first two URL-strip regexes as JVM expressions (the
    third, unicode-quoted pattern lives kernel-side; these two are the
    Catalyst-friendly fast path used by SQL-level cleanup)."""
    out = F.regexp_replace(col, r"https?://\S+", "")
    return F.regexp_replace(out, r"www\.\S+", "")


def collapse_blank3(col) -> Column:
    """C3 — W:190 variant (3+ blank-ish lines → one blank line)."""
    return F.regexp_replace(col, r"\n\s*\n\s*\n+", "\n\n")


def sanitize_filename(col) -> Column:
    """C8 — create_file.py:27-31 forbidden-char replacement."""
    return F.translate(col, '<>:"/\\|?*', "_________")


def domain_of(url_col) -> Column:
    """C6 — corrected domain regex (W:1206 form; SURVEY Q3)."""
    return F.regexp_extract(url_col, r"https?://(?:www\.)?([^/]+)", 1)


TRACKING_PARAM_EXACT = ["gclid", "fbclid", "ref", "igshid", "mc_cid", "mc_eid"]


def canonical_url(url_col) -> Column:
    """URL canonicalization for URL-level dedup / exclusion matching —
    the normalizer crawl pipelines run before grouping by URL:

    1. lowercase the scheme://host prefix (path/query case preserved —
       paths are case-sensitive, hosts are not);
    2. strip the fragment (``#…`` never reaches the server);
    3. drop tracking params (``utm_*`` prefix + the exact-name list in
       ``TRACKING_PARAM_EXACT``) and SORT the survivors, so
       ``?b=2&a=1&utm_source=x`` ≡ ``?a=1&b=2``.

    Pure regexp/array expressions (no parse_url — DuckDB lacks it, and
    the oracle must replay byte-for-byte): split at the first ``?``,
    operate on the param array, rejoin.  Binary string sort on both
    engines.  Semantics note: duplicate surviving params are kept
    (order-normalized), and an all-tracking query collapses to no
    ``?`` at all."""
    no_frag = F.regexp_replace(url_col, r"#.*$", "")
    prefix = F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    lowered = F.concat(
        F.lower(prefix),
        F.substring(no_frag, F.length(prefix) + 1, F.lit(2147483647)),
    )
    path_part = F.regexp_replace(lowered, r"\?.*$", "")
    query = F.when(
        lowered.contains("?"), F.regexp_replace(lowered, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~F.regexp_extract(p, r"^([^=]*)", 1).isin(TRACKING_PARAM_EXACT),
    )
    sorted_q = F.concat_ws("&", F.array_sort(params))
    return F.when(sorted_q != "", F.concat(path_part, F.lit("?"), sorted_q)).otherwise(
        path_part
    )


def ping_decode(url_col) -> Column:
    """D13 — Yahoo SERP ping-wrapped URL decode
    (yahoo_url_search.py:166-209): extract the ``/*-…`` tail and
    percent-decode it."""
    return F.url_decode(F.regexp_extract(url_col, r"/\*-(.*)", 1))
