"""C1–C5 cleanup chain + A2 near-duplicate paragraph removal + F8
nav-only detector, over TrackedText so span provenance survives.

Faithful to /root/reference/common_scripts/web_text_extractor_ver1.5.py:
- ``cleanup_extracted_text``  ← W:161-208 (_cleanup_extracted_text)
- ``remove_duplicate_content`` ← W:297-343 (_remove_duplicate_content)
- ``jina_markdown_cleanup``    ← W:87-106 (the Jina post-strip chain)
- ``is_nav_only``              ← W:210-295 (_is_pinterest_navigation_error)

Operation ORDER matters for byte equality and is preserved exactly;
the two different blank-line-collapse regexes (SURVEY.md §7.5 Q2) are
kept path-faithful: W:190 collapses only 3+ blank-ish lines, W:106 /
W:818 collapse 2+.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

import numpy as np

from webtext_extraction_spark import rules
from webtext_extraction_spark.kernel.tracked import TrackedText

# C1 — URL strip chain (W:181-187); order matters
_URL_HTTP = re.compile(r"https?://\S+")
_URL_WWW = re.compile(r"www\.\S+")
# W:187 verbatim: broad heuristic URL matcher.  The reference's final
# character class ends ...<>?«»""'' with ASCII straight quotes (byte
# inspection — the intended curly quotes were mangled to ASCII dupes at
# some point in its history), so CURLY quotes are valid URL-final chars
# there and a URL ending in one IS stripped; round-3 review caught the
# engine excluding them (trailing ” survived where the reference
# deletes it).
_URL_BROAD = re.compile(
    r"(?i)\b((?:https?://|www\d{0,3}[.]|[a-z0-9.\-]+[.][a-z]{2,4}/)"
    r"(?:[^\s()<>]+|\(([^\s()<>]+|(\([^\s()<>]+\)))*\))+"
    r"(?:\(([^\s()<>]+|(\([^\s()<>]+\)))*\)|[^\s`!()\[\]{};:\'\".,<>?«»]))"
)
# C3 — the two blank-line-collapse variants (Q2)
_BLANK3 = re.compile(r"\n\s*\n\s*\n+")   # W:190 (cleanup path)
_BLANK2 = re.compile(r"\n\s*\n")          # W:106 (Jina), W:818 (chiebukuro)

# C2 — Jina/markdown cleanup chain (W:89-103)
_MD_TITLE = re.compile(r"^Title:.*\n?", re.MULTILINE)
_MD_URLSRC = re.compile(r"^URL Source:.*\n?", re.MULTILINE)
_MD_PUBTIME = re.compile(r"^Published Time:.*\n?", re.MULTILINE)
_MD_MDCONTENT = re.compile(r"^Markdown Content:\n?", re.MULTILINE)
_MD_SOURCELINK = re.compile(r"\[Source\]\(https://r\.jina\.ai/[^)]+\)\s*")
_MD_IMGLINK = re.compile(r"\[!\[[^\]]*\]\([^)]*\)\]\([^)]*\)\s*")
_MD_IMG = re.compile(r"!\[[^\]]*\]\([^)]*\)\s*")
_MD_LINK = re.compile(r"\[[^\]]*\]\([^)]*\)\s*")
_MD_IMGTAG = re.compile(r"<img[^>]*>\s*")

_CONTENT_INDICATORS = [re.compile(p) for p in rules.CONTENT_INDICATOR_PATTERNS]
_FFFD = re.compile("�")
# kept-whitespace removed before the whole-string isprintable fast path
_WS_STRIP = {ord("\n"): None, ord("\t"): None, ord("\r"): None}


def remove_duplicate_content(tt: TrackedText) -> TrackedText:
    """A2 — greedy order-preserving near-dup paragraph removal (W:297-343).

    Paragraph split on '\\n\\n', per-paragraph strip, drop empties;
    a paragraph is dropped iff difflib ratio > 0.8 against any *kept*
    earlier paragraph (strict >, vs-kept-only — SURVEY.md Q6); when at
    least 2 paragraphs exist the result is the '\\n\\n' join of kept,
    stripped paragraphs, otherwise the input is returned unchanged
    (including when below the 100-char activation threshold, W:307).
    """
    if not tt.text or len(tt.text.strip()) < 100:
        return tt
    paragraphs = [p.strip() for p in tt.split("\n\n")]
    paragraphs = [p for p in paragraphs if p.text]
    if len(paragraphs) < 2:
        return tt
    kept: list[TrackedText] = []
    kept_texts: list[str] = []
    # one lazily-created SequenceMatcher per KEPT paragraph with seq2
    # fixed: difflib's b-side preprocessing (__chain_b / fullbcount)
    # runs once per kept paragraph actually compared against, instead of
    # once per compared pair; set_seq1 between comparisons is free.
    # Identical results to a fresh SequenceMatcher(None, para, seen)
    # per pair.
    kept_sms: list[SequenceMatcher | None] = []
    for para in paragraphs:
        is_dup = False
        pt = para.text
        for j, seen in enumerate(kept_texts):
            if pt == seen:  # exact dup: ratio()==1.0 > 0.8
                is_dup = True
                break
            sm = kept_sms[j]
            if sm is None:
                sm = kept_sms[j] = SequenceMatcher(None, "", seen)
            sm.set_seq1(pt)
            # quick ratios are UPPER BOUNDS on ratio(): gating on them
            # is exact for the strict > 0.8 test and skips the O(n²)
            # pass for clearly-dissimilar pairs
            if (
                sm.real_quick_ratio() > 0.8
                and sm.quick_ratio() > 0.8
                and sm.ratio() > 0.8
            ):
                is_dup = True
                break
        if not is_dup:
            kept.append(para)
            kept_texts.append(pt)
            kept_sms.append(None)
    return TrackedText.join("\n\n", kept)


def _printable_filter(tt: TrackedText) -> TrackedText:
    """C5 — drop U+FFFD then keep \\n\\t\\r plus str.isprintable chars
    (W:196-203).  Python ``isprintable`` drops all Cc/Cf/Zl/Zp and all
    Zs except ' ' — no SQL builtin matches, hence kernel-side."""
    tt = tt.sub(_FFFD, "")
    if not tt.text:
        return tt
    # fast path: whole-string isprintable check (C speed) — per-char
    # masking only when the text actually contains dirty characters
    if tt.text.translate(_WS_STRIP).isprintable():
        return tt
    keep = np.fromiter(
        ((ch in "\n\t\r") or ch.isprintable() for ch in tt.text),
        dtype=bool,
        count=len(tt.text),
    )
    if keep.all():
        return tt
    return tt.filter_chars(keep)


def cleanup_extracted_text(tt: TrackedText) -> TrackedText:
    """The full post-extraction cleanup chain, order-exact (W:161-208):
    URL strip ×3 → 3+-blank-line collapse → strip → U+FFFD/unprintable
    filter → near-dup paragraph removal."""
    if not tt.text:
        return tt
    tt = tt.sub(_URL_HTTP, "")
    tt = tt.sub(_URL_WWW, "")
    # _URL_BROAD opens with an alternation whose third branch starts in
    # a character class, so re has no literal prefix to fast-scan with
    # and pays a per-position backtracking walk (~17% of total kernel
    # time measured on the bench mix).  Every branch of the pattern
    # requires '/' (https?:// and [.][a-z]{2,4}/) or case-insensitive
    # 'www', so this guard is implied by any possible match: skipping
    # on guard failure is semantics-exact (0.42s -> 0.02s on 1,956
    # bench-mix cleanups, of which only 30 pass the guard).
    t = tt.text
    if "/" in t or "www" in t.lower():
        tt = tt.sub(_URL_BROAD, "")
    tt = tt.sub(_BLANK3, "\n\n")
    tt = tt.strip()
    tt = _printable_filter(tt)
    tt = remove_duplicate_content(tt)
    return tt


def jina_markdown_cleanup(tt: TrackedText) -> TrackedText:
    """C2 — reader-service markdown post-strip (W:89-106), ending with
    the 2-blank-line collapse variant and strip."""
    tt = tt.sub(_MD_TITLE, "")
    tt = tt.sub(_MD_URLSRC, "")
    tt = tt.sub(_MD_PUBTIME, "")
    tt = tt.sub(_MD_MDCONTENT, "")
    tt = tt.sub(_MD_SOURCELINK, "")
    tt = tt.sub(_MD_IMGLINK, "")
    tt = tt.sub(_MD_IMG, "")
    tt = tt.sub(_MD_LINK, "")
    tt = tt.sub(_MD_IMGTAG, "")
    tt = tt.sub(_BLANK2, "\n\n")
    return tt.strip()


def collapse_blank2(tt: TrackedText) -> TrackedText:
    """W:818 variant used by the chiebukuro handler."""
    return tt.sub(_BLANK2, "\n\n")


def is_nav_only(text: str) -> bool:
    """F8 — nav-only page detector (W:210-295), pure predicate."""
    if not text or len(text.strip()) == 0:
        return False
    for rx in _CONTENT_INDICATORS:
        if rx.search(text):
            return False
    nav_char_count = 0
    total_nav_phrases = 0
    for phrase in rules.NAV_PHRASES:
        if phrase in text:
            nav_char_count += len(phrase)
            total_nav_phrases += 1
    total = len(text.strip())
    if total_nav_phrases >= rules.NAV_MIN_PHRASES and total > 0:
        if nav_char_count / total > rules.NAV_RATIO_THRESHOLD:
            return True
    normalized_text = " ".join(text.split())
    normalized_pattern = " ".join(rules.STRICT_NAV_PATTERN.split())
    if len(normalized_text) < rules.STRICT_NAV_MAX_LEN and normalized_pattern in normalized_text:
        return True
    return False
