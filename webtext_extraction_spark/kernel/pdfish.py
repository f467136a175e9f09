"""S8 — synthetic-PDF payload parser.

The sandbox has no PDF library, so the engine defines a deterministic
text-bearing stand-in format (FIXTURES.md §4) and implements the
reference's per-page extraction semantics over it
(/root/reference/common_scripts/web_text_extractor_ver1.5.py:122-159):

format:
    %PDF-SYNTH\n
    %%page 1\n  <text lines…>
    %%page 2 broken\n  <ignored — simulates a per-page extract error>
    ...

semantics (W:136-148): pages extracted in order; a broken page is
skipped (per-page try/except); each non-empty page text contributes
``page_text + "\\n"``; the concatenation is stripped at the end; an
empty result is the empty-PDF failure; a structurally corrupt payload
(magic line present but no page structure) is the processing-error
failure (W:156-159).
"""

from __future__ import annotations

from webtext_extraction_spark.kernel.tracked import TrackedText

PDF_MAGIC = "%PDF-SYNTH"


def is_pdfish(payload: str) -> bool:
    return payload.startswith(PDF_MAGIC)


class PdfCorrupt(Exception):
    """Raised for PDF-magic payloads without a parseable page structure
    (analogue of a PyPDF2 parse error, W:156-159)."""


def extract_pdfish(payload: str) -> TrackedText:
    """Per-page extract + join; raises PdfCorrupt on bad structure;
    returns empty TrackedText when no page yields text (W:146-151)."""
    lines = payload.split("\n")
    if not lines or not lines[0].startswith(PDF_MAGIC):
        raise PdfCorrupt("missing magic")
    if lines[0] != PDF_MAGIC:
        # e.g. "%PDF-SYNTH-CORRUPT" — magic prefix but bad structure
        raise PdfCorrupt("bad magic line")
    body = lines[1:]
    if not any(line.startswith("%%page ") for line in body):
        raise PdfCorrupt("no page structure")

    # locate page blocks with absolute character offsets
    offset = len(lines[0]) + 1  # past magic line + newline
    pages: list[tuple[bool, list[tuple[str, int]]]] = []  # (broken, [(line, off)])
    current: list[tuple[str, int]] | None = None
    broken = False
    for line in body:
        if line.startswith("%%page "):
            if current is not None:
                pages.append((broken, current))
            header = line[len("%%page ") :].split()
            broken = "broken" in header[1:]
            if not header or not header[0].isdigit():
                raise PdfCorrupt(f"bad page header: {line!r}")
            current = []
        elif current is not None:
            current.append((line, offset))
        offset += len(line) + 1
    if current is not None:
        pages.append((broken, current))

    parts: list[TrackedText] = []
    for is_broken, page_lines in pages:
        if is_broken:  # simulated per-page extract error → skip (W:142-144)
            continue
        line_tts = [TrackedText.literal(text, off) for text, off in page_lines]
        page_tt = TrackedText.join("\n", line_tts)
        if page_tt.text:  # only non-empty page text contributes (W:140)
            parts.append(page_tt.concat(TrackedText.synthetic("\n")))
    if not parts:
        return TrackedText.empty()
    joined = parts[0]
    for p in parts[1:]:
        joined = joined.concat(p)
    return joined.strip()
