"""TrackedText — a string whose every character knows its origin.

The north rule requires emitting character-span offsets into the raw
payload alongside the extracted text (the reference only emits text,
never offsets).  The whole cleanup chain
(/root/reference/common_scripts/web_text_extractor_ver1.5.py:161-343)
is therefore implemented over (text, offsets) pairs: deletions drop
offsets, inserted characters (separators, labels, entity decodes,
regex replacements) carry offset -1 ("synthetic").

Offsets are a numpy int32 array of the same length as the text, so
all transforms are vectorized slices/takes — no per-character Python
in the hot path beyond regex scanning (C-speed).

Span encoding (run-length):
  kind='src': payload[start:end] == the next (end-start) chars of text
  kind='syn': start/end index *the extracted text itself* (synthetic
              chars: separators, labels, templates, entity decodes)
Walking spans in order tiles the extracted text exactly; tests assert
the reconstruction invariant (FIXTURES.md §2).
"""

from __future__ import annotations

import re

import numpy as np

_EMPTY = np.empty(0, dtype=np.int64)


class TrackedText:
    __slots__ = ("text", "off")

    def __init__(self, text: str, off: np.ndarray):
        self.text = text
        self.off = off

    # -- constructors --------------------------------------------------------
    @classmethod
    def synthetic(cls, text: str) -> "TrackedText":
        return cls(text, np.full(len(text), -1, dtype=np.int64))

    @classmethod
    def literal(cls, text: str, start: int) -> "TrackedText":
        return cls(text, np.arange(start, start + len(text), dtype=np.int64))

    @classmethod
    def empty(cls) -> "TrackedText":
        return cls("", _EMPTY)

    @classmethod
    def from_pieces(cls, pieces) -> "TrackedText":
        """From DOM text-node pieces (text, src_start, src_end, literal)."""
        texts = []
        offs = []
        for text, start, _end, lit in pieces:
            texts.append(text)
            if lit:
                offs.append(np.arange(start, start + len(text), dtype=np.int64))
            else:
                offs.append(np.full(len(text), -1, dtype=np.int64))
        if not texts:
            return cls.empty()
        return cls("".join(texts), np.concatenate(offs))

    @classmethod
    def join(cls, sep: str, parts: list["TrackedText"]) -> "TrackedText":
        if not parts:
            return cls.empty()
        if len(parts) == 1:
            return parts[0]
        sep_off = np.full(len(sep), -1, dtype=np.int64)
        texts, offs = [], []
        for i, p in enumerate(parts):
            if i:
                texts.append(sep)
                offs.append(sep_off)
            texts.append(p.text)
            offs.append(p.off)
        return cls("".join(texts), np.concatenate(offs) if offs else _EMPTY)

    # -- transforms (all offset-preserving) -----------------------------------
    def __len__(self) -> int:
        return len(self.text)

    def __bool__(self) -> bool:
        return bool(self.text)

    def slice(self, start: int, end: int) -> "TrackedText":
        return TrackedText(self.text[start:end], self.off[start:end])

    def concat(self, other: "TrackedText") -> "TrackedText":
        return TrackedText(self.text + other.text, np.concatenate([self.off, other.off]))

    def strip(self) -> "TrackedText":
        if not self.text.strip():
            return TrackedText.empty()
        lead = len(self.text) - len(self.text.lstrip())
        trail = len(self.text) - len(self.text.rstrip())
        return self.slice(lead, len(self.text) - trail)

    def sub(self, pattern, repl: str = "", flags: int = 0) -> "TrackedText":
        """re.sub with a constant replacement; replacement chars are
        synthetic.  Semantics identical to ``re.sub`` on plain text."""
        rx = re.compile(pattern, flags) if isinstance(pattern, str) else pattern
        pieces_t, pieces_o = [], []
        pos = 0
        repl_off = np.full(len(repl), -1, dtype=np.int64)
        for m in rx.finditer(self.text):
            s, e = m.span()
            pieces_t.append(self.text[pos:s])
            pieces_o.append(self.off[pos:s])
            if repl:
                pieces_t.append(repl)
                pieces_o.append(repl_off)
            pos = e
        pieces_t.append(self.text[pos:])
        pieces_o.append(self.off[pos:])
        return TrackedText("".join(pieces_t), np.concatenate(pieces_o) if pieces_o else _EMPTY)

    def filter_chars(self, keep_mask: np.ndarray) -> "TrackedText":
        """Keep characters where mask is True (C5 printable filter)."""
        idx = np.flatnonzero(keep_mask)
        return TrackedText("".join(self.text[i] for i in idx), self.off[idx])

    def split(self, sep: str) -> list["TrackedText"]:
        out = []
        start = 0
        while True:
            i = self.text.find(sep, start)
            if i == -1:
                out.append(self.slice(start, len(self.text)))
                return out
            out.append(self.slice(start, i))
            start = i + len(sep)

    # -- span encoding ---------------------------------------------------------
    def spans(self) -> list[dict]:
        """Run-length encode offsets into (start, end, kind) structs."""
        n = len(self.text)
        if n == 0:
            return []
        off = self.off
        # run boundary where offsets stop being contiguous (+1 steps in a
        # src run, or -1/-1 continuation in a syn run)
        prev, cur = off[:-1], off[1:]
        contiguous = ((prev == -1) & (cur == -1)) | ((prev != -1) & (cur == prev + 1))
        bounds = np.concatenate(([0], np.flatnonzero(~contiguous) + 1, [n]))
        out = []
        for run_start, run_end in zip(bounds[:-1], bounds[1:]):
            if off[run_start] == -1:
                out.append({"start": int(run_start), "end": int(run_end), "kind": "syn"})
            else:
                out.append(
                    {
                        "start": int(off[run_start]),
                        "end": int(off[run_end - 1]) + 1,
                        "kind": "src",
                    }
                )
        return out

    def span_tuples(self) -> list[tuple]:
        """spans() as (start, end, kind) tuples — the Arrow-friendly
        form the extraction UDF emits (dict construction is measurable
        at millions of rows)."""
        n = len(self.text)
        if n == 0:
            return []
        off = self.off
        prev, cur = off[:-1], off[1:]
        contiguous = ((prev == -1) & (cur == -1)) | ((prev != -1) & (cur == prev + 1))
        bounds = np.concatenate(([0], np.flatnonzero(~contiguous) + 1, [n]))
        out = []
        for run_start, run_end in zip(bounds[:-1].tolist(), bounds[1:].tolist()):
            if off[run_start] == -1:
                out.append((run_start, run_end, "syn"))
            else:
                first = int(off[run_start])
                out.append((first, first + (run_end - run_start), "src"))
        return out


def reconstruct(payload: str, extracted: str, spans: list) -> str:
    """Rebuild extracted text from payload + spans (test invariant).
    Accepts dict spans ({start,end,kind}) or (start, end, kind) tuples."""
    parts = []
    for sp in spans:
        if isinstance(sp, dict):
            start, end, kind = sp["start"], sp["end"], sp["kind"]
        else:
            start, end, kind = sp
        parts.append(payload[start:end] if kind == "src" else extracted[start:end])
    return "".join(parts)
