"""Minimal offset-tracking DOM for the extraction kernel.

A from-scratch, stdlib-only HTML tree used *inside* vectorized pandas
UDF batches (never as a Spark type).  Behavior pins the subset of
BeautifulSoup(html, 'html.parser') semantics the reference engine
relies on (see /root/reference/common_scripts/
web_text_extractor_ver1.5.py — cited as W throughout):

- ``get_text(separator, strip=True)``: per-text-node strip, drop
  empties, join by separator (W:815, W:1288, W:1354, W:625).
  Comments / doctypes / processing instructions contribute no text.
- ``decompose()``: subtree removal that later selections and
  ``get_text`` observe (W:1285-1287).
- script/style/noscript raw-text (CDATA) contents *are* text nodes
  (which is exactly why the reference decomposes those tags first).
- adjacent character data and decoded entities merge into a single
  logical text node (bs4 ``convert_charrefs=True`` behavior), so a
  run like ``a &amp; b`` strips as one string.

Every character of every text node carries its offset into the raw
payload so extracted text can be emitted with character-span
provenance (new-engine obligation; the reference never records
offsets).  Entity-decoded characters are flagged as non-literal: the
decoded char is not a verbatim slice of the payload.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Nesting-depth guard: elements opened beyond this depth attach as
# siblings at the cap level instead of nesting.  Rationale: block
# scoring (D3) does per-block subtree text walks, which is quadratic
# in nesting depth — a hostile 5000-deep payload would stall an
# executor for ~12 s.  The reference's answer to stalls is a 600 s
# wall-clock kill (W:1388, P2); the engine's is this deterministic
# structural cap (real pages nest < 100 levels; capped parses remain
# well-defined and linear).
MAX_DEPTH = 512


class TextNode:
    """One logical run of character data.

    ``pieces`` is a list of ``(text, src_start, src_end, literal)``
    fragments: ``literal`` fragments satisfy
    ``payload[src_start:src_end] == text``; non-literal fragments are
    entity decodes whose source range covers the entity reference.
    """

    __slots__ = ("pieces", "parent")

    def __init__(self, pieces, parent):
        self.pieces = pieces
        self.parent = parent

    @property
    def text(self) -> str:
        return "".join(p[0] for p in self.pieces)


class Element:
    __slots__ = ("name", "attrs", "parent", "children", "decomposed", "_classes")

    def __init__(self, name: str, attrs: dict, parent):
        self.name = name
        self.attrs = attrs
        self.parent = parent
        self.children: list = []
        self.decomposed = False
        self._classes = None  # lazy class-token cache (attrs are immutable)

    # -- attribute helpers -------------------------------------------------
    def get(self, key: str, default=None):
        if key == "class":
            return self.class_list() or default
        return self.attrs.get(key, default)

    def class_list(self) -> list[str]:
        if self._classes is None:
            raw = self.attrs.get("class")
            self._classes = raw.split() if raw else []
        return self._classes

    @property
    def id(self):
        return self.attrs.get("id")

    # -- tree walks (iterative: real pages nest 1000+ levels deep, which
    # overflows the python stack with recursive generators) ----------------
    def iter(self):
        """Yield self + all live descendant Elements, document order."""
        if self.decomposed:
            return
        yield self
        yield from self.descendants()

    def iter_text_nodes(self):
        """Yield live TextNodes in document order."""
        if self.decomposed:
            return
        stack = [iter(self.children)]
        while stack:
            try:
                child = next(stack[-1])
            except StopIteration:
                stack.pop()
                continue
            if isinstance(child, TextNode):
                yield child
            elif isinstance(child, Element) and not child.decomposed:
                stack.append(iter(child.children))

    def descendants(self):
        stack = [iter(self.children)]
        while stack:
            try:
                child = next(stack[-1])
            except StopIteration:
                stack.pop()
                continue
            if isinstance(child, Element) and not child.decomposed:
                yield child
                stack.append(iter(child.children))

    def ancestors(self):
        node = self.parent
        while node is not None:
            yield node
            node = node.parent

    def prev_element_sibling(self):
        if self.parent is None:
            return None
        prev = None
        for child in self.parent.children:
            if child is self:
                return prev
            if isinstance(child, Element) and not child.decomposed:
                prev = child
        return None

    # -- mutation -----------------------------------------------------------
    def decompose(self):
        """Remove this subtree from the document (W:1285-1287 analogue)."""
        self.decomposed = True
        if self.parent is not None:
            self.parent.children = [c for c in self.parent.children if c is not self]
            self.parent = None

    # -- text assembly (the D6 kernel, W:815/W:1288) -------------------------
    def get_text(self, separator: str = "", strip: bool = False) -> str:
        parts = []
        for tn in self.iter_text_nodes():
            s = tn.text
            if strip:
                s = s.strip()
                if not s:
                    continue
            parts.append(s)
        return separator.join(parts)

    def get_text_tracked(self, separator: str = "", strip: bool = False):
        """Like get_text but returns a TrackedText with payload offsets."""
        from webtext_extraction_spark.kernel.tracked import TrackedText

        parts = []
        for tn in self.iter_text_nodes():
            tt = TrackedText.from_pieces(tn.pieces)
            if strip:
                tt = tt.strip()
                if not tt.text:
                    continue
            parts.append(tt)
        return TrackedText.join(separator, parts)

    # -- queries -------------------------------------------------------------
    def select(self, selector: str) -> list["Element"]:
        from webtext_extraction_spark.html.selector import select

        return select(self, selector)

    def select_one(self, selector: str):
        matches = self.select(selector)
        return matches[0] if matches else None

    def find_all(self, names=None, class_pred=None, id_pred=None):
        """Subset of bs4 find_all used by the per-site handlers
        (W:765, W:773, W:778, W:864, W:1157): match by tag-name list
        and/or predicates over the raw class string / id string."""
        if isinstance(names, str):
            names = [names]
        out = []
        for el in self.descendants():
            if names is not None and el.name not in names:
                continue
            if class_pred is not None and not class_pred(el.attrs.get("class")):
                continue
            if id_pred is not None and not id_pred(el.attrs.get("id")):
                continue
            out.append(el)
        return out

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<{self.name} {self.attrs}>"


class Document(Element):
    """Root node; also exposes ``body`` and ``title`` (W:1341, W:1359)."""

    def __init__(self):
        super().__init__("[document]", {}, None)

    def _first_named(self, name):
        for el in self.descendants():
            if el.name == name:
                return el
        return None

    @property
    def body(self):
        return self._first_named("body")

    @property
    def title(self):
        return self._first_named("title")


class _TreeBuilder(HTMLParser):
    """Event-driven tree build with absolute source offsets.

    ``convert_charrefs=False`` so entity references arrive as discrete
    events with exact positions; adjacent data/entity fragments are
    buffered and flushed into one logical TextNode at the next tag
    boundary (matching bs4's merged-string behavior).
    """

    def __init__(self, payload: str):
        super().__init__(convert_charrefs=False)
        self.payload = payload
        # line-start table: getpos() is (1-based line, col)
        self.linestarts = [0]
        idx = payload.find("\n")
        while idx != -1:
            self.linestarts.append(idx + 1)
            idx = payload.find("\n", idx + 1)
        self.root = Document()
        self.stack: list[Element] = [self.root]
        self.pending: list = []  # text pieces awaiting flush
        # tag names of opens beyond MAX_DEPTH (flattened, not pushed) —
        # names are kept so an end tag only consumes a flattened open it
        # actually matches; </body> arriving while a capped <div> is
        # open must reach the real stack (ADVICE r01)
        self.overflow_tags: list[str] = []

    def _abs(self) -> int:
        line, col = self.getpos()
        return self.linestarts[line - 1] + col

    def _flush_text(self):
        if self.pending:
            parent = self.stack[-1]
            parent.children.append(TextNode(self.pending, parent))
            self.pending = []

    # -- tag events ----------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        self._flush_text()
        attr_map = {}
        for k, v in attrs:
            if k not in attr_map:  # first occurrence wins (html.parser order)
                attr_map[k] = v if v is not None else ""
        el = Element(tag, attr_map, self.stack[-1])
        self.stack[-1].children.append(el)
        if tag not in VOID_ELEMENTS:
            if len(self.stack) >= MAX_DEPTH:
                self.overflow_tags.append(tag)  # attach flat; named close below
            else:
                self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        self._flush_text()
        attr_map = {}
        for k, v in attrs:
            if k not in attr_map:
                attr_map[k] = v if v is not None else ""
        el = Element(tag, attr_map, self.stack[-1])
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag):
        self._flush_text()
        if self.overflow_tags:
            # consume the most recent MATCHING flattened open (closing
            # any flattened opens above it, stack-scan semantics); an
            # end tag naming no flattened open falls through to the
            # real stack below
            for i in range(len(self.overflow_tags) - 1, -1, -1):
                if self.overflow_tags[i] == tag:
                    del self.overflow_tags[i:]
                    return
        # pop to the most recent matching open tag; ignore strays
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                # every flattened open is logically ABOVE any real-stack
                # element: closing a real element closes them all, so a
                # stale overflow entry must not swallow a later legitimate
                # close (ADVICE r02)
                self.overflow_tags.clear()
                del self.stack[i:]
                break

    # -- text events ---------------------------------------------------------
    def handle_data(self, data):
        start = self._abs()
        self.pending.append((data, start, start + len(data), True))

    def handle_entityref(self, name):
        import html as _html

        start = self._abs()
        end = start + 1 + len(name)
        if end < len(self.payload) and self.payload[end] == ";":
            end += 1
        decoded = _html.unescape(self.payload[start:end])
        self.pending.append((decoded, start, end, False))

    def handle_charref(self, name):
        start = self._abs()
        end = start + 2 + len(name)
        if end < len(self.payload) and self.payload[end] == ";":
            end += 1
        try:
            code = int(name[1:], 16) if name.lower().startswith("x") else int(name)
            decoded = chr(code)
        except (ValueError, OverflowError):
            decoded = self.payload[start:end]
        self.pending.append((decoded, start, end, False))

    # comments / declarations / PIs contribute no text
    def handle_comment(self, data):
        self._flush_text()

    def handle_decl(self, decl):
        self._flush_text()

    def handle_pi(self, data):
        self._flush_text()

    def unknown_decl(self, data):
        self._flush_text()


def parse(payload: str) -> Document:
    """Parse an HTML payload into an offset-tracking Document tree."""
    builder = _TreeBuilder(payload)
    builder.feed(payload)
    builder.close()
    builder._flush_text()
    return builder.root
