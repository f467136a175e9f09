"""Single-pass HTML event driver — stdlib semantics, batch-input speed.

``fast_feed(builder, payload)`` replays, event for event, exactly what
CPython 3.11's ``html.parser.HTMLParser`` (with
``convert_charrefs=False``) produces for ``feed(payload); close()``,
driving the same ``_TreeBuilder`` handler methods — but in one flat
loop over the full document:

- every "incomplete construct, wait for more data" branch of
  ``goahead`` collapses into the end-of-input recovery (``end=1``),
  because the whole payload is available up front;
- no per-event line/column bookkeeping, no ``rawdata`` re-slicing, no
  ``startswith``-chain re-dispatch through bound-method indirection;
- positions are absolute payload offsets, assigned to ``builder._pos``
  right before each position-sensitive event (data/entityref/charref),
  matching what ``_TreeBuilder._abs()`` reads.

All *tolerant-parsing* semantics (what counts as a tag, how broken
markup degrades to data) come from the stdlib's own compiled regexes,
imported and applied in the same order — this module only re-implements
the dispatch loop, not the grammar.  ``tests/test_fastfeed_diff.py``
asserts tree equality against the stdlib path over every fixture
archetype, the e2e corpus, adversarial snippets, and random mutations.

Reference: the original engine parses with BeautifulSoup's
``html.parser`` backend (/root/reference/common_scripts/
web_text_extractor_ver1.5.py:1241 etc.); this driver preserves that
parser's observable behavior.
"""

from __future__ import annotations

import re

from html import unescape

try:  # stdlib internals — stable in the pinned CPython; guarded anyway
    from _markupbase import (
        _commentclose,
        _declname_match,
        _markedsectionclose,
        _msmarkedsectionclose,
    )
    from html.parser import (
        attrfind_tolerant,
        charref,
        endendtag,
        endtagfind,
        entityref,
        incomplete,
        interesting_normal,
        locatestarttagend_tolerant,
        piclose,
        starttagopen,
        tagfind_tolerant,
    )

    FAST_FEED_AVAILABLE = True
except ImportError:  # pragma: no cover - other CPython layouts
    FAST_FEED_AVAILABLE = False

if FAST_FEED_AVAILABLE:
    # set_cdata_mode equivalents, precompiled (CDATA_CONTENT_ELEMENTS)
    _CDATA_CLOSE = {
        "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
        "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
    }

_TAG_BREAK_CHARS = "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"

# fast paths for the overwhelmingly-common tag shapes: '<name ...>' with
# a plain ASCII-alphanumeric name and zero or more well-formed
# double-quoted '&'-free attributes, and '</name>'.  For exactly these
# inputs the stdlib machinery (tolerant regexes + attrfind loop +
# unescape + strip) provably produces the same events with the same end
# positions — plain names lowercase identically, quote stripping is the
# same, and unescape of an '&'-free value is the identity — so one
# anchored match replaces the chain; anything else falls through to the
# stdlib-regex path unchanged (verified by tests/test_fastfeed_diff.py).
_SIMPLE_START = re.compile(
    r"([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z][a-zA-Z0-9_:.-]*=\"[^\"&]*\")*)"
    r"\s*(/?)>"
)
_SIMPLE_ATTR = re.compile(r"\s+([a-zA-Z][a-zA-Z0-9_:.-]*)=\"([^\"&]*)\"")
_SIMPLE_END = re.compile(r"([a-zA-Z][a-zA-Z0-9]*)>")


def _parse_starttag(b, rawdata: str, i: int):
    """HTMLParser.parse_starttag + check_for_whole_start_tag, end=1.

    Returns (endpos, cdata_elem_opened) — endpos < 0 means the construct
    is unrecoverable at EOF (caller runs the data-fallback)."""
    m = _SIMPLE_START.match(rawdata, i + 1)
    if m:
        tag = m.group(1).lower()
        rawattrs = m.group(2)
        if rawattrs:
            attrs = [
                (am.group(1).lower(), am.group(2))
                for am in _SIMPLE_ATTR.finditer(rawattrs)
            ]
        else:
            attrs = []
        if m.group(3):  # '/>' — empty-element tag
            b.handle_startendtag(tag, attrs)
            return m.end(), None
        b.handle_starttag(tag, attrs)
        return m.end(), tag if tag in _CDATA_CLOSE else None
    m = locatestarttagend_tolerant.match(rawdata, i)
    j = m.end()
    nextc = rawdata[j : j + 1]
    if nextc == ">":
        endpos = j + 1
    elif nextc == "/":
        if rawdata.startswith("/>", j):
            endpos = j + 2
        else:  # stdlib returns -1 for any lone '/' here
            return -1, None
    elif nextc == "":
        return -1, None  # end of input inside the tag
    elif nextc in _TAG_BREAK_CHARS:
        return -1, None  # stdlib: EOF in/before attribute value
    else:
        endpos = j if j > i else i + 1

    attrs = []
    m = tagfind_tolerant.match(rawdata, i + 1)
    k = m.end()
    tag = m.group(1).lower()
    while k < endpos:
        am = attrfind_tolerant.match(rawdata, k)
        if not am:
            break
        attrname, rest, attrvalue = am.group(1, 2, 3)
        if not rest:
            attrvalue = None
        elif attrvalue[:1] == "'" == attrvalue[-1:] or attrvalue[:1] == '"' == attrvalue[-1:]:
            attrvalue = attrvalue[1:-1]
        if attrvalue:
            attrvalue = unescape(attrvalue)
        attrs.append((attrname.lower(), attrvalue))
        k = am.end()

    end = rawdata[k:endpos].strip()
    if end not in (">", "/>"):
        b._pos = i
        b.handle_data(rawdata[i:endpos])
        return endpos, None
    if end.endswith("/>"):
        b.handle_startendtag(tag, attrs)
        return endpos, None
    b.handle_starttag(tag, attrs)
    return endpos, tag if tag in _CDATA_CLOSE else None


def _parse_endtag(b, rawdata: str, i: int, cdata_elem):
    """HTMLParser.parse_endtag.  Returns (endpos, new_cdata_elem)."""
    m = _SIMPLE_END.match(rawdata, i + 2)
    if m:
        elem = m.group(1).lower()
        if cdata_elem is not None and elem != cdata_elem:
            b._pos = i
            b.handle_data(rawdata[i : m.end()])
            return m.end(), cdata_elem
        b.handle_endtag(elem)
        return m.end(), None  # clear_cdata_mode
    match = endendtag.search(rawdata, i + 1)  # any '>'
    if not match:
        return -1, cdata_elem
    gtpos = match.end()
    match = endtagfind.match(rawdata, i)  # </ + tag + >
    if not match:
        if cdata_elem is not None:
            b._pos = i
            b.handle_data(rawdata[i:gtpos])
            return gtpos, cdata_elem
        namematch = tagfind_tolerant.match(rawdata, i + 2)
        if not namematch:
            if rawdata[i : i + 3] == "</>":
                return i + 3, cdata_elem
            return _parse_bogus_comment(b, rawdata, i), cdata_elem
        tagname = namematch.group(1).lower()
        gtpos = rawdata.find(">", namematch.end())
        b.handle_endtag(tagname)
        return gtpos + 1, cdata_elem

    elem = match.group(1).lower()
    if cdata_elem is not None and elem != cdata_elem:
        b._pos = i
        b.handle_data(rawdata[i:gtpos])
        return gtpos, cdata_elem
    b.handle_endtag(elem)
    return gtpos, None  # clear_cdata_mode


def _parse_comment(b, rawdata: str, i: int) -> int:
    match = _commentclose.search(rawdata, i + 4)
    if not match:
        return -1
    b.handle_comment(rawdata[i + 4 : match.start()])
    return match.end()


def _parse_pi(b, rawdata: str, i: int) -> int:
    match = piclose.search(rawdata, i + 2)
    if not match:
        return -1
    b.handle_pi(rawdata[i + 2 : match.start()])
    return match.end()


def _parse_bogus_comment(b, rawdata: str, i: int) -> int:
    pos = rawdata.find(">", i + 2)
    if pos == -1:
        return -1
    b.handle_comment(rawdata[i + 2 : pos])
    return pos + 1


def _scan_name(rawdata: str, i: int, declstartpos: int):
    n = len(rawdata)
    if i == n:
        return None, -1
    m = _declname_match(rawdata, i)
    if m:
        s = m.group()
        if (i + len(s)) == n:
            return None, -1  # end of buffer
        return s.strip().lower(), m.end()
    raise AssertionError(
        "expected name token at %r" % rawdata[declstartpos : declstartpos + 20]
    )


def _parse_marked_section(b, rawdata: str, i: int) -> int:
    sect_name, j = _scan_name(rawdata, i + 3, i)
    if j < 0:
        return j
    if sect_name in ("temp", "cdata", "ignore", "include", "rcdata"):
        match = _markedsectionclose.search(rawdata, i + 3)  # ]]>
    elif sect_name in ("if", "else", "endif"):
        match = _msmarkedsectionclose.search(rawdata, i + 3)  # ]>
    else:
        raise AssertionError(
            "unknown status keyword %r in marked section" % rawdata[i + 3 : j]
        )
    if not match:
        return -1
    b.unknown_decl(rawdata[i + 3 : match.start(0)])
    return match.end(0)


def _parse_html_declaration(b, rawdata: str, i: int) -> int:
    if rawdata[i : i + 4] == "<!--":
        return _parse_comment(b, rawdata, i)
    if rawdata[i : i + 3] == "<![":
        return _parse_marked_section(b, rawdata, i)
    if rawdata[i : i + 9].lower() == "<!doctype":
        gtpos = rawdata.find(">", i + 9)
        if gtpos == -1:
            return -1
        b.handle_decl(rawdata[i + 2 : gtpos])
        return gtpos + 1
    return _parse_bogus_comment(b, rawdata, i)


_TREE = None


def _bind_tree():
    # late import (dom imports this module); cached tuple of the tree
    # types/constants the fused fast paths need
    global _TREE
    from webtext_extraction_spark.html import dom as _dom

    _TREE = (_dom.TextNode, _dom.Element, _dom.VOID_ELEMENTS, _dom.MAX_DEPTH)
    return _TREE


def fast_feed(b, rawdata: str) -> None:
    """Drive builder ``b`` through the full event stream for
    ``rawdata`` — identical events/positions to ``b.feed(rawdata);
    b.close()`` on the stdlib parser.

    When ``b`` is a ``_TreeBuilder`` (the only production builder), the
    common events are FUSED: data runs append straight to the stable
    pending list, and the simple start/end-tag fast paths inline the
    builder's handler bodies over local variables — a mechanical copy
    of ``handle_starttag`` / ``handle_startendtag`` / ``handle_endtag``
    statement for statement, so the resulting tree is identical (the
    differential suite drives this path against the stdlib parser)."""
    n = len(rawdata)
    i = 0
    cdata_elem = None
    interesting = interesting_normal
    handle_data = b.handle_data
    # _TreeBuilder contract: the pending-pieces list object is stable
    # (flush copies + clears), _rebase is 0 on a fresh builder — data
    # runs append straight to it, skipping a method call per event
    pending = getattr(b, "pending", None)
    direct = pending is not None and getattr(b, "_rebase", None) == 0
    if direct:
        TextNode, Element, void_elements, max_depth = _TREE or _bind_tree()
        stack = b.stack
        order_list = b._order_list
        overflow = b.overflow_tags
        # local pre-order counter; synced to b.order around any generic
        # path that can create elements (_parse_starttag)
        order = b.order
    # The stdlib runs TWO goahead passes (feed(end=0), then close(end=1)).
    # Every feed-pass break simply resumes identically in the close pass —
    # except the bogus-'&#' bail, which resumes parsing after a feed-pass
    # break but dumps the remaining input as plain data after a
    # close-pass break.  `bailed` tracks which pass we are simulating.
    bailed = False
    while i < n:
        match = interesting.search(rawdata, i)
        if match:
            j = match.start()
        else:
            if cdata_elem:
                if direct:
                    b.order = order
                return  # unterminated CDATA tail is never emitted (stdlib)
            j = n
        if i < j:
            if direct:
                pending.append((rawdata[i:j], i, j, True))
            else:
                b._pos = i
                handle_data(rawdata[i:j])
        i = j
        if i == n:
            break
        c = rawdata[i]
        if c == "<":
            # single-char dispatch — same decision tree as the stdlib's
            # startswith chain ('<'+letter / '</' / '<!--' / '<?' / '<!')
            # without a regex match per tag (starttagopen is '<[a-zA-Z]')
            nxt = rawdata[i + 1 : i + 2]
            if "a" <= nxt <= "z" or "A" <= nxt <= "Z":
                if direct:
                    m = _SIMPLE_START.match(rawdata, i + 1)
                    if m:
                        # fused _parse_starttag fast path +
                        # handle_starttag/handle_startendtag body
                        tag, rawattrs, slash = m.group(1, 2, 3)
                        tag = tag.lower()
                        parent = stack[-1]
                        if pending:
                            parent.children.append(TextNode(pending[:], parent))
                            pending.clear()
                        attr_map = {}
                        if rawattrs:
                            for am in _SIMPLE_ATTR.finditer(rawattrs):
                                attr_map[am.group(1).lower()] = am.group(2)
                        order += 1
                        el = Element(tag, attr_map, parent, order)
                        parent.children.append(el)
                        order_list.append(el)
                        if not slash:  # start tag (not '/>')
                            if tag not in void_elements:
                                if len(stack) >= max_depth:
                                    overflow.append(tag)
                                else:
                                    stack.append(el)
                            if tag in _CDATA_CLOSE:
                                cdata_elem = tag
                                interesting = _CDATA_CLOSE[tag]
                        i = m.end()
                        continue
                if direct:
                    b.order = order
                k, opened = _parse_starttag(b, rawdata, i)
                if direct:
                    order = b.order
                if opened is not None:
                    cdata_elem = opened
                    interesting = _CDATA_CLOSE[opened]
            elif nxt == "/":
                if direct:
                    m = _SIMPLE_END.match(rawdata, i + 2)
                    if m:
                        # fused _parse_endtag fast path
                        elem = m.group(1).lower()
                        k = m.end()
                        if cdata_elem is not None and elem != cdata_elem:
                            pending.append((rawdata[i:k], i, k, True))
                            i = k
                            continue
                        # inline handle_endtag body
                        if pending:
                            parent = stack[-1]
                            parent.children.append(TextNode(pending[:], parent))
                            pending.clear()
                        if not overflow and len(stack) > 1 and stack[-1].name == elem:
                            stack.pop()  # innermost match
                        else:
                            b.handle_endtag(elem)  # overflow / stray cases
                        if cdata_elem is not None:  # clear_cdata_mode
                            cdata_elem = None
                            interesting = interesting_normal
                        i = k
                        continue
                k, new_cdata = _parse_endtag(b, rawdata, i, cdata_elem)
                if new_cdata is not cdata_elem and k >= 0:
                    cdata_elem = new_cdata
                    interesting = interesting_normal
            elif nxt == "!":
                if rawdata.startswith("<!--", i):
                    k = _parse_comment(b, rawdata, i)
                else:
                    k = _parse_html_declaration(b, rawdata, i)
            elif nxt == "?":
                k = _parse_pi(b, rawdata, i)
            elif i + 1 < n:
                b._pos = i
                handle_data("<")
                k = i + 1
            else:
                break  # lone trailing '<' — emitted by the tail block
            if k < 0:
                # end-of-input recovery (goahead's end=1 branch).  The
                # stdlib only reaches this in the CLOSE pass — its feed
                # pass breaks at every -1 construct — so from here on we
                # are simulating the close pass (a later bogus-'&#' bail
                # must dump the tail, not resume parsing).
                bailed = True
                k = rawdata.find(">", i + 1)
                if k < 0:
                    k = rawdata.find("<", i + 1)
                    if k < 0:
                        k = i + 1
                else:
                    k += 1
                b._pos = i
                handle_data(rawdata[i:k])
            i = k
        elif rawdata.startswith("&#", i):
            match = charref.match(rawdata, i)
            if match:
                b._pos = i
                b.handle_charref(match.group()[2:-1])
                k = match.end()
                if not rawdata.startswith(";", k - 1):
                    k -= 1
                i = k
                continue
            if ";" in rawdata[i:]:  # stdlib: bail by consuming '&#'
                b._pos = i
                handle_data(rawdata[i : i + 2])
                i += 2
                if not bailed:
                    # feed-pass break: the close pass re-parses the rest
                    bailed = True
                    continue
            break
        else:  # '&'
            match = entityref.match(rawdata, i)
            if match:
                b._pos = i
                b.handle_entityref(match.group(1))
                k = match.end()
                if not rawdata.startswith(";", k - 1):
                    k -= 1
                i = k
                continue
            match = incomplete.match(rawdata, i)
            if match:
                if match.group() == rawdata[i:]:
                    i += 1  # stdlib drops the '&' at EOF
                break
            if i + 1 < n:
                b._pos = i
                handle_data("&")
                i += 1
            else:
                break
    if direct:
        b.order = order
    # trailing emit (end=1; suppressed in CDATA mode, like the stdlib)
    if i < n and cdata_elem is None:
        b._pos = i
        handle_data(rawdata[i:n])
