"""Fast single-shot HTML tokenizer — drop-in driver for _BlockSegmenter.

``html.parser.HTMLParser.goahead`` costs ~45% of whole-document extraction:
it maintains feed()-boundary state (updatepos, rawdata carry-over), parses
every attribute into (name, unescape(value)) pairs, and allocates Match
objects per attribute — none of which the block segmenter uses (it consumes
only tag names, self-closing-ness, and text data). ``fast_feed`` replicates
goahead's CONTROL FLOW for the whole-document case (feed once + close)
using html.parser's OWN module regexes for every boundary decision, so tag
boundaries are decided by the exact same patterns — and skips attribute
parsing entirely on the common path (no '/' inside the tag), falling back to
the stdlib attr-consume loop whenever the classification could depend on it
(self-closing vs bare-attr-value-ending-in-'/', junk-in-tag-as-data).

Byte-identity is enforced two ways: a differential fuzz test drives both
tokenizers over adversarial HTML and the full synthetic corpus and compares
every segmenter observable, and the committed goldens pin end-to-end output.

Replicated edge semantics (verified against CPython 3.11 html/parser.py):
* charrefs converted chunk-wise with html.unescape exactly where goahead
  does (never in script/style);
* script/style CDATA mode: data is raw, only the real ``</script>`` pattern
  ends it, and an unterminated element silently drops its tail;
* '<' not starting a construct is emitted as a LONE data chunk (chunk
  boundaries matter: link_chars collapses whitespace per chunk);
* unterminated tags/comments at EOF take goahead's end=1 path (emit through
  the next '>' or '<' or one char, unescaped);
* ``<a href=x/>`` is a START tag (the '/' belongs to the bare value), while
  ``<br/>`` is a startend tag — decided by the stdlib attr loop on the
  slow path.
"""

from __future__ import annotations

from html import unescape
from html.parser import (
    attrfind_tolerant,
    commentclose,
    endtagfind,
    locatestarttagend_tolerant,
    starttagopen,
    tagfind_tolerant,
)
import re

_CDATA_ELEMS = ("script", "style")
# Attribute-free tag fast paths (~half of start tags, ~all end tags on web
# corpora).  Name chars are restricted to [a-zA-Z0-9] — a strict subset of
# what tagfind_tolerant / endtagfind / locatestarttagend_tolerant accept with
# zero attributes and zero whitespace, so every fast-path hit provably takes
# the same branch as the stdlib-regex path: start → terminated, no '/' after
# the name → handle_starttag(tag, []); end → endtagfind match at the first
# '>' → handle_endtag(tag).  Misses fall through unchanged.
_SIMPLE_START = re.compile(r"<([a-zA-Z][a-zA-Z0-9]*)>")
_SIMPLE_END = re.compile(r"</([a-zA-Z][a-zA-Z0-9]*)>")
# Attr-ful start-tag fast path: name + [\t\n\r\f ] separator + a TOKEN-level
# attribute grammar — separator runs and ``name[=value]`` attributes, where
# value is "..."/'...' (no '<'/'>' inside) or a bare run, and names/bare
# values use only chars that are neither quotes, '=', '/', '<', '>', nor
# ASCII whitespace.  Every hit provably reproduces the stdlib path:
# (a) the separator [\t\n\r\f ] is in tagfind_tolerant's name-exclusion
#     set, so the stdlib would extract the identical tag name ('\x0b' and
#     unicode spaces are NOT — they'd extend the stdlib name — hence the
#     explicit ASCII class instead of \s);
# (b) quotes occur ONLY as a complete quoted value directly after a
#     ``name=`` whose name starts at a position where the stdlib attr
#     machinery starts an attr name (region start / after a separator /
#     after a quoted value — attrfind_tolerant's lookbehind ['"\s/] holds at
#     exactly those), the stdlib name stops at the same '=' (its name class
#     excludes '='), and the '=' indicator then consumes the same quoted
#     span (our content excludes the quote itself, so the stdlib's first
#     closing quote is ours; ws INSIDE quotes is fine here because this is
#     guaranteed value position).  Everything that could make a quote mean
#     something else falls through to the slow path: a quote in attr-NAME
#     position stalls the stdlib mid-tag and demotes the whole tag to data
#     (``<a 't='>`` — name "'t" eats the quote, every value alternative then
#     fails at the orphaned quote); '=' may START a tolerant name and eat a
#     following quote into it (``<a ="u=">``); and after a BARE value a
#     second '=' makes the stdlib re-tokenize mid-bare-value
#     (``<a t=t='q x'>`` — the stdlib bare value stops at the space inside
#     what a naive reading calls a quoted value).  All three classes are
#     unmatchable under this grammar: '=' never starts a token, bare values
#     exclude '=' and quotes, and adjacent-token gaps (bare value followed
#     by '=' or a quote) match nothing.  Since no token contains '<'/'>',
#     every hit's locatestarttagend_tolerant/attr-loop scan lands on exactly
#     our terminating '>' → handle_starttag;
# (c) no '/' anywhere (quoted content aside) → not a startend tag; quoted
#     '/' is exactly the case this pattern reclaims (href="/..." etc.,
#     ~40% of start tags on link-bearing web corpora).  Misses fall through
#     unchanged; byte-identity is pinned by the differential fuzz (incl.
#     the three adversarial classes above) + goldens like the other fast
#     paths.
# Linearity: every quantifier is possessive (Python 3.11+), token first
# chars are disjoint (separator ws vs name chars; '=' and quotes start
# nothing), and the value alternation is first-char-deterministic with an
# atomic empty-bare fallback — one forward scan, zero backtracking, even on
# miss.
_FAST_START = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9]*)[\t\n\r\f ]"
    r"(?:[\t\n\r\f ]++"
    r"|[^<>/\"'=\t\n\r\f ]++"
    r"(?:=(?:\"[^\"<>]*+\"|'[^'<>]*+'|[^<>/\"'=\t\n\r\f ]*+))?+"
    r")*+>"
)
# `<br/>`-style bare startend tag: stdlib path is check_for_whole_start_tag
# endpos=j+2 via the '/>' branch, then the attr loop breaks immediately at
# '/' and end == '/>' → handle_startendtag(tag, []).
_SIMPLE_STARTEND = re.compile(r"<([a-zA-Z][a-zA-Z0-9]*)/>")
_NO_ATTRS: list = []  # handlers never mutate attrs; shared to skip per-tag allocs
_MARKED_CLOSE = re.compile(r"]\s*]\s*>")
_MARKED_IF_CLOSE = re.compile(r"]\s*>")
_CDATA_INTERESTING = {
    elem: re.compile(r"</\s*%s\s*>" % elem, re.I) for elem in _CDATA_ELEMS
}


def _check_whole_start_tag(rawdata: str, i: int, n: int) -> int:
    """html.parser.check_for_whole_start_tag for the single-shot case."""
    m = locatestarttagend_tolerant.match(rawdata, i)
    j = m.end()
    nxt = rawdata[j:j + 1]
    if nxt == ">":
        return j + 1
    if nxt == "/":
        if rawdata.startswith("/>", j):
            return j + 2
        # lone '/' at EOF: buffer boundary in stdlib → incomplete
        return -1
    if nxt == "":
        return -1
    if nxt in ("abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"):
        return -1
    return j if j > i else i + 1


def _parse_starttag(h, rawdata: str, i: int, n: int) -> tuple[int, str | None]:
    """Returns (next_pos, cdata_elem_or_None); next_pos < 0 = incomplete."""
    endpos = _check_whole_start_tag(rawdata, i, n)
    if endpos < 0:
        return -1, None
    m = tagfind_tolerant.match(rawdata, i + 1)
    k = m.end()
    tag = m.group(1).lower()

    terminated = rawdata[endpos - 1] == ">"
    if terminated and "/" not in rawdata[k:endpos - 1]:
        # common fast path: no '/' anywhere after the tag name → plain start
        # tag; the attr loop could neither change the terminator nor make it
        # self-closing
        h.handle_starttag(tag, _NO_ATTRS)
        if tag in _CDATA_ELEMS:
            return endpos, tag
        return endpos, None

    # slow path — replicate parse_starttag's attr-consume loop exactly
    while k < endpos:
        am = attrfind_tolerant.match(rawdata, k)
        if not am:
            break
        k = am.end()
    end = rawdata[k:endpos].strip()
    if end not in (">", "/>"):
        h.handle_data(rawdata[i:endpos])
        return endpos, None
    if end.endswith("/>"):
        h.handle_startendtag(tag, _NO_ATTRS)
        return endpos, None
    h.handle_starttag(tag, _NO_ATTRS)
    if tag in _CDATA_ELEMS:
        return endpos, tag
    return endpos, None


def _parse_endtag(h, rawdata: str, i: int, n: int, cdata_elem: str | None
                  ) -> tuple[int, str | None]:
    gt = rawdata.find(">", i + 1)
    if gt < 0:
        return -1, cdata_elem
    gtpos = gt + 1
    m = endtagfind.match(rawdata, i)
    if not m:
        if cdata_elem is not None:
            h.handle_data(rawdata[i:gtpos])
            return gtpos, cdata_elem
        nm = tagfind_tolerant.match(rawdata, i + 2)
        if not nm:
            if rawdata[i:i + 3] == "</>":
                return i + 3, cdata_elem
            # bogus comment: consume to '>' (handle_comment is unused)
            pos = rawdata.find(">", i + 2)
            return (pos + 1) if pos >= 0 else -1, cdata_elem
        tagname = nm.group(1).lower()
        gtpos = rawdata.find(">", nm.end())
        h.handle_endtag(tagname)
        return gtpos + 1, cdata_elem
    elem = m.group(1).lower()
    if cdata_elem is not None and elem != cdata_elem:
        h.handle_data(rawdata[i:gtpos])
        return gtpos, cdata_elem
    h.handle_endtag(elem)
    return gtpos, None


def _parse_html_declaration(rawdata: str, i: int) -> int:
    """'<!...' minus the '<!--' case (handled by the caller). handle_decl /
    handle_comment are no-ops in the segmenter, so only the end position
    matters — computed with the stdlib's exact rules."""
    if rawdata[i:i + 3] == "<![":
        # marked section: replicate _markupbase.parse_marked_section +
        # _scan_name exactly (incl. both of its raising branches — the
        # caller's fallback then replays the doc through the stdlib parser
        # and lands in exactly its partial state)
        n = len(rawdata)
        if i + 3 == n:
            return -1
        m = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*").match(rawdata, i + 3)
        if not m:
            raise ValueError("expected name token in marked section")
        if i + 3 + len(m.group()) == n:
            return -1  # name touches end of buffer
        sect = m.group().strip().lower()
        if sect in {"temp", "cdata", "ignore", "include", "rcdata"}:
            mm = _MARKED_CLOSE.search(rawdata, i + 3)
        elif sect in {"if", "else", "endif"}:
            mm = _MARKED_IF_CLOSE.search(rawdata, i + 3)
        else:
            raise ValueError(f"unknown marked section keyword {sect!r}")
        return mm.end() if mm else -1
    if rawdata[i:i + 9].lower() == "<!doctype":
        gt = rawdata.find(">", i + 9)
        return (gt + 1) if gt >= 0 else -1
    # bogus comment
    pos = rawdata.find(">", i + 2)
    return (pos + 1) if pos >= 0 else -1


def fast_feed(h, rawdata: str) -> None:
    """Single-shot feed()+close() equivalent driving handler callbacks."""
    i, n = 0, len(rawdata)
    cdata_elem: str | None = None
    while i < n:
        # -- data up to the next interesting position ----------------------
        if cdata_elem is None:
            j = rawdata.find("<", i)
            if j < 0:
                h.handle_data(unescape(rawdata[i:n]))
                return
        else:
            m = _CDATA_INTERESTING[cdata_elem].search(rawdata, i)
            if not m:
                return  # unterminated cdata: tail silently dropped (stdlib)
            j = m.start()
        if i < j:
            if cdata_elem is None:
                h.handle_data(unescape(rawdata[i:j]))
            else:
                h.handle_data(rawdata[i:j])
        i = j
        # -- dispatch on the construct at '<' ------------------------------
        sm = _SIMPLE_START.match(rawdata, i)
        if sm is not None:
            # cdata_elem is always None here: in cdata mode the dispatcher
            # only ever lands on a ``</`` match, which this pattern rejects
            tag = sm.group(1).lower()
            h.handle_starttag(tag, _NO_ATTRS)
            if tag in _CDATA_ELEMS:
                cdata_elem = tag
            i = sm.end()
            continue
        fm = _FAST_START.match(rawdata, i)
        if fm is not None:
            # as with _SIMPLE_START, cdata_elem is always None here
            tag = fm.group(1).lower()
            h.handle_starttag(tag, _NO_ATTRS)
            if tag in _CDATA_ELEMS:
                cdata_elem = tag
            i = fm.end()
            continue
        xm = _SIMPLE_STARTEND.match(rawdata, i)
        if xm is not None:
            h.handle_startendtag(xm.group(1).lower(), _NO_ATTRS)
            i = xm.end()
            continue
        if starttagopen.match(rawdata, i):
            k, cdata_elem = _parse_starttag(h, rawdata, i, n)
        elif rawdata.startswith("</", i):
            em = _SIMPLE_END.match(rawdata, i)
            if em is not None:
                elem = em.group(1).lower()
                if cdata_elem is None or elem == cdata_elem:
                    h.handle_endtag(elem)
                    cdata_elem = None
                    i = em.end()
                    continue
            k, cdata_elem = _parse_endtag(h, rawdata, i, n, cdata_elem)
        elif rawdata.startswith("<!--", i):
            m = commentclose.search(rawdata, i + 4)
            k = m.end() if m else -1
        elif rawdata.startswith("<?", i):
            gt = rawdata.find(">", i + 2)
            k = (gt + 1) if gt >= 0 else -1
        elif rawdata.startswith("<!", i):
            k = _parse_html_declaration(rawdata, i)
        elif i + 1 < n:
            h.handle_data("<")
            k = i + 1
        else:
            break  # lone '<' at EOF → epilogue emits it
        if k < 0:
            # goahead's end=1 incomplete path: emit through next '>' or '<'
            # or one char
            k = rawdata.find(">", i + 1)
            if k < 0:
                k = rawdata.find("<", i + 1)
                if k < 0:
                    k = i + 1
            else:
                k += 1
            if cdata_elem is None:
                h.handle_data(unescape(rawdata[i:k]))
            else:
                h.handle_data(rawdata[i:k])
        i = k
    # epilogue (goahead end=1): trailing unprocessed text, unless in cdata
    if i < n and cdata_elem is None:
        h.handle_data(unescape(rawdata[i:n]))
