"""minisoup — a stdlib-only HTML DOM with a CSS-selector subset.

The reference drives all extraction through BeautifulSoup with the
``html.parser`` backend (/root/reference/src/webscraper/scrapers/
ecommerce.py:119). bs4 is not available in this runtime, so this module
provides the small slice of that API the extraction cascades actually
use, implemented on :class:`html.parser.HTMLParser`:

- ``parse(html) -> Tag`` (document root)
- ``tag.select(css)`` / ``tag.select_one(css)`` with: tag names,
  ``.class``, ``#id``, ``[attr]``, ``[attr=v]``, ``[attr^=v]``,
  ``[attr*=v]``, ``[attr$=v]``, compound selectors, descendant/child
  combinators, selector groups (``,``), ``:first-of-type`` and
  ``:contains('txt')`` (every selector shape that appears in
  SURVEY.md §2.2's cascade inventory).
- ``tag.find`` / ``tag.find_all`` with name str/list, ``class_``
  str-or-callable, ``attrs`` dict, keyword attr filters (value
  str / True / compiled regex), and ``text=<regex>`` which — like bs4 —
  returns the matching *string* rather than a tag.
- ``tag.get_text(separator="", strip=False)`` with bs4 semantics
  (strip=True strips each descendant string and drops empties).
- ``tag.attrs`` / ``tag[attr]`` / ``tag.get`` / ``tag.has_attr``,
  ``tag.parent``, ``tag.find_next_sibling()``, ``tag.string``.

Pure Python, no per-row JVM crossing: the engine calls this inside
Arrow-batched ``mapInPandas`` UDFs, one DOM per page, vectorized over
Arrow record batches.
"""

from __future__ import annotations

import re
from bisect import bisect_right
from html.parser import HTMLParser
from operator import attrgetter
from types import MappingProxyType
from typing import Callable, Dict, Iterator, List, Mapping, Optional, Union

# sort/bisect key for the document-ordered index pools
_tag_start = attrgetter("start")

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# Elements whose open tag implicitly closes a same-name ancestor.
_IMPLICIT_CLOSE_SAME = frozenset("li p option tr td th dt dd".split())


class Tag:
    """An element node. ``children`` holds Tag and str (text) nodes.

    After :func:`parse`, every tag carries a document-order interval
    (``start``/``end``: descendant ⇔ interval containment) and a pointer
    to the root, which holds name/class/id indexes — so CSS selects are
    index lookups instead of full-tree walks (the extraction cascades
    evaluate ~25 selectors per page; this is the UDF hot path).
    """

    __slots__ = ("name", "attrs", "children", "parent", "start", "end", "root", "index", "text_len")

    def __init__(self, name: str, attrs: Optional[Dict[str, str]] = None):
        self.name = name
        self.attrs: Mapping[str, str] = attrs or {}
        self.children: List[Union["Tag", str]] = []
        self.parent: Optional["Tag"] = None
        self.start = 0
        self.end = 0
        self.root: Optional["Tag"] = None
        self.index: Optional[dict] = None
        # total document text length, tracked by _fast_build on the
        # root only (== len(get_text()); None elsewhere)
        self.text_len: Optional[int] = None

    # -- attribute access ------------------------------------------------
    def has_attr(self, key: str) -> bool:
        return key in self.attrs

    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    def __getitem__(self, key: str) -> str:
        return self.attrs[key]

    # -- traversal -------------------------------------------------------
    # Iterative stack walks: these run millions of times inside the
    # extraction UDFs; recursive generators cost ~3x more.
    def descendants(self) -> Iterator[Union["Tag", str]]:
        """Document-order traversal of all descendant nodes."""
        stack = [iter(self.children)]
        while stack:
            try:
                node = next(stack[-1])
            except StopIteration:
                stack.pop()
                continue
            yield node
            if node.__class__ is Tag and node.children:
                stack.append(iter(node.children))

    def iter_tags(self) -> Iterator["Tag"]:
        for node in self.descendants():
            if node.__class__ is Tag:
                yield node

    @property
    def strings(self) -> Iterator[str]:
        for node in self.descendants():
            if node.__class__ is str:
                yield node

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        if strip:
            return separator.join(s.strip() for s in self.strings if s.strip())
        return separator.join(self.strings)

    @property
    def string(self) -> Optional[str]:
        """bs4 ``.string``: the single string child, recursing through
        single-tag wrappers; None when ambiguous."""
        non_blank = [c for c in self.children if not (isinstance(c, str) and not c)]
        if len(non_blank) == 1:
            child = non_blank[0]
            if isinstance(child, str):
                return child
            return child.string
        return None

    def find_next_sibling(self) -> Optional["Tag"]:
        if self.parent is None:
            return None
        siblings = self.parent.children
        idx = None
        for i, node in enumerate(siblings):
            if node is self:
                idx = i
                break
        if idx is None:
            return None
        for node in siblings[idx + 1 :]:
            if isinstance(node, Tag):
                return node
        return None

    # -- find / find_all ---------------------------------------------------
    def _index_pool(self, name, attrs, class_, kwargs) -> Optional[List["Tag"]]:
        """Document-order candidate tags from the root index for a
        find/find_all query, or None when no index key applies (caller
        falls back to the tree walk). The classifier/cascade probes run
        15+ finds per page — index pools turn each from an O(tree) walk
        into an O(matches) scan."""
        root = self.root
        if root is None or root.index is None:
            return None
        index = root.index
        if attrs:
            key, value = next(iter(attrs.items()))
            if key == "id" and isinstance(value, str):
                pool = index["id"].get(value, [])
            elif key == "class" and isinstance(value, str):
                # the class index is TOKEN-keyed, but attrs={"class": v}
                # means exact-attribute-value match (_match_attr_value):
                # only a single clean token can be answered from the
                # token index (as a superset the matcher then filters);
                # multi-token / empty / padded values fall back to the
                # all-classed-tags pool so the matcher decides
                toks = value.split()
                if len(toks) == 1 and toks[0] == value:
                    pool = index["class"].get(value, [])
                else:
                    pool = index["attr"].get("class", [])
            else:
                pool = index["attr"].get(key, [])
        elif isinstance(class_, str):
            pool = index["class"].get(class_, [])
        elif class_ is not None:  # callable / True / regex: any classed tag
            pool = index["attr"].get("class", [])
        elif kwargs:
            pool = index["attr"].get(next(iter(kwargs)).rstrip("_"), [])
        elif isinstance(name, str):
            pool = index["name"].get(name, [])
        elif isinstance(name, (list, tuple, set, frozenset)) and all(
            isinstance(n, str) for n in name
        ):
            merged: List[Tag] = []
            for n in name:
                merged.extend(index["name"].get(n, ()))
            merged.sort(key=lambda t: t.start)
            pool = merged
        else:
            return None
        if self is not root:
            # pools are document-ordered (strictly increasing .start from
            # the one-pass build), so the containment range (lo, hi] is a
            # bisect slice — O(log n + matches), never a full-pool scan
            lo, hi = self.start, self.end
            i = bisect_right(pool, lo, key=_tag_start)
            pool = pool[i : bisect_right(pool, hi, lo=i, key=_tag_start)]
        return pool

    def find_all(
        self,
        name=None,
        attrs: Optional[Dict] = None,
        text=None,
        class_=None,
        limit: Optional[int] = None,
        **kwargs,
    ) -> List:
        results: List = []
        want_text = text is not None and name is None
        if not want_text:
            pool = self._index_pool(name, attrs, class_, kwargs)
            if pool is not None:
                for node in pool:
                    if _match_tag(node, name, attrs, class_, kwargs) and (
                        text is None or _match_text(text, node.string)
                    ):
                        results.append(node)
                        if limit is not None and len(results) >= limit:
                            break
                return results
        for node in self.descendants():
            if want_text:
                if isinstance(node, str) and _match_text(text, node):
                    results.append(node)
            elif isinstance(node, Tag):
                if _match_tag(node, name, attrs, class_, kwargs) and (
                    text is None or _match_text(text, node.string)
                ):
                    results.append(node)
            if limit is not None and len(results) >= limit:
                break
        return results

    def find(self, name=None, attrs=None, text=None, class_=None, **kwargs):
        hits = self.find_all(name, attrs, text, class_, limit=1, **kwargs)
        return hits[0] if hits else None

    # -- CSS select --------------------------------------------------------
    def _candidates(self, compound: "_Compound") -> Optional[List["Tag"]]:
        """Index-narrowed candidate tags (document order, contained in
        self), or None when no index / no narrowing key applies."""
        root = self.root
        if root is None or root.index is None:
            return None
        index = root.index
        if compound.id is not None:
            pool = index["id"].get(compound.id, ())
        elif compound.classes:
            pool = index["class"].get(compound.classes[0], ())
        elif compound.tag is not None:
            pool = index["name"].get(compound.tag, ())
        elif compound.attr_tests:
            pool = index["attr"].get(compound.attr_tests[0][0], ())
        else:
            return None
        if self is root:
            return list(pool)
        # document-ordered pool → containment slice via bisect (see
        # _index_pool); slicing also yields the fresh list select() needs
        lo, hi = self.start, self.end
        i = bisect_right(pool, lo, key=_tag_start)
        out = pool[i : bisect_right(pool, hi, lo=i, key=_tag_start)]
        return out if type(out) is list else list(out)

    def select(self, selector: str) -> List["Tag"]:
        matchers = _compiled_selector(selector)
        if len(matchers) == 1:
            matcher, compound = matchers[0]
            pool = self._candidates(compound)
            if pool is not None:
                if compound.trivial:
                    return pool  # _candidates always returns a fresh list
                return [t for t in pool if matcher(t, self)]
        out: List[Tag] = []
        for tag in self.iter_tags():
            if any(m(tag, self) for m, _ in matchers):
                out.append(tag)
        return out

    def select_one(self, selector: str) -> Optional["Tag"]:
        matchers = _compiled_selector(selector)
        if len(matchers) == 1:
            matcher, compound = matchers[0]
            pool = self._candidates(compound)
            if pool is not None:
                if compound.trivial:
                    return pool[0] if pool else None
                for tag in pool:
                    if matcher(tag, self):
                        return tag
                return None
        for tag in self.iter_tags():
            if any(m(tag, self) for m, _ in matchers):
                return tag
        return None

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        attrs = " ".join(f'{k}="{v}"' for k, v in self.attrs.items())
        return f"<{self.name}{' ' + attrs if attrs else ''}> ({len(self.children)} children)"


# ---------------------------------------------------------------------------
# find/find_all matching
# ---------------------------------------------------------------------------


def _match_text(pattern, value: Optional[str]) -> bool:
    if value is None:
        return False
    if hasattr(pattern, "search"):
        return bool(pattern.search(value))
    if pattern is True:
        return True
    return pattern == value


def _match_attr_value(expected, actual: Optional[str]) -> bool:
    if expected is True:
        return actual is not None
    if actual is None:
        return False
    if hasattr(expected, "search"):
        return bool(expected.search(actual))
    if callable(expected):
        return bool(expected(actual))
    return expected == actual


def _match_tag(tag: Tag, name, attrs, class_, kwargs) -> bool:
    if name is not None:
        if isinstance(name, str):
            if tag.name != name:
                return False
        elif tag.name not in name:
            return False
    if class_ is not None:
        cls = tag.attrs.get("class")
        if callable(class_):
            if not class_(cls):
                return False
        else:
            if cls is None or class_ not in cls.split():
                return False
    if attrs:
        for key, expected in attrs.items():
            if not _match_attr_value(expected, tag.attrs.get(key)):
                return False
    for key, expected in kwargs.items():
        key = key.rstrip("_")
        if not _match_attr_value(expected, tag.attrs.get(key)):
            return False
    return True


# ---------------------------------------------------------------------------
# CSS selector engine
# ---------------------------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"""
    (?P<tag>[a-zA-Z][a-zA-Z0-9_-]*|\*)
  | \.(?P<cls>[\w-]+)
  | \#(?P<id>[\w-]+)
  | \[(?P<attr>[\w:-]+)(?:(?P<op>[\^\$\*]?=)(?P<q>["']?)(?P<val>[^\]"']*)(?P=q))?\]
  | :(?P<pseudo>[\w-]+)(?:\((?P<parg>(?:"[^"]*"|'[^']*'|[^)])*)\))?
    """,
    re.VERBOSE,
)


def _split_group(selector: str) -> List[str]:
    parts, depth, buf = [], 0, []
    for ch in selector:
        if ch == "(" or ch == "[":
            depth += 1
        elif ch == ")" or ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return parts


def _tokenize_complex(selector: str) -> List[tuple]:
    """Split a complex selector into (combinator, compound) pairs.

    combinator is ' ' (descendant) or '>' (child); the first compound
    has combinator None.
    """
    # Normalize child combinator spacing, then split on whitespace.
    selector = re.sub(r"\s*>\s*", " >", selector.strip())
    pieces = selector.split()
    out: List[tuple] = []
    for i, piece in enumerate(pieces):
        comb = None if i == 0 else " "
        if piece.startswith(">"):
            comb = ">"
            piece = piece[1:]
        out.append((comb, piece))
    return out


class _Compound:
    __slots__ = ("tag", "classes", "id", "attr_tests", "pseudos", "trivial")

    def __init__(self, compound: str):
        self.tag: Optional[str] = None
        self.classes: List[str] = []
        self.id: Optional[str] = None
        self.attr_tests: List[tuple] = []
        self.pseudos: List[tuple] = []
        pos = 0
        while pos < len(compound):
            m = _SIMPLE_RE.match(compound, pos)
            if not m:
                raise ValueError(f"unsupported selector: {compound!r} at {pos}")
            pos = m.end()
            if m.group("tag"):
                if m.group("tag") != "*":
                    self.tag = m.group("tag").lower()
            elif m.group("cls"):
                self.classes.append(m.group("cls"))
            elif m.group("id"):
                self.id = m.group("id")
            elif m.group("attr"):
                self.attr_tests.append(
                    (m.group("attr"), m.group("op"), m.group("val"))
                )
            elif m.group("pseudo"):
                arg = m.group("parg")
                if arg is not None:
                    arg = arg.strip()
                    if len(arg) >= 2 and arg[0] in "\"'" and arg[-1] == arg[0]:
                        arg = arg[1:-1]
                self.pseudos.append((m.group("pseudo"), arg))
        # trivial ⇔ the compound's ONLY test is the index key that
        # _candidates narrows by — every pool member matches by
        # construction, so select can skip the matcher entirely (most
        # cascade selectors are bare '.class' or 'tag')
        if self.pseudos:
            self.trivial = False
        elif self.id is not None:
            self.trivial = (
                self.tag is None and not self.classes and not self.attr_tests
            )
        elif self.classes:
            self.trivial = (
                self.tag is None
                and len(self.classes) == 1
                and not self.attr_tests
            )
        elif self.attr_tests:
            self.trivial = (
                self.tag is None
                and len(self.attr_tests) == 1
                and self.attr_tests[0][1] in (None, "")
            )
        else:
            self.trivial = self.tag is not None

    def matches(self, tag: Tag) -> bool:
        if self.tag is not None and tag.name != self.tag:
            return False
        if self.classes:
            cls = tag.attrs.get("class")
            if cls is None:
                return False
            have = _class_tokens(cls)
            if any(c not in have for c in self.classes):
                return False
        if self.id is not None and tag.attrs.get("id") != self.id:
            return False
        for attr, op, val in self.attr_tests:
            actual = tag.attrs.get(attr)
            if actual is None:
                return False
            if op is None or op == "":
                continue
            if op == "=" and actual != val:
                return False
            if op == "^=" and not actual.startswith(val):
                return False
            if op == "$=" and not actual.endswith(val):
                return False
            if op == "*=" and val not in actual:
                return False
        for name, arg in self.pseudos:
            if name == "contains":
                if arg is None or arg not in tag.get_text():
                    return False
            elif name == "first-of-type":
                parent = tag.parent
                if parent is None:
                    return False
                for sib in parent.children:
                    if isinstance(sib, Tag) and sib.name == tag.name:
                        if sib is not tag:
                            return False
                        break
            else:
                raise ValueError(f"unsupported pseudo-class :{name}")
        return True


from functools import lru_cache


@lru_cache(maxsize=1024)
def _compiled_selector(selector: str) -> tuple:
    """Selector-string → ((matcher, rightmost_compound), ...), cached:
    the extraction cascades evaluate the same ~100 selector strings on
    every page, so compiling per call would dominate the parse cost.
    The rightmost compound is exposed for index-based candidate
    narrowing in Tag.select/_candidates."""
    return tuple(_compile_complex(s) for s in _split_group(selector))


def _compile_complex(selector: str) -> tuple:
    parts = _tokenize_complex(selector)
    compounds = [(comb, _Compound(c)) for comb, c in parts]
    if len(compounds) > 1:
        # the rightmost compound alone being trivial is not enough —
        # the matcher must still verify the ancestor combinators
        compounds[-1][1].trivial = False

    def match_at(idx: int, tag: Tag, scope: Tag) -> bool:
        comb, compound = compounds[idx]
        if not compound.matches(tag):
            return False
        if idx == 0:
            return True
        # `comb` describes how THIS compound attaches to the previous one.
        if comb == ">":
            parent = tag.parent
            if parent is None or parent is scope:
                return False
            return match_at(idx - 1, parent, scope)
        # descendant: any proper ancestor strictly inside the scope
        anc = tag.parent
        while anc is not None and anc is not scope:
            if match_at(idx - 1, anc, scope):
                return True
            anc = anc.parent
        return False

    def matcher(tag: Tag, scope: Tag) -> bool:
        return match_at(len(compounds) - 1, tag, scope)

    return matcher, compounds[-1][1]


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Tag("[document]")
        self.stack: List[Tag] = [self.root]

    def handle_starttag(self, tag: str, attrs):
        if tag in _IMPLICIT_CLOSE_SAME and self.stack[-1].name == tag:
            self.stack.pop()
        node = Tag(tag, {k: (v if v is not None else "") for k, v in attrs})
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs):
        node = Tag(tag, {k: (v if v is not None else "") for k, v in attrs})
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag: str):
        if tag in VOID_ELEMENTS:
            return
        # Pop to the nearest matching open tag (tolerate misnesting).
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str):
        if data:
            self.stack[-1].children.append(data)


def _build_index(root: Tag) -> None:
    """One DFS pass: document-order intervals + name/class/id indexes."""
    by_name: Dict[str, List[Tag]] = {}
    by_class: Dict[str, List[Tag]] = {}
    by_id: Dict[str, List[Tag]] = {}
    by_attr: Dict[str, List[Tag]] = {}
    counter = 0
    root.start = 0
    root.root = root
    stack = [(root, iter(root.children))]
    while stack:
        parent, it = stack[-1]
        child = next(it, None)
        if child is None:
            parent.end = counter
            stack.pop()
            continue
        if child.__class__ is not Tag:
            continue
        counter += 1
        child.start = counter
        child.root = root
        by_name.setdefault(child.name, []).append(child)
        attrs = child.attrs
        cls = attrs.get("class")
        if cls:
            for token in cls.split():
                by_class.setdefault(token, []).append(child)
        tag_id = attrs.get("id")
        if tag_id:
            by_id.setdefault(tag_id, []).append(child)
        for attr_name in attrs:
            by_attr.setdefault(attr_name, []).append(child)
        stack.append((child, iter(child.children)))
    root.end = counter
    root.index = {"name": by_name, "class": by_class, "id": by_id, "attr": by_attr}


# ---------------------------------------------------------------------------
# Fast tokenizer: a regex scanner replacing html.parser.HTMLParser in
# the hot path. Produces the same trees as _TreeBuilder (verified by a
# differential test over fixtures + adversarial HTML): charrefs
# unescaped in text and attribute values, script/style as raw text,
# comments/doctype/PIs dropped, void elements, misnesting tolerance,
# implicit close of li/p/... . ~3x faster and far fewer intermediate
# allocations than HTMLParser's callback machinery — this matters
# because allocation pressure is what caps multi-core scaling of the
# parse stage (BENCH/BASELINE.md control experiments).
# ---------------------------------------------------------------------------

from html import unescape as _unescape

_START_TAG_RE = re.compile(
    r"<([a-zA-Z][^\s/>\x00]*)"
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)"
    r"(/?)>"
)
_END_TAG_RE = re.compile(r"</\s*([a-zA-Z][^\s/>]*)[^>]*>")
_ATTR_RE = re.compile(
    r"([^\s/>=]+)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?"
)
_RAWTEXT_CLOSE = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}


def _parse_attrs_uncached(blob: str) -> Dict[str, str]:
    attrs: Dict[str, str] = {}
    for m in _ATTR_RE.finditer(blob):
        name = m.group(1).lower()
        value = m.group(2)
        if value is None:
            value = ""
        elif value[:1] in ('"', "'") and value[-1:] == value[:1]:
            value = value[1:-1]
        if "&" in value:
            value = _unescape(value)
        attrs[name] = value
    return attrs


@lru_cache(maxsize=8192)
def _parse_attrs(blob: str) -> Mapping[str, str]:
    """Attr blobs repeat heavily across real pages (class= boilerplate),
    so identical blobs share ONE parsed mapping. The shared object is a
    read-only MappingProxyType: the cache spans documents process-wide,
    so an accidental ``tag.attrs[...] = ...`` must raise instead of
    silently corrupting every tag (and future parse) sharing the blob."""
    return MappingProxyType(_parse_attrs_uncached(blob))


@lru_cache(maxsize=4096)
def _class_tokens(cls: str) -> tuple:
    return tuple(cls.split())


def _fast_build(html: str) -> Tag:
    """Tokenize + build the tree + build the root index in ONE pass
    (document-order intervals assigned at push/pop time — identical to
    the separate :func:`_build_index` DFS, verified by the differential
    test including start/end)."""
    root = Tag("[document]")
    root.root = root
    root.start = 0
    by_name: Dict[str, List[Tag]] = {}
    by_class: Dict[str, List[Tag]] = {}
    by_id: Dict[str, List[Tag]] = {}
    by_attr: Dict[str, List[Tag]] = {}
    counter = 0
    text_len = 0
    stack = [root]
    pos, n = 0, len(html)
    find = html.find
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            text = html[pos:]
            if text:
                text = _unescape(text) if "&" in text else text
                text_len += len(text)
                stack[-1].children.append(text)
            break
        if lt > pos:
            text = html[pos:lt]
            text = _unescape(text) if "&" in text else text
            text_len += len(text)
            stack[-1].children.append(text)
        nxt = html[lt + 1 : lt + 2]
        if nxt == "/":
            m = _END_TAG_RE.match(html, lt)
            if m is None:
                gt = find(">", lt)
                pos = gt + 1 if gt >= 0 else n
                continue
            pos = m.end()
            name = m.group(1).lower()
            if name in VOID_ELEMENTS:
                continue
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].name == name:
                    for popped in stack[i:]:
                        popped.end = counter
                    del stack[i:]
                    break
        elif nxt == "!" or nxt == "?":
            if html.startswith("<!--", lt):
                end = find("-->", lt + 4)
                pos = end + 3 if end >= 0 else n
            else:
                gt = find(">", lt)
                pos = gt + 1 if gt >= 0 else n
        else:
            m = _START_TAG_RE.match(html, lt)
            if m is None:
                # bare '<' (or truncated tag): literal text, as
                # html.parser's tolerant mode effectively yields —
                # counted in text_len like any other text child (the
                # field's invariant is == len(root.get_text()))
                stack[-1].children.append("<")
                text_len += 1
                pos = lt + 1
                continue
            pos = m.end()
            name = m.group(1).lower()
            blob = m.group(2)
            attrs = _parse_attrs(blob) if blob and not blob.isspace() else {}
            top = stack[-1]
            if name in _IMPLICIT_CLOSE_SAME and top.name == name:
                top.end = counter
                stack.pop()
                top = stack[-1]
            node = Tag(name, attrs)
            node.parent = top
            top.children.append(node)
            counter += 1
            node.start = counter
            node.root = root
            by_name.setdefault(name, []).append(node)
            if attrs:
                cls = attrs.get("class")
                if cls:
                    for token in _class_tokens(cls):
                        by_class.setdefault(token, []).append(node)
                tag_id = attrs.get("id")
                if tag_id:
                    by_id.setdefault(tag_id, []).append(node)
                for attr_name in attrs:
                    by_attr.setdefault(attr_name, []).append(node)
            if m.group(3) == "/" or name in VOID_ELEMENTS:
                node.end = counter
                continue
            raw_close = _RAWTEXT_CLOSE.get(name)
            if raw_close is not None:
                mm = raw_close.search(html, pos)
                if mm is None:
                    # unterminated script/style: html.parser buffers to
                    # EOF and drops the content — match that
                    node.end = counter
                    pos = n
                    continue
                end = mm.start()
                if end > pos:
                    node.children.append(html[pos:end])  # raw: no unescape
                    text_len += end - pos
                node.end = counter
                pos = end
                continue
            stack.append(node)
    for leftover in stack:
        leftover.end = counter
    root.index = {"name": by_name, "class": by_class, "id": by_id, "attr": by_attr}
    root.text_len = text_len  # == len(root.get_text()), O(1) for callers
    return root


def parse(html: Union[str, bytes]) -> Tag:
    """Parse HTML into a DOM; accepts str or UTF-8 bytes (the ``html``
    binary column from the pages table decodes here). The returned tree
    is indexed for fast selects (index built in the same pass) and
    treated as immutable."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    return _fast_build(html)


def parse_reference(html: Union[str, bytes]) -> Tag:
    """The html.parser-backed builder, kept as the differential oracle
    for the fast tokenizer (tests/test_minisoup.py)."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    _build_index(builder.root)
    return builder.root
