"""Recursive-descent parser for the Lopez Crawl Directives DSL.

Grammar mirrors the reference's nom parsers:
``/root/reference/lib-lopez/src/directives/parse.rs`` (items, rule sets,
boundaries, literals, css-selector scanning), ``parse_common.rs``
(comments ``// …``, whitespace, escaped strings) and
``expressions/parse.rs`` (extractor/transformer/aggregator expressions).

Notable reference quirks preserved:
- identifiers are any run of chars not in ``\\/:;.()[]{}'" \\n\\t\\r\\0``
  (parse.rs:28-30);
- escaped strings unescape ``\\"`` but keep the backslash for every other
  escape (parse_common.rs:83-112) — regex literals pass through intact;
- css selectors are scanned to the next boundary char at bracket level 0
  (parse.rs:93-117);
- integer literals are ``digit1`` not followed by '.'; otherwise f64
  (parse.rs:531-553).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Optional, Union

from ..html.cssselect import Selector, compile_selector
from .exprs import (
    Aggregator,
    AggregatorExpression,
    ExplodingExtractorExpression,
    Extractor,
    ExtractorExpression,
    Transformer,
    TransformerExpression,
)

_IDENT_STOP = set("\\/:;.()[]{}'\" \n\t\r\0")


class ParseError(Exception):
    def __init__(self, msg: str, src: str = "", pos: int = 0):
        line = src[:pos].count("\n") + 1
        col = pos - src.rfind("\n", 0, pos)
        super().__init__(f"{msg} at line {line}, col {col}")
        self.pos = pos


# ----- item AST -----


@dataclass(frozen=True)
class Seed:
    url: str


@dataclass(frozen=True)
class BoundaryItem:
    kind: str  # allow | disallow | frontier | use-param | ignore-param | use-all-params
    value: Optional[str] = None


@dataclass(frozen=True)
class Import:
    path: str


@dataclass(frozen=True)
class SetVariable:
    name: str
    value: Any


@dataclass(frozen=True)
class WebDriverItem:
    pattern: str


@dataclass(frozen=True)
class RuleSet:
    in_page: Optional[re.Pattern]
    selector: Selector
    aggregators: tuple[tuple[str, AggregatorExpression], ...]


Item = Union[Seed, BoundaryItem, Import, SetVariable, WebDriverItem, RuleSet]


class _Cursor:
    __slots__ = ("src", "pos")

    def __init__(self, src: str):
        self.src = src
        self.pos = 0

    def error(self, msg: str) -> ParseError:
        return ParseError(msg, self.src, self.pos)

    def eof(self) -> bool:
        return self.pos >= len(self.src)

    def ws(self) -> None:
        """Whitespace = runs of Unicode whitespace and // line comments."""
        src, n = self.src, len(self.src)
        while self.pos < n:
            c = src[self.pos]
            if c.isspace():
                self.pos += 1
            elif src.startswith("//", self.pos):
                nl = src.find("\n", self.pos)
                self.pos = n if nl == -1 else nl + 1
            else:
                return

    def try_tag(self, tag: str, ws_after: bool = True) -> bool:
        if self.src.startswith(tag, self.pos):
            self.pos += len(tag)
            if ws_after:
                self.ws()
            return True
        return False

    def expect(self, tag: str, ws_after: bool = True) -> None:
        if not self.try_tag(tag, ws_after):
            raise self.error(f"expected {tag!r}")

    def identifier(self) -> str:
        start = self.pos
        src, n = self.src, len(self.src)
        while self.pos < n and src[self.pos] not in _IDENT_STOP:
            self.pos += 1
        if self.pos == start:
            raise self.error("expected identifier")
        return src[start : self.pos]

    def escaped_string(self) -> str:
        if not self.src.startswith('"', self.pos):
            raise self.error("expected string literal")
        i = self.pos + 1
        out: list[str] = []
        src, n = self.src, len(self.src)
        while i < n:
            c = src[i]
            if c == "\\" and i + 1 < n:
                nxt = src[i + 1]
                if nxt == '"':
                    out.append('"')
                else:
                    out.append("\\")
                    out.append(nxt)
                i += 2
            elif c == '"':
                self.pos = i + 1
                return "".join(out)
            else:
                out.append(c)
                i += 1
        raise self.error("unterminated string literal")

    def number(self) -> float:
        m = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?").match(self.src, self.pos)
        if not m:
            raise self.error("expected number")
        self.pos = m.end()
        return float(m.group(0))

    def css_selector(self, boundary: str) -> Selector:
        """Scan to a char in `boundary` at bracket-level 0 (parse.rs:93-117).

        `boundary` may hold several terminator chars (we accept ';' as well
        as '{' for the empty `select <sel>;` form).
        """
        level = 0
        i = self.pos
        src, n = self.src, len(self.src)
        while i < n and (level != 0 or src[i] not in boundary):
            if src[i] == "[":
                level += 1
            elif src[i] == "]":
                level -= 1
            i += 1
        if i == self.pos:
            raise self.error("expected css selector")
        raw = src[self.pos : i]
        self.pos = i
        try:
            return compile_selector(raw)
        except Exception as e:
            raise self.error(f"bad css selector {raw!r}: {e}")


# ----- expressions -----

# Word-boundary-aware keyword matching: the reference uses nom `tag` (pure
# prefix match); ordering alternatives longest-first reproduces its behavior.

_SIMPLE_TRANSFORMERS = [
    ("is-not-null", "is-not-null"),
    ("is-null", "is-null"),
    ("is-empty", "is-empty"),
    ("hash", "hash"),
    ("not", "not"),
    ("as-number", "as-number"),
    ("as-string", "as-string"),
    ("length", "length"),
    ("flatten", "flatten"),
    ("sort-by", None),  # handled specially (nested)
    ("sort", "sort"),
    ("pretty", "pretty"),
]


def _parse_transformer(c: _Cursor) -> Optional[Transformer]:
    start = c.pos
    # Nested chains:
    for kw in ("each", "filter", "any", "all", "sort-by"):
        if c.try_tag(kw):
            if c.try_tag("("):
                inner = _parse_transformer_expression(c)
                c.expect(")", ws_after=False)
                return Transformer(kw, (), inner)
            c.pos = start
            if kw == "sort-by":
                continue
            # `any`/`all`/`each`/`filter` without parens are not transformers
            # (could be an identifier elsewhere); fall through.
            continue
    for kw, kind in _SIMPLE_TRANSFORMERS:
        if kind is None:
            continue
        if c.src.startswith(kw, c.pos):
            c.pos += len(kw)
            return Transformer(kind)
    if c.try_tag("greater-or-equal"):
        return Transformer("greater-or-equal", (c.number(),))
    if c.try_tag("greater-than"):
        return Transformer("greater-than", (c.number(),))
    if c.try_tag("lesser-or-equal"):
        return Transformer("lesser-or-equal", (c.number(),))
    if c.try_tag("lesser-than"):
        return Transformer("lesser-than", (c.number(),))
    if c.try_tag("between"):
        low = c.number()
        c.ws()
        c.expect("and")
        return Transformer("between", (low, c.number()))
    if c.try_tag("equals"):
        if c.src.startswith('"', c.pos):
            return Transformer("equals-str", (c.escaped_string(),))
        return Transformer("equals-num", (c.number(),))
    if c.try_tag("in"):
        if not c.try_tag("["):
            c.pos = start
            return None
        items: list[Any] = []
        if not c.try_tag("]", ws_after=False):
            while True:
                c.ws()
                if c.src.startswith('"', c.pos):
                    items.append(c.escaped_string())
                else:
                    items.append(c.number())
                c.ws()
                if c.try_tag(",", ws_after=False):
                    continue
                c.expect("]", ws_after=False)
                break
        if items and isinstance(items[0], str):
            return Transformer("in-strs", (tuple(items),))
        return Transformer("in-nums", (tuple(items),))
    if c.try_tag("get"):
        if c.src.startswith('"', c.pos):
            return Transformer("get-key", (c.escaped_string(),))
        m = re.compile(r"\d+").match(c.src, c.pos)
        if m:
            c.pos = m.end()
            return Transformer("get-idx", (int(m.group(0)),))
        c.pos = start
        return None
    if c.try_tag("capture"):
        return Transformer("capture", (_regex(c),))
    if c.try_tag("all-captures"):
        return Transformer("all-captures", (_regex(c),))
    if c.try_tag("matches"):
        return Transformer("matches", (_regex(c),))
    if c.try_tag("replace"):
        rx = _regex(c)
        c.ws()
        c.expect("with")
        from .exprs import _rust_replacer_to_py

        return Transformer("replace", (rx, _rust_replacer_to_py(c.escaped_string())))
    c.pos = start
    return None


def _regex(c: _Cursor) -> re.Pattern:
    raw = c.escaped_string()
    try:
        return re.compile(raw)
    except re.error as e:
        raise c.error(f"bad regex {raw!r}: {e}")


def _parse_transformer_expression(c: _Cursor) -> TransformerExpression:
    out: list[Transformer] = []
    while True:
        c.ws()
        t = _parse_transformer(c)
        if t is None:
            break
        out.append(t)
    return TransformerExpression(tuple(out))


def _parse_extractor(c: _Cursor) -> Extractor:
    # "attrs" must be tried before "attr" (longest-first ordering).
    for kw in ("inner-html", "name", "text", "html", "attrs", "classes", "id"):
        if c.src.startswith(kw, c.pos):
            c.pos += len(kw)
            return Extractor(kw)
    if c.try_tag("attr"):
        return Extractor("attr", (c.escaped_string(),))
    for kw in ("parent", "children"):
        if c.try_tag(kw):
            c.expect("(")
            inner = _parse_extractor_expression(c)
            c.expect(")", ws_after=False)
            return Extractor(kw, (inner,))
    for kw in ("select-any", "select-all"):
        if c.try_tag(kw):
            c.expect("(")
            inner = _parse_extractor_expression(c)
            c.expect(",")
            sel = c.css_selector(")")
            c.expect(")", ws_after=False)
            return Extractor(kw, (inner, sel))
    raise c.error("expected extractor")


def _parse_extractor_expression(c: _Cursor) -> ExtractorExpression:
    ex = _parse_extractor(c)
    c.ws()
    te = _parse_transformer_expression(c)
    return ExtractorExpression(ex, te)


def _parse_exploding(c: _Cursor) -> ExplodingExtractorExpression:
    expr = _parse_extractor_expression(c)
    c.ws()
    explodes = c.try_tag("!explode", ws_after=False)
    return ExplodingExtractorExpression(expr, explodes)


def _parse_aggregator(c: _Cursor) -> Aggregator:
    if c.try_tag("count"):
        if c.try_tag("("):
            inner = _parse_exploding(c)
            c.ws()
            c.expect(")", ws_after=False)
            return Aggregator("count-not-null", inner)
        return Aggregator("count")
    for kw in ("first", "collect", "distinct", "sum"):
        if c.try_tag(kw):
            c.expect("(")
            inner = _parse_exploding(c)
            c.ws()
            c.expect(")", ws_after=False)
            return Aggregator(kw, inner)
    if c.try_tag("group"):
        c.expect("(")
        key = _parse_exploding(c)
        c.ws()
        c.expect(",")
        sub = _parse_aggregator_expression(c)
        c.expect(")", ws_after=False)
        return Aggregator("group", key, sub)
    raise c.error("expected aggregator")


def _parse_aggregator_expression(c: _Cursor) -> AggregatorExpression:
    agg = _parse_aggregator(c)
    c.ws()
    te = _parse_transformer_expression(c)
    return AggregatorExpression(agg, te)


# ----- literals -----


def _parse_literal(c: _Cursor) -> Any:
    if c.src.startswith('"', c.pos):
        return c.escaped_string()
    if c.try_tag("true", ws_after=False):
        return True
    if c.try_tag("false", ws_after=False):
        return False
    if c.try_tag("[", ws_after=True):
        items = []
        if not c.try_tag("]", ws_after=False):
            while True:
                items.append(_parse_literal(c))
                c.ws()
                if c.try_tag(",", ws_after=True):
                    continue
                c.expect("]", ws_after=False)
                break
        return items
    # integer (digits not followed by '.') else double (parse.rs:531-553)
    m = re.compile(r"-?\d+(?![\d.])").match(c.src, c.pos)
    if m:
        c.pos = m.end()
        return int(m.group(0))
    return c.number()


# ----- items -----


def _parse_rule_set(c: _Cursor) -> RuleSet:
    # "select" consumed by caller.
    in_page = None
    save = c.pos
    if c.try_tag("in"):
        # Backtrack if this was a selector starting with "in" (e.g. `input`),
        # mirroring nom's opt(in_directive) backtracking.
        if c.src.startswith('"', c.pos):
            in_page = _regex(c)
            c.ws()
        else:
            c.pos = save
    sel = c.css_selector("{;")
    c.ws()
    if c.try_tag(";", ws_after=False):
        return RuleSet(in_page, sel, ())
    c.expect("{")
    aggs: list[tuple[str, AggregatorExpression]] = []
    names: set[str] = set()
    while not c.try_tag("}", ws_after=False):
        name = c.identifier()
        if name in names:
            raise c.error(f"rule `{name}` defined more than once")
        names.add(name)
        c.ws()
        c.expect(":")
        agg = _parse_aggregator_expression(c)
        c.ws()
        c.expect(";")
        aggs.append((name, agg))
    return RuleSet(in_page, sel, tuple(aggs))


def _string_directive(c: _Cursor) -> str:
    s = c.escaped_string()
    c.ws()
    c.expect(";", ws_after=False)
    return s


def _boundary_regex(c: _Cursor) -> str:
    """allow/disallow/frontier patterns compile at load time like the
    reference (parse.rs:469-490); the raw source string is kept in the AST."""
    start = c.pos
    s = _string_directive(c)
    try:
        re.compile(s)
    except re.error as e:
        raise ParseError(f"bad boundary regex {s!r}: {e}", c.src, start)
    return s


def parse_items(src: str) -> list[Item]:
    """Parse one module's items (entrypoint, parse.rs:673-680)."""
    c = _Cursor(src)
    c.ws()
    items: list[Item] = []
    while not c.eof():
        if c.try_tag("select"):
            items.append(_parse_rule_set(c))
        elif c.try_tag("import"):
            items.append(Import(_string_directive(c)))
        elif c.try_tag("seed"):
            items.append(Seed(_string_directive(c)))
        elif c.try_tag("allow"):
            items.append(BoundaryItem("allow", _boundary_regex(c)))
        elif c.try_tag("disallow"):
            items.append(BoundaryItem("disallow", _boundary_regex(c)))
        elif c.try_tag("frontier"):
            items.append(BoundaryItem("frontier", _boundary_regex(c)))
        elif c.try_tag("use"):
            if c.try_tag("webdriver"):
                c.expect("on")
                items.append(WebDriverItem(_string_directive(c)))
            else:
                c.expect("param")
                if c.try_tag("*"):
                    c.expect(";", ws_after=False)
                    items.append(BoundaryItem("use-all-params"))
                else:
                    items.append(BoundaryItem("use-param", _string_directive(c)))
        elif c.try_tag("ignore"):
            c.expect("param")
            items.append(BoundaryItem("ignore-param", _string_directive(c)))
        elif c.try_tag("set"):
            name = c.identifier()
            c.ws()
            c.expect("=")
            value = _parse_literal(c)
            c.ws()
            c.expect(";", ws_after=False)
            items.append(SetVariable(name, value))
        else:
            raise c.error("expected item")
        c.ws()
    return items
