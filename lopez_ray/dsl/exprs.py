"""Expression engine: extractors → transformers → aggregators.

Semantics mirror the reference's expression module
(``/root/reference/lib-lopez/src/directives/expressions/``):

- ``transformer.rs:318-460`` — transformer eval, including:
  * null propagates through every transformer (catch-all at :457);
  * ``length`` on a string counts *bytes* (Rust ``String::len``, :350);
  * ``equals <num>`` is an ±f64-epsilon comparison (:342-344);
  * the reference's ``greater-or-equal`` evaluates as strict ``>``
    (reference bug at :333-335) — replicated here for bit-parity and
    marked with REFERENCE_BUG below;
  * ``sort`` uses the cross-type ``cmp_json`` order
    (null < bool < number < string < array; :93-116).
- ``aggregator.rs:152-271`` — per-page fold state.
- ``extractor.rs:55-118`` (expressions/extractor.rs) — the ``!explode``
  modifier feeding array elements individually into the aggregator.

Values are JSON-ish Python: None | bool | int/float | str | list | dict.
Type checking happens at load time (``type_for`` / ``type_of``); eval may
raise only on type-checker-violating programs, mirroring the reference's
``panic!("type checked: …")``.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from ..hash import rust_str_hash
from .types import ANY, BOOL, NUMBER, STRING, ArrayT, MapT, Type, TypeError_

F64_EPSILON = 2.220446049250313e-16

# Replicate the reference's `greater-or-equal` evaluating as strict `>`
# (transformer.rs:333-335). Set False to get the mathematically correct
# behavior instead of bit-parity.
REFERENCE_BUG_GREATER_OR_EQUAL = True


class EvalPanic(Exception):
    """Mirror of the reference's `panic!("type checked: ...")`."""


def force_f64(v: Any) -> float:
    """value_ext.rs:8-13 — lossy numeric coercion."""
    return float(v)


def cmp_json_key(v: Any):
    """Total-order sort key equivalent to cmp_json (transformer.rs:93-116).

    null < bool < number < string < array (element-wise). Mixed types and
    objects panic in the reference; type checking prevents them, so a
    homogeneous array is assumed — the rank term keeps null-vs-T stable.
    """
    if v is None:
        return (0,)
    if isinstance(v, bool):
        return (1, v)
    if isinstance(v, (int, float)):
        return (2, force_f64(v))
    if isinstance(v, str):
        return (3, v)
    if isinstance(v, list):
        return (4, tuple(cmp_json_key(x) for x in v))
    raise EvalPanic(f"comparing objects is not defined (yet): {v!r}")


def hashable_json(v: Any):
    """Hashable key for `distinct` (value_ext.rs HashableJson).

    Like the reference, numbers hash by their f64 bits, so 1 and 1.0
    collapse; bool is tagged separately from number.
    """
    if v is None:
        return (0,)
    if isinstance(v, bool):
        return (1, v)
    if isinstance(v, (int, float)):
        return (2, float(v))
    if isinstance(v, str):
        return (3, v)
    if isinstance(v, list):
        return (4, tuple(hashable_json(x) for x in v))
    if isinstance(v, dict):
        return (5, tuple((k, hashable_json(x)) for k, x in v.items()))
    raise EvalPanic(f"unhashable: {v!r}")


def pretty(text: str) -> str:
    """Whitespace normalizer (transformer.rs:29-65, tests :67-80).

    Paragraphs split on '\\n'; words on Unicode whitespace; words joined by
    single spaces; a pending '\\n' separator is consumed by the *next*
    paragraph iteration (wordful or not); trailing '\\n' appended if
    non-empty.
    """
    out: list[str] = []
    p_sep: Optional[str] = None
    for paragraph in text.split("\n"):
        if p_sep is not None:
            out.append(p_sep)
        words = paragraph.split()
        if words:
            out.append(" ".join(words))
            p_sep = "\n"
        else:
            p_sep = None
    result = "".join(out)
    if result and not result.endswith("\n"):
        result += "\n"
    return result


def rust_f64_display(v: float) -> str:
    """Rust `f64::Display` (used by `as-string`): shortest round-trip
    decimal, never exponent notation; integral floats drop the '.0'."""
    if isinstance(v, bool):  # defensive; bools handled separately
        raise EvalPanic("not a number")
    if isinstance(v, int):
        return str(v)
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "inf" if v > 0 else "-inf"
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    r = repr(v)
    if "e" in r or "E" in r:
        # Expand exponent notation to full decimal like Rust Display.
        from decimal import Decimal

        return format(Decimal(r), "f")
    return r


_FLOAT_RE = re.compile(
    r"^[+-]?(?:inf(?:inity)?|nan|(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)$", re.IGNORECASE
)


def rust_parse_f64(s: str) -> Optional[float]:
    """Rust `str::parse::<f64>()`: no whitespace trimming, no underscores."""
    if not _FLOAT_RE.match(s):
        return None
    try:
        return float(s)
    except ValueError:  # pragma: no cover
        return None


def _rust_replacer_to_py(replacer: str) -> str:
    """Translate Rust-regex `$1`/`$name`/`$$` replacement syntax to re.sub's."""

    def sub(m: re.Match) -> str:
        tok = m.group(0)
        if tok == "$$":
            return "$"
        name = tok[2:-1] if tok.startswith("${") else tok[1:]
        return f"\\g<{name}>"

    out = re.sub(r"\$\$|\$\{[A-Za-z0-9_]+\}|\$[A-Za-z0-9_]+", sub, replacer)
    return out.replace("\\", "\\\\").replace("\\\\g<", "\\g<")


def capture_json(rx: re.Pattern, m: re.Match) -> dict:
    """transformer.rs:10-26 — {group-name-or-index: text} for matched groups.

    Group 0 (whole match) is keyed "0"; named groups use their name,
    unnamed ones their index as a string; unmatched groups are skipped.
    """
    index_to_name = {idx: name for name, idx in rx.groupindex.items()}
    out: dict[str, Any] = {}
    for i in range(rx.groups + 1):
        g = m.group(i)
        if g is None:
            continue
        out[index_to_name.get(i, str(i))] = g
    return out


# ---------------------------------------------------------------------------
# Transformers
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Transformer:
    """One chainable scalar/collection function (transformer.rs:118-160).

    ``kind`` is the DSL spelling (e.g. "is-null", "greater-than"); ``args``
    holds literal parameters; ``inner`` a nested TransformerExpression for
    each/filter/any/all/sort-by.
    """

    kind: str
    args: tuple = ()
    inner: Optional["TransformerExpression"] = None

    def __str__(self) -> str:
        k = self.kind
        if k in ("each", "filter", "any", "all", "sort-by"):
            return f"{k}({self.inner})"
        if k == "between":
            return f"between {self.args[0]} and {self.args[1]}"
        if k == "replace":
            return f'replace "{self.args[0]}" with "{self.args[1]}"'
        if self.args:
            a = self.args[0]
            if isinstance(a, str):
                return f'{k} "{a}"'
            if isinstance(a, (list, tuple)):
                return f"{k} [{', '.join(map(str, a))}]"
            return f"{k} {a}"
        return k

    # -- typing (transformer.rs:220-310) --

    def type_for(self, input_t: Type) -> Type:
        k = self.kind

        def err():
            raise TypeError_(f"`{self}` cannot take input of type {input_t}")

        if k in ("is-null", "is-not-null"):
            return BOOL
        if k == "hash":
            return NUMBER if input_t == STRING else err()
        if k == "not":
            return BOOL if input_t == BOOL else err()
        if k == "as-number":
            return NUMBER if input_t == STRING else err()
        if k in ("greater-than", "lesser-than", "greater-or-equal", "lesser-or-equal", "between", "equals-num", "in-nums"):
            return BOOL if input_t == NUMBER else err()
        if k == "length":
            return NUMBER if input_t == STRING or isinstance(input_t, (ArrayT, MapT)) else err()
        if k == "is-empty":
            return BOOL if input_t == STRING or isinstance(input_t, (ArrayT, MapT)) else err()
        if k == "get-key":
            return input_t.inner if isinstance(input_t, MapT) else err()
        if k == "get-idx":
            return input_t.inner if isinstance(input_t, ArrayT) else err()
        if k == "flatten":
            if isinstance(input_t, ArrayT) and isinstance(input_t.inner, ArrayT):
                return input_t.inner
            err()
        if k == "each":
            if isinstance(input_t, ArrayT):
                return ArrayT(self.inner.type_for(input_t.inner))
            if isinstance(input_t, MapT):
                return MapT(self.inner.type_for(input_t.inner))
            err()
        if k == "filter":
            if isinstance(input_t, (ArrayT, MapT)):
                it = self.inner.type_for(input_t.inner)
                if it == BOOL:
                    return input_t
                raise TypeError_(f"filter predicate must be bool, got {it}")
            err()
        if k in ("any", "all"):
            if isinstance(input_t, ArrayT):
                it = self.inner.type_for(input_t.inner)
                if it == BOOL:
                    return BOOL
                raise TypeError_(f"{k} predicate must be bool, got {it}")
            err()
        if k == "sort":
            if isinstance(input_t, ArrayT) and not input_t.inner.is_map():
                return input_t
            err()
        if k == "sort-by":
            if isinstance(input_t, ArrayT):
                kt = self.inner.type_for(input_t.inner)
                if not kt.is_map():
                    return input_t
                raise TypeError_(f"sort-by key cannot be a map")
            err()
        if k == "as-string":
            return STRING if input_t in (NUMBER, BOOL, STRING) else err()
        if k == "pretty":
            return STRING if input_t == STRING else err()
        if k in ("equals-str", "in-strs", "matches"):
            return BOOL if input_t == STRING else err()
        if k == "capture":
            return MapT(STRING) if input_t == STRING else err()
        if k == "all-captures":
            return ArrayT(MapT(STRING)) if input_t == STRING else err()
        if k == "replace":
            return STRING if input_t == STRING else err()
        raise TypeError_(f"unknown transformer {k}")

    # -- eval (transformer.rs:318-460) --

    def eval(self, v: Any) -> Any:
        k = self.kind
        if k == "is-null":
            return v is None
        if k == "is-not-null":
            return v is not None
        if v is None:
            return None  # null propagation (:457)
        if k == "not":
            return not v
        if k == "hash":
            return rust_str_hash(v)
        if k == "as-number":
            return rust_parse_f64(v)
        if k == "greater-than":
            return force_f64(v) > self.args[0]
        if k == "lesser-than":
            return force_f64(v) < self.args[0]
        if k == "greater-or-equal":
            # REFERENCE_BUG: evals as `>` in the reference (:333-335).
            if REFERENCE_BUG_GREATER_OR_EQUAL:
                return force_f64(v) > self.args[0]
            return force_f64(v) >= self.args[0]
        if k == "lesser-or-equal":
            return force_f64(v) <= self.args[0]
        if k == "between":
            return self.args[0] <= force_f64(v) <= self.args[1]
        if k == "equals-num":
            return abs(force_f64(v) - self.args[0]) < F64_EPSILON
        if k == "in-nums":
            f = force_f64(v)
            return any(abs(f - x) < F64_EPSILON for x in self.args[0])
        if k == "length":
            if isinstance(v, str):
                return len(v.encode("utf-8"))  # Rust String::len = bytes
            return len(v)
        if k == "is-empty":
            return len(v) == 0
        if k == "get-key":
            return v.get(self.args[0]) if isinstance(v, dict) else None
        if k == "get-idx":
            i = self.args[0]
            return v[i] if 0 <= i < len(v) else None
        if k == "flatten":
            out = []
            for el in v:
                if el is None:
                    continue
                if not isinstance(el, list):
                    raise EvalPanic(f"type checked: flatten {el!r}")
                out.extend(el)
            return out
        if k == "each":
            if isinstance(v, dict):
                return {key: self.inner.eval(val) for key, val in v.items()}
            return [self.inner.eval(el) for el in v]
        if k == "filter":
            if isinstance(v, dict):
                return {key: val for key, val in v.items() if self._pred(val)}
            return [el for el in v if self._pred(el)]
        if k == "any":
            return any(self._pred(el) for el in v)
        if k == "all":
            return all(self._pred(el) for el in v)
        if k == "sort":
            return sorted(v, key=cmp_json_key)
        if k == "sort-by":
            return sorted(v, key=lambda el: cmp_json_key(self.inner.eval(el)))
        if k == "as-string":
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, (int, float)):
                return rust_f64_display(v)
            return v
        if k == "pretty":
            return pretty(v)
        if k == "equals-str":
            return v == self.args[0]
        if k == "in-strs":
            return v in self.args[0]
        if k == "capture":
            rx = self.args[0]
            m = rx.search(v)
            return capture_json(rx, m) if m else None
        if k == "all-captures":
            rx = self.args[0]
            return [capture_json(rx, m) for m in rx.finditer(v)]
        if k == "matches":
            return self.args[0].search(v) is not None
        if k == "replace":
            return self.args[0].sub(self.args[1], v)
        raise EvalPanic(f"type checked: {k} {v!r}")

    def _pred(self, el: Any) -> bool:
        r = self.inner.eval(el)
        if r is None or r is False:
            return False
        if r is True:
            return True
        raise EvalPanic(f"type checked: predicate returned {r!r}")


@dataclass(frozen=True)
class TransformerExpression:
    """Left-to-right chain (transformer.rs:514-520)."""

    transformers: tuple[Transformer, ...] = ()

    def __str__(self) -> str:
        return " ".join(str(t) for t in self.transformers)

    def is_empty(self) -> bool:
        return not self.transformers

    def type_for(self, input_t: Type) -> Type:
        t = input_t
        for tr in self.transformers:
            t = tr.type_for(t)
        return t

    def eval(self, v: Any) -> Any:
        for tr in self.transformers:
            v = tr.eval(v)
        return v


# ---------------------------------------------------------------------------
# Extractor expressions (generic over the element type)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ExtractorExpression:
    """extractor + transformer chain (expressions/extractor.rs:9-52)."""

    extractor: "Extractor"
    transformers: TransformerExpression = TransformerExpression()

    def __str__(self) -> str:
        if self.transformers.is_empty():
            return str(self.extractor)
        return f"{self.extractor} {self.transformers}"

    def type_of(self) -> Type:
        return self.transformers.type_for(self.extractor.type_of())

    def extract(self, element) -> Any:
        return self.transformers.eval(self.extractor.extract(element))


@dataclass(frozen=True)
class ExplodingExtractorExpression:
    """`... !explode` (expressions/extractor.rs:55-118): an Array-typed
    extraction feeds its elements individually into the aggregator."""

    expr: ExtractorExpression
    explodes: bool = False

    def __str__(self) -> str:
        return f"{self.expr} !explode" if self.explodes else str(self.expr)

    def type_of(self) -> Type:
        raw = self.expr.type_of()
        if self.explodes:
            if isinstance(raw, ArrayT):
                return raw.inner
            raise TypeError_(f"!explode needs array, got {raw}")
        return raw

    def extract(self, element) -> list:
        v = self.expr.extract(element)
        if self.explodes:
            if isinstance(v, list):
                return v
            raise EvalPanic(f"type checked: !explode {v!r}")
        return [v]


# ---------------------------------------------------------------------------
# DOM extractors (extractor.rs:14-123). Elements implement the protocol in
# lopez_ray.html.dom.Element.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Extractor:
    kind: str
    args: tuple = ()  # attr name, nested ExtractorExpression, Selector

    def __str__(self) -> str:
        k = self.kind
        if k == "attr":
            return f'attr "{self.args[0]}"'
        if k in ("parent", "children"):
            return f"{k}({self.args[0]})"
        if k in ("select-any", "select-all"):
            return f"{k}({self.args[0]}, {self.args[1]})"
        return k

    def type_of(self) -> Type:
        k = self.kind
        if k in ("name", "text", "html", "inner-html", "attr", "id"):
            return STRING
        if k == "attrs":
            return MapT(STRING)
        if k == "classes":
            return ArrayT(STRING)
        if k == "parent":
            return self.args[0].type_of()
        if k == "children":
            return ArrayT(self.args[0].type_of())
        if k == "select-any":
            return self.args[0].type_of()
        if k == "select-all":
            return ArrayT(self.args[0].type_of())
        raise TypeError_(f"unknown extractor {k}")

    def extract(self, el) -> Any:
        k = self.kind
        if k == "name":
            return el.name
        if k == "html":
            return el.outer_html()
        if k == "inner-html":
            return el.inner_html()
        if k == "text":
            return " ".join(el.text_nodes())
        if k == "attr":
            return el.attrs.get(self.args[0])
        if k == "attrs":
            return dict(el.attrs)
        if k == "classes":
            return el.classes()
        if k == "id":
            return el.attrs.get("id")
        if k == "parent":
            p = el.parent_element()
            return self.args[0].extract(p) if p is not None else None
        if k == "children":
            return [self.args[0].extract(c) for c in el.child_elements()]
        if k == "select-any":
            for d in el.select(self.args[1]):
                return self.args[0].extract(d)
            return None
        if k == "select-all":
            return [self.args[0].extract(d) for d in el.select(self.args[1])]
        raise EvalPanic(f"unknown extractor {k}")


# ---------------------------------------------------------------------------
# Aggregators (aggregator.rs:13-25, fold :152-271)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Aggregator:
    kind: str  # count | count-not-null | first | collect | distinct | sum | group
    expr: Optional[ExplodingExtractorExpression] = None
    sub: Optional["AggregatorExpression"] = None  # for group

    def __str__(self) -> str:
        if self.kind == "count" and self.expr is None:
            return "count"
        if self.kind == "group":
            return f"group({self.expr}, {self.sub})"
        name = "count" if self.kind == "count-not-null" else self.kind
        return f"{name}({self.expr})"

    def type_of(self) -> Type:
        k = self.kind
        if k == "count":
            return NUMBER
        if k == "count-not-null":
            t = self.expr.type_of()
            if t == BOOL:
                return NUMBER
            raise TypeError_(f"count(E) needs bool, got {t}")
        if k == "first":
            return self.expr.type_of()
        if k in ("collect", "distinct"):
            return ArrayT(self.expr.type_of())
        if k == "sum":
            t = self.expr.type_of()
            if t == NUMBER:
                return NUMBER
            raise TypeError_(f"sum(E) needs number, got {t}")
        if k == "group":
            t = self.expr.type_of()
            if t == STRING:
                return MapT(self.sub.type_of())
            raise TypeError_(f"group key must be string, got {t}")
        raise TypeError_(f"unknown aggregator {k}")


@dataclass(frozen=True)
class AggregatorExpression:
    aggregator: Aggregator
    transformers: TransformerExpression = TransformerExpression()

    def __str__(self) -> str:
        if self.transformers.is_empty():
            return str(self.aggregator)
        return f"{self.aggregator} {self.transformers}"

    def type_of(self) -> Type:
        return self.transformers.type_for(self.aggregator.type_of())


class AggregatorState:
    """Fold state, fresh per page (aggregator.rs:152-271)."""

    __slots__ = ("agg", "count", "value", "values", "seen", "total", "groups")

    def __init__(self, agg: Aggregator):
        self.agg = agg
        self.count = 0
        self.value: Any = None
        self.values: list = []
        self.seen: dict = {}  # hashable-json key -> value (insertion-ordered)
        self.total = 0.0
        self.groups: dict[str, "AggregatorExpressionState"] = {}

    def aggregate(self, element) -> None:
        k = self.agg.kind
        if k == "count":
            self.count += 1
            return
        if k == "count-not-null":
            for v in self.agg.expr.extract(element):
                if v is True:
                    self.count += 1
                elif v is False or v is None:
                    pass
                else:
                    raise EvalPanic(f"type checked: count({v!r})")
            return
        if k == "first":
            if self.value is None:
                for v in self.agg.expr.extract(element):
                    if v is not None:
                        self.value = v
                        break
            return
        if k == "collect":
            self.values.extend(self.agg.expr.extract(element))
            return
        if k == "distinct":
            for v in self.agg.expr.extract(element):
                self.seen.setdefault(hashable_json(v), v)
            return
        if k == "sum":
            for v in self.agg.expr.extract(element):
                if isinstance(v, bool):
                    raise EvalPanic(f"type checked: sum({v!r})")
                if isinstance(v, (int, float)):
                    self.total += force_f64(v)
                elif v is not None:
                    raise EvalPanic(f"type checked: sum({v!r})")
            return
        if k == "group":
            for key in self.agg.expr.extract(element):
                if isinstance(key, str):
                    state = self.groups.get(key)
                    if state is None:
                        state = self.groups[key] = AggregatorExpressionState(self.agg.sub)
                    state.aggregate(element)
                elif key is not None:
                    raise EvalPanic(f"type checked: group key {key!r}")
            return
        raise EvalPanic(f"unknown aggregator {k}")

    def finalize(self) -> Any:
        k = self.agg.kind
        if k in ("count", "count-not-null"):
            return self.count
        if k == "first":
            return self.value
        if k == "collect":
            return self.values
        if k == "distinct":
            return list(self.seen.values())
        if k == "sum":
            return self.total
        if k == "group":
            # BTreeMap ordering = byte-wise key order (Rust String Ord).
            return {
                key: self.groups[key].finalize()
                for key in sorted(self.groups, key=lambda s: s.encode("utf-8"))
            }
        raise EvalPanic(f"unknown aggregator {k}")


class AggregatorExpressionState:
    __slots__ = ("state", "transformers")

    def __init__(self, agg_expr: AggregatorExpression):
        self.state = AggregatorState(agg_expr.aggregator)
        self.transformers = agg_expr.transformers

    def aggregate(self, element) -> None:
        self.state.aggregate(element)

    def finalize(self) -> Any:
        return self.transformers.eval(self.state.finalize())
