"""CSS selector engine (subset) — stand-in for the scraper crate's
``Selector`` used by rule sets (``/root/reference/lib-lopez/src/directives/
parse.rs:93-129`` parses the raw selector text; matching happens in
``directives.rs:581-615``).

Supported grammar (covers everything in the reference's std-lopez library
and our fixtures):

  selector-list  := complex ("," complex)*
  complex        := compound ((" " | ">" | "+" | "~") compound)*
  compound       := (tag | "*")? simple*
  simple         := "#id" | ".class" | "[attr]" | "[attr op value ( i)?]"
                    | ":not(selector-list)"
  op             := "=" | "^=" | "$=" | "*=" | "~=" | "|="

Unsupported pseudo-classes raise at compile time (fail-fast, like the
reference rejecting bad selectors at load).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional


class SelectorError(Exception):
    pass


@dataclass(frozen=True)
class AttrTest:
    name: str
    op: Optional[str]  # None = presence
    value: Optional[str]
    case_insensitive: bool = False

    def matches(self, el) -> bool:
        if self.name not in el.attrs:
            return False
        if self.op is None:
            return True
        actual = el.attrs[self.name]
        value = self.value
        if self.case_insensitive:
            actual = actual.lower()
            value = value.lower()
        if self.op == "=":
            return actual == value
        if self.op == "^=":
            return value != "" and actual.startswith(value)
        if self.op == "$=":
            return value != "" and actual.endswith(value)
        if self.op == "*=":
            return value != "" and value in actual
        if self.op == "~=":
            return value in actual.split()
        if self.op == "|=":
            return actual == value or actual.startswith(value + "-")
        raise SelectorError(f"bad attr op {self.op}")


@dataclass(frozen=True)
class Compound:
    tag: Optional[str]  # None = any
    ids: tuple[str, ...]
    classes: tuple[str, ...]
    attrs: tuple[AttrTest, ...]
    nots: tuple["Selector", ...]

    def matches(self, el) -> bool:
        if self.tag is not None and el.name != self.tag:
            return False
        if self.ids:
            el_id = el.attrs.get("id")
            if any(i != el_id for i in self.ids):
                return False
        if self.classes:
            cl = set(el.classes())
            if any(c not in cl for c in self.classes):
                return False
        if any(not a.matches(el) for a in self.attrs):
            return False
        if any(n.matches(el) for n in self.nots):
            return False
        return True


@dataclass(frozen=True)
class Complex:
    # Rightmost compound first; each entry's second item is the combinator
    # linking that compound to the compound on its LEFT in source order
    # (None for the leftmost): "a > b c" → [(c, " "), (b, ">"), (a, None)].
    parts: tuple[tuple[Compound, Optional[str]], ...]

    def matches(self, el) -> bool:
        return self._match_from(el, 0)

    def _match_from(self, el, idx: int) -> bool:
        compound, comb = self.parts[idx]
        if not compound.matches(el):
            return False
        if idx + 1 == len(self.parts):
            return True
        if comb == ">":
            p = el.parent_element()
            return p is not None and self._match_from(p, idx + 1)
        if comb == " ":
            p = el.parent_element()
            while p is not None:
                if self._match_from(p, idx + 1):
                    return True
                p = p.parent_element()
            return False
        if comb == "+":
            sib = _prev_sibling_element(el)
            return sib is not None and self._match_from(sib, idx + 1)
        if comb == "~":
            sib = _prev_sibling_element(el)
            while sib is not None:
                if self._match_from(sib, idx + 1):
                    return True
                sib = _prev_sibling_element(sib)
            return False
        raise SelectorError(f"bad combinator {comb}")


def _prev_sibling_element(el):
    p = el.parent
    if p is None:
        return None
    prev = None
    for c in p.children:
        if c is el:
            return prev
        if not isinstance(c, str):
            prev = c
    return None


@dataclass(frozen=True)
class Selector:
    source: str
    alternatives: tuple[Complex, ...]

    def __str__(self) -> str:
        return self.source

    def matches(self, el) -> bool:
        return any(alt.matches(el) for alt in self.alternatives)


_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comb>[>+~,])
  | (?P<tag>[A-Za-z][A-Za-z0-9-]*|\*)
  | \#(?P<id>[A-Za-z0-9_-]+)
  | \.(?P<cls>[A-Za-z0-9_-]+)
  | (?P<attr>\[)
  | :(?P<pseudo>[A-Za-z-]+)
    """,
    re.VERBOSE,
)

_ATTR = re.compile(
    r"""\s*(?P<name>[A-Za-z0-9_:.-]+)\s*
        (?:(?P<op>[=^$*~|]=|=)\s*
           (?P<val>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*'|[^\]\s]+)\s*
           (?P<ci>[iI]\s*)?
        )?\]""",
    re.VERBOSE,
)


def compile_selector(source: str) -> Selector:
    text = source.strip()
    if not text:
        raise SelectorError("empty selector")
    alternatives: list[Complex] = []
    pos = 0
    # sequence under construction (left-to-right)
    seq: list[tuple[Compound, Optional[str]]] = []
    cur_tag: Optional[str] = None
    cur_ids: list[str] = []
    cur_classes: list[str] = []
    cur_attrs: list[AttrTest] = []
    cur_nots: list[Selector] = []
    has_compound = False
    pending_comb: Optional[str] = None

    def flush_compound(comb_to_left: Optional[str]):
        nonlocal cur_tag, cur_ids, cur_classes, cur_attrs, cur_nots, has_compound
        if not has_compound:
            raise SelectorError(f"dangling combinator in {source!r}")
        seq.append(
            (
                Compound(cur_tag, tuple(cur_ids), tuple(cur_classes), tuple(cur_attrs), tuple(cur_nots)),
                comb_to_left,
            )
        )
        cur_tag, cur_ids, cur_classes, cur_attrs, cur_nots = None, [], [], [], []
        has_compound = False

    def flush_complex():
        nonlocal seq, pending_comb
        flush_compound(pending_comb)
        pending_comb = None
        # seq[i][1] is the combinator between seq[i-1] and seq[i]; reversing
        # pairs each compound with its link to the left, as Complex expects.
        alternatives.append(Complex(tuple(reversed(seq))))
        seq = []

    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise SelectorError(f"cannot parse selector {source!r} at {text[pos:]!r}")
        pos = m.end()
        if m.group("ws"):
            if has_compound:
                # Might be a descendant combinator; decided by what follows.
                if pos < len(text) and text[pos] not in ">+~,":
                    flush_compound(pending_comb)
                    pending_comb = " "
            continue
        if m.group("comb"):
            c = m.group("comb")
            if c == ",":
                flush_complex()
                continue
            if has_compound:
                flush_compound(pending_comb)
            elif pending_comb == " ":
                pass  # "a > b": space already flushed; replace combinator
            else:
                raise SelectorError(f"dangling combinator in {source!r}")
            pending_comb = c
            continue
        if m.group("tag"):
            t = m.group("tag")
            cur_tag = None if t == "*" else t.lower()
            has_compound = True
            continue
        if m.group("id"):
            cur_ids.append(m.group("id"))
            has_compound = True
            continue
        if m.group("cls"):
            cur_classes.append(m.group("cls"))
            has_compound = True
            continue
        if m.group("attr"):
            am = _ATTR.match(text, pos)
            if not am:
                raise SelectorError(f"bad attribute selector in {source!r}")
            pos = am.end()
            val = am.group("val")
            if val is not None and val[0] in "\"'":
                val = re.sub(r"\\(.)", r"\1", val[1:-1])
            cur_attrs.append(
                AttrTest(am.group("name").lower(), am.group("op"), val, bool(am.group("ci")))
            )
            has_compound = True
            continue
        if m.group("pseudo"):
            name = m.group("pseudo")
            if name != "not":
                raise SelectorError(f"unsupported pseudo-class :{name}")
            if pos >= len(text) or text[pos] != "(":
                raise SelectorError(":not needs parentheses")
            depth, j = 1, pos + 1
            while j < len(text) and depth:
                if text[j] == "(":
                    depth += 1
                elif text[j] == ")":
                    depth -= 1
                j += 1
            if depth:
                raise SelectorError("unbalanced :not(...)")
            cur_nots.append(compile_selector(text[pos + 1 : j - 1]))
            pos = j
            has_compound = True
            continue

    flush_complex()
    return Selector(source.strip(), tuple(alternatives))
