"""Directives loading: module resolution, validation, variables, analyzer.

Mirrors ``/root/reference/lib-lopez/src/directives/directives.rs``:

- module loader with ``import "path";`` resolution (directives.rs:25-63,
  168-209, 371-394): paths use '.' separators with ``super``/``root``
  navigation (canonical_path, :67-84); a module resolves to either
  ``<path>.lcd`` or ``<path>/module.lcd`` under any import root
  (main file's directory first, then extra import paths);
- load-time validation (directives.rs:212-369): duplicate rule names across
  modules, seeds that are disallowed or on the frontier, unknown or
  duplicate ``set`` variables with bad-typed values, rule type errors;
- ``SetVariables`` → typed crawl parameters with reference defaults
  (variable.rs:19-140);
- ``Analyzer``: the per-page rule evaluation (directives.rs:581-615), rule
  names prefixed ``module.rule`` for non-root modules (full_rule_name,
  :86-93).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Optional

from ..crawler.boundaries import Boundaries
from ..crawler.urls import ParamPolicy, canonicalize
from .exprs import AggregatorExpressionState
from .parser import (
    BoundaryItem,
    Import,
    Item,
    ParseError,
    RuleSet,
    Seed,
    SetVariable,
    WebDriverItem,
    parse_items,
)
from .types import Type, TypeError_

SEPARATOR = "."
EXTENSION = "lcd"
MODULE_FILE = "module"

DEFAULT_USER_AGENT = "lopez/0.6.1 (+https://github.com/tokahuke/lopez)"

# name -> (python type check, default) — variable.rs:19-140
_VARIABLES: dict[str, tuple[str, Any]] = {
    "user_agent": ("str", DEFAULT_USER_AGENT),
    "quota": ("u64", 1000),
    "max_depth": ("u64", 7),
    "max_hits_per_sec": ("pos_f64", 2.5),
    "request_timeout": ("pos_f64", 60.0),
    "max_body_size": ("u64", 10_000_000),
    "enable_page_rank": ("bool", True),
}


class LoadError(Exception):
    pass


@dataclass(frozen=True)
class Parameters:
    """crawler/mod.rs:34-40 — the validated crawl tunables."""

    user_agent: str = DEFAULT_USER_AGENT
    quota: int = 1000
    max_depth: int = 7
    max_hits_per_sec: float = 2.5
    request_timeout: float = 60.0
    max_body_size: int = 10_000_000
    enable_page_rank: bool = True


def _canonical_path(path: str) -> str:
    """directives.rs:67-84 — strip super/root from a '.'-separated path."""
    parts: list[str] = []
    for part in path.split(SEPARATOR):
        if part == "super":
            if not parts:
                raise LoadError(f"got empty path from `{path}`")
            parts.pop()
        elif part == "root":
            parts.clear()
        elif part == "":
            continue
        else:
            parts.append(part)
    return SEPARATOR.join(parts)


class Directives:
    """Parsed + linked + validated program. ``modules`` maps module name
    ("" = main) to its item list."""

    def __init__(self, modules: dict[str, list[Item]]):
        self.modules = modules
        self._validate()

    # ----- loading -----

    @classmethod
    def load(cls, main_path: str, import_path: Optional[str] = None) -> "Directives":
        """directives.rs:371-394 — load main file then imports recursively."""
        main_dir = os.path.dirname(os.path.abspath(main_path))
        roots = [main_dir] + ([import_path] if import_path else [])
        with open(main_path, encoding="utf-8") as f:
            items = parse_items(f.read())
        modules: dict[str, list[Item]] = {"": items}
        cls._load_imports("", items, roots, modules)
        return cls(modules)

    @classmethod
    def from_source(cls, source: str) -> "Directives":
        return cls({"": parse_items(source)})

    @classmethod
    def _load_imports(cls, prefix: str, items, roots, modules) -> None:
        for item in items:
            if not isinstance(item, Import):
                continue
            rel = item.path if not prefix else prefix + SEPARATOR + item.path
            name = _canonical_path(rel)
            if name in modules:
                continue
            fs_rel = name.replace(SEPARATOR, os.sep)
            candidates = []
            for root in roots:
                candidates.append(os.path.join(root, f"{fs_rel}.{EXTENSION}"))
                candidates.append(
                    os.path.join(root, fs_rel, f"{MODULE_FILE}.{EXTENSION}")
                )
            for cand in candidates:
                if os.path.isfile(cand):
                    with open(cand, encoding="utf-8") as f:
                        sub_items = parse_items(f.read())
                    modules[name] = sub_items
                    cls._load_imports(name, sub_items, roots, modules)
                    break
            else:
                raise LoadError(
                    f"could not open module `{name}` from paths {candidates!r}"
                )

    # ----- validation (directives.rs:212-369) -----

    def _validate(self) -> None:
        rule_names: set[str] = set()
        for mod_name, items in self.modules.items():
            seen_vars: set[str] = set()
            for item in items:
                if isinstance(item, RuleSet):
                    for rule_name, agg in item.aggregators:
                        full = self._full_rule_name(mod_name, rule_name)
                        if full in rule_names:
                            raise LoadError(f"duplicate rule name `{full}`")
                        rule_names.add(full)
                        try:
                            agg.type_of()
                        except TypeError_ as e:
                            raise LoadError(f"rule `{full}`: {e}")
                elif isinstance(item, SetVariable):
                    if item.name not in _VARIABLES:
                        raise LoadError(f"unknown variable `{item.name}`")
                    if item.name in seen_vars:
                        raise LoadError(f"variable `{item.name}` set twice")
                    seen_vars.add(item.name)
                    self._check_var(item.name, item.value)
        boundaries = self.boundaries()
        for seed in self.seeds():
            if not boundaries.is_allowed(seed):
                raise LoadError(f"seed `{seed}` is not within boundaries")
            if boundaries.is_frontier(seed):
                raise LoadError(f"seed `{seed}` is on the frontier")

    @staticmethod
    def _check_var(name: str, value: Any) -> None:
        kind = _VARIABLES[name][0]
        ok = {
            "str": lambda v: isinstance(v, str),
            "u64": lambda v: isinstance(v, int) and not isinstance(v, bool) and v >= 0,
            "pos_f64": lambda v: isinstance(v, (int, float))
            and not isinstance(v, bool)
            and v > 0,
            "bool": lambda v: isinstance(v, bool),
        }[kind](value)
        if not ok:
            raise LoadError(f"bad value for `{name}`: {value!r}")

    @staticmethod
    def _full_rule_name(prefix: str, rule_name: str) -> str:
        return f"{prefix}{SEPARATOR}{rule_name}" if prefix else rule_name

    # ----- accessors -----

    def _items(self):
        for mod_name, items in self.modules.items():
            for item in items:
                yield mod_name, item

    def seeds(self) -> list[str]:
        """Seed URLs, canonicalized under the param policy (master seeds
        flow through the same canonical form as discovered links)."""
        policy = self.param_policy()
        return [
            canonicalize(item.url, policy)
            for _m, item in self._items()
            if isinstance(item, Seed)
        ]

    def param_policy(self) -> ParamPolicy:
        use, ignore, use_all = [], [], False
        for _m, item in self._items():
            if isinstance(item, BoundaryItem):
                if item.kind == "use-param":
                    use.append(item.value)
                elif item.kind == "ignore-param":
                    ignore.append(item.value)
                elif item.kind == "use-all-params":
                    use_all = True
        return ParamPolicy(use, ignore, use_all)

    def boundaries(self) -> Boundaries:
        allowed, disallowed, frontier = [], [], []
        for _m, item in self._items():
            if isinstance(item, BoundaryItem):
                if item.kind == "allow":
                    allowed.append(item.value)
                elif item.kind == "disallow":
                    disallowed.append(item.value)
                elif item.kind == "frontier":
                    frontier.append(item.value)
        return Boundaries(allowed, disallowed, frontier, self.param_policy())

    def parameters(self) -> Parameters:
        values: dict[str, Any] = {}
        for _m, item in self._items():
            if isinstance(item, SetVariable):
                values[item.name] = item.value
        kwargs = {}
        for name, (_kind, default) in _VARIABLES.items():
            v = values.get(name, default)
            if name in ("max_hits_per_sec", "request_timeout"):
                v = float(v)
            kwargs[name] = v
        return Parameters(**kwargs)

    def webdriver_patterns(self) -> list[str]:
        return [
            item.pattern
            for _m, item in self._items()
            if isinstance(item, WebDriverItem)
        ]

    def analyzer(self) -> "Analyzer":
        rule_sets = [
            (mod_name, item)
            for mod_name, item in self._items()
            if isinstance(item, RuleSet)
        ]
        return Analyzer(rule_sets)

    def rule_types(self) -> dict[str, Type]:
        """Static output schema: rule full-name → Type (SURVEY.md §1.2)."""
        out: dict[str, Type] = {}
        for mod_name, item in self._items():
            if isinstance(item, RuleSet):
                for rule_name, agg in item.aggregators:
                    out[self._full_rule_name(mod_name, rule_name)] = agg.type_of()
        return out


class Analyzer:
    """directives.rs:581-615 — evaluate all matching rule sets over a page."""

    def __init__(self, rule_sets: list[tuple[str, RuleSet]]):
        self.rule_sets = rule_sets

    def analyze(self, url: str, doc) -> list[tuple[str, Any]]:
        out: list[tuple[str, Any]] = []
        for mod_name, rs in self.rule_sets:
            if rs.in_page is not None and rs.in_page.search(url) is None:
                continue
            states = [
                (name, AggregatorExpressionState(agg)) for name, agg in rs.aggregators
            ]
            for element in doc.select(rs.selector):
                for _name, state in states:
                    state.aggregate(element)
            for name, state in states:
                out.append(
                    (Directives._full_rule_name(mod_name, name), state.finalize())
                )
        return out
