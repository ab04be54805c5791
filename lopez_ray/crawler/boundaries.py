"""Crawl boundaries: allow/disallow/frontier gates + link cleaning.

Mirrors ``/root/reference/lib-lopez/src/crawler/boundaries.rs:40-76`` and
the ``Boundaries`` struct in ``directives.rs:533-577``:

- ``is_allowed(url)`` = matches some allow regex AND no disallow regex;
- ``is_frontier(url)`` = matches some frontier regex → the page may be
  fetched but none of its links are followed (``clean_links`` → []);
- ``clean_links``: checked_join each raw link, canonicalize query params,
  filter ``is_allowed``, re-canonicalize, then sort+dedup so only one
  representative per (reason, url) survives (boundaries.rs:69-74).

Reasons order for the sort matches the Rust enum: ahref < redirect <
canonical (reason.rs:4-8 derives Ord).
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence

from .urls import BadLink, ParamPolicy, canonicalize, checked_join

REASON_AHREF = "ahref"
REASON_REDIRECT = "redirect"
REASON_CANONICAL = "canonical"
_REASON_ORDER = {REASON_AHREF: 0, REASON_REDIRECT: 1, REASON_CANONICAL: 2}


class _RegexSet:
    """Compiled alternation, semantics of Rust RegexSet::is_match (search,
    not fullmatch). An empty set never matches."""

    def __init__(self, patterns: Sequence[str]):
        self.patterns = tuple(patterns)
        self._compiled = [re.compile(p) for p in patterns]

    def is_match(self, s: str) -> bool:
        return any(r.search(s) for r in self._compiled)


class Boundaries:
    def __init__(
        self,
        allowed: Sequence[str] = (),
        disallowed: Sequence[str] = (),
        frontier: Sequence[str] = (),
        param_policy: ParamPolicy | None = None,
    ):
        self.allowed = _RegexSet(allowed)
        self.disallowed = _RegexSet(disallowed)
        self.frontier = _RegexSet(frontier)
        self.param_policy = param_policy or ParamPolicy()

    def is_allowed(self, url: str) -> bool:
        return self.allowed.is_match(url) and not self.disallowed.is_match(url)

    def is_frontier(self, url: str) -> bool:
        return self.frontier.is_match(url)

    def clean_query_params(self, url: str) -> str:
        return self.param_policy.filter_query(url)

    def clean_links(
        self, page_url: str, links: Iterable[tuple[str, str]]
    ) -> list[tuple[str, str]]:
        """[(reason, raw_href)] → sorted, deduped [(reason, canonical_url)].

        Mirrors clean_links exactly, including the double
        clean_query_params application (boundaries.rs:61-66 applies it both
        before and after the is_allowed filter).
        """
        if self.is_frontier(page_url):
            return []
        out: list[tuple[str, str]] = []
        for reason, raw in links:
            try:
                url = checked_join(page_url, raw)
            except BadLink:
                continue
            url = canonicalize(url, self.param_policy)
            if not self.is_allowed(url):
                continue
            out.append((reason, self.clean_query_params(url)))
        out.sort(key=lambda t: (_REASON_ORDER[t[0]], t[1]))
        deduped: list[tuple[str, str]] = []
        for item in out:
            if not deduped or deduped[-1] != item:
                deduped.append(item)
        return deduped
