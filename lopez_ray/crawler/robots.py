"""robots.txt parsing and matching.

Mirrors ``/root/reference/lib-lopez/src/crawler/robots.rs``:

- section choice: the User-Agent section that best matches our agent token
  ("lopez"), falling back to ``*`` (the robots_txt crate's
  ``choose_section``);
- only ``Disallow`` rules matter for exclusion (robots.rs:20-26 filters
  ``!rule.allow``);
- the wildcard matcher (robots.rs:50-88): pattern split on ``*``, each part
  found in sequence; trailing ``$`` requires the route to be fully consumed;
  an empty pattern never matches (corner case at :71-74);
- crawl delay: ``Crawl-delay`` seconds, else ``Request-rate: n/m`` →
  ``m / n`` seconds (robots.rs:26-34);
- the route tested is everything from the path on (``Position::BeforePath..``):
  path + query + fragment.

The walk-up-the-domain fetch logic (robots.rs:151-179) lives in the fetch
stage, which resolves robots bodies from the fixture/web table.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional
from urllib.parse import urlsplit


class Match:
    __slots__ = ("match_str", "is_strict")

    def __init__(self, path: str):
        if path.endswith("$"):
            self.match_str = path[:-1]
            self.is_strict = True
        else:
            self.match_str = path
            self.is_strict = False

    def matches(self, route: str) -> bool:
        """Exact port of robots.rs:70-87: each '*'-separated pattern is
        found in sequence; the cursor advances to the match *start* (not
        past it), and `$` requires the remaining route to be empty."""
        if not self.match_str:
            return False
        for pattern in self.match_str.split("*"):
            found = route.find(pattern)
            if found == -1:
                return False
            route = route[found:]
        return (not self.is_strict) or route == ""


def _route_of(url: str) -> str:
    p = urlsplit(url)
    route = p.path or "/"
    if p.query:
        route += "?" + p.query
    if p.fragment:
        route += "#" + p.fragment
    return route


@dataclass
class _Section:
    agents: list[str]
    disallow: list[str]
    allow: list[str]
    crawl_delay: Optional[float]
    req_rate: Optional[tuple[int, int]]  # (requests, seconds)


def _parse_sections(text: str) -> list[_Section]:
    sections: list[_Section] = []
    cur: Optional[_Section] = None
    last_was_agent = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if cur is None or not last_was_agent:
                cur = _Section([], [], [], None, None)
                sections.append(cur)
            cur.agents.append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if cur is None:
            # Rules before any User-Agent: treat as a '*' section (lossy).
            cur = _Section(["*"], [], [], None, None)
            sections.append(cur)
        if field == "disallow":
            cur.disallow.append(value)
        elif field == "allow":
            cur.allow.append(value)
        elif field == "crawl-delay":
            try:
                cur.crawl_delay = float(value)
            except ValueError:
                pass
        elif field == "request-rate":
            try:
                n, _, m = value.partition("/")
                cur.req_rate = (int(n), int(m.split()[0]))
            except (ValueError, IndexError):
                pass
    return sections


def _choose_section(sections: list[_Section], agent: str) -> Optional[_Section]:
    agent = agent.lower()
    best: Optional[_Section] = None
    best_len = -1
    star: Optional[_Section] = None
    for s in sections:
        for ua in s.agents:
            if ua == "*":
                if star is None:
                    star = s
            elif ua in agent or agent in ua:
                if len(ua) > best_len:
                    best, best_len = s, len(ua)
    return best if best is not None else star


class RobotExclusion:
    """robots.rs:10-48."""

    def __init__(self, robots_str: str, agent: str = "lopez"):
        section = _choose_section(_parse_sections(robots_str), agent)
        if section is None:
            self.disallow: list[Match] = []
            self._crawl_delay: Optional[float] = None
            return
        self.disallow = [Match(p) for p in section.disallow]
        delay = section.crawl_delay
        if delay is None and section.req_rate is not None:
            requests, seconds = section.req_rate
            if requests > 0:
                delay = seconds / requests
        self._crawl_delay = delay

    def crawl_delay(self) -> Optional[float]:
        return self._crawl_delay

    def allows(self, url: str) -> bool:
        route = _route_of(url)
        return not any(m.matches(route) for m in self.disallow)


def crawl_delay_for(
    exclusion: Optional[RobotExclusion], max_hits_per_sec: float
) -> float:
    """origins.rs:37-44: max(1/max_hits_per_sec, robots crawl-delay)."""
    robots_delay = 0.0
    if exclusion is not None and exclusion.crawl_delay() is not None:
        robots_delay = exclusion.crawl_delay()
    return max(1.0 / max_hits_per_sec, robots_delay)
