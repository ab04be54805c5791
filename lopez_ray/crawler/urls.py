"""URL parsing, joining and canonicalization.

Mirrors the reference's link hygiene:

- ``checked_join`` (``/root/reference/lib-lopez/src/crawler/worker/mod.rs:90-122``):
  resolve relative links against the page URL; reject empty links,
  ``#fragment``-only links, non-http(s) schemes, and hosts that are not
  domain names (IP hosts are rejected, matching ``Url::domain()``).
- query-param policy (``directives.rs:552-573`` / ``filter_query_params``):
  keep a pair iff (use_all or key in use_params) and key not in
  ignore_params; an emptied query is removed entirely.

Canonicalization here defines the bytes fed to ``page_id`` — every URL that
becomes an id flows through ``canonicalize`` so partitioning and dedup agree
engine-wide (SURVEY.md §2.4).
"""

from __future__ import annotations

import ipaddress
import re
from typing import Optional
from urllib.parse import parse_qsl, quote, urlencode, urljoin, urlsplit, urlunsplit

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")
_DEFAULT_PORTS = {"http": 80, "https": 443}


class BadLink(ValueError):
    pass


def _remove_dot_segments(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
            continue
        out.append(seg)
    # Preserve leading slash semantics
    cleaned = "/".join(out)
    if path.startswith("/") and not cleaned.startswith("/"):
        cleaned = "/" + cleaned
    if path.endswith(("/.", "/..")) and not cleaned.endswith("/"):
        cleaned += "/"
    return cleaned


def _is_ip_host(host: str) -> bool:
    h = host[1:-1] if host.startswith("[") and host.endswith("]") else host
    try:
        ipaddress.ip_address(h)
        return True
    except ValueError:
        return False


def normalize(url: str) -> str:
    """WHATWG-ish normalization: lowercase scheme/host, strip default port,
    empty path → "/", dot segments removed. Fragment is preserved (the
    reference's Url keeps it; only raw '#...' links are rejected)."""
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    netloc = host
    if parts.port is not None and parts.port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{parts.port}"
    path = _remove_dot_segments(parts.path) or "/"
    return urlunsplit((scheme, netloc, path, parts.query, parts.fragment))


def checked_join(base_url: str, raw: str) -> str:
    """crawler/worker/mod.rs:90-122 — returns normalized absolute URL or
    raises BadLink."""
    if raw == "" or raw.startswith("#"):
        raise BadLink(f"bad link: {raw}")
    if _SCHEME_RE.match(raw):
        joined = raw
    else:
        joined = urljoin(base_url, raw)
    parts = urlsplit(joined)
    if parts.scheme not in ("http", "https"):
        raise BadLink(f"unaccepted scheme: {raw}")
    host = parts.hostname
    if not host or _is_ip_host(host):
        raise BadLink(f"no domain: {raw}")
    return normalize(joined)


def host_of(url: str) -> str:
    return (urlsplit(url).hostname or "").lower()


_HOST_BATCH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?(?P<host>[^/?#:]+)"


def hosts_of_batch(urls) -> list[str]:
    """Vectorized ``host_of`` for a pyarrow string array of canonical
    absolute URLs (one regex kernel instead of a urlsplit per row); any
    row the kernel can't parse falls back to the scalar path so the two
    always agree."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    matched = pc.extract_regex(urls, _HOST_BATCH_RE)
    hosts = pc.utf8_lower(pc.struct_field(matched, "host")).to_pylist()
    if any(h is None for h in hosts):
        raw = urls.to_pylist()
        hosts = [h if h is not None else host_of(u) for h, u in zip(hosts, raw)]
    return hosts


def origin_of(url: str) -> tuple[str, str, int]:
    """(scheme, host, effective-port) — the politeness/robots scope
    (url::Origin in origins.rs)."""
    p = urlsplit(url)
    scheme = p.scheme.lower()
    return (scheme, (p.hostname or "").lower(), p.port or _DEFAULT_PORTS.get(scheme, 0))


class ParamPolicy:
    """use param / ignore param / use param * (directives.rs:552-573)."""

    __slots__ = ("use_params", "ignore_params", "use_all")

    def __init__(self, use_params=(), ignore_params=(), use_all: bool = False):
        self.use_params = frozenset(use_params)
        self.ignore_params = frozenset(ignore_params)
        self.use_all = use_all

    def filter_query(self, url: str) -> str:
        parts = urlsplit(url)
        if not parts.query:
            return url
        pairs = parse_qsl(parts.query, keep_blank_values=True)
        kept = [
            (k, v)
            for k, v in pairs
            if (self.use_all or k in self.use_params) and k not in self.ignore_params
        ]
        query = urlencode(kept) if kept else ""
        return urlunsplit((parts.scheme, parts.netloc, parts.path, query, parts.fragment))


def canonicalize(url: str, policy: Optional[ParamPolicy] = None) -> str:
    """The canonical URL string hashed into ``page_id`` and used as the
    partitioning key everywhere (frontier shards, dedup shuffles)."""
    n = normalize(url)
    return policy.filter_query(n) if policy is not None else n
