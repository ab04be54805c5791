"""Analyze stage: parse + link-extract + rule eval + payload decode.

One ``map_batches`` stage (callable class so the compiled Analyzer /
Boundaries / regexes are built once per actor) doing, per successful page,
what the reference's worker does per URL (``crawler/worker/mod.rs:199-296``
+ ``directives/mod.rs:37-70`` tree_search + ``Analyzer::analyze``):

- parse the HTML body (our mini-DOM);
- collect raw links: every ``a[href]`` (reason=ahref) and
  ``link[rel=canonical]`` (reason=canonical);
- ``clean_links`` through the Boundaries (checked_join → canonicalize →
  allow-filter → sort+dedup); redirects contribute a single
  reason=redirect link per worker/mod.rs:264-285;
- evaluate every rule set → one Arrow column per rule, typed from the
  rule's static Type (SURVEY.md §1.2);
- decode the image payload (PNG/LJPG) and check the per-row invariants:
  phash equality against the corpus column and caption equality between
  the DOM caption and the corpus caption (north-rule invariant columns
  ``phash_ok`` / ``caption_match`` / ``psnr_db``).

Status mapping (ensure_closed/ensure_error semantics): success, bad_status
and redirect close the page with its HTTP code; timed_out and fetch errors
mark ``error``; robots_denied marks ``error`` with its own counter (see
fetch.py for the documented divergence).
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

from ..dsl.directives import Directives
from ..dsl.types import AnyT, ArrayT, MapT, NumberT, Type
from ..html.cssselect import compile_selector
from ..html.dom import parse_html
from ..media.codecs import decode
from ..media.phash import phash64
from .boundaries import REASON_AHREF, REASON_CANONICAL, REASON_REDIRECT
from .urls import BadLink, checked_join

_A_SEL = compile_selector("a[href]")
_CANON_SEL = compile_selector('link[rel="canonical"]')
_CAPTION_SEL = compile_selector("p.caption")


def _arrow_type(t: Type) -> pa.DataType:
    return t.to_arrow()


def _to_storable(value: Any, t: Type) -> Any:
    """JSON value → value acceptable to pa.array for the mapped type."""
    if value is None:
        return None
    if isinstance(t, NumberT):
        return float(value)
    if isinstance(t, AnyT):
        return json.dumps(value, sort_keys=True)
    if isinstance(t, ArrayT):
        return [_to_storable(v, t.inner) for v in value]
    if isinstance(t, MapT):
        return [(k, _to_storable(v, t.inner)) for k, v in value.items()]
    return value


class AnalyzeStage:
    def __init__(self, directives_source: str):
        d = Directives.from_source(directives_source)
        self.analyzer = d.analyzer()
        self.boundaries = d.boundaries()
        self.rule_types = d.rule_types()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        urls = batch["url"].to_pylist()
        outcomes = batch["outcome"].to_pylist()
        htmls = batch["html"].to_pylist()
        redirects = batch["redirect_to"].to_pylist()
        payload_bytes = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        captions = batch["caption"].to_pylist()
        phashes = batch["phash"].to_pylist()

        link_urls: list[list[str]] = []
        link_reasons: list[list[str]] = []
        final_status: list[str] = []
        caption_match: list[bool | None] = []
        phash_ok: list[bool | None] = []
        rule_cols: dict[str, list] = {name: [] for name in self.rule_types}

        for i in range(n):
            url, outcome = urls[i], outcomes[i]
            links: list[tuple[str, str]] = []
            analyses: dict[str, Any] = {}
            cap_ok = ph_ok = None
            if outcome == "success":
                doc = parse_html(htmls[i])
                raw = [(REASON_AHREF, el.attrs["href"]) for el in doc.select(_A_SEL)]
                raw += [
                    (REASON_CANONICAL, el.attrs.get("href", ""))
                    for el in doc.select(_CANON_SEL)
                ]
                links = self.boundaries.clean_links(url, raw)
                analyses = dict(self.analyzer.analyze(url, doc))
                if payload_bytes[i] is not None:
                    img = decode(payload_bytes[i], fmts[i])
                    ph_ok = phash64(img) == phashes[i]
                    cap_el = next(doc.select(_CAPTION_SEL), None)
                    dom_caption = (
                        " ".join(cap_el.text_nodes()) if cap_el is not None else None
                    )
                    cap_ok = dom_caption == captions[i]
                status = "closed"
            elif outcome == "redirect":
                loc = redirects[i]
                if loc is not None and not self.boundaries.is_frontier(url):
                    try:
                        target = checked_join(url, loc)
                        target = self.boundaries.clean_query_params(target)
                        if self.boundaries.is_allowed(target):
                            links = [(REASON_REDIRECT, target)]
                    except BadLink:
                        pass
                status = "closed"
            elif outcome == "bad_status":
                status = "closed"
            else:  # timed_out | robots_denied | not_found
                status = "error"
            for name, t in self.rule_types.items():
                rule_cols[name].append(_to_storable(analyses.get(name), t))
            link_urls.append([u for _r, u in links])
            link_reasons.append([r for r, _u in links])
            final_status.append(status)
            caption_match.append(cap_ok)
            phash_ok.append(ph_ok)

        cols = {
            "url": batch["url"],
            "page_id": batch["page_id"],
            "depth": batch["depth"],
            "seq": batch["seq"],
            "outcome": batch["outcome"],
            "status_code": batch["status_code"],
            "final_status": pa.array(final_status, pa.string()),
            "link_urls": pa.array(link_urls, pa.list_(pa.string())),
            "link_reasons": pa.array(link_reasons, pa.list_(pa.string())),
            "caption_match": pa.array(caption_match, pa.bool_()),
            "phash_ok": pa.array(phash_ok, pa.bool_()),
        }
        for name, t in self.rule_types.items():
            cols[f"rule.{name}"] = pa.array(rule_cols[name], _arrow_type(t))
        return pa.table(cols)
