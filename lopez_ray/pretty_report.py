"""Console pretty-printer for single-URL test reports.

Re-expresses the reference's report formatter
(lib-lopez/src/pretty_print.rs:1-188): status line colored by HTTP
status class with the canonical reason phrase, canonical/link URL lists
with per-list display limits ("... and N more."), and analyses rendered
as indented JSON. ANSI colors are dropped when stdout is not a TTY or
NO_COLOR is set.
"""

from __future__ import annotations

import json
import os
import sys
from http import HTTPStatus

_RESET = "\x1b[0m"
_COLORS = {
    "white": "37",
    "green": "32",
    "blue": "34",
    "yellow": "33",
    "red": "31",
    "purple": "35",
}


def _use_color() -> bool:
    return sys.stdout.isatty() and not os.environ.get("NO_COLOR")


def _paint(text: str, color: str, bold: bool = False) -> str:
    if not _use_color():
        return text
    code = _COLORS[color]
    prefix = f"\x1b[1;{code}m" if bold else f"\x1b[{code}m"
    return f"{prefix}{text}{_RESET}"


def _color_for_code(code: int) -> str:
    # pretty_print.rs:12-25 status-class palette
    if 100 <= code < 200:
        return "white"
    if 200 <= code < 300:
        return "green"
    if 300 <= code < 400:
        return "blue"
    if 400 <= code < 500:
        return "yellow"
    if 500 <= code < 600:
        return "red"
    return "purple"


def _print_status(code: int) -> None:
    color = _color_for_code(code)
    try:
        reason = HTTPStatus(code).phrase
    except ValueError:
        reason = None
    if reason:
        print(
            f"Status code: {_paint(f'⏺ {code}', color, bold=True)}"
            f"{_paint(' - ', 'white')}{_paint(reason, 'white')}"
        )
    else:
        print(f"Status code: {code}")


def _print_url_list(urls: list[str], color: str, limit: int) -> None:
    # pretty_print.rs:43-66: indent 4, per-list limit, "... and N more."
    if not urls:
        print("    <empty>")
        return
    shown = [_paint(u, color) for u in urls[:limit]]
    print("    " + "\n    ".join(shown))
    if len(urls) > limit:
        print(f"    ... and {len(urls) - limit} more.")


def pretty_print_report(report: dict) -> None:
    """report: the dict cmd_test builds (actual_url, downloader, report)."""
    print(f"Actual url: {_paint(report['actual_url'], 'white', bold=True)}")
    if "downloader" in report:
        print(f"Downloader: {report['downloader']}")
    body = report["report"]
    if body == "DisallowedByDirectives":
        print(f"Status: {_paint('disallowed by directives', 'yellow', bold=True)}")
        return
    if body == "DisallowedByOrigin":
        print(f"Status: {_paint('disallowed by origin', 'red', bold=True)} (robots.txt)")
        return
    outcome = body["outcome"]
    if outcome == "timed_out":
        print(f"Status: {_paint('timed out', 'red', bold=True)}")
        return
    if outcome in ("bad_status", "not_found"):
        _print_status(body["status_code"])
        return
    if outcome == "redirect":
        _print_status(body["status_code"])
        locs = [u for r, u in body["links"] if r == "redirect"]
        print(f"Location: {_paint(locs[0] if locs else '<none>', 'blue')}")
        return
    # success
    _print_status(body["status_code"])
    print("Canonical:")
    _print_url_list([u for r, u in body["links"] if r == "canonical"], "red", 3)
    print("Links:")
    _print_url_list([u for r, u in body["links"] if r == "ahref"], "blue", 10)
    analyses = body.get("analyses", {})
    if not analyses:
        print("Analyses:\n    <empty>")
        return
    rendered = [
        f"{name}: " + json.dumps(value, indent=1).replace("\n", "\n    ")
        for name, value in analyses.items()
    ]
    print("Analyses:\n    " + "\n    ".join(rendered))
