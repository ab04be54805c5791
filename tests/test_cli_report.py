"""Console pretty-printer parity checks.

Covers the report shapes cmd_test emits (reference formatter:
lib-lopez/src/pretty_print.rs:1-188): disallowed variants, error
statuses, redirects, and the full success layout with URL-list limits.
"""

import pytest

from lopez_ray.pretty_report import pretty_print_report


@pytest.fixture(autouse=True)
def no_color(monkeypatch):
    monkeypatch.setenv("NO_COLOR", "1")


def _success_report(n_links=3, analyses=None):
    links = [("canonical", "https://a.test/")] + [
        ("ahref", f"https://a.test/p{i}") for i in range(n_links)
    ]
    return {
        "actual_url": "https://a.test/",
        "downloader": "simple",
        "report": {
            "outcome": "success",
            "status_code": 200,
            "links": links,
            "analyses": analyses or {},
        },
    }


def test_disallowed_by_directives(capsys):
    pretty_print_report(
        {"actual_url": "https://x.test/", "report": "DisallowedByDirectives"}
    )
    out = capsys.readouterr().out
    assert "Actual url: https://x.test/" in out
    assert "disallowed by directives" in out


def test_disallowed_by_origin(capsys):
    pretty_print_report(
        {
            "actual_url": "https://x.test/",
            "downloader": "simple",
            "report": "DisallowedByOrigin",
        }
    )
    out = capsys.readouterr().out
    assert "disallowed by origin" in out
    assert "robots.txt" in out


def test_bad_status_reason_phrase(capsys):
    pretty_print_report(
        {
            "actual_url": "https://x.test/missing",
            "report": {"outcome": "not_found", "status_code": 404, "links": []},
        }
    )
    out = capsys.readouterr().out
    assert "404" in out and "Not Found" in out


def test_redirect_location(capsys):
    pretty_print_report(
        {
            "actual_url": "https://x.test/old",
            "report": {
                "outcome": "redirect",
                "status_code": 301,
                "links": [("redirect", "https://x.test/new")],
            },
        }
    )
    out = capsys.readouterr().out
    assert "301" in out
    assert "Location: https://x.test/new" in out


def test_success_full_layout(capsys):
    pretty_print_report(_success_report(analyses={"title": ["Hello"]}))
    out = capsys.readouterr().out
    assert "Status code: ⏺ 200 - OK" in out
    assert "Canonical:" in out and "https://a.test/" in out
    assert "Links:" in out and "https://a.test/p0" in out
    assert 'title: [\n     "Hello"\n    ]' in out


def test_link_list_limit(capsys):
    pretty_print_report(_success_report(n_links=14))
    out = capsys.readouterr().out
    # ahref limit is 10 (pretty_print.rs display limit)
    assert "https://a.test/p9" in out
    assert "https://a.test/p10" not in out
    assert "... and 4 more." in out


def test_empty_lists_and_analyses(capsys):
    rep = _success_report(n_links=0)
    rep["report"]["links"] = []
    pretty_print_report(rep)
    out = capsys.readouterr().out
    assert out.count("<empty>") == 3  # canonical, links, analyses
