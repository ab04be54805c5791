"""WebDriver downloader: wire-protocol client, reference download
semantics (web_driver.rs:9-105), SelectiveDownloader routing
(directives/mod.rs:164-177), and the FetchStage integration."""

import pyarrow as pa
import pytest

from lopez_ray.crawler.webdriver import (
    EXTRACT_SOURCE,
    FixtureWebDriverTransport,
    WebDriverClient,
    WebDriverDownloader,
    WebDriverError,
    WebDriverSelector,
)


def _downloader(source_of, direct_get):
    return WebDriverDownloader(
        connect=lambda: FixtureWebDriverTransport(source_of),
        user_agent="lopez/webdriver-test",
        direct_get=direct_get,
    )


def test_client_session_call_sequence():
    """new session → goto → execute-async → quit, in that wire order
    (the exact flow of the reference's download_source)."""
    t = FixtureWebDriverTransport(lambda u: f"<html>{u}</html>")
    c = WebDriverClient(t)
    sid = c.new_session("ua-1")
    assert sid.startswith("fixture-")
    c.goto("https://js.test/a")
    out = c.execute_async(EXTRACT_SOURCE, [])
    assert out == "<html>https://js.test/a</html>"
    c.quit()
    assert [p for _m, p in t.log] == [
        "/session",
        f"/session/{sid}/url",
        f"/session/{sid}/execute/async",
        f"/session/{sid}",
    ]
    assert [m for m, _p in t.log] == ["POST", "POST", "POST", "DELETE"]


def test_client_invalid_session_and_unknown_command():
    t = FixtureWebDriverTransport(lambda u: "x")
    c = WebDriverClient(t)
    c.session_id = "no-such-session"
    with pytest.raises(WebDriverError) as ei:
        c.goto("https://a.test/")
    assert ei.value.error == "invalid session id"
    c2 = WebDriverClient(t)
    with pytest.raises(WebDriverError) as ei:
        c2._call("POST", "/bogus/route")
    assert ei.value.error == "unknown command"


def test_client_execute_before_goto_is_js_error():
    t = FixtureWebDriverTransport(lambda u: "x")
    c = WebDriverClient(t)
    c.new_session()
    with pytest.raises(WebDriverError) as ei:
        c.execute_async(EXTRACT_SOURCE, [])
    assert ei.value.error == "javascript error"


def test_download_success_routes_through_webdriver():
    dl = _downloader(
        lambda u: f"<html><body>rendered {u}</body></html>",
        lambda u: (200, None),
    )
    out = dl.download("https://js.test/p")
    assert out["outcome"] == "success"
    assert out["status_code"] == 200
    assert out["content"] == b"<html><body>rendered https://js.test/p</body></html>"


def test_download_redirect_and_bad_status_skip_the_session():
    calls = []

    def connect():
        calls.append(1)
        return FixtureWebDriverTransport(lambda u: "never")

    dl = WebDriverDownloader(
        connect=connect,
        user_agent="ua",
        direct_get=lambda u: (301, "https://js.test/moved"),
    )
    out = dl.download("https://js.test/old")
    # redirect outcome decided by the direct GET (web_driver.rs:81-95);
    # no webdriver session is opened
    assert out == {
        "outcome": "redirect",
        "status_code": 301,
        "content": None,
        "location": "https://js.test/moved",
    }
    dl2 = WebDriverDownloader(
        connect=connect, user_agent="ua", direct_get=lambda u: (503, None)
    )
    assert dl2.download("https://js.test/x")["outcome"] == "bad_status"
    assert calls == []


def test_download_redirect_without_location_is_error():
    dl = _downloader(lambda u: "x", lambda u: (302, None))
    with pytest.raises(WebDriverError, match="no Location header"):
        dl.download("https://js.test/r")


def test_non_string_js_result_is_error():
    """web_driver.rs:55-58: only Value::String is a valid source."""

    class DictResultTransport(FixtureWebDriverTransport):
        def __call__(self, method, path, payload):
            status, body = super().__call__(method, path, payload)
            if path.endswith("/execute/async") and status == 200:
                return 200, {"value": {"not": "a string"}}
            return status, body

    dl = WebDriverDownloader(
        connect=lambda: DictResultTransport(lambda u: "x"),
        user_agent="ua",
        direct_get=lambda u: (200, None),
    )
    with pytest.raises(WebDriverError, match="unexpected value from js"):
        dl.download("https://js.test/d")


def test_source_of_exception_surfaces_as_javascript_error():
    def boom(u):
        raise RuntimeError("render failed")

    dl = _downloader(boom, lambda u: (200, None))
    with pytest.raises(WebDriverError) as ei:
        dl.download("https://js.test/e")
    assert ei.value.error == "javascript error"


def test_selector_routing():
    sel = WebDriverSelector([r"^https://js\.", r"/spa/"])
    assert sel.use_webdriver("https://js.test/a")
    assert sel.use_webdriver("https://plain.test/spa/page")
    assert not sel.use_webdriver("https://plain.test/static")
    assert not WebDriverSelector([]).use_webdriver("https://js.test/a")


def test_fetch_stage_webdriver_route_matches_simple_render():
    """A webdriver-routed URL fetches the same document as the simple
    route (the fixture browser renders identically), via the real
    protocol client; non-matching URLs are untouched."""
    from lopez_ray.crawler.fetch import FetchStage

    urls = ["https://js.test/spa", "https://plain.test/page"]
    web = pa.table(
        {
            "url": pa.array(urls),
            "host": pa.array(["js.test", "plain.test"]),
            "status_code": pa.array([200, 200], pa.int32()),
            "redirect_to": pa.array([None, None], pa.string()),
            "links": pa.array([["https://js.test/next"], []], pa.list_(pa.string())),
            "canonical": pa.array([None, None], pa.string()),
            "image_id": pa.array([None, None], pa.string()),
            "latency_ms": pa.array([1, 1], pa.int32()),
        }
    )
    batch = pa.table(
        {
            "url": web["url"],
            "page_id": pa.array([0, 1], pa.int64()),
            "depth": pa.array([0, 0], pa.int32()),
            "seq": pa.array([0, 1], pa.int64()),
        }
    )
    routed = FetchStage(
        web, {}, None, enforce_politeness=False,
        webdriver_patterns=[r"^https://js\."],
    )(batch)
    plain = FetchStage(web, {}, None, enforce_politeness=False)(batch)
    assert routed["outcome"].to_pylist() == ["success", "success"]
    assert routed["html"].to_pylist() == plain["html"].to_pylist()
