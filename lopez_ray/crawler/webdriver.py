"""W3C WebDriver downloader (reference crawler/downloader/web_driver.rs:9-105).

The reference's ``WebDriverDownloader`` does two things per URL:

1. a plain HTTP GET to learn the status code — redirect and bad-status
   outcomes are decided from THIS response, exactly like
   ``SimpleDownloader`` (web_driver.rs:66-105);
2. on a 2xx status, a W3C WebDriver session against the configured
   webdriver server (fantoccini in the reference): connect, set the
   user agent, ``goto`` the page, then execute an ASYNC script that
   waits for ``document.readyState == "complete"`` and calls back with
   ``document.documentElement.outerHTML`` (web_driver.rs:9-19, 46-59).
   A non-string script result is an error ("unexpected value from js").

This module implements the same wire protocol — ``POST /session``,
``POST /session/{id}/url``, ``POST /session/{id}/execute/async``,
``DELETE /session/{id}`` — over an injectable transport
``(method, path, payload_dict) -> (http_status, body_dict)``.

* ``HttpTransport`` speaks real HTTP/1.1 (stdlib ``http.client``) to a
  chromedriver/geckodriver endpoint; it is the production transport on
  a machine that has a browser. This sandbox has neither network nor a
  browser, so no test exercises it end-to-end (connection errors map to
  ``WebDriverError`` like any other failure).
* ``FixtureWebDriverTransport`` is a protocol-faithful in-process
  server used by the crawl engine and the tests: real session
  lifecycle, W3C error objects (``invalid session id``,
  ``unknown command``, ``javascript error``), and a "browser" whose
  rendering is an injected ``source_of(url) -> html`` callable (the
  fixture page renderer). Every payload is round-tripped through JSON
  so non-serializable arguments fail here exactly as they would on the
  wire. This is the same honest-seam pattern as media/codecs.py: the
  protocol client, routing, and error paths are real; only the browser
  behind the socket is synthesized.

The per-URL routing (``use webdriver on "regex"`` directives) mirrors
``SelectiveDownloader`` (directives/mod.rs:164-177): any matching rule
sends the URL to the webdriver downloader, everything else to the
simple one.
"""

from __future__ import annotations

import itertools
import json
from typing import Callable

# Verbatim semantics of the reference's EXTRACT_SOURCE script
# (web_driver.rs:9-19): wait for load, call back with the outer HTML.
EXTRACT_SOURCE = """
    const [callback] = arguments;
    const snapshot = () => callback(document.documentElement.outerHTML);

    if (document.readyState == "complete") {
        snapshot()
    } else {
        window.addEventListener("load", snapshot);
    }
"""


class WebDriverError(Exception):
    """A W3C error object ({"value": {"error", "message"}}) or a
    transport failure."""

    def __init__(self, error: str, message: str = ""):
        super().__init__(f"{error}: {message}" if message else error)
        self.error = error
        self.message = message


class HttpTransport:
    """Wire transport to a real WebDriver server (chromedriver etc.).

    One connection per transport, mirroring the reference's
    one-fantoccini-client-per-download connect (web_driver.rs:46-48).
    """

    def __init__(self, base_url: str, timeout: float = 60.0):
        from urllib.parse import urlparse

        u = urlparse(base_url)
        if u.scheme not in ("http", ""):
            raise WebDriverError(
                "unsupported scheme", f"webdriver url must be http: {base_url}"
            )
        self._host = u.hostname or "localhost"
        self._port = u.port or 4444
        self._prefix = (u.path or "").rstrip("/")
        self._timeout = timeout
        self._conn = None

    def __call__(self, method: str, path: str, payload: dict | None):
        import http.client

        if self._conn is None:
            self._conn = http.client.HTTPConnection(
                self._host, self._port, timeout=self._timeout
            )
        body = json.dumps(payload) if payload is not None else None
        try:
            self._conn.request(
                method,
                self._prefix + path,
                body=body,
                headers={"Content-Type": "application/json; charset=utf-8"},
            )
            resp = self._conn.getresponse()
            raw = resp.read()
        except OSError as exc:  # includes socket.timeout, refused, DNS
            raise WebDriverError("transport error", str(exc)) from exc
        try:
            parsed = json.loads(raw) if raw else {}
        except json.JSONDecodeError as exc:
            raise WebDriverError("invalid response", raw[:200].decode("utf-8", "replace")) from exc
        return resp.status, parsed

    def close(self) -> None:
        if self._conn is not None:
            self._conn.close()
            self._conn = None


class FixtureWebDriverTransport:
    """In-process WebDriver server over the fixture page renderer.

    Implements the protocol surface the client uses — with real error
    objects, so client error paths are testable: unknown routes return
    ``unknown command``, a bad/expired session returns ``invalid
    session id``, and a script callback error returns ``javascript
    error`` (a ``source_of`` exception plays the role of a JS throw).
    """

    def __init__(self, source_of: Callable[[str], str]):
        self._source_of = source_of
        self._ids = itertools.count(1)
        self._sessions: dict[str, dict] = {}  # sid -> {"url": current}
        self.log: list[tuple[str, str]] = []  # (method, path) for tests

    def __call__(self, method: str, path: str, payload: dict | None):
        # Faithful wire behavior: everything crosses a JSON boundary.
        payload = json.loads(json.dumps(payload)) if payload is not None else None
        self.log.append((method, path))
        parts = [p for p in path.split("/") if p]
        if method == "POST" and parts == ["session"]:
            sid = f"fixture-{next(self._ids)}"
            self._sessions[sid] = {"url": None}
            caps = (payload or {}).get("capabilities", {})
            return 200, {
                "value": {"sessionId": sid, "capabilities": caps.get("alwaysMatch", {})}
            }
        if len(parts) >= 2 and parts[0] == "session":
            sid = parts[1]
            sess = self._sessions.get(sid)
            if sess is None:
                return 404, {
                    "value": {
                        "error": "invalid session id",
                        "message": f"no such session: {sid}",
                    }
                }
            rest = parts[2:]
            if method == "DELETE" and not rest:
                del self._sessions[sid]
                return 200, {"value": None}
            if method == "POST" and rest == ["url"]:
                sess["url"] = (payload or {}).get("url")
                return 200, {"value": None}
            if method == "POST" and rest == ["execute", "async"]:
                if sess["url"] is None:
                    return 400, {
                        "value": {
                            "error": "javascript error",
                            "message": "no page loaded",
                        }
                    }
                try:
                    # The only async script the engine sends snapshots
                    # the loaded document; the fixture browser's
                    # "render" is source_of.
                    return 200, {"value": self._source_of(sess["url"])}
                except Exception as exc:  # a JS throw on the wire
                    return 500, {
                        "value": {"error": "javascript error", "message": str(exc)}
                    }
        return 404, {
            "value": {
                "error": "unknown command",
                "message": f"{method} {path}",
            }
        }

    def close(self) -> None:
        pass


class WebDriverClient:
    """Minimal W3C client: the exact call sequence the reference's
    download_source performs (new session → goto → execute-async →
    quit), with W3C error objects surfaced as ``WebDriverError``."""

    def __init__(self, transport):
        self._t = transport
        self.session_id: str | None = None

    def _call(self, method: str, path: str, payload: dict | None = None):
        status, body = self._t(method, path, payload)
        value = body.get("value") if isinstance(body, dict) else None
        if status >= 400 or (isinstance(value, dict) and "error" in value):
            err = value if isinstance(value, dict) else {}
            raise WebDriverError(
                err.get("error", f"http {status}"), err.get("message", "")
            )
        return value

    def new_session(self, user_agent: str | None = None) -> str:
        # fantoccini's set_ua is expressed at session-create time here:
        # the UA rides in as a capability argument (the one part of the
        # reference flow that is browser-specific rather than W3C).
        caps: dict = {"alwaysMatch": {}}
        if user_agent:
            caps["alwaysMatch"]["goog:chromeOptions"] = {
                "args": [f"--user-agent={user_agent}"]
            }
        value = self._call("POST", "/session", {"capabilities": caps})
        sid = (value or {}).get("sessionId")
        if not sid:
            raise WebDriverError("session not created", json.dumps(value)[:200])
        self.session_id = sid
        return sid

    def goto(self, url: str) -> None:
        self._call("POST", f"/session/{self.session_id}/url", {"url": url})

    def execute_async(self, script: str, args: list | None = None):
        return self._call(
            "POST",
            f"/session/{self.session_id}/execute/async",
            {"script": script, "args": args or []},
        )

    def quit(self) -> None:
        if self.session_id is not None:
            try:
                self._call("DELETE", f"/session/{self.session_id}")
            finally:
                self.session_id = None


class WebDriverDownloader:
    """Reference parity for WebDriverDownloader::download
    (web_driver.rs:63-105): outcome classification from a direct GET,
    content from the webdriver session.

    ``connect`` builds a fresh transport per download (the reference
    connects a fresh fantoccini client per download_source call);
    ``direct_get(url) -> (status_code, location_or_none)`` is the
    plain-HTTP leg — in the crawl engine it is answered by the fixture
    web table, on a real deployment by an HTTP GET.
    """

    def __init__(
        self,
        connect: Callable[[], object],
        user_agent: str,
        direct_get: Callable[[str], tuple[int, str | None]],
    ):
        self._connect = connect
        self._ua = user_agent
        self._direct_get = direct_get

    def download_source(self, page_url: str) -> str:
        transport = self._connect()
        client = WebDriverClient(transport)
        try:
            client.new_session(self._ua)
            client.goto(page_url)
            result = client.execute_async(EXTRACT_SOURCE, [])
            if not isinstance(result, str):
                # web_driver.rs:55-58: anything but a string is an error
                raise WebDriverError(
                    "unexpected value from js", json.dumps(result)[:200]
                )
            return result
        finally:
            try:
                # best-effort cleanup: a dead transport would raise again
                # here and mask the ORIGINAL goto/execute failure
                client.quit()
            except WebDriverError:
                pass
            finally:
                close = getattr(transport, "close", None)
                if close:
                    close()

    def download(self, page_url: str) -> dict:
        """Returns the ``Downloaded`` enum as a dict:
        {"outcome": "success"|"redirect"|"bad_status",
         "status_code": int, "content": bytes|None,
         "location": str|None}."""
        status_code, location = self._direct_get(page_url)
        if 300 <= status_code < 400:
            if location is None:
                # web_driver.rs:84-87: a redirect without Location is an
                # error, not a Downloaded
                raise WebDriverError(
                    "no Location header on redirect", page_url
                )
            return {
                "outcome": "redirect",
                "status_code": status_code,
                "content": None,
                "location": location,
            }
        if 200 <= status_code < 300:
            content = self.download_source(page_url).encode("utf-8")
            return {
                "outcome": "success",
                "status_code": status_code,
                "content": content,
                "location": None,
            }
        return {
            "outcome": "bad_status",
            "status_code": status_code,
            "content": None,
            "location": None,
        }


class WebDriverSelector:
    """Per-URL routing (directives/directives.rs:618-628): any
    ``use webdriver on "re"`` pattern matching the URL routes it to the
    webdriver downloader."""

    def __init__(self, patterns: list[str]):
        import re

        self._res = [re.compile(p) for p in patterns]

    def use_webdriver(self, page_url: str) -> bool:
        return any(r.search(page_url) for r in self._res)
