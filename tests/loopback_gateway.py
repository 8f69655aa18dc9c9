"""Loopback HTTP gateway fixture: serves the deterministic synthetic web
corpus over real HTTP (ThreadingHTTPServer, keep-alive) so the engine's
``http_fetcher`` mapInPandas stage exercises its full network path — DNS-free
gateway addressing, connection reuse, timeouts, retries, politeness pacing —
with no internet. The request log (host, monotonic arrival time, path) lets
tests assert per-host crawl-delay spacing; ``flaky`` URLs return one 503
before succeeding, proving the retry path runs."""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from news_crawler_slm_spark.crawl.semantics import host_of, path_of


def _etag_of(html: bytes) -> str:
    import hashlib

    return '"' + hashlib.md5(html).hexdigest() + '"'


_LM_EPOCH = 1767225600  # 2026-01-01T00:00:00Z — deterministic base


def _lm_of(version: int) -> str:
    """Deterministic Last-Modified HTTP-date: the base epoch advanced one
    second per in-place mutation of the page."""
    from email.utils import formatdate

    return formatdate(_LM_EPOCH + version, usegmt=True)


class Gateway:
    def __init__(
        self,
        web_rows,
        flaky_urls=(),
        retry_after: float | None = None,
        no_etag_hosts: frozenset[str] | set[str] = frozenset(),
    ):
        # hosts that serve NO ETag (Last-Modified only) — exercises the
        # If-Modified-Since revalidation path end-to-end
        self.no_etag_hosts = frozenset(no_etag_hosts)
        # per-page mutation counter -> Last-Modified version
        self.versions: dict[tuple[str, str], int] = {}
        # when set, transient 503s carry a Retry-After header (RFC 9110
        # delta-seconds; fractional here only to keep tests fast)
        self.retry_after = retry_after
        # corpus keyed by (host, path): url -> row fields; rows may carry
        # an optional 7th element redirect_to (served as a 301 + Location)
        self.pages = {}
        for row in web_rows:
            url, html, links, ok, lang, publisher = row[:6]
            redirect_to = row[6] if len(row) > 6 else None
            self.pages[(host_of(url), path_of(url))] = (
                html, links, ok, lang, publisher, redirect_to,
            )
        self.flaky = dict.fromkeys(flaky_urls, 0)  # url -> times 503'd so far
        self.request_log: list[tuple[str, float, str]] = []
        # conditional-GET log: (url, if_none_match_header, status_returned)
        self.conditional_log: list[tuple[str, str | None, int]] = []
        self._lock = threading.Lock()

        gw = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"  # keep-alive: one socket per task

            def log_message(self, *a):  # silence stderr chatter
                pass

            def do_GET(self):
                t = time.monotonic()
                host, _, path = self.path.lstrip("/").partition("/")
                path = "/" + path
                url = f"https://{host}{path}"
                inm = self.headers.get("If-None-Match")
                with gw._lock:
                    gw.request_log.append((host, t, path))
                    flake = url in gw.flaky and gw.flaky[url] == 0
                    if flake:
                        gw.flaky[url] += 1
                page = gw.pages.get((host, path))
                if flake:
                    hdrs = (
                        {"Retry-After": str(gw.retry_after)}
                        if gw.retry_after is not None
                        else None
                    )
                    self._respond(503, b"transient", hdrs)
                elif page is None:
                    self._respond(404, b"not found")
                elif not page[2]:  # corpus fetch_ok=False -> permanent 5xx
                    self._respond(503, b"down")
                elif page[5] is not None:  # redirect row: 301 + Location
                    self._respond(301, b"", {"Location": page[5]})
                else:
                    html, links, _ok, lang, publisher, _rt = page
                    serve_etag = host not in gw.no_etag_hosts
                    etag = _etag_of(html)
                    lm = _lm_of(gw.versions.get((host, path), 0))
                    val_hdrs = {"Last-Modified": lm}
                    if serve_etag:
                        val_hdrs["ETag"] = etag
                    ims = self.headers.get("If-Modified-Since")
                    # RFC 9110 §13.2.2 precedence: If-None-Match, when
                    # present, is evaluated ALONE; If-Modified-Since is
                    # only consulted otherwise
                    if serve_etag and inm is not None and inm == etag:
                        # RFC 9110 §15.4.5: empty body, validator repeated
                        with gw._lock:
                            gw.conditional_log.append((url, inm, 304))
                        self._respond(304, b"", val_hdrs)
                    elif inm is None and ims is not None and gw._unmodified_since(ims, lm):
                        with gw._lock:
                            gw.conditional_log.append((url, f"IMS {ims}", 304))
                        self._respond(304, b"", val_hdrs)
                    else:
                        if inm is not None or ims is not None:
                            with gw._lock:
                                gw.conditional_log.append(
                                    (url, inm if inm is not None else f"IMS {ims}", 200)
                                )
                        self._respond(
                            200,
                            html,
                            {
                                **val_hdrs,
                                "Content-Language": lang,
                                "X-Publisher": publisher,
                                "X-Out-Links": json.dumps(links),
                            },
                        )

            def _respond(self, status, body, headers=None):
                self.send_response(status)
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.end_headers()
                self.wfile.write(body)

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_port}"
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self._thread.start()

    def mutate(self, url: str, html: bytes):
        """Replace a page's content in place (new ETag, advanced
        Last-Modified) — models a page edited between crawls, so a
        conditional GET sees 200 + new body."""
        key = (host_of(url), path_of(url))
        with self._lock:
            _old, links, ok, lang, publisher, redirect_to = self.pages[key]
            self.pages[key] = (html, links, ok, lang, publisher, redirect_to)
            self.versions[key] = self.versions.get(key, 0) + 1

    @staticmethod
    def _unmodified_since(ims: str, lm: str) -> bool:
        """True when the page's Last-Modified is not later than the
        client's If-Modified-Since (parsed comparison, RFC 9110 §13.1.3)."""
        from email.utils import parsedate_to_datetime

        try:
            return parsedate_to_datetime(lm) <= parsedate_to_datetime(ims)
        except (TypeError, ValueError):
            return False

    def per_host_request_times(self) -> dict[str, list[float]]:
        with self._lock:
            log = list(self.request_log)
        out: dict[str, list[float]] = {}
        for host, t, _p in log:
            out.setdefault(host, []).append(t)
        for ts in out.values():
            ts.sort()
        return out

    def close(self):
        self.server.shutdown()
        self.server.server_close()
        self._thread.join(timeout=5)
