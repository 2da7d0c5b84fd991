"""HTTP API layer over :class:`pubcrawl.service.SearchSession` — the
counterpart of the reference's FastAPI surface
(/root/reference/src/api/main.py:90-140: POST /search dispatching on the
``sem:`` prefix with a stats summary, POST /chat gated on an AI backend).

Two servers, one route table:

- :func:`make_server` — stdlib ``http.server`` JSON API, zero dependencies,
  runs (and is tested end-to-end) in this sandbox. The search itself executes
  distributed through the session's Ray-Data pipelines; only the top-k hit
  list serializes.
- :func:`make_fastapi_app` — the same routes as a FastAPI app when fastapi is
  installed (import-guarded; raises ImportError with guidance otherwise).

The AI chat route mirrors the reference's gating: without an injected
``chat_fn`` it answers 503 (the reference returns 503 when ZHIPUAI_API_KEY is
unset — an external LLM client is out of engine scope)."""

from __future__ import annotations

import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable

import numpy as np
import pandas as pd


def _jsonable(v):
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, float):
        # NaN/Inf would serialize as bare `NaN` tokens — invalid JSON for
        # strict clients; reachable via all-NA cells from the left-join attach
        return v if math.isfinite(v) else None
    if isinstance(v, np.ndarray):
        return [_jsonable(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def _results_payload(df: pd.DataFrame) -> list[dict]:
    return [
        {k: _jsonable(v) for k, v in rec.items()} for rec in df.to_dict("records")
    ]


class Routes:
    """Framework-agnostic route handlers: (payload dict) -> (status, body
    dict). Both server frontends delegate here, so route semantics are
    defined once."""

    def __init__(self, session, chat_fn: Callable[[list, list], str] | None = None):
        self.session = session
        self.chat_fn = chat_fn
        self._lock = threading.Lock()  # session mutates state per search

    @staticmethod
    def _int(payload: dict, key: str, default: int) -> int:
        try:
            return int(payload.get(key, default))
        except (TypeError, ValueError) as e:
            raise _BadRequest(f"{key} must be an integer") from e

    def search(self, payload: dict) -> tuple[int, dict]:
        query = str(payload.get("query", "")).strip()
        top_n = self._int(payload, "top_n", 20)
        if not (1 <= top_n <= 100):
            return 400, {"detail": "top_n must be in [1, 100]"}
        try:
            # empty sem: queries 400 via the session's own ValueError
            with self._lock:
                out = self.session.search(query, top_n=top_n)
        except ValueError as e:
            return 400, {"detail": str(e)}
        results = out["results"]
        if len(results) == 0:
            return 200, {"results": [], "stats": {"total_found": 0, "distribution": {}},
                         "message": "no results"}
        return 200, {"results": _results_payload(results), "stats": out["stats"],
                     "message": "ok"}

    def stats(self, _payload: dict) -> tuple[int, dict]:
        from .service import stats_summary

        with self._lock:
            return 200, stats_summary(self.session.filtered)

    def page(self, payload: dict) -> tuple[int, dict]:
        page = self._int(payload, "page", 1)
        per_page = self._int(payload, "per_page", 10)
        if not (1 <= per_page <= 100):
            return 400, {"detail": "per_page must be in [1, 100]"}
        if page < 1:
            return 400, {"detail": "page must be >= 1"}
        with self._lock:
            rows, info = self.session.page(page, per_page)
        return 200, {"results": _results_payload(rows), **info}

    def chat(self, payload: dict) -> tuple[int, dict]:
        if self.chat_fn is None:
            return 503, {"detail": "AI backend not configured"}
        ctx = payload.get("search_results_context") or []
        if not ctx:
            return 400, {"detail": "no search results context provided"}
        history = list(payload.get("chat_history") or [])
        history.append({"role": "user", "content": str(payload.get("current_message", ""))})
        try:
            return 200, {"response": self.chat_fn(history, ctx), "message": "ok"}
        except Exception as e:
            return 500, {"detail": str(e)}

    def index(self, _payload: dict) -> tuple[int, str]:
        """GET / — the single-file HTML dashboard (ui.DASHBOARD_HTML), the
        rendering counterpart of the reference's Streamlit search page. A
        str body tells the frontends to reply text/html instead of JSON."""
        from .ui import DASHBOARD_HTML

        return 200, DASHBOARD_HTML

    TABLE: dict[tuple[str, str], str] = {
        ("GET", "/"): "index",
        ("POST", "/search"): "search",
        ("GET", "/stats"): "stats",
        ("POST", "/page"): "page",
        ("POST", "/chat"): "chat",
    }

    def dispatch(self, method: str, path: str, payload: dict) -> tuple[int, dict]:
        name = self.TABLE.get((method, path))
        if name is None:
            return 404, {"detail": f"no route {method} {path}"}
        try:
            return getattr(self, name)(payload)
        except _BadRequest as e:  # client input errors are 400s, never 500s
            return 400, {"detail": str(e)}


class _BadRequest(ValueError):
    """Raised by route handlers for malformed client input → HTTP 400."""


def make_server(session, host: str = "127.0.0.1", port: int = 0,
                chat_fn: Callable | None = None) -> ThreadingHTTPServer:
    """Stdlib JSON API server (not started — call ``serve_forever`` on a
    thread, or use :func:`serve_background`). ``port=0`` binds an ephemeral
    port (``server.server_address[1]``)."""
    routes = Routes(session, chat_fn)

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, status: int, body) -> None:
            if isinstance(body, str):  # HTML routes (the dashboard)
                data, ctype = body.encode("utf-8"), "text/html; charset=utf-8"
            else:
                data, ctype = json.dumps(body).encode("utf-8"), "application/json"
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _handle(self, method: str) -> None:
            try:
                n = int(self.headers.get("Content-Length") or 0)
                payload = json.loads(self.rfile.read(n) or b"{}") if n else {}
                status, body = routes.dispatch(method, self.path, payload)
            except json.JSONDecodeError:
                status, body = 400, {"detail": "invalid JSON body"}
            except Exception as e:  # route errors → 500, never a hung socket
                status, body = 500, {"detail": str(e)}
            self._reply(status, body)

        def do_GET(self) -> None:
            self._handle("GET")

        def do_POST(self) -> None:
            self._handle("POST")

        def log_message(self, *args) -> None:  # quiet: library server
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve_background(session, host: str = "127.0.0.1", port: int = 0,
                     chat_fn: Callable | None = None) -> tuple[ThreadingHTTPServer, int]:
    """Start the stdlib server on a daemon thread; returns (server, port)."""
    srv = make_server(session, host, port, chat_fn)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


def make_fastapi_app(session, chat_fn: Callable | None = None) -> Any:
    """FastAPI frontend over the same :class:`Routes` table — import-guarded
    (fastapi is not installed in this sandbox; the stdlib server above covers
    the identical routes)."""
    try:
        from fastapi import FastAPI, Request  # type: ignore
        from fastapi.responses import HTMLResponse, JSONResponse  # type: ignore
    except ImportError as e:
        raise ImportError(
            "make_fastapi_app needs fastapi (pip install fastapi); "
            "use make_server for the dependency-free stdlib frontend"
        ) from e

    routes = Routes(session, chat_fn)
    app = FastAPI(title="pubcrawl API", version="1.0.0")

    def bind(method: str, path: str):
        async def endpoint(request: Request):
            payload = {}
            if method == "POST":
                try:
                    payload = await request.json()
                except Exception:
                    payload = {}
            status, body = routes.dispatch(method, path, payload)
            if isinstance(body, str):  # HTML routes (the dashboard)
                return HTMLResponse(body, status_code=status)
            return JSONResponse(body, status_code=status)

        if method == "GET":
            app.get(path)(endpoint)
        else:
            app.post(path)(endpoint)

    for (method, path) in Routes.TABLE:
        bind(method, path)
    return app
