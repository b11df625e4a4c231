"""One-time OAuth authorization-code capture — the interactive bootstrap
step before ``auth.py``'s token lifecycle takes over.

Mirrors the reference's login helper (``/root/reference/util/login.py:1-53``:
a FastAPI app whose ``/login`` redirects to Spotify's authorize endpoint
and whose ``/callback`` validates the CSRF ``state`` and surfaces the
``code``) with stdlib ``http.server`` only — no web-framework dependency
for a page that serves exactly one request.

Flow (the standard authorization-code grant):

1. ``authorize_url`` builds the consent URL (response_type=code, the
   reference's ``user-read-recently-played`` scope, a ``secrets`` CSRF
   state) — reference lines 21-30.
2. The user opens it; Spotify redirects the browser to
   ``http://localhost:<port>/callback?code=...&state=...``.
3. ``capture_auth_code`` serves that single callback, validates the state
   (mismatch → error, reference lines 37-38), rejects provider errors
   (reference lines 40-41), and returns the code for ``auth.py``'s
   authorization-code token exchange.

Engine scope note: SURVEY §2.2 scopes the interactive OAuth bootstrap out
of the engine; this module exists for reference-surface completeness and
is covered by loopback tests (tests/test_ingest.py) — it never runs inside
a Spark job.
"""

from __future__ import annotations

import secrets
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlencode, urlparse

AUTHORIZE_URL = "https://accounts.spotify.com/authorize"
SCOPE = "user-read-recently-played"


class StateMismatch(ValueError):
    """Callback ``state`` differs from the one we issued (CSRF guard)."""


class AuthorizationDenied(RuntimeError):
    """Provider returned ``error=...`` instead of a code."""


def authorize_url(client_id: str, redirect_uri: str, state: str, scope: str = SCOPE) -> str:
    """The consent URL the user opens (reference login.py:21-30)."""
    return AUTHORIZE_URL + "?" + urlencode(
        {
            "response_type": "code",
            "client_id": client_id,
            "scope": scope,
            "redirect_uri": redirect_uri,
            "state": state,
        }
    )


def parse_callback(query: str, expected_state: str) -> str:
    """Validate a callback query string and extract the code.

    Raises ``StateMismatch`` on a wrong/missing state (login.py:37-38) and
    ``AuthorizationDenied`` if the provider sent ``error`` (login.py:40-41).
    """
    params = {k: v[0] for k, v in parse_qs(query).items()}
    if params.get("state") != expected_state:
        raise StateMismatch("Mismatched state")
    if params.get("error"):
        raise AuthorizationDenied(params["error"])
    code = params.get("code")
    if not code:
        raise AuthorizationDenied("callback carried neither code nor error")
    return code


@dataclass
class AuthCodeCapture:
    """One-shot loopback listener for the authorization redirect.

    ``start()`` binds localhost on ``port`` (0 = ephemeral) and returns the
    redirect URI to register; ``wait()`` blocks until the single callback
    arrives and returns the validated code.  The CSRF state is generated
    here (``secrets.token_hex``, as the reference does at import time) so
    the caller can't accidentally reuse one across attempts.
    """

    port: int = 0
    state: str = field(default_factory=lambda: secrets.token_hex(16))
    _server: HTTPServer | None = None
    _result: dict = field(default_factory=dict)
    _done: threading.Event = field(default_factory=threading.Event)

    def start(self) -> str:
        capture = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                url = urlparse(self.path)
                if url.path != "/callback":
                    self.send_error(404)
                    return
                try:
                    capture._result["code"] = parse_callback(url.query, capture.state)
                    body, status = b"Authorized. You can close this tab.", 200
                except Exception as e:  # noqa: BLE001 — surfaced to wait()
                    capture._result["error"] = e
                    body, status = str(e).encode(), 400
                self.send_response(status)
                self.send_header("Content-Type", "text/plain")
                self.end_headers()
                self.wfile.write(body)
                capture._done.set()

            def log_message(self, *args) -> None:  # silence stderr
                pass

        self._server = HTTPServer(("127.0.0.1", self.port), Handler)
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return f"http://localhost:{self._server.server_address[1]}/callback"

    def wait(self, timeout: float | None = 60.0) -> str:
        assert self._server is not None, "call start() first"
        try:
            if not self._done.wait(timeout):
                raise TimeoutError("no authorization callback received")
            if "error" in self._result:
                raise self._result["error"]
            return self._result["code"]
        finally:
            self._server.shutdown()
            self._server.server_close()


def capture_auth_code(
    client_id: str,
    open_url,
    port: int = 0,
    timeout: float | None = 60.0,
) -> str:
    """End-to-end bootstrap: builds the consent URL, hands it to
    ``open_url`` (``webbrowser.open`` interactively; a loopback driver in
    tests), and blocks until the redirect delivers a validated code.  The
    code then feeds the authorization-code grant (TOKEN_URL form POST with
    redirect_uri + client credentials — reference login.py:47-52), which is
    ``auth.py``'s exchange."""
    cap = AuthCodeCapture(port=port)
    redirect_uri = cap.start()
    open_url(authorize_url(client_id, redirect_uri, cap.state))
    return cap.wait(timeout)
