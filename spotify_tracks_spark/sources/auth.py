"""Injectable OAuth token lifecycle for the REST source — the engine-side
mirror of the reference's driver credential flow
(flows/pull_recent_tracks.py:73-109: check_token → get_token →
store_tokens), with every external dependency injected so the whole path
runs offline:

- ``TokenStore``       where (access, refresh) live.  The reference keeps
                       them in a secret manager; tests use the in-memory
                       store.  NO secret material belongs in this repo.
- ``Transport``        one callable ``(method, url, headers, data) ->
                       (status, body)`` standing in for HTTP.
- ``TokenProvider``    check (GET the probe URL with the bearer; 200 =
                       valid) → refresh (POST the token endpoint with the
                       refresh grant) → store (persist the new pair, and
                       the rotated refresh token only when one is issued —
                       the reference deliberately keeps its original
                       refresh token, :104-106).
- ``authorized_fetcher``  adapts a provider into the ``Fetcher`` shape
                       ``sources/rest.py`` consumes, retrying exactly once
                       on a mid-pagination 401 (expiry between check and
                       fetch) with a forced refresh.

This is driver-side credential management — it never touches executors;
tokens stay out of closures and plans.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Protocol

Transport = Callable[[str, str, dict, dict | None], tuple[int, dict]]

CHECK_URL = "https://api.spotify.com/v1/me"
TOKEN_URL = "https://accounts.spotify.com/api/token"


class TokenStore(Protocol):
    def load(self) -> tuple[str, str]:
        """Return (access_token, refresh_token)."""
        ...

    def save(self, access: str, refresh: str) -> None: ...


class InMemoryTokenStore:
    """Test/offline store; a deployment substitutes its secret manager."""

    def __init__(self, access: str, refresh: str) -> None:
        self._access, self._refresh = access, refresh

    def load(self) -> tuple[str, str]:
        return self._access, self._refresh

    def save(self, access: str, refresh: str) -> None:
        self._access, self._refresh = access, refresh


class RefreshError(RuntimeError):
    """Token endpoint returned non-200 — credentials need re-authorization."""


class TokenProvider:
    """check → refresh → store, with all I/O through ``transport``."""

    def __init__(
        self,
        store: TokenStore,
        transport: Transport,
        client_id: str = "",
        client_secret: str = "",
        check_url: str = CHECK_URL,
        token_url: str = TOKEN_URL,
    ) -> None:
        self._store = store
        self._transport = transport
        self._client_id = client_id
        self._client_secret = client_secret
        self._check_url = check_url
        self._token_url = token_url

    def token(self) -> str:
        """Current access token, refreshed first if the probe rejects it."""
        access, _ = self._store.load()
        status, _body = self._transport(
            "GET", self._check_url, {"Authorization": f"Bearer {access}"}, None
        )
        if status == 200:
            return access
        return self.refresh()

    def refresh(self) -> str:
        """Exchange the refresh token for a fresh access token and store it.

        A rotated refresh token is persisted only when the endpoint issues
        one; otherwise the existing refresh token is kept (the reference's
        behavior — it never overwrites its long-lived refresh token)."""
        _, refresh = self._store.load()
        status, body = self._transport(
            "POST",
            self._token_url,
            {"Content-Type": "application/x-www-form-urlencoded"},
            {
                "grant_type": "refresh_token",
                "refresh_token": refresh,
                "client_id": self._client_id,
                "client_secret": self._client_secret,
            },
        )
        if status != 200:
            raise RefreshError(f"token refresh failed with status {status}")
        access = body["access_token"]
        self._store.save(access, body.get("refresh_token") or refresh)
        return access


def authorized_fetcher(provider: TokenProvider, transport: Transport):
    """A ``sources.rest.Fetcher`` that injects the bearer token and
    retries once on 401 (token expired mid-pagination) after a forced
    refresh; any other non-200 raises."""

    def fetch(url: str) -> dict:
        token = provider.token()
        status, body = transport(
            "GET", url, {"Authorization": f"Bearer {token}"}, None
        )
        if status == 401:
            token = provider.refresh()
            status, body = transport(
                "GET", url, {"Authorization": f"Bearer {token}"}, None
            )
        if status != 200:
            raise RuntimeError(f"GET {url} failed with status {status}")
        return body

    return fetch
