"""HTTP client for the VerseCrafter-TPU API server (bpy-free, stdlib only).

Covers the reference addon's transport tricks
(/root/reference/blender_addon/operators.py:80-349): cookie headers,
TLS-verify opt-out, HTML-response detection (proxy login pages), chunked +
base64 upload fallbacks for proxies that block large POSTs, and base64
downloads.
"""

from __future__ import annotations

import base64
import json
import ssl
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import Callable, Optional


class ApiClient:
    def __init__(self, base_url: str, cookie: str = "", verify_tls: bool = True,
                 timeout: float = 60.0):
        self.base = base_url.rstrip("/")
        self.cookie = cookie
        self.timeout = timeout
        self.ctx = None
        if not verify_tls:
            self.ctx = ssl.create_default_context()
            self.ctx.check_hostname = False
            self.ctx.verify_mode = ssl.CERT_NONE

    def _open(self, req):
        return urllib.request.urlopen(req, timeout=self.timeout, context=self.ctx)

    def _headers(self, extra=None):
        h = {"User-Agent": "versecrafter-blender"}
        if self.cookie:
            h["Cookie"] = self.cookie
        h.update(extra or {})
        return h

    def _json_or_raise(self, raw: bytes) -> dict:
        text = raw.decode("utf-8", "replace")
        if text.lstrip()[:1] == "<":
            raise RuntimeError(
                "server returned HTML (proxy login page?) — check the URL "
                "and proxy cookie")
        return json.loads(text)

    def get(self, path: str, **query) -> dict:
        url = f"{self.base}{path}"
        if query:
            url += "?" + urllib.parse.urlencode(query)
        req = urllib.request.Request(url, headers=self._headers())
        with self._open(req) as r:
            return self._json_or_raise(r.read())

    def post(self, path: str, payload: Optional[dict] = None,
             raw: Optional[bytes] = None, **query) -> dict:
        url = f"{self.base}{path}"
        if query:
            url += "?" + urllib.parse.urlencode(query)
        data = raw if raw is not None else json.dumps(payload or {}).encode()
        hdr = {} if raw is not None else {"Content-Type": "application/json"}
        req = urllib.request.Request(url, data=data, headers=self._headers(hdr))
        with self._open(req) as r:
            return self._json_or_raise(r.read())

    # -- files -----------------------------------------------------------
    def upload(self, local_path: str, remote_name: str,
               chunk_size: int = 1 << 20) -> dict:
        """POST upload; falls back to chunked, then base64-GET."""
        with open(local_path, "rb") as f:
            data = f.read()
        try:
            return self.post("/api/upload", raw=data, filename=remote_name)
        except (urllib.error.HTTPError, urllib.error.URLError):
            pass
        try:
            uid = f"u{int(time.time() * 1e3):x}"
            total = (len(data) + chunk_size - 1) // chunk_size
            for i in range(total):
                self.post("/api/upload_chunk",
                          raw=data[i * chunk_size:(i + 1) * chunk_size],
                          upload_id=uid, index=i, total=total,
                          filename=remote_name)
            return self.post("/api/upload_complete",
                             payload={"upload_id": uid, "filename": remote_name})
        except (urllib.error.HTTPError, urllib.error.URLError):
            pass
        # base64-GET fallback (query-length bound: small pieces, append mode)
        piece = 4096
        for off in range(0, len(data), piece):
            self.get("/api/upload_base64_get", filename=remote_name,
                     data=base64.b64encode(data[off:off + piece]).decode(),
                     append="1" if off else "0")
        return {"filename": remote_name, "size": len(data)}

    def download(self, remote_name: str, local_path: str,
                 chunked: bool = False) -> str:
        if not chunked:
            url = f"{self.base}/api/download/" + urllib.parse.quote(
                remote_name, safe="")
            req = urllib.request.Request(url, headers=self._headers())
            with self._open(req) as r:
                blob = r.read()
        else:
            blob = b""
            off = 0
            while True:
                st = self.get("/api/download_chunk/"
                              + urllib.parse.quote(remote_name, safe=""),
                              offset=off, size=1 << 20)
                blob += base64.b64decode(st["data"])
                if st["done"]:
                    break
                off += 1 << 20
        with open(local_path, "wb") as f:
            f.write(blob)
        return local_path

    # -- tasks -----------------------------------------------------------
    def start(self, kind: str, **params) -> str:
        return self.get(f"/api/{kind}_get", **params)["task_id"]

    def poll(self, task_id: str, on_progress: Optional[Callable] = None,
             interval: float = 3.0, timeout: float = 3600.0) -> dict:
        t0 = time.time()
        while time.time() - t0 < timeout:
            st = self.get(f"/api/status/{task_id}")
            if on_progress:
                on_progress(st)
            if st["status"] in ("COMPLETED", "FAILED"):
                return st
            time.sleep(interval)
        raise TimeoutError(task_id)

    def health(self) -> dict:
        return self.get("/api/health")
