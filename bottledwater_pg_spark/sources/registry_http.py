"""Confluent schema-registry HTTP transport — the R3 wire protocol the
reference speaks (/root/reference/kafka/registry.c:93-138 POSTs each
schema to ``/subjects/{topic}-{key|value}/versions`` and reads back a
32-bit id; framing at registry.c:63-87).

Two halves, both stdlib-only:

* :class:`HttpSchemaRegistry` — the CLIENT. Same interface as
  ``registry_client.LocalSchemaRegistry`` (register / latest / by_id
  / subjects / versions / snapshot), but over HTTP with the
  Confluent v1 content type. Works against a real Confluent registry
  or against the bundled server below.
* :func:`serve_registry` — a minimal in-process SERVER implementing
  the subset of the Confluent REST API the client (and the
  reference's producer) uses, backed by a ``LocalSchemaRegistry``
  state dir. It exists so the HTTP path is RUNTIME-TESTED in this
  offline image (loopback sockets need no network); in production
  the same client simply points at the real registry URL.

Ids are the local registry's deterministic content ids — any 32-bit
id is Confluent-frame-compatible, and content ids need no
coordination across a 1000-executor producer fleet.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.parse
import urllib.request

CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"


class HttpSchemaRegistry:
    """Client for the Confluent REST API (v1 subset)."""

    def __init__(self, base_url: str, timeout: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def _get(self, path: str):
        req = urllib.request.Request(self.base_url + path)
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read().decode("utf-8"))

    def register(self, subject: str, schema: object) -> int:
        """POST /subjects/{subject}/versions (registry.c:97-110: the
        schema rides JSON-escaped under the ``schema`` key; the
        response's ``id`` prefixes every message)."""
        body = json.dumps({"schema": json.dumps(schema)}).encode("utf-8")
        req = urllib.request.Request(
            f"{self.base_url}/subjects/"
            f"{urllib.parse.quote(subject, safe='')}/versions",
            data=body,
            headers={"Content-Type": CONTENT_TYPE},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return int(json.loads(r.read().decode("utf-8"))["id"])

    def by_id(self, sid: int) -> object | None:
        try:
            got = self._get(f"/schemas/ids/{int(sid)}")
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise
        return json.loads(got["schema"])

    def latest(self, subject: str) -> dict | None:
        try:
            got = self._get(
                f"/subjects/{urllib.parse.quote(subject, safe='')}"
                "/versions/latest"
            )
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise
        return {
            "version": got["version"],
            "id": got["id"],
            "schema": json.loads(got["schema"]),
        }

    def subjects(self) -> list[str]:
        return list(self._get("/subjects"))

    def versions(self, subject: str) -> list[dict]:
        out = []
        quoted = urllib.parse.quote(subject, safe="")
        try:
            nums = self._get(f"/subjects/{quoted}/versions")
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return []
            raise
        for n in nums:
            got = self._get(f"/subjects/{quoted}/versions/{n}")
            out.append(
                {
                    "version": got["version"],
                    "id": got["id"],
                    "schema": json.loads(got["schema"]),
                }
            )
        return out

    def snapshot(self) -> dict[int, object]:
        """Every registered schema by id — the driver-side map a
        consumer ships to executors for per-frame resolution."""
        out: dict[int, object] = {}
        for s in self.subjects():
            for v in self.versions(s):
                out[int(v["id"])] = v["schema"]
        return out


def serve_registry(state_dir: str, host: str = "127.0.0.1", port: int = 0):
    """Start the in-process registry server over a
    ``LocalSchemaRegistry`` state dir. Returns ``(server, url)``;
    call ``server.shutdown()`` when done. Daemon-threaded — callers
    never block on it at exit."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from bottledwater_pg_spark.sources.registry_client import (
        LocalSchemaRegistry,
    )

    reg = LocalSchemaRegistry(state_dir)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: object) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", CONTENT_TYPE)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        # the server is user-reachable (CLI `serve-registry`), so
        # malformed input must come back as a JSON error, never as an
        # uncaught exception that resets the connection: 422 mirrors
        # Confluent's 422xx invalid-schema/invalid-version family,
        # anything else unexpected is a 500 with the message attached
        def do_POST(self):  # noqa: N802 — http.server API
            try:
                self._post()
            except (ValueError, KeyError, TypeError,
                    UnicodeDecodeError) as exc:
                self._send(422, {"error_code": 42201,
                                 "message": f"invalid request: {exc}"})
            except Exception as exc:  # pragma: no cover — safety net
                self._send(500, {"error_code": 50001, "message": str(exc)})

        def do_GET(self):  # noqa: N802
            try:
                self._get()
            except (ValueError, KeyError, TypeError) as exc:
                self._send(422, {"error_code": 42202,
                                 "message": f"invalid request: {exc}"})
            except Exception as exc:  # pragma: no cover — safety net
                self._send(500, {"error_code": 50001, "message": str(exc)})

        def _post(self):
            parts = [p for p in self.path.split("/") if p]
            if len(parts) == 3 and parts[0] == "subjects" \
                    and parts[2] == "versions":
                subject = urllib.parse.unquote(parts[1])
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n).decode("utf-8"))
                if not isinstance(req, dict) or "schema" not in req:
                    raise KeyError("body must be a JSON object with 'schema'")
                schema = json.loads(req["schema"])
                self._send(200, {"id": reg.register(subject, schema)})
                return
            self._send(404, {"error_code": 404, "message": "not found"})

        def _get(self):
            parts = [p for p in self.path.split("/") if p]
            if parts == ["subjects"]:
                self._send(200, reg.subjects())
                return
            if len(parts) >= 2 and parts[0] == "subjects":
                subject = urllib.parse.unquote(parts[1])
                versions = reg.versions(subject)
                if len(parts) == 3 and parts[2] == "versions":
                    if not versions:
                        self._send(404, {"error_code": 40401,
                                         "message": "subject not found"})
                        return
                    self._send(200, [v["version"] for v in versions])
                    return
                if len(parts) == 4 and parts[2] == "versions":
                    # Confluent distinguishes the two 404s: a missing
                    # SUBJECT is 40401 even on a /versions/<v> lookup;
                    # 40402 is only "this subject exists but has no
                    # such version"
                    if not versions:
                        self._send(404, {"error_code": 40401,
                                         "message": "subject not found"})
                        return
                    pick = None
                    if parts[3] == "latest":
                        pick = versions[-1]
                    else:
                        want = int(parts[3])  # non-integer → 422 42202
                        for v in versions:
                            if v["version"] == want:
                                pick = v
                    if pick is None:
                        self._send(404, {"error_code": 40402,
                                         "message": "version not found"})
                        return
                    self._send(
                        200,
                        {
                            "subject": subject,
                            "version": pick["version"],
                            "id": pick["id"],
                            "schema": json.dumps(pick["schema"]),
                        },
                    )
                    return
            if len(parts) == 3 and parts[:2] == ["schemas", "ids"]:
                schema = reg.by_id(int(parts[2]))
                if schema is None:
                    self._send(404, {"error_code": 40403,
                                     "message": "schema not found"})
                    return
                self._send(200, {"schema": json.dumps(schema)})
                return
            self._send(404, {"error_code": 404, "message": "not found"})

    server = ThreadingHTTPServer((host, port), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, f"http://{host}:{server.server_address[1]}"
