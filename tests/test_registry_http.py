"""HTTP schema-registry transport (registry_http.py): the Confluent
REST wire the reference speaks (kafka/registry.c:93-138), exercised
END-TO-END over loopback — client POST/GET against the in-process
server, parity with the file-backed registry, and the full
publish-with-ids → decode-by-id Spark round-trip through the HTTP
client."""

from __future__ import annotations

import pytest

from bottledwater_pg_spark.session import load_table
from bottledwater_pg_spark.sources.registry_client import (
    LocalSchemaRegistry,
    decode_with_registry,
    frames_with_registry,
    schema_id_of,
)
from bottledwater_pg_spark.sources.registry_http import (
    HttpSchemaRegistry,
    serve_registry,
)

F1 = [["c_custkey", "long"]]
F2 = [["c_custkey", "long"], ["c_name", "string"]]


@pytest.fixture()
def http_reg(tmp_path):
    server, url = serve_registry(str(tmp_path / "reg"))
    try:
        yield HttpSchemaRegistry(url), LocalSchemaRegistry(
            str(tmp_path / "reg")
        )
    finally:
        server.shutdown()


def test_http_register_returns_content_id_and_versions(http_reg):
    http, local = http_reg
    i1 = http.register("customer-key", F1)
    assert i1 == schema_id_of(F1)  # same deterministic content id
    assert http.register("customer-key", F1) == i1  # idempotent
    i2 = http.register("customer-key", F2)
    assert i2 != i1
    # both transports see the same subject state
    assert http.subjects() == local.subjects() == ["customer-key"]
    hv = http.versions("customer-key")
    lv = local.versions("customer-key")
    assert [(v["version"], v["id"]) for v in hv] == [
        (v["version"], v["id"]) for v in lv
    ]
    assert http.latest("customer-key")["id"] == i2
    assert [tuple(x) for x in http.by_id(i1)] == [tuple(x) for x in F1]
    assert http.by_id(999) is None
    assert http.latest("nope") is None
    assert http.versions("nope") == []
    assert http.snapshot() == {
        int(k): v for k, v in local.snapshot().items()
    }


def test_http_registry_malformed_inputs_get_json_errors(http_reg):
    """The server is user-reachable (CLI serve-registry): malformed
    input must produce a JSON 4xx, never an uncaught exception that
    resets the connection; the 404 error codes follow Confluent
    (40401 subject missing — even via /versions/<v>; 40402 version
    missing on an EXISTING subject)."""
    import json
    import urllib.error
    import urllib.request

    http, _ = http_reg
    base = http.base_url

    def req(path, data=None):
        r = urllib.request.Request(
            base + path, data=data,
            headers={"Content-Type": "application/json"} if data else {},
        )
        try:
            with urllib.request.urlopen(r, timeout=10) as resp:
                return resp.status, json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read().decode())

    # non-JSON POST body
    code, body = req("/subjects/s/versions", b"not json at all")
    assert code == 422 and body["error_code"] == 42201
    # JSON body missing the schema key
    code, body = req("/subjects/s/versions", b'{"nope": 1}')
    assert code == 422 and body["error_code"] == 42201
    # schema key holding invalid JSON
    code, body = req("/subjects/s/versions", b'{"schema": "{oops"}')
    assert code == 422 and body["error_code"] == 42201
    # non-integer version id
    http.register("t-key", F1)
    code, body = req("/subjects/t-key/versions/banana")
    assert code == 422 and body["error_code"] == 42202
    # non-integer schema id
    code, body = req("/schemas/ids/banana")
    assert code == 422 and body["error_code"] == 42202
    # missing SUBJECT on a version lookup -> 40401 (not 40402)
    code, body = req("/subjects/ghost/versions/latest")
    assert code == 404 and body["error_code"] == 40401
    code, body = req("/subjects/ghost/versions/1")
    assert code == 404 and body["error_code"] == 40401
    # existing subject, missing VERSION -> 40402
    code, body = req("/subjects/t-key/versions/99")
    assert code == 404 and body["error_code"] == 40402
    # the server is still healthy after all the bad requests
    assert http.versions("t-key")


def test_http_registry_spark_roundtrip(spark, sf_dir, tmp_path):
    """frames_with_registry registers over HTTP; decode_with_registry
    resolves ids over HTTP — the reference producer/consumer pair with
    the registry actually on the wire."""
    import pandas as pd

    server, url = serve_registry(str(tmp_path / "reg"))
    try:
        http = HttpSchemaRegistry(url)
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_acctbal"
        ).limit(50)
        frames = frames_with_registry(
            cust, ["c_custkey"], ["c_custkey", "c_name", "c_acctbal"],
            http, "customer",
        )
        back = decode_with_registry(frames, http, topic="customer")
        got = back.toPandas().sort_values("c_custkey").reset_index(drop=True)
        want = cust.toPandas().sort_values("c_custkey").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
        # and the file-backed view of the same state dir decodes the
        # same frames — transports are interchangeable
        local = LocalSchemaRegistry(str(tmp_path / "reg"))
        got2 = (
            decode_with_registry(frames, local, topic="customer")
            .toPandas()
            .sort_values("c_custkey")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got2[want.columns.tolist()], want)
    finally:
        server.shutdown()
