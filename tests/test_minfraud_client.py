"""minFraud Insights client against a local http.server + the real
reverse-DNS provider (Minfraud.java / Normalized.insightsEnrichment /
CidrUtil reverse-DNS semantics)."""

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from foxsec_pipeline_spark.functions.minfraud_client import (
    MinfraudClient,
    dns_hostname_provider,
    enrich_insights,
    minfraud_insights_provider,
)


class _FakeMinfraud(BaseHTTPRequestHandler):
    auth_seen: list[str] = []

    def do_POST(self):  # noqa: N802
        self.auth_seen.append(self.headers.get("Authorization", ""))
        body = json.loads(
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
        )
        ip = body.get("device", {}).get("ip_address", "")
        if ip == "10.0.0.9":
            self._send(402, b"")  # insufficient funds -> error path
            return
        risky = ip == "10.0.0.1"
        resp = {
            "id": "t",
            "ip_address": {
                "risk": 99.0 if risky else 0.5,
                "traits": {
                    "is_anonymous": risky,
                    "is_anonymous_vpn": False,
                    "is_hosting_provider": False,
                    "is_legitimate_proxy": False,
                    "is_public_proxy": False,
                    "is_tor_exit_node": risky,
                },
            },
        }
        if "email" in body:
            resp["email"] = {"is_free": True}
        out = json.dumps(resp).encode()
        self._send(200, out)

    def _send(self, code, body):
        self.send_response(code)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _FakeMinfraud)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_get_insights_auth_and_fields(server):
    c = MinfraudClient("123", "key", endpoint=server)
    ir = c.get_insights("10.0.0.1")
    assert ir["ip_address"]["risk"] == 99.0
    assert ir["ip_address"]["traits"]["is_tor_exit_node"] is True
    want = "Basic " + base64.b64encode(b"123:key").decode()
    assert want in _FakeMinfraud.auth_seen
    # email rides along when provided (Minfraud.java:124-126)
    ir = c.get_insights("10.0.0.2", email="a@x.com")
    assert ir.get("email") == {"is_free": True}


def test_get_insights_error_paths(server):
    c = MinfraudClient("123", "key", endpoint=server)
    assert c.get_insights(None) is None          # null ip -> null
    assert c.get_insights("10.0.0.9") is None    # HTTP error -> null
    dead = MinfraudClient("1", "k", endpoint="http://127.0.0.1:1",
                          timeout=0.3)
    assert dead.get_insights("10.0.0.1") is None  # IO error -> null


def test_enrich_insights_dataframe(spark, server):
    df = spark.createDataFrame(
        [("10.0.0.1",), ("10.0.0.2",), ("10.0.0.9",)], "addr string"
    )
    provider = minfraud_insights_provider("123", "key", endpoint=server)
    out = {r.addr: r for r in enrich_insights(df, "addr", provider).collect()}
    assert out["10.0.0.1"].risk_score == 99.0
    assert out["10.0.0.1"].is_tor_exit_node is True
    assert out["10.0.0.2"].risk_score == 0.5
    assert out["10.0.0.2"].is_anonymous is False
    # failed lookup -> nulls, row kept (enrichment never drops)
    assert out["10.0.0.9"].risk_score is None


def test_dns_hostname_provider_real_resolver(spark):
    """socket.gethostbyaddr through the executor-side provider;
    localhost reverse resolution is expected in this container —
    skip-gate if the resolver can't do even that."""
    import socket

    try:
        expected = socket.gethostbyaddr("127.0.0.1")[0]
    except OSError:
        pytest.skip("no reverse resolver in this environment")
    from foxsec_pipeline_spark.functions.enrich import enrich_hostname

    df = spark.createDataFrame(
        [("127.0.0.1",), ("192.0.2.255",)], "addr string"
    )
    out = {r.addr: r.hostname for r in
           enrich_hostname(df, "addr",
                           provider=dns_hostname_provider).collect()}
    assert out["127.0.0.1"] == expected
    # TEST-NET-1 address should not resolve; null, row kept
    assert out["192.0.2.255"] is None
