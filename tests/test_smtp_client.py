"""Real SMTP client against a local SMTP server — closes the last
AlertIO output leg with a tested wire client (S14;
`alert/AlertMailer.java` + `AlertIO.java:187-223` semantics), the
same pattern as the r7 iprepd/minFraud local-server tests."""

import base64
import json
import socketserver
import threading

import pytest

from foxsec_pipeline_spark.functions.smtp_client import (
    SmtpMailer,
    assemble_payload,
    email_alert_emitter,
    parse_smtp_creds,
)


class _SmtpHandler(socketserver.StreamRequestHandler):
    """Minimal RFC 5321 conversation: EHLO, AUTH PLAIN/LOGIN, MAIL,
    RCPT, DATA, QUIT. Records (authed_user, from, rcpts, data)."""

    def _reply(self, line: str) -> None:
        self.wfile.write((line + "\r\n").encode())

    def handle(self):  # noqa: C901 - a wire-protocol switch
        srv = self.server
        self._reply("220 localtest ESMTP")
        sender, rcpts, user = None, [], None
        while True:
            raw = self.rfile.readline()
            if not raw:
                return
            line = raw.decode().rstrip("\r\n")
            verb = line.split(" ", 1)[0].upper()
            if verb in ("EHLO", "HELO"):
                self._reply("250-localtest")
                self._reply("250 AUTH PLAIN LOGIN")
            elif verb == "AUTH":
                mech = line.split()[1].upper()
                if mech == "PLAIN":
                    blob = line.split()[2]
                    _, u, p = base64.b64decode(blob).decode().split("\0")
                elif mech == "LOGIN":
                    self._reply("334 VXNlcm5hbWU6")
                    u = base64.b64decode(self.rfile.readline()).decode().strip()
                    self._reply("334 UGFzc3dvcmQ6")
                    p = base64.b64decode(self.rfile.readline()).decode().strip()
                else:
                    self._reply("504 unsupported")
                    continue
                if (u, p) == srv.accept_creds:
                    user = u
                    self._reply("235 ok")
                else:
                    self._reply("535 auth failed")
            elif verb == "MAIL":
                sender = line.split(":", 1)[1].strip()
                self._reply("250 ok")
            elif verb == "RCPT":
                rcpts.append(line.split(":", 1)[1].strip())
                self._reply("250 ok")
            elif verb == "DATA":
                self._reply("354 go")
                buf = []
                while True:
                    dline = self.rfile.readline().decode()
                    if dline.rstrip("\r\n") == ".":
                        break
                    buf.append(dline)
                srv.messages.append(
                    (user, sender, list(rcpts), "".join(buf))
                )
                sender, rcpts = None, []
                self._reply("250 queued")
            elif verb == "RSET":
                sender, rcpts = None, []
                self._reply("250 ok")
            elif verb == "QUIT":
                self._reply("221 bye")
                return
            else:
                self._reply("502 not implemented")


class _SmtpServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True

    def __init__(self):
        super().__init__(("127.0.0.1", 0), _SmtpHandler)
        self.messages: list[tuple] = []
        self.accept_creds = ("mailuser", "mailpass")


@pytest.fixture(scope="module")
def smtp_server():
    srv = _SmtpServer()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _mailer(srv, creds="mailuser:mailpass", **kw):
    kw.setdefault("starttls", False)  # plaintext local server
    return SmtpMailer("127.0.0.1", creds, "foxsec@example.org",
                      port=srv.server_address[1], **kw)


def test_parse_smtp_creds():
    assert parse_smtp_creds("u:p") == ("u", "p")
    assert parse_smtp_creds("nocolon") is None
    assert parse_smtp_creds("a:b:c") is None


def test_assemble_payload_metadata_footer():
    alert = {"payload": "body text",
             "metadata": {"source_address": "10.0.0.1", "k": "v"}}
    assert assemble_payload(alert) == (
        "body text\n\nAlert metadata:\n"
        "source_address = 10.0.0.1\nk = v\n"
    )
    assert assemble_payload({"payload": "p"}) == "p"


def test_send_mail_wire(smtp_server):
    smtp_server.messages.clear()
    m = _mailer(smtp_server)
    ok = m.send_mail(["sec@example.org"], "subj: threshold",
                     "text body here")
    assert ok
    [(user, sender, rcpts, data)] = smtp_server.messages
    assert user == "mailuser"
    assert "foxsec@example.org" in sender
    assert rcpts == ["<sec@example.org>"]
    assert "Subject: subj: threshold" in data
    assert "text body here" in data


def test_send_mail_html_alternative(smtp_server):
    smtp_server.messages.clear()
    m = _mailer(smtp_server,
                body_renderer=lambda a: "<html><b>hi</b></html>")
    alert = {"summary": "s", "payload": "p", "metadata": {}}
    assert m.send_to_address(alert, "x@example.org")
    [(_, _, _, data)] = smtp_server.messages
    assert "multipart/alternative" in data
    assert "text/html" in data


def test_send_mail_failure_paths(smtp_server):
    # invalid credential FORMAT: reference logs and skips
    # ("mail submission failed: invalid SMTP credentials specified")
    m = _mailer(smtp_server, creds="not-a-pair")
    n0 = len(smtp_server.messages)
    assert m.send_mail(["a@b"], "s", "t") is False
    assert len(smtp_server.messages) == n0
    # wrong password: 535 -> False, never raises
    m = _mailer(smtp_server, creds="mailuser:wrong")
    assert m.send_mail(["a@b"], "s", "t") is False
    # connection refused -> False
    dead = SmtpMailer("127.0.0.1", "u:p", "f@e", port=9, starttls=False,
                      timeout=0.5)
    assert dead.send_mail(["a@b"], "s", "t") is False


def test_email_alert_emitter_writefn_semantics(smtp_server):
    """The per-line AlertIO email leg: catchall always, direct on
    notify_email_direct, ignore-field and malformed lines dropped."""
    smtp_server.messages.clear()
    emit = email_alert_emitter(
        "127.0.0.1", "mailuser:mailpass", "foxsec@example.org",
        catchall="catchall@example.org",
        port=smtp_server.server_address[1], starttls=False,
    )
    base = {"summary": "threshold exceeded for 10.1.2.3",
            "category": "httprequest", "alert_id": "id-1",
            "timestamp": "2024-01-01T00:00:00Z",
            "payload": "pl"}
    lines = [
        json.dumps(base),
        json.dumps({**base, "alert_id": "id-2", "metadata":
                    {"notify_email_direct": "oncall@example.org"}}),
        json.dumps({**base, "alert_id": "id-3", "metadata":
                    {"alertio_ignore_event": "true"}}),
        "not json",
        json.dumps({"summary": "incomplete"}),  # hasCorrectFields fail
        # Alert.java:73-78 rejects summary.isEmpty(), not just null
        json.dumps({**base, "alert_id": "id-5", "summary": ""}),
    ]
    emit(lines)
    rcpt_lists = [tuple(r) for (_, _, r, _) in smtp_server.messages]
    # id-1 -> catchall; id-2 -> catchall + direct; id-3/bad -> nothing
    assert rcpt_lists == [
        ("<catchall@example.org>",),
        ("<catchall@example.org>",),
        ("<oncall@example.org>",),
    ]
    directs = [d for (_, _, r, d) in smtp_server.messages
               if r == ["<oncall@example.org>"]]
    assert "threshold exceeded" in directs[0]
    assert "Alert metadata:" in directs[0]
    assert "notify_email_direct = oncall@example.org" in directs[0]


def test_email_emitter_through_composite_output(spark, smtp_server):
    """The full AlertIO email leg end-to-end: alert DataFrame ->
    CompositeOutput foreachPartition (EXECUTOR-side, the default) ->
    real SMTP submissions to the local server — the same wiring a
    deployment uses, `AlertIO.Write.expand` -> WriteFn -> AlertMailer."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from foxsec_pipeline_spark.alert.model import to_alerts
    from foxsec_pipeline_spark.functions.smtp_client import (
        email_alert_emitter,
    )
    from foxsec_pipeline_spark.sinks.output import CompositeOutput

    smtp_server.messages.clear()
    hits = spark.createDataFrame([
        Row(window_start="2024-01-01 00:00:00", source_address="1.2.3.4"),
        Row(window_start="2024-01-01 01:00:00", source_address="5.6.7.8"),
    ]).withColumn("window_start", F.col("window_start").cast("timestamp"))
    alerts = to_alerts(
        hits, category="httprequest", severity="warn",
        summary=F.concat(F.lit("threshold for "), F.col("source_address")),
        metadata_cols=["source_address"],
    )
    out = CompositeOutput(emitters={
        "email": email_alert_emitter(
            "127.0.0.1", "mailuser:mailpass", "foxsec@example.org",
            catchall="catchall@example.org",
            port=smtp_server.server_address[1], starttls=False,
        ),
    })
    out.write_batch(alerts)
    assert len(smtp_server.messages) == 2
    for user, sender, rcpts, data in smtp_server.messages:
        assert user == "mailuser"
        assert rcpts == ["<catchall@example.org>"]
        assert "threshold for " in data
