"""Real SMTP client behind the email AlertIO seam.

Reference: `alert/AlertMailer.java` — sendToAddress/sendToCatchall
build a message with subject = alert summary, text body =
Alert.assemblePayload() (payload + metadata footer,
`Alert.java:86-98`), optional HTML body from the alert's email
template (`AlertMailer.java:113-127`), and submit over an
authenticated STARTTLS session to the configured relay
(`AlertMailer.java:57-100`: mail.smtp.auth + starttls, port 587,
credentials `user:pass` from RuntimeSecrets — invalid credential
format and every MessagingException are log-and-continue, never a
pipeline error).

Spark mapping: like the iprepd/minFraud clients
(`functions/iprepd_client.py`), delivery rides the executor-side
emitter map of `sinks/output.py` (foreachPartition) — an alert storm
must not funnel through the driver. stdlib smtplib/email only; tests
exercise the full client against a local SMTP server.
"""

from __future__ import annotations

import smtplib
from collections.abc import Callable
from email.message import EmailMessage

SMTP_TIMEOUT_SECONDS = 5.0


def parse_smtp_creds(
    spec: str, gcs_fetch=None, kms_decrypt=None
) -> tuple[str, str] | None:
    """`user:pass` (RuntimeSecrets-wrapped allowed) -> (user, pass);
    None on an invalid format — the reference logs and skips the send
    rather than failing the bundle (`AlertMailer.java:59-63`)."""
    from ..sinks.output import interpret_secret

    buf = interpret_secret(spec, gcs_fetch=gcs_fetch,
                           kms_decrypt=kms_decrypt)
    parts = buf.split(":")
    if len(parts) != 2:
        return None
    return parts[0], parts[1]


def assemble_payload(alert: dict) -> str:
    """`Alert.assemblePayload` (`Alert.java:86-98`): payload plus a
    `key = value` metadata footer. Alert-JSON metadata is a map here
    (insertion-ordered like the reference's ArrayList)."""
    ret = alert.get("payload") or ""
    meta = alert.get("metadata")
    if meta:
        ret += "\n\nAlert metadata:\n"
        for k, v in meta.items():
            ret += f"{k} = {v}\n"
    return ret


class SmtpMailer:
    """`alert/AlertMailer.java` with the reference's degradation
    semantics: every failure path (bad credentials, connect/auth/send
    errors) returns False, never raises."""

    def __init__(
        self,
        relay: str,
        creds: str | None,
        from_addr: str,
        port: int = 587,
        starttls: bool = True,
        timeout: float = SMTP_TIMEOUT_SECONDS,
        body_renderer: Callable[[dict], str | None] | None = None,
        gcs_fetch=None,
        kms_decrypt=None,
    ) -> None:
        self.relay = relay
        self.port = port
        self.from_addr = from_addr
        self.starttls = starttls
        self.timeout = timeout
        # createAlertMailBody: template-rendered HTML alternative, or
        # None for text-only (`AlertMailer.java:113-127`)
        self._render = body_renderer or (lambda alert: None)
        self._auth = (
            parse_smtp_creds(creds, gcs_fetch=gcs_fetch,
                             kms_decrypt=kms_decrypt)
            if creds is not None else None
        )
        self._creds_given = creds is not None

    def send_mail(
        self,
        recipients: list[str],
        subject: str,
        text_body: str,
        html_body: str | None = None,
    ) -> bool:
        """`AlertMailer.sendMail` — one MIME message, text part plus
        optional HTML alternative."""
        if self._creds_given and self._auth is None:
            # "invalid SMTP credentials specified" — skip the send
            return False
        msg = EmailMessage()
        msg["From"] = self.from_addr
        msg["To"] = ", ".join(recipients)
        msg["Subject"] = subject
        msg.set_content(text_body)
        if html_body is not None:
            msg.add_alternative(html_body, subtype="html")
        try:
            with smtplib.SMTP(self.relay, self.port,
                              timeout=self.timeout) as smtp:
                smtp.ehlo()
                if self.starttls and smtp.has_extn("starttls"):
                    smtp.starttls()
                    smtp.ehlo()
                if self._auth is not None:
                    smtp.login(*self._auth)
                smtp.send_message(msg)
            return True
        except (smtplib.SMTPException, OSError):
            return False

    def send_to_address(self, alert: dict, address: str) -> bool:
        """`AlertMailer.sendToAddress` — subject is the summary, text
        body is the assembled payload, HTML from the template seam."""
        return self.send_mail(
            [address],
            alert.get("summary") or "",
            assemble_payload(alert),
            self._render(alert),
        )

    def send_to_catchall(self, alert: dict, catchall: str | None) -> bool:
        """`AlertMailer.sendToCatchall` — no configured catchall is a
        silent no-op (returns True: nothing to do is not a failure)."""
        if catchall is None:
            return True
        return self.send_to_address(alert, catchall)


def email_alert_emitter(
    relay: str,
    creds: str | None,
    from_addr: str,
    catchall: str | None = None,
    port: int = 587,
    starttls: bool = True,
    body_renderer: Callable[[dict], str | None] | None = None,
    gcs_fetch=None,
    kms_decrypt=None,
):
    """A CompositeOutput emitter (executor-side foreachPartition) for
    the email AlertIO leg — the per-line twin of
    `AlertIO.WriteFn.processElement` (`AlertIO.java:187-223`):

    - non-JSON / field-incomplete lines are dropped (hasCorrectFields);
    - ``alertio_ignore_event`` metadata skips the alert entirely;
    - the catchall address always receives a copy;
    - ``notify_email_direct`` metadata also sends to that address.

    One mailer per partition batch; each message submits on its own
    SMTP session, exactly the reference's Transport.send behavior.
    """

    def emit(lines: list[str]) -> None:
        import json as _json

        mailer = SmtpMailer(
            relay, creds, from_addr, port=port, starttls=starttls,
            body_renderer=body_renderer, gcs_fetch=gcs_fetch,
            kms_decrypt=kms_decrypt,
        )
        for line in lines:
            try:
                alert = _json.loads(line)
            except ValueError:
                continue
            if not isinstance(alert, dict):
                continue
            # hasCorrectFields (Alert.java:73-78) checks ONLY summary:
            # non-null AND non-empty (the reference rejects
            # summary.isEmpty()). The category/alert_id/timestamp null
            # checks below are THIS port's guard for raw-JSON dicts —
            # the reference never sees nulls there because the Alert
            # constructor defaults them during deserialization.
            if alert.get("summary") is None or alert.get("summary") == "":
                continue
            if any(
                alert.get(k) is None for k in
                ("category", "alert_id", "timestamp")
            ):
                continue
            meta = alert.get("metadata") or {}
            if not isinstance(meta, dict):
                continue
            if meta.get("alertio_ignore_event") is not None:
                continue
            if catchall is not None:
                mailer.send_to_catchall(alert, catchall)
            direct = meta.get("notify_email_direct")
            if direct:
                mailer.send_to_address(alert, direct)

    return emit
