"""Slack notification seam with the confirmation-state flow.

Reference: `alert/AlertSlack.java:140-238` — direct messages and
"was this you?" confirmation requests to users, with the pending
alert stored in the KV state plane (keyed by alert id, STATUS=NEW)
so the Slack interaction callback can resolve it later. The Slack
HTTP client itself is a network seam (the reference mocks it in
TestAlertSlack the same way); the state write and the dispatch
logic are real and golden-replayed.
"""

from __future__ import annotations

from collections.abc import Callable

from ..state import State, StateException


def default_alert_body(alert: dict) -> str:
    """`AlertSlack.createAlertBody` fallback format
    (`AlertSlack.java:228-238`) when no slack template is set."""
    return (
        "Foxsec Fraud Detection Alert\n\n%s\n\nalert id: %s"
        % (alert.get("summary"), alert.get("alert_id"))
    )


class AlertSlack:
    """`alert/AlertSlack.java` — the send methods return True only if
    the (pluggable) Slack transport acknowledged the message; any
    missing argument, unconfigured state, state failure, or transport
    error returns False rather than raising (golden
    TestAlertSlack.sendConfirmationAlertToUserBasicTest/StateTest).

    `send` stands in for SlackManager.sendConfirmationRequestToUser /
    sendMessageToChannel: a callable (user_id, alert_id, text) ->
    bool. Tests inject a collector; deployment wires the real client.
    """

    def __init__(
        self,
        state: State | None = None,
        send: Callable[[str, str, str], bool] | None = None,
        body: Callable[[dict], str] = default_alert_body,
    ) -> None:
        self._state = state
        self._send = send or (lambda user, alert_id, text: True)
        self._body = body

    def send_alert_to_user(self, alert: dict | None,
                           user_id: str | None) -> bool:
        """`AlertSlack.java:140-164` — direct message, no state."""
        if alert is None or user_id is None:
            return False
        try:
            return bool(
                self._send(user_id, str(alert.get("alert_id")),
                           self._body(alert))
            )
        except Exception:
            return False

    def send_confirmation_alert_to_user(
        self, alert: dict | None, user_id: str | None
    ) -> bool:
        """`AlertSlack.java:173-207` — store the alert in state with
        STATUS=NEW keyed by its id, then send the confirmation
        request. Mutates the passed alert's metadata like the
        reference (the stored and in-flight alert share the STATUS)."""
        if alert is None or user_id is None:
            return False
        if self._state is None:
            return False
        try:
            c = self._state.new_cursor()
            alert.setdefault("metadata", {})["status"] = "NEW"
            c.set(str(alert["alert_id"]), alert)
        except (StateException, KeyError):
            return False
        try:
            return bool(
                self._send(user_id, str(alert.get("alert_id")),
                           self._body(alert))
            )
        except Exception:
            return False
