"""Runtime-secret encryption: a KMS-shaped local backend.

Reference: `crypto/RuntimeSecrets.java` — secrets arrive as
``cloudkms://<base64>`` tokens (optionally indirected through a
gs:// object) and are decrypted with a symmetric key addressed by
(project, location='global', ring='dataflow', key='dataflow'). The
cloud client itself cannot run in this container; this module
provides the SAME two operations (encrypt -> base64 token,
decrypt(base64 token) -> plaintext) over stdlib primitives so the
whole secret path — spec parsing, gs:// indirection, cloudkms://
dispatch, decrypt, downstream client wiring — is REAL and locally
tested. Deployment swaps `LocalKms` for a cloud-KMS-backed twin with
the same interface; every consumer goes through the `kms_decrypt`
callable seam of `interpret_secret` either way.

Scheme (all public, stdlib-only): HMAC-SHA256-CTR encryption with an
encrypt-then-MAC tag —
    enc_key = HMAC(key, b"enc"); mac_key = HMAC(key, b"mac")
    keystream_i = HMAC(enc_key, nonce || i_be64)
    token = b64( b"\\x01" || nonce(16) || ct || HMAC(mac_key, hdr||nonce||ct)[:32] )
Authenticated decryption rejects any tampered token before touching
the plaintext (constant-time compare).
"""

from __future__ import annotations

import base64
import hmac
import os
from hashlib import sha256

_VERSION = b"\x01"
_NONCE_LEN = 16
_TAG_LEN = 32


class KmsError(Exception):
    """Invalid token, wrong key, or tampered ciphertext."""


def _derive(key: bytes, label: bytes) -> bytes:
    return hmac.new(key, label, sha256).digest()


def _keystream(enc_key: bytes, nonce: bytes, n: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hmac.new(enc_key, nonce + i.to_bytes(8, "big"), sha256).digest()
        i += 1
    return bytes(out[:n])


class LocalKms:
    """The RuntimeSecrets key object (`RuntimeSecrets.java:38-84`):
    encrypt/decrypt against one symmetric key. Key addressing mirrors
    the reference's fixed ring/key convention; the material comes
    from a local keystore mapping (or a single key), never from the
    environment of the running query."""

    def __init__(self, key: bytes | str,
                 project: str | None = None,
                 ring: str = "dataflow",
                 key_name: str = "dataflow") -> None:
        if isinstance(key, str):
            key = key.encode("utf-8")
        if len(key) < 16:
            raise KmsError("key material too short (need >= 16 bytes)")
        self.key_path = (project, "global", ring, key_name)
        self._enc = _derive(key, b"enc")
        self._mac = _derive(key, b"mac")

    def encrypt(self, plaintext: str) -> str:
        """-> base64 token (the reference returns base64 of the KMS
        ciphertext, `RuntimeSecrets.java:60-68`)."""
        pt = plaintext.encode("utf-8")
        nonce = os.urandom(_NONCE_LEN)
        ct = bytes(
            a ^ b for a, b in zip(pt, _keystream(self._enc, nonce, len(pt)))
        )
        tag = hmac.new(self._mac, _VERSION + nonce + ct, sha256).digest()
        return base64.b64encode(_VERSION + nonce + ct + tag).decode("ascii")

    def decrypt(self, token: str) -> str:
        """base64 token -> plaintext; raises KmsError on anything
        malformed or unauthenticated."""
        try:
            raw = base64.b64decode(token.encode("ascii"), validate=True)
        except Exception as exc:
            raise KmsError("token is not valid base64") from exc
        if len(raw) < 1 + _NONCE_LEN + _TAG_LEN or raw[:1] != _VERSION:
            raise KmsError("token too short or unknown version")
        nonce = raw[1:1 + _NONCE_LEN]
        ct, tag = raw[1 + _NONCE_LEN:-_TAG_LEN], raw[-_TAG_LEN:]
        want = hmac.new(self._mac, _VERSION + nonce + ct, sha256).digest()
        if not hmac.compare_digest(tag, want):
            raise KmsError("token authentication failed")
        pt = bytes(
            a ^ b for a, b in zip(ct, _keystream(self._enc, nonce, len(ct)))
        )
        return pt.decode("utf-8")


def kms_decrypt_provider(key: bytes | str, project: str | None = None):
    """The `kms_decrypt` callable for `interpret_secret` — the twin of
    RuntimeSecrets.interpretSecret's cloudkms:// branch
    (`RuntimeSecrets.java:113-128`: ring/key fixed to 'dataflow')."""
    kms = LocalKms(key, project=project)
    return kms.decrypt
