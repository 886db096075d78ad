"""parquet-mr key tools — local key wrapping + key-material envelopes.

From-scratch implementation of the reference key-management layer
(parquet-hadoop .../crypto/keytools/KeyToolkit.java:292-319
``encryptKeyLocally``/``decryptKeyLocally``,
LocalWrapKmsClient.java:131-148 (AAD = master key ID),
KeyMaterial.java / PropertiesDrivenCryptoFactory single-wrap mode):

- a random Data Encryption Key (DEK) protects the file; the DEK is
  WRAPPED (AES-GCM, AAD = the master key's identifier) with a long-lived
  MASTER key and stored base64 inside a ``PKMT1`` key-material JSON in
  ``key_metadata`` — the footer's for the footer DEK, each column-key
  chunk's crypto metadata for column DEKs;
- readers resolve keys from the file alone plus the master keys: parse
  the JSON, unwrap the DEK, decrypt.

This is byte-compatible with what pyarrow's ``CryptoFactory`` (arrow C++,
``double_wrapping=False``) produces when its KmsClient wraps the same way
— test-pinned in BOTH directions: we read pyarrow-encrypted files with
only master keys, and pyarrow reads ours.
"""

from __future__ import annotations

import base64
import json
import os

from .parquet_crypto import (
    MOD_FOOTER,
    _aesgcm,
    _decrypt_module,
    _module_aad,
    encrypt_parquet,
    read_crypto_footer,
)
from .thrift_compact import read_struct

NONCE_LEN = 12


def wrap_key_locally(key: bytes, master_key: bytes,
                     master_key_id: str) -> str:
    """KeyToolkit.encryptKeyLocally: AES-GCM(key) under the master key
    with AAD = master key ID bytes -> base64(nonce | ciphertext | tag)."""
    nonce = os.urandom(NONCE_LEN)
    ct = _aesgcm(master_key).encrypt(nonce, key, master_key_id.encode())
    return base64.b64encode(nonce + ct).decode()


def unwrap_key_locally(wrapped: str, master_key: bytes,
                       master_key_id: str) -> bytes:
    """KeyToolkit.decryptKeyLocally (raises ValueError on a wrong master
    key — the GCM tag binds key bytes AND key id)."""
    from cryptography.exceptions import InvalidTag

    raw = base64.b64decode(wrapped)
    try:
        return _aesgcm(master_key).decrypt(
            raw[:NONCE_LEN], raw[NONCE_LEN:], master_key_id.encode())
    except InvalidTag as e:
        raise ValueError(
            f"DEK unwrap failed for master key {master_key_id!r} "
            "(wrong master key?)") from e


def key_material(master_key_id: str, wrapped_dek: str,
                 is_footer_key: bool) -> bytes:
    """The PKMT1 key-material JSON (KeyMaterial.java field set, internal
    storage, single wrapping)."""
    return json.dumps({
        "keyMaterialType": "PKMT1",
        "internalStorage": True,
        "isFooterKey": is_footer_key,
        "kmsInstanceID": "DEFAULT",
        "kmsInstanceURL": "DEFAULT",
        "masterKeyID": master_key_id,
        "wrappedDEK": wrapped_dek,
        "doubleWrapping": False,
    }, separators=(",", ":")).encode()


def parse_key_material(km: bytes) -> dict:
    d = json.loads(km)
    if d.get("keyMaterialType") != "PKMT1":
        raise ValueError(
            f"unsupported key material type {d.get('keyMaterialType')!r}")
    if d.get("doubleWrapping"):
        raise ValueError("double wrapping (KEK layer) is out of scope")
    if not d.get("internalStorage", True):
        raise ValueError("external key material storage is out of scope")
    return d


def unwrap_from_material(km: bytes, master_keys: dict[str, bytes]) -> bytes:
    d = parse_key_material(km)
    mid = d["masterKeyID"]
    if mid not in master_keys:
        raise ValueError(f"unknown master key id {mid!r}")
    return unwrap_key_locally(d["wrappedDEK"], master_keys[mid], mid)


def encrypt_parquet_keytools(
        plain: bytes, master_keys: dict[str, bytes],
        footer_master_id: str,
        column_master_ids: dict[str, str] | None = None,
        aad_mode: str = "spec") -> bytes:
    """Encrypt with freshly generated DEKs wrapped under master keys —
    the PropertiesDrivenCryptoFactory write path. ``column_master_ids``
    maps dotted column paths to master key ids; other columns use the
    footer DEK. The output is readable by pyarrow's CryptoFactory (and by
    :func:`resolve_file_keys` + the native reader) with master keys only.
    """
    column_master_ids = column_master_ids or {}
    footer_dek = os.urandom(16)
    footer_km = key_material(
        footer_master_id,
        wrap_key_locally(footer_dek, master_keys[footer_master_id],
                         footer_master_id),
        True)
    column_keys: dict[str, bytes] = {}
    column_km: dict[str, bytes] = {}
    for path, mid in column_master_ids.items():
        dek = os.urandom(16)
        column_keys[path] = dek
        column_km[path] = key_material(
            mid, wrap_key_locally(dek, master_keys[mid], mid), False)
    return encrypt_parquet(
        plain, footer_dek, column_keys=column_keys, aad_mode=aad_mode,
        key_metadata=footer_km, column_key_metadata=column_km)


def resolve_file_keys(buf: bytes, master_keys: dict[str, bytes],
                      aad_prefix: bytes = b"") -> tuple[bytes, dict]:
    """Resolve (footer_key, column_keys) for an encrypted-footer file from
    its own key-material metadata plus the MASTER keys — the read half of
    the key tools. Works on pyarrow/CryptoFactory files and ours; feed the
    result straight to read_parquet_filtered or decrypt_parquet."""
    info = read_crypto_footer(buf)
    if info["key_metadata"] is None:
        raise ValueError("file carries no key metadata (raw-DEK file?)")
    footer_key = unwrap_from_material(info["key_metadata"], master_keys)
    file_aad = (aad_prefix or info["aad_prefix"]) + info["aad_file_unique"]
    fbytes, _ = _decrypt_module(
        footer_key, buf, info["footer_module_start"],
        _module_aad(file_aad, MOD_FOOTER))
    fmeta, _ = read_struct(fbytes)
    column_keys: dict[str, bytes] = {}
    for rg in fmeta.get(4, []):
        for cc in rg.get(1, []):
            crypto = cc.get(8)
            if crypto is None or 2 not in crypto:
                continue
            path = ".".join(p.decode() for p in crypto[2].get(1, []))
            km = crypto[2].get(2)
            if path in column_keys or km is None:
                continue
            column_keys[path] = unwrap_from_material(km, master_keys)
    return footer_key, column_keys
