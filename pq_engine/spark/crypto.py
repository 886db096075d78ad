"""Modular page encryption — the parquet-hadoop crypto analog
(/root/reference/parquet-hadoop/.../crypto/: AesGcmEncryptor/Decryptor,
ModuleCipherFactory module types, AAD = file prefix + module suffix;
column keys per EncryptionPropertiesFactory).

AES-GCM (AEAD) over each page blob with a per-COLUMN key, additional
authenticated data binding the ciphertext to its exact position
``(module_type, split, batch, column, page)`` — a page moved, swapped or
truncated fails authentication, the property the reference's module-AAD
scheme provides. Blob layout: ``12-byte nonce || ciphertext+tag``; the
page's ``compression`` label gains a ``+aes-gcm`` suffix so a decode
without :func:`decrypt_pages` fails loudly instead of mis-decoding.

Columns without a key pass through untouched (the reference's
plaintext-column mode). Masked re-encrypt = rewrite.mask_hash ∘
encrypt_pages.
"""

from __future__ import annotations

import os
import struct

import pandas as pd
from pyspark.sql import DataFrame

from .engine import PAGE_SCHEMA

_SUFFIX = "+aes-gcm"


def available() -> bool:
    """True when the AES-GCM backend (`cryptography`, present in this
    environment but gated per the stub-or-import-try rule) can load."""
    try:
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM  # noqa: F401

        return True
    except ImportError:
        return False


MODULE_DATA_PAGE = 2  # ModuleCipherFactory.ModuleType.DataPage ordinal


def _aad(prefix: bytes, split: int, batch: int, column: str, page: int) -> bytes:
    return (
        prefix
        + bytes([MODULE_DATA_PAGE])
        + struct.pack("<iii", split, batch, page)
        + column.encode()
    )


def encrypt_pages(pages: DataFrame, keys: dict[str, bytes],
                  aad_prefix: bytes = b"") -> DataFrame:
    """Encrypt every page (data, dict, bloom) of the keyed columns."""
    for k in keys.values():
        if len(k) not in (16, 24, 32):
            raise ValueError("AES keys must be 16/24/32 bytes")

    def run(it):
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM

        ciphers = {c: AESGCM(k) for c, k in keys.items()}
        for pdf in it:
            out = pdf.copy()
            datas, comps = [], []
            for r in pdf.itertuples():
                if r.column not in ciphers or r.codec == "rowranges":
                    datas.append(bytes(r.data))
                    comps.append(r.compression)
                    continue
                nonce = os.urandom(12)
                ct = ciphers[r.column].encrypt(
                    nonce,
                    bytes(r.data),
                    _aad(aad_prefix, int(r.split_id), int(r.batch_id), r.column, int(r.page)),
                )
                datas.append(nonce + ct)
                comps.append(r.compression + _SUFFIX)
            out["data"] = datas
            out["compression"] = comps
            out["encoded_bytes"] = [len(d) for d in datas]
            yield out

    return pages.mapInPandas(run, PAGE_SCHEMA)


def decrypt_pages(pages: DataFrame, keys: dict[str, bytes],
                  aad_prefix: bytes = b"") -> DataFrame:
    """Inverse of encrypt_pages; GCM tag verification makes every page
    tamper-evident (wrong key, bit flips, or page swaps all raise)."""

    def run(it):
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM

        ciphers = {c: AESGCM(k) for c, k in keys.items()}
        for pdf in it:
            out = pdf.copy()
            datas, comps, encs, crcs = [], [], [], []
            for r in pdf.itertuples():
                if not r.compression.endswith(_SUFFIX):
                    datas.append(bytes(r.data))
                    comps.append(r.compression)
                    encs.append(int(r.encoded_bytes))
                    crcs.append(int(r.crc32))
                    continue
                if r.column not in ciphers:
                    raise PermissionError(f"no key for encrypted column {r.column!r}")
                blob = bytes(r.data)
                pt = ciphers[r.column].decrypt(
                    blob[:12],
                    blob[12:],
                    _aad(aad_prefix, int(r.split_id), int(r.batch_id), r.column, int(r.page)),
                )
                datas.append(pt)
                comps.append(r.compression[: -len(_SUFFIX)])
                encs.append(len(pt))
                crcs.append(int(r.crc32))
            out["data"] = datas
            out["compression"] = comps
            out["encoded_bytes"] = encs
            out["crc32"] = crcs
            yield out

    return pages.mapInPandas(run, PAGE_SCHEMA)
