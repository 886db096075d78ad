"""Key tools: local key wrapping, PKMT1 key-material envelopes, and
CryptoFactory interop in both directions.

Reference surface: parquet-hadoop crypto/keytools — KeyToolkit.java
encryptKeyLocally/decryptKeyLocally, LocalWrapKmsClient.java (AAD =
master key id), KeyMaterial.java, PropertiesDrivenCryptoFactory
(single-wrap mode). Interop peer: pyarrow's CryptoFactory (arrow C++
parquet encryption) with ``double_wrapping=False`` and a KMS client that
wraps exactly like KeyToolkit — giving byte-level proof our PARE files
and key-material JSON are what a spec reader expects.
"""

from __future__ import annotations

import numpy as np
import pytest

from pq_engine.interop.parquet_keytools import (
    encrypt_parquet_keytools,
    key_material,
    parse_key_material,
    resolve_file_keys,
    unwrap_from_material,
    unwrap_key_locally,
    wrap_key_locally,
)
from pq_engine.interop.parquet_writer import write_parquet
from pq_engine.kernels.ragged import RaggedBytes

MASTER = {"kf": b"0123456789012345", "kc": b"abcdefghijklmnop"}


def _ragged(strs):
    offs = np.zeros(len(strs) + 1, np.int64)
    for i, s in enumerate(strs):
        offs[i + 1] = offs[i] + len(s)
    return RaggedBytes(offs, np.frombuffer(b"".join(strs), np.uint8))


def _plain_file(tmp_path, n=2000):
    path = str(tmp_path / "plain.parquet")
    write_parquet(path, [
        {"name": "id", "ptype": "int64", "codec": "plain",
         "values": np.arange(n, dtype=np.int64)},
        {"name": "tag", "ptype": "string", "codec": "plain",
         "values": _ragged([f"t{i % 7}".encode() for i in range(n)])},
    ], n)
    return open(path, "rb").read(), n


def test_wrap_unwrap_roundtrip_and_aad_binding():
    dek = bytes(range(16))
    wrapped = wrap_key_locally(dek, MASTER["kf"], "kf")
    assert unwrap_key_locally(wrapped, MASTER["kf"], "kf") == dek
    # the GCM tag binds the master key AND the key id (LocalWrapKmsClient
    # uses the id as AAD) — either being wrong must fail loudly
    with pytest.raises(ValueError, match="unwrap failed"):
        unwrap_key_locally(wrapped, MASTER["kc"], "kf")
    with pytest.raises(ValueError, match="unwrap failed"):
        unwrap_key_locally(wrapped, MASTER["kf"], "other-id")


def test_key_material_envelope_and_scope_refusals():
    km = key_material("kf", wrap_key_locally(b"x" * 16, MASTER["kf"], "kf"),
                      True)
    d = parse_key_material(km)
    assert d["masterKeyID"] == "kf" and d["isFooterKey"] is True
    assert unwrap_from_material(km, MASTER) == b"x" * 16
    with pytest.raises(ValueError, match="unknown master key id"):
        unwrap_from_material(km, {"zz": b"q" * 16})
    import json
    bad = dict(d, doubleWrapping=True)
    with pytest.raises(ValueError, match="double wrapping"):
        parse_key_material(json.dumps(bad).encode())
    bad = dict(d, keyMaterialType="PKMT2")
    with pytest.raises(ValueError, match="key material type"):
        parse_key_material(json.dumps(bad).encode())


def test_keytools_self_roundtrip(tmp_path):
    """encrypt with master keys only -> resolve keys from the file itself
    -> native filtered read; no raw DEK ever crosses the API."""
    from pq_engine.interop.parquet_reader import read_parquet_filtered_pandas

    plain, n = _plain_file(tmp_path)
    enc = encrypt_parquet_keytools(plain, MASTER, "kf", {"tag": "kc"})
    fkey, ckeys = resolve_file_keys(enc, MASTER)
    assert set(ckeys) == {"tag"}
    df, _ = read_parquet_filtered_pandas(
        enc, ("ge", "id", 0), footer_key=fkey, column_keys=ckeys)
    assert len(df) == n and int(df["id"].sum()) == n * (n - 1) // 2
    assert sorted(df["tag"].unique()) == [f"t{i}" for i in range(7)]
    # wrong master key set refuses at unwrap, before any data decrypt
    with pytest.raises(ValueError, match="unwrap failed"):
        resolve_file_keys(enc, {"kf": MASTER["kc"], "kc": MASTER["kf"]})


def _crypto_factory():
    pe = pytest.importorskip("pyarrow.parquet.encryption")

    class Kms(pe.KmsClient):
        def __init__(self, config):
            pe.KmsClient.__init__(self)

        def wrap_key(self, key_bytes, master_key_identifier):
            return wrap_key_locally(
                key_bytes, MASTER[master_key_identifier],
                master_key_identifier)

        def unwrap_key(self, wrapped_key, master_key_identifier):
            return unwrap_key_locally(
                wrapped_key, MASTER[master_key_identifier],
                master_key_identifier)

    return pe, pe.CryptoFactory(lambda c: Kms(c)), pe.KmsConnectionConfig()


def test_pyarrow_reads_our_keytools_file(tmp_path):
    """Direction B: arrow C++ (CryptoFactory + our KeyToolkit-compatible
    KMS client) opens OUR PARE file — footer key material in
    FileCryptoMetaData, column key material in each chunk's
    ENCRYPTION_WITH_COLUMN_KEY, encrypted_column_metadata present,
    compressed_page_size = ciphertext module length (the spec
    convention)."""
    import pyarrow.parquet as papq
    pe, cf, kcfg = _crypto_factory()

    plain, n = _plain_file(tmp_path)
    enc = encrypt_parquet_keytools(plain, MASTER, "kf", {"tag": "kc"})
    p = str(tmp_path / "ours.parquet")
    open(p, "wb").write(enc)
    got = papq.ParquetFile(
        p, decryption_properties=cf.file_decryption_properties(kcfg)).read()
    assert got.num_rows == n
    assert got.column("id").to_pylist() == list(range(n))
    assert got.column("tag")[5].as_py() == "t5"


def test_we_read_pyarrow_cryptofactory_file(tmp_path):
    """Direction A: a pyarrow CryptoFactory-encrypted file (column-key
    subset => the unlisted column is PLAINTEXT in arrow's contract) is
    fully readable from the file + master keys alone via
    resolve_file_keys + the native filtered reader."""
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as papq
    pe, cf, kcfg = _crypto_factory()

    from pq_engine.interop.parquet_reader import read_parquet_filtered_pandas

    n = 2000
    tab = pa.table({"id": np.arange(n, dtype=np.int64),
                    "tag": [f"t{i % 7}" for i in range(n)]})
    ec = pe.EncryptionConfiguration(
        footer_key="kf", column_keys={"kc": ["tag"]}, double_wrapping=False)
    p = str(tmp_path / "arrow.parquet")
    with papq.ParquetWriter(
            p, tab.schema,
            encryption_properties=cf.file_encryption_properties(
                kcfg, ec)) as w:
        w.write_table(tab)
    buf = open(p, "rb").read()
    fkey, ckeys = resolve_file_keys(buf, MASTER)
    assert set(ckeys) == {"tag"}
    df, _ = read_parquet_filtered_pandas(
        buf, ("lt", "id", 100), footer_key=fkey, column_keys=ckeys)
    assert len(df) == 100 and df["tag"].iloc[5] == "t5"
