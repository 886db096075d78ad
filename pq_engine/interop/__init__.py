"""Format-level interop: write real parquet files from pq_engine page bytes.

If pyarrow / DuckDB (independent implementations of the same public format
parquet-java writes) decode our files bit-identically, our encoders are
byte-compatible with the reference — the strongest form of the BASELINE.json
"decoded columns bit-identical to parquet-java's reference decode" criterion.
"""
