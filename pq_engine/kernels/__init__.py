"""Pure-NumPy codec kernels. Each module pairs an ``encode_*`` with a ``decode_*``
that round-trips bit-identically. No Spark imports here — kernels are testable
standalone and run inside Arrow-batched UDF workers."""

from pq_engine.memtune import tune_allocator as _tune

_tune()
