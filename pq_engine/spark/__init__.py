"""Distributed engine: Spark supplies partitioning, shuffle, skew salting and
Arrow batching; the kernels do the bytes. No per-row Python anywhere."""
