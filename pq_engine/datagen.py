"""Deterministic synthetic Common-Crawl-style web-page table (FIXTURES.md F1).

Schema (BASELINE.json input_hint): url:string, warc_ts:timestamp,
html:binary, text:string, lang:string.

Key invariant (north rule / input_hint): **text is a pure deterministic
function of url** — token indices are hash-mixed from the url's hash — so
"byte-identical extracted text per url" is checkable after any round-trip.

Everything is vectorized NumPy; the Spark path generates per-partition with
``mapInArrow`` over ``spark.range`` so any scale factor streams without
collecting to the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .kernels.ragged import RaggedBytes

N_DOMAINS = 1000
N_LANGS = 40
VOCAB = 5000
TEXT_VOCAB = 50_000
_LANGS = np.array(
    [
        "en", "zh", "es", "de", "fr", "ja", "ru", "pt", "it", "nl", "pl", "tr",
        "ar", "ko", "sv", "cs", "fa", "id", "vi", "el", "hu", "da", "fi", "no",
        "ro", "uk", "th", "he", "bg", "sk", "lt", "hr", "sr", "et", "lv", "sl",
        "ms", "hi", "bn", "ta",
    ]
)


def _zipf_ranks(u: np.ndarray, n: int, a: float) -> np.ndarray:
    """Map uniform(0,1) to Zipf(a)-distributed ranks in [0, n) via inverse-CDF
    of the continuous approximation."""
    if a <= 1.0001:
        a = 1.0001
    # P(rank <= r) ∝ r^(1-a); invert
    r = (u * (n ** (1 - a) - 1) + 1) ** (1 / (1 - a))
    return np.minimum(r.astype(np.int64), n - 1)


def _mix(h: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64-style vectorized hash mixing."""
    z = (h + np.uint64((salt * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _words(prefix: str, n: int) -> RaggedBytes:
    return RaggedBytes.from_pylist([f"{prefix}{i}".encode() for i in range(n)])


_VOCABSEP_CACHE: dict = {}


def _vocab_with_sep(vocab: RaggedBytes, sep: bytes) -> RaggedBytes:
    """``vocab`` with ``sep`` appended to every token, cached per (vocab, sep)
    — vocabs are module-level constants, so this builds once per process."""
    key = (id(vocab), sep)
    vs = _VOCABSEP_CACHE.get(key)
    if vs is None:
        n = len(vocab)
        lens = vocab.lengths + len(sep)
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        data = np.empty(int(off[-1]), dtype=np.uint8)
        sep_arr = np.frombuffer(sep, dtype=np.uint8)
        for i in range(n):
            o = off[i]
            data[o : o + lens[i] - len(sep)] = vocab.data[vocab.offsets[i] : vocab.offsets[i + 1]]
            data[o + lens[i] - len(sep) : off[i + 1]] = sep_arr
        vs = RaggedBytes(off, data)
        _VOCABSEP_CACHE[key] = vs
    return vs


def _join_tokens(token_ids: np.ndarray, counts: np.ndarray, vocab: RaggedBytes, sep: bytes = b" ") -> RaggedBytes:
    """Build ragged strings: for row i, join vocab[token_ids[...]] of counts[i]
    tokens with ``sep``. token_ids is flat (sum(counts),).

    One composed gather: each output byte is read straight from a cached
    sep-appended vocab (the former take -> scatter -> gather chain moved the
    token bytes three times)."""
    n = len(counts)
    vs = _vocab_with_sep(vocab, sep)
    vs_lens = vs.lengths
    # per-token effective length: token+sep, minus the trailing sep for the
    # last token of each row
    eff = vs_lens[token_ids]
    row_end = np.cumsum(counts) - 1  # index of each row's last token (counts>0)
    nz = counts > 0
    eff[row_end[nz]] -= len(sep)
    total = int(eff.sum())
    dcum = np.zeros(len(token_ids), dtype=np.int64)
    np.cumsum(eff[:-1], out=dcum[1:])
    gather = np.repeat(vs.offsets[:-1][token_ids] - dcum, eff) + np.arange(
        total, dtype=np.int64
    )
    out = vs.data[gather]
    row_lens = np.zeros(n, dtype=np.int64)
    ecum = np.cumsum(eff)
    row_lens[nz] = ecum[row_end[nz]] - np.concatenate(
        ([0], ecum[row_end[nz]][:-1])
    )
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(row_lens, out=offsets[1:])
    return RaggedBytes(offsets, out)


_PATH_VOCAB = _words("seg", VOCAB)
_TEXT_VOCAB = _words("tok", TEXT_VOCAB)
_HTML_TEMPLATE = (
    b"<html><head><title>synthetic page</title></head><body>"
    + b"<p>lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod</p>" * 64
    + b"</body></html>"
)


def gen_webpages(n: int, seed: int = 42, html_mu: float = 6.5, html_sigma: float = 1.2,
                 html_max: int = 1 << 18, sort_by_domain: bool = True) -> pa.Table:
    """Generate ``n`` rows deterministically. ``seed`` varies per partition in
    the distributed path."""
    base = _mix(np.arange(n, dtype=np.uint64), seed + 1)

    # --- url: https://{domain}/{1-5 path tokens}
    dom_rank = _zipf_ranks(_u01(_mix(base, 2)), N_DOMAINS, 1.2)
    if sort_by_domain:
        order = np.argsort(dom_rank, kind="stable")
        dom_rank = dom_rank[order]
        base = base[order]
    n_seg = 1 + (_mix(base, 3) % np.uint64(5)).astype(np.int64)
    total_seg = int(n_seg.sum())
    row_of_seg = np.repeat(np.arange(n), n_seg)
    seg_idx = np.arange(total_seg) - np.repeat(np.cumsum(n_seg) - n_seg, n_seg)
    seg_hash = _mix(base[row_of_seg] + seg_idx.astype(np.uint64), 4)
    seg_ids = _zipf_ranks(_u01(seg_hash), VOCAB, 1.1)
    paths = _join_tokens(seg_ids, n_seg, _PATH_VOCAB, sep=b"/")
    hosts = RaggedBytes.from_pylist(
        [f"https://host{r}.example.com/".encode() for r in range(N_DOMAINS)]
    ).take(dom_rank)
    url = _concat_cols(hosts, paths)

    # --- warc_ts: near-monotone int64 micros
    rng_free = _u01(_mix(base, 5))
    deltas = (-np.log(np.maximum(rng_free, 1e-12)) * 900_000).astype(np.int64)  # exp(mean .9s) in us
    ts = np.int64(1735689600_000_000) + np.cumsum(deltas)
    swap = _u01(_mix(base, 6)) < 0.01  # 1% out-of-order
    si = np.flatnonzero(swap[:-1])
    ts[si], ts[si + 1] = ts[si + 1].copy(), ts[si].copy()

    # --- text: pure function of url (the per-row invariant)
    url_hash = _hash_ragged(url)
    tcount = np.maximum(
        (np.exp(2.5 + 1.0 * _norm(_mix(url_hash, 7)))).astype(np.int64), 1
    )  # LogNormal-ish token count, mean ~ 20
    tcount = np.minimum(tcount, 400)
    ttotal = int(tcount.sum())
    trow = np.repeat(np.arange(n), tcount)
    tj = np.arange(ttotal) - np.repeat(np.cumsum(tcount) - tcount, tcount)
    th = _mix(url_hash[trow] + (tj * 0x9E3779B9).astype(np.uint64), 8)
    tok_ids = _zipf_ranks(_u01(th), TEXT_VOCAB, 1.3)
    text = _join_tokens(tok_ids, tcount, _TEXT_VOCAB)

    # --- html: pseudo-HTML, LogNormal lengths, 0.1% oversized, 2% null
    hlen = np.exp(html_mu + html_sigma * _norm(_mix(base, 9))).astype(np.int64)
    hlen = np.clip(hlen, 256, html_max)
    hlen[_u01(_mix(base, 10)) < 0.001] = html_max
    html_null = _u01(_mix(base, 11)) < 0.02
    hlen[html_null] = 0
    tmpl = np.frombuffer(_HTML_TEMPLATE, dtype=np.uint8)
    reps = int(np.ceil(int(hlen.max(initial=0)) / len(tmpl))) + 1
    tiled = np.tile(tmpl, reps)
    h_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(hlen, out=h_off[1:])
    start_in_tmpl = (_mix(base, 12) % np.uint64(len(tmpl))).astype(np.int64)
    # row i's bytes are tiled[(start_in_tmpl[i] + j) % len(tiled)] for
    # j < hlen[i]; start < len(tmpl) and len(tiled) >= hlen.max() + len(tmpl),
    # so the modulo never wraps and each row is the contiguous slice
    # tiled[start : start + hlen]. Copy slices row-wise (memcpy-speed) instead
    # of materializing a per-byte int64 gather index (8x the memory traffic).
    out = np.empty(int(h_off[-1]), dtype=np.uint8)
    for i in range(n):
        l = hlen[i]
        if l:
            s = start_in_tmpl[i]
            out[h_off[i] : h_off[i] + l] = tiled[s : s + l]
    html = RaggedBytes(h_off, out)

    # --- lang: Zipf(1.5) over 40 codes
    lang_ids = _zipf_ranks(_u01(_mix(base, 13)), N_LANGS, 1.5)

    # html nulls: attach the validity bitmap directly (null rows already have
    # zero-length slots) instead of copying the whole blob column via if_else
    n_null = int(html_null.sum())
    if n_null:
        vbuf = pa.py_buffer(np.packbits(~html_null, bitorder="little"))
        html_arr = pa.Array.from_buffers(
            pa.binary(), n,
            [vbuf, pa.py_buffer(html.offsets.astype(np.int32)), pa.py_buffer(html.data)],
            null_count=n_null,
        )
    else:
        html_arr = html.to_arrow(binary=True)
    return pa.table(
        {
            "url": url.to_arrow(),
            "warc_ts": pa.array(ts.astype("datetime64[us]")),
            "html": html_arr,
            "text": text.to_arrow(),
            "lang": pa.array(_LANGS[lang_ids]),
        }
    )


def _concat_cols(a: RaggedBytes, b: RaggedBytes) -> RaggedBytes:
    n = len(a)
    lens = a.lengths + b.lengths
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    out = np.zeros(int(off[-1]), dtype=np.uint8)
    # scatter a's bytes at row starts, b's bytes right after a's per row
    sa = np.repeat(off[:-1] - a.offsets[:-1], a.lengths) + np.arange(
        int(a.lengths.sum()), dtype=np.int64
    )
    out[sa] = a.data
    sb = np.repeat(off[:-1] + a.lengths - b.offsets[:-1], b.lengths) + np.arange(
        int(b.lengths.sum()), dtype=np.int64
    )
    out[sb] = b.data
    return RaggedBytes(off, out)


def _hash_ragged(col: RaggedBytes) -> np.ndarray:
    """Order-sensitive 64-bit hash per ragged value, vectorized: position-mixed
    byte contributions summed per row."""
    n = len(col)
    lens = col.lengths
    pos_in_row = np.arange(len(col.data), dtype=np.uint64) - np.repeat(
        col.offsets[:-1].astype(np.uint64), lens
    )
    contrib = _mix(col.data.astype(np.uint64) + (pos_in_row << np.uint64(8)), 99)
    # exact floor-mod 2^52 without the scalar fmod loop of `%`: every
    # intermediate (power-of-two divide, floor, multiply-back, subtract) is
    # exact in float64 here, so the result is bit-identical to `f % 2**52`
    f = contrib.view(np.int64).astype(np.float64)
    w = f - np.floor(f * (2.0**-52)) * (2.0**52)
    row = np.repeat(np.arange(n), lens)
    sums = np.bincount(row, weights=w, minlength=n)
    return _mix(sums.astype(np.uint64), 100)


def _norm(h: np.ndarray) -> np.ndarray:
    """Deterministic standard-normal-ish from hashes (sum of 4 uniforms, CLT)."""
    u = sum(_u01(_mix(h, 40 + i)) for i in range(4))
    return (u - 2.0) * np.sqrt(3.0)


def webpages_df(spark, n_rows: int, partitions: int | None = None, seed: int = 42,
                html_mu: float = 7.5, html_max: int = 1 << 18):
    """Distributed generation: each partition generates its slice via the same
    deterministic kernel (seed offset by partition id)."""
    import pyarrow as pa
    from pyspark.sql import types as T

    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    # ``partitions`` is the LOGICAL slice count (fixes the per-slice seeds and
    # hence every generated byte); the PHYSICAL task count is capped at 2x the
    # session parallelism so a low-core run doesn't pay Spark's fixed
    # per-Python-task latency (~60 ms on this host) 64 times for work 1 core
    # must serialize anyway. spark.range assigns each physical partition a
    # contiguous pid range, so output rows, batch boundaries and ordering are
    # identical at any core count.
    phys = max(1, min(partitions, 2 * spark.sparkContext.defaultParallelism))
    plan = spark.range(0, partitions, 1, phys).withColumnRenamed("id", "pid")
    n_parts = partitions
    total = n_rows

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )

    def gen(it):
        from pq_engine.memtune import tune_allocator

        tune_allocator()
        for batch in it:
            for pid in batch.column(0).to_pylist():
                nr = total // n_parts + (1 if pid < total % n_parts else 0)
                if nr:
                    tbl = gen_webpages(nr, seed=seed + pid * 1_000_003, html_mu=html_mu, html_max=html_max)
                    for rb in tbl.to_batches(max_chunksize=20_480):
                        yield rb

    out = plan.mapInArrow(gen, schema)
    # advertise the producing (input plan, batch fn) so a directly-chained
    # Arrow map stage (encode_table) can fuse into ONE Python pass — the
    # generated bytes then never cross Python -> JVM -> Python between the
    # two stages (each crossing pays an InternalRow conversion of the full
    # table). The attribute dies with this DataFrame object: any further
    # transformation returns a new frame without it, disabling fusion.
    out._pq_fuse = (plan, gen)
    return out
