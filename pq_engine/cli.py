"""CLI over encoded page tables — the parquet-cli analog
(/root/reference/parquet-cli/.../cli/commands/: cat, scan, schema, meta,
pages, dictionary, column-size, column-index, bloom-filter, prune, masking,
trans-compression, convert-csv). Reads the page-table parquet with pyarrow
and decodes with the NumPy kernels directly — no Spark session needed, so it
works on any machine that can see the files.

    python -m pq_engine.cli meta   <pages_dir>
    python -m pq_engine.cli schema <pages_dir>
    python -m pq_engine.cli pages  <pages_dir> [--column C]
    python -m pq_engine.cli stats  <pages_dir>
    python -m pq_engine.cli dictionary <pages_dir> --column C [--limit N]
    python -m pq_engine.cli cat    <pages_dir> [--limit N]
    python -m pq_engine.cli scan   <pages_dir>
    python -m pq_engine.cli column-size  <pages_dir>
    python -m pq_engine.cli column-index <pages_dir> --column C
    python -m pq_engine.cli bloom-filter <pages_dir> --column C [--value V]
    python -m pq_engine.cli prune  <pages_dir> --out DIR --columns a,b
    python -m pq_engine.cli mask   <pages_dir> --out DIR --column C [--mode hash|nullify]
    python -m pq_engine.cli trans-compression <pages_dir> --out DIR --to zstd
    python -m pq_engine.cli from-csv <file.csv> --out DIR
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import pyarrow.dataset as ds

from .pages import RAGGED_TYPES, decode_column


def _load(path):
    return ds.dataset(path).to_table()


def _page_dicts(tbl, split, batch, column):
    import pyarrow.compute as pc

    mask = pc.and_(
        pc.and_(
            pc.and_(pc.equal(tbl["split_id"], split), pc.equal(tbl["batch_id"], batch)),
            pc.equal(tbl["column"], column),
        ),
        pc.greater_equal(tbl["page"], -2),  # keep chunk dict pages (-2);
        # bloom rows (-1) are skipped inside decode_column
    )
    sub = tbl.filter(mask).sort_by("page")
    return [
        (
            {
                "page": sub["page"][i].as_py(),
                "codec": sub["codec"][i].as_py(),
                "ptype": sub["ptype"][i].as_py(),
                "n_rows": sub["n_rows"][i].as_py(),
                "crc32": sub["crc32"][i].as_py(),
                "compression": sub["compression"][i].as_py(),
            },
            sub["data"][i].as_py(),
        )
        for i in range(sub.num_rows)
    ]


def cmd_meta(tbl, args):
    import collections

    per = collections.defaultdict(lambda: [0, 0, 0, set()])
    for i in range(tbl.num_rows):
        c = tbl["column"][i].as_py()
        per[c][0] += 1
        per[c][1] += tbl["raw_bytes"][i].as_py()
        per[c][2] += tbl["encoded_bytes"][i].as_py()
        per[c][3].add(tbl["codec"][i].as_py())
    print(f"{'column':12s} {'pages':>6s} {'raw':>12s} {'encoded':>12s} {'ratio':>7s}  codecs")
    for c in sorted(per):
        p, r, e, k = per[c]
        print(f"{c:12s} {p:6d} {r:12d} {e:12d} {e/max(r,1):7.3f}  {','.join(sorted(k))}")


def cmd_schema(tbl, args):
    seen = {}
    for i in range(tbl.num_rows):
        seen.setdefault(tbl["column"][i].as_py(), tbl["ptype"][i].as_py())
    for c in sorted(seen):
        print(f"{c}: {seen[c]}")


def cmd_pages(tbl, args):
    cols = ["split_id", "batch_id", "column", "page", "codec", "n_rows",
            "null_count", "encoded_bytes", "min", "max", "ndv"]
    sub = tbl.sort_by([("split_id", "ascending"), ("batch_id", "ascending"), ("page", "ascending")])
    for i in range(min(sub.num_rows, args.limit)):
        if args.column and sub["column"][i].as_py() != args.column:
            continue
        print(" ".join(f"{c}={sub[c][i].as_py()}" for c in cols))


def cmd_stats(tbl, args):
    for i in range(min(tbl.num_rows, args.limit)):
        print(
            f"{tbl['column'][i].as_py():10s} page={tbl['page'][i].as_py():3d} "
            f"min={str(tbl['min'][i].as_py())[:32]!r} max={str(tbl['max'][i].as_py())[:32]!r} "
            f"nulls={tbl['null_count'][i].as_py()} ndv={tbl['ndv'][i].as_py()}"
        )


def cmd_dictionary(tbl, args):
    pages = _page_dicts(tbl, args.split, args.batch, args.column)
    if not pages:
        sys.exit(f"no pages for column {args.column}")
    values, _ = decode_column(pages)
    if pages[0][0]["ptype"] in RAGGED_TYPES:
        uniq = sorted(set(values.to_pylist()))[: args.limit]
    else:
        uniq = np.unique(values)[: args.limit].tolist()
    for u in uniq:
        print(u)


def cmd_cat(tbl, args):
    import pyarrow.compute as pc

    keys = set()
    for i in range(tbl.num_rows):
        keys.add((tbl["split_id"][i].as_py(), tbl["batch_id"][i].as_py()))
    columns = sorted({tbl["column"][i].as_py() for i in range(tbl.num_rows)})
    emitted = 0
    for split, batch in sorted(keys):
        decoded = {}
        n = None
        for c in columns:
            values, validity = decode_column(_page_dicts(tbl, split, batch, c))
            if hasattr(values, "to_pylist"):
                vals = values.to_pylist()
            else:
                vals = values.tolist()
            if validity is not None:
                full, vi = [], 0
                for ok in validity:
                    full.append(vals[vi] if ok else None)
                    vi += ok
                vals = full
            decoded[c] = vals
            n = len(vals)
        for r in range(n):
            print({c: decoded[c][r] for c in columns})
            emitted += 1
            if emitted >= args.limit:
                return


def cmd_scan(tbl, args):
    """ScanCommand analog: decode everything, count records, xor checksums."""
    import zlib as _z

    keys = sorted(
        {(tbl["split_id"][i].as_py(), tbl["batch_id"][i].as_py()) for i in range(tbl.num_rows)}
    )
    columns = sorted({tbl["column"][i].as_py() for i in range(tbl.num_rows)})
    rows = 0
    crc = 0
    for split, batch in keys:
        n = None
        for c in columns:
            pages = _page_dicts(tbl, split, batch, c)
            values, validity = decode_column(pages)
            n = len(validity) if validity is not None else len(values)
            for meta, _ in pages:
                crc ^= meta["crc32"]
        rows += n or 0
    print(f"records={rows} columns={len(columns)} chunks={len(keys)} crc_xor={crc:08x}")


def cmd_column_size(tbl, args):
    """ColumnSizeCommand analog: per-column encoded size and share."""
    import collections

    per = collections.defaultdict(lambda: [0, 0])
    for i in range(tbl.num_rows):
        c = tbl["column"][i].as_py()
        per[c][0] += tbl["raw_bytes"][i].as_py()
        per[c][1] += tbl["encoded_bytes"][i].as_py()
    total_enc = sum(v[1] for v in per.values()) or 1
    print(f"{'column':12s} {'raw':>12s} {'encoded':>12s} {'ratio':>7s} {'share':>7s}")
    for c in sorted(per):
        r, e = per[c]
        print(f"{c:12s} {r:12d} {e:12d} {e/max(r,1):7.3f} {e/total_enc:7.1%}")


def cmd_column_index(tbl, args):
    """ShowColumnIndexCommand analog: per-page min/max/nulls + first-row
    offset index + boundary order per chunk (ColumnIndexBuilder semantics)."""
    import pyarrow.compute as pc

    if not args.column:
        sys.exit("--column required")
    sub = tbl.filter(
        pc.and_(pc.equal(tbl["column"], args.column), pc.greater_equal(tbl["page"], 0))
    ).sort_by([("split_id", "ascending"), ("batch_id", "ascending"), ("page", "ascending")])
    chunks = {}
    for i in range(sub.num_rows):
        key = (sub["split_id"][i].as_py(), sub["batch_id"][i].as_py())
        chunks.setdefault(key, []).append(i)
    ptype = sub["ptype"][0].as_py() if sub.num_rows else "string"
    for key, idxs in sorted(chunks.items()):
        mins = [
            _parse_value(m, ptype) if m is not None else None
            for m in (sub["min"][i].as_py() for i in idxs)
        ]
        clean = [m for m in mins if m is not None]
        if len(clean) < 2:
            order = "UNORDERED"
        elif all(a <= b for a, b in zip(clean, clean[1:])):
            order = "ASCENDING"
        elif all(a >= b for a, b in zip(clean, clean[1:])):
            order = "DESCENDING"
        else:
            order = "UNORDERED"
        print(f"chunk split={key[0]} batch={key[1]} boundary_order={order}")
        for i in idxs:
            print(
                f"  page={sub['page'][i].as_py():3d} first_row={sub['first_row'][i].as_py():6d} "
                f"rows={sub['n_rows'][i].as_py():6d} nulls={sub['null_count'][i].as_py():4d} "
                f"min={str(sub['min'][i].as_py())[:24]!r} max={str(sub['max'][i].as_py())[:24]!r}"
            )


def cmd_bloom_filter(tbl, args):
    """ShowBloomFilterCommand analog: list bloom index rows; with --value,
    probe membership per chunk."""
    import pyarrow.compute as pc

    from .kernels.bloom import BlockSplitBloomFilter, key_for_value

    if not args.column:
        sys.exit("--column required")
    sub = tbl.filter(
        pc.and_(pc.equal(tbl["column"], args.column), pc.equal(tbl["page"], -1))
    )
    if sub.num_rows == 0:
        print("no bloom filters for column", args.column)
        return
    for i in range(sub.num_rows):
        blob = sub["data"][i].as_py()
        bf = BlockSplitBloomFilter.deserialize(blob)
        line = (
            f"split={sub['split_id'][i].as_py()} batch={sub['batch_id'][i].as_py()} "
            f"bytes={len(blob)} blocks={bf.num_blocks} keys={sub['n_rows'][i].as_py()}"
        )
        if args.value is not None:
            key = key_for_value(_parse_value(args.value, sub["ptype"][i].as_py()),
                                sub["ptype"][i].as_py())
            hit = bool(bf.contains_u64(np.array([key], dtype=np.uint64))[0])
            line += f" maybe_contains({args.value})={hit}"
        print(line)


def _parse_value(v: str, ptype: str):
    if ptype in ("int32", "int64", "timestamp_us", "timestamp_ntz_us", "date32"):
        return int(v)
    if ptype in ("float32", "float64"):
        return float(v)
    return v


def _write_pages(tbl, out_dir: str) -> None:
    import pyarrow.parquet as pq

    pq.write_table(tbl, f"{out_dir.rstrip('/')}/part-0.parquet")


def cmd_prune(tbl, args):
    """PruneColumnsCommand analog: keep only --columns (footer-only rewrite)."""
    import os

    import pyarrow.compute as pc

    keep = [c.strip() for c in (args.columns or "").split(",") if c.strip()]
    if not keep or not args.out:
        sys.exit("--columns a,b and --out required")
    os.makedirs(args.out, exist_ok=True)
    out = tbl.filter(pc.is_in(tbl["column"], value_set=__import__("pyarrow").array(keep)))
    _write_pages(out, args.out)
    print(f"kept {out.num_rows} of {tbl.num_rows} page rows → {args.out}")


def _rebuild_rows(tbl, split, batch, column, new_pages, template_row):
    rows = []
    for meta, blob in new_pages:
        rows.append(
            {
                "split_id": split, "batch_id": batch, "column": column,
                "page": meta["page"], "codec": meta["codec"], "ptype": meta["ptype"],
                "first_row": meta.get("first_row", -1), "n_rows": meta["n_rows"],
                "null_count": meta["null_count"], "raw_bytes": meta["raw_bytes"],
                "encoded_bytes": meta["encoded_bytes"], "crc32": meta["crc32"],
                "compression": meta["compression"], "min": meta["min"],
                "max": meta["max"], "ndv": meta["ndv"], "data": blob,
            }
        )
    return rows


def cmd_mask(tbl, args):
    """MaskingCommand analog (hash|nullify), local NumPy path."""
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.compute as pc

    from .kernels import rle
    from .kernels.ragged import RaggedBytes
    from .pages import encode_column

    if not args.column or not args.out:
        sys.exit("--column and --out required")
    os.makedirs(args.out, exist_ok=True)
    rest = tbl.filter(pc.not_equal(tbl["column"], args.column))
    keys = sorted(
        {(tbl["split_id"][i].as_py(), tbl["batch_id"][i].as_py()) for i in range(tbl.num_rows)}
    )
    new_rows = []
    for split, batch in keys:
        pages = _page_dicts(tbl, split, batch, args.column)
        if not pages:
            continue
        data_pages = [p for p in pages if p[0]["page"] >= 0]
        if args.mode == "hash" and data_pages and data_pages[0][0]["ptype"] not in (
            "string", "binary"
        ):
            sys.exit(
                f"mask --mode hash requires a string/binary column; "
                f"{args.column!r} is {data_pages[0][0]['ptype']} (use --mode nullify)"
            )
        values, validity = decode_column(pages)
        if args.mode == "nullify":
            import zlib as _z

            n = len(validity) if validity is not None else len(values)
            blob = bytes([1]) + rle.encode_hybrid_length_prefixed(
                np.zeros(n, dtype=np.uint64), 1
            )
            new_rows += _rebuild_rows(
                tbl, split, batch, args.column,
                [({"page": 0, "codec": "plain", "ptype": pages[0][0]["ptype"],
                   "first_row": 0, "n_rows": n, "null_count": n, "raw_bytes": 0,
                   "encoded_bytes": len(blob), "crc32": _z.crc32(blob) & 0xFFFFFFFF,
                   "compression": "none", "min": None, "max": None, "ndv": 0}, blob)],
                None,
            )
        else:
            # hashlib per value: each iteration is ONE OpenSSL C call —
            # measured 159 MB/s on this host vs 8.5 MB/s for the fully
            # vectorized NumPy wave kernel (kernels/md5.py; MD5's 64
            # sequential rounds are DRAM-bound as u32 lane arrays). The
            # distributed rewrite path hashes JVM-side (rewrite.mask_hash,
            # F.md5) — this local tool takes the fastest in-process option.
            hashed = RaggedBytes.from_pylist(
                [hashlib.md5(v).hexdigest().encode() for v in values.to_pylist()]
            )
            out_pages = encode_column(hashed, "string", validity=validity)
            new_rows += _rebuild_rows(tbl, split, batch, args.column, out_pages, None)
    masked = pa.Table.from_pylist(new_rows, schema=tbl.schema) if new_rows else tbl.slice(0, 0)
    _write_pages(pa.concat_tables([rest, masked]), args.out)
    print(f"masked column {args.column} ({args.mode}) → {args.out}")


def cmd_trans_compression(tbl, args):
    """TransCompressionCommand analog: re-compress page bodies locally."""
    import os
    import zlib as _z

    import pyarrow as pa

    from .compression import compress as _pc_, decompress as _pd_

    if not args.out:
        sys.exit("--out required")
    os.makedirs(args.out, exist_ok=True)
    to_label = args.to or "none"
    rows = tbl.to_pylist()
    for r in rows:
        if r["compression"] == to_label or r["page"] == -1 or r["codec"] == "rowranges":
            continue
        blob = bytes(r["data"])
        from .pages import split_page_blob

        pos = split_page_blob(blob)  # handles flat, validity AND list layouts
        body = _pc_(_pd_(blob[pos:], r["compression"]), to_label)
        nb = blob[:pos] + body
        r.update(
            data=nb, encoded_bytes=len(nb), compression=to_label,
            crc32=_z.crc32(nb) & 0xFFFFFFFF,
        )
    _write_pages(pa.Table.from_pylist(rows, schema=tbl.schema), args.out)
    print(f"transcoded to {to_label} → {args.out}")


def cmd_from_csv(args):
    """ConvertCSVCommand analog: csv → encoded page table, local pyarrow."""
    import os

    import pyarrow as pa
    from pyarrow import csv as pacsv

    from .pages import encode_column

    if not args.out:
        sys.exit("--out required")
    os.makedirs(args.out, exist_ok=True)
    src = pacsv.read_csv(args.path)
    ptype_of = {
        pa.string(): "string", pa.int64(): "int64", pa.int32(): "int32",
        pa.float64(): "float64", pa.float32(): "float32", pa.bool_(): "bool",
    }
    rows = []
    for name in src.column_names:
        arr = src[name].combine_chunks()
        pt = ptype_of.get(arr.type)
        if pt is None:
            arr = arr.cast(pa.string())
            pt = "string"
        validity = np.asarray(arr.is_valid()) if arr.null_count else None
        dense = arr.drop_null()
        if pt == "string":
            from .kernels.ragged import RaggedBytes

            values = RaggedBytes.from_arrow(dense)
        elif pt == "bool":
            values = np.asarray(dense)
        else:
            values = np.asarray(dense)
        rows += _rebuild_rows(None, 0, 0, name, encode_column(values, pt, validity=validity), None)
    tbl = pa.Table.from_pylist(rows)
    _write_pages(tbl, args.out)
    print(f"encoded {len(src)} csv rows, {len(src.column_names)} columns → {args.out}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="pq_engine.cli")
    ap.add_argument(
        "command",
        choices=[
            "meta", "schema", "pages", "stats", "dictionary", "cat", "scan",
            "column-size", "column-index", "bloom-filter", "prune", "mask",
            "trans-compression", "from-csv",
        ],
    )
    ap.add_argument("path")
    ap.add_argument("--column")
    ap.add_argument("--columns")
    ap.add_argument("--split", type=int, default=0)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--out")
    ap.add_argument("--to")
    ap.add_argument("--value")
    ap.add_argument("--mode", choices=["hash", "nullify"], default="hash")
    args = ap.parse_args(argv)
    if args.command == "from-csv":
        cmd_from_csv(args)
        return
    tbl = _load(args.path)
    {
        "meta": cmd_meta,
        "schema": cmd_schema,
        "pages": cmd_pages,
        "stats": cmd_stats,
        "dictionary": cmd_dictionary,
        "cat": cmd_cat,
        "scan": cmd_scan,
        "column-size": cmd_column_size,
        "column-index": cmd_column_index,
        "bloom-filter": cmd_bloom_filter,
        "prune": cmd_prune,
        "mask": cmd_mask,
        "trans-compression": cmd_trans_compression,
    }[args.command](tbl, args)


if __name__ == "__main__":
    main()
