"""CLI over encoded page tables — the parquet-cli analog
(/root/reference/parquet-cli/.../cli/commands/: cat, scan, schema, meta,
pages, dictionary, column-size). Reads the page-table parquet with pyarrow
and decodes with the NumPy kernels directly — no Spark session needed, so it
works on any machine that can see the files.

    python -m pq_engine.cli meta   <pages_dir>
    python -m pq_engine.cli schema <pages_dir>
    python -m pq_engine.cli pages  <pages_dir> [--column C]
    python -m pq_engine.cli stats  <pages_dir>
    python -m pq_engine.cli dictionary <pages_dir> --column C [--limit N]
    python -m pq_engine.cli cat    <pages_dir> [--limit N]
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


def main(argv=None):
    ap = argparse.ArgumentParser(prog="pq_engine.cli")
    ap.add_argument("command", choices=["meta", "schema", "pages", "stats", "dictionary", "cat"])
    ap.add_argument("path")
    ap.add_argument("--column")
    ap.add_argument("--split", type=int, default=0)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--limit", type=int, default=20)
    args = ap.parse_args(argv)
    tbl = _load(args.path)
    {
        "meta": cmd_meta,
        "schema": cmd_schema,
        "pages": cmd_pages,
        "stats": cmd_stats,
        "dictionary": cmd_dictionary,
        "cat": cmd_cat,
    }[args.command](tbl, args)


if __name__ == "__main__":
    main()
