"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata structs; the
Spark side — schema, batching, partition sizing, UDF signatures — is real and
tested. PNG decoding is REAL (r5): :mod:`pq_engine.pipeline.png` is a pure
NumPy+zlib codec, and JPEG decoding is REAL (r6): :mod:`pq_engine.pipeline.
jpeg` is a pure-NumPy baseline-sequential codec — so ``extract_features(
deterministic_fake=False)`` returns true pixel statistics for PNG and
baseline JPEG blobs. Remaining formats (progressive JPEG/gif/audio/video —
no codec libraries in this container) fall back to a seeded deterministic
hash-projection so the downstream plumbing still exercises end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("magic", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),
    ]
)

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff",
    b"<htm": "html",
    b"<!do": "html",
    b"<IDX": "unknown",
}


def media_metadata(df: DataFrame, bin_col: str = "html") -> DataFrame:
    """Typed metadata for an opaque binary column — pure JVM-side expressions."""
    b = F.col(bin_col)
    head = F.substring(b, 1, 4)
    kind = F.lit("unknown")
    for magic, name in _MAGIC.items():
        kind = F.when(
            F.substring(b, 1, len(magic)) == F.lit(magic), F.lit(name)
        ).otherwise(kind)
    return df.withColumn(
        "media_meta",
        F.when(
            b.isNotNull(),
            F.struct(
                F.length(b).cast("long").alias("n_bytes"),
                F.hex(head).alias("magic"),
                kind.alias("kind"),
            ),
        ),
    )


def extract_features(
    df: DataFrame,
    bin_col: str = "html",
    feature_dim: int = 64,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Feature extraction over binary media via mapInPandas: batch shape,
    Arrow transfer and output schema are the real production plumbing.

    ``deterministic_fake=False``: PNG blobs decode FOR REAL through the
    pure-NumPy codec in :mod:`pq_engine.pipeline.png` (r5; zlib inflate +
    all five row filters), and baseline JPEG blobs through
    :mod:`pq_engine.pipeline.jpeg` (r6; Huffman + IDCT + upsample) —
    features = [height, width, channels, mean_ch0..ch3, std_ch0..ch3]
    zero-padded to ``feature_dim``. Remaining blobs (progressive JPEG /
    gif / audio / video — no decoder in this container) fall back to the
    deterministic hash-projection, same as the fake path.

    ``deterministic_fake=True`` → every blob gets the seeded hash-projection
    of its raw bytes (repeatable across runs/workers), decoding nothing.
    """
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()), True)]
    )

    def _fake(v) -> np.ndarray:
        raw = np.frombuffer(bytes(v[:4096]), dtype=np.uint8)
        acc = np.zeros(feature_dim, dtype=np.float64)
        if len(raw):
            idx = np.arange(len(raw)) % feature_dim
            np.add.at(acc, idx, raw.astype(np.float64))
            acc = acc / max(len(raw), 1)
        return acc.astype(np.float32)

    def _img_features(img: np.ndarray) -> np.ndarray:
        h, w, c = img.shape
        px = img.reshape(-1, c).astype(np.float64)
        out = np.zeros(feature_dim, dtype=np.float64)
        out[0], out[1], out[2] = h, w, c
        out[3 : 3 + c] = px.mean(axis=0)
        out[7 : 7 + c] = px.std(axis=0)
        return out.astype(np.float32)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import decode_jpeg
        from .png import decode_png

        for pdf in batches:
            feats: list = []
            for v in pdf[bin_col]:
                if v is None:
                    feats.append(None)
                    continue
                head = bytes(v[:4])
                try:
                    if not deterministic_fake and head == b"\x89PNG":
                        feats.append(_img_features(decode_png(bytes(v))))
                    elif not deterministic_fake and head[:3] == b"\xff\xd8\xff":
                        feats.append(_img_features(decode_jpeg(bytes(v))))
                    else:
                        feats.append(_fake(v))
                except ValueError:
                    # declared-scope decode refusal (progressive JPEG,
                    # 16-bit PNG, ...) -> deterministic fake, not a crash
                    feats.append(_fake(v))
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, out_schema)


def frame_sample_plan(df: DataFrame, bin_col: str = "html", every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: emits (offset) rows per media blob without
    decoding (the real sampler would seek those offsets). Shows the explode/
    repartition shape such an operator needs at scale."""
    n_frames = (F.length(F.col(bin_col)) / F.lit(4096)).cast("int")
    return (
        df.withColumn("n_frames", F.greatest(n_frames, F.lit(1)))
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
        )
        .withColumn("frame_offset", F.col("frame_idx") * 4096)
    )
