"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata structs; the
Spark side — schema, batching, partition sizing, UDF signatures — is real and
tested. The actual pixel/sample decoding is STUBBED (this container has no
image/audio libraries): ``decode_image`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, which produces a seeded fake feature vector so
the downstream plumbing can be exercised end-to-end.
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
    Arrow transfer and output schema are the real production plumbing; the
    decode itself is a stub.

    ``deterministic_fake=True`` → feature = seeded hash-projection of the raw
    bytes (repeatable across runs/workers). ``False`` → NotImplementedError,
    marking exactly where a real decoder (PIL/ffmpeg) plugs in.
    """
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats: list = []
            for v in pdf[bin_col]:
                if v is None:
                    feats.append(None)
                    continue
                if not deterministic_fake:
                    raise NotImplementedError(
                        "media decode requires an image/audio library not present "
                        "in this container; plug a real decoder in here"
                    )
                raw = np.frombuffer(bytes(v[:4096]), dtype=np.uint8)
                acc = np.zeros(feature_dim, dtype=np.float64)
                if len(raw):
                    idx = np.arange(len(raw)) % feature_dim
                    np.add.at(acc, idx, raw.astype(np.float64))
                    acc = acc / max(len(raw), 1)
                feats.append(acc.astype(np.float32))
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
