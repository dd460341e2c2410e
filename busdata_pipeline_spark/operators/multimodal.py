"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with Arrow-batched decode/feature stages.

The container has no image/audio codecs, so the actual decode is stubbed
(DETERMINISTIC_FAKE or NotImplementedError), but everything Spark-side is
real and tested: binary column construction, metadata struct schema, the
mapInPandas batch shape, and the partitioning story.

At 100 TB the rules encoded here:
- payloads travel as ``binary`` columns next to their metadata — one scan,
  no sidecar fetch per row;
- per-item work is Arrow-batched (mapInPandas), never row-at-a-time;
- decode output schema is declared up front so Catalyst can prune it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Real decoders would be registered here (PIL / torchaudio / pyav).
#: Import-gated: the engine works without them, decode_items raises
#: cleanly if asked for a real decode.
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_IMAGE_CODEC = True
except Exception:  # pragma: no cover
    HAVE_IMAGE_CODEC = False

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("media_meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ])),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def attach_binary_payload(docs: DataFrame, text_col: str = "text",
                          mime: str = "application/octet-stream") -> DataFrame:
    """Stand-in media ingestion: UTF-8 bytes of the text as the payload,
    plus the metadata struct every media row carries."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).cast("long").alias("byte_len"),
            F.md5(F.col(text_col)).alias("checksum"),
        ).alias("media_meta"),
    )


def decode_items(media: DataFrame, real: bool = False,
                 feature_dim: int = 8) -> DataFrame:
    """Arrow-batched decode/feature-extract via mapInPandas.

    ``real=True`` requires an installed codec (absent here) and raises
    NotImplementedError; the default produces a DETERMINISTIC FAKE decode
    (dimensions + feature vector derived from the payload's sha256) so the
    batch shape, schema and partitioning are fully exercised.
    """
    if real and not HAVE_IMAGE_CODEC:
        raise NotImplementedError(
            "real media decode needs an image codec (e.g. Pillow); "
            "this environment has none — use real=False for the "
            "deterministic fake decode"
        )

    dim = feature_dim

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            digests = [
                hashlib.sha256(bytes(p) if p is not None else b"").digest()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": [16 + d[0] % 64 for d in digests],
                "height": [16 + d[1] % 64 for d in digests],
                "n_frames": [1 + d[2] % 8 for d in digests],
                "feature": [
                    [float(b) / 255.0 for b in d[:dim]] for d in digests
                ],
            })

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def resize_items(decoded: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize planning: scale every item so its longest side is
    ``max_side``, preserving aspect ratio.  The geometry (scale factor,
    output dims) is pure Column algebra; the pixel resample itself
    belongs in the decode UDF body once a real codec is present —
    keeping the plan identical either way."""
    longest = F.greatest("width", "height")
    scale = F.round(
        F.when(longest > max_side, F.lit(max_side) / longest).otherwise(F.lit(1.0)),
        6,
    )
    return decoded.withColumn("scale", scale).withColumns({
        "out_width": F.greatest(
            F.floor(F.col("width") * F.col("scale")), F.lit(1)
        ).cast("int"),
        "out_height": F.greatest(
            F.floor(F.col("height") * F.col("scale")), F.lit(1)
        ).cast("int"),
    })


def frame_sample(decoded: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling: explode n_frames into frame indexes, keep every
    n-th — pure Column algebra (no Python), prunes before any heavy
    per-frame work downstream."""
    return decoded.select(
        "doc_id", "width", "height",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    ).where(F.col("frame_idx") % every_n == 0)
