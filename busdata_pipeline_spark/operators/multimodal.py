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


# ---------------------------------------------------------------------------
# Real lightweight codecs (no external libraries): PPM P6 images and
# PCM WAV audio are fully self-describing, so the decode seam can be
# exercised with REAL byte parsing — proving the mapInPandas interface
# carries an actual codec, not just the deterministic fake above.

PPM_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_pixels", T.LongType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
])

WAV_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("mean_abs", T.DoubleType()),
])


def encode_ppm(width: int, height: int, pixels) -> bytes:
    """Binary PPM (P6, maxval 255). ``pixels`` is an iterable of
    width*height*3 byte values in RGB scan order."""
    header = f"P6\n{width} {height}\n255\n".encode("ascii")
    return header + bytes(bytearray(pixels))


def encode_wav(sample_rate: int, samples) -> bytes:
    """Minimal RIFF/WAVE, 1 channel, 16-bit PCM."""
    import struct

    import numpy as np

    data = np.asarray(list(samples), dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _parse_ppm(buf: bytes):
    """Parse a P6 PPM: returns (width, height, ndarray[h*w*3] uint8)."""
    import numpy as np

    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval as whitespace-separated tokens
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        tok = b""
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            tok += buf[pos : pos + 1]
            pos += 1
        fields.append(int(tok))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    px = np.frombuffer(buf, dtype=np.uint8, offset=pos, count=w * h * 3)
    return w, h, px


def decode_ppm_items(media: DataFrame) -> DataFrame:
    """REAL image decode over the standard media schema: parses the P6
    header and pixel plane with numpy inside mapInPandas — same seam,
    same batch shape as the stub decoder, an actual codec in the body."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = {k: [] for k in
                    ("doc_id", "width", "height", "n_pixels",
                     "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _parse_ppm(bytes(payload))
                plane = px.reshape(-1, 3).astype(np.float64)
                means = plane.mean(axis=0)
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                rows["mean_r"].append(round(float(means[0]), 6))
                rows["mean_g"].append(round(float(means[1]), 6))
                rows["mean_b"].append(round(float(means[2]), 6))
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=PPM_FEATURES_SCHEMA)


def decode_wav_items(media: DataFrame) -> DataFrame:
    """REAL audio decode: walks RIFF chunks to fmt/data, reads 16-bit PCM
    samples with numpy, emits sample stats."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in it:
            rows = {k: [] for k in
                    ("doc_id", "sample_rate", "n_samples", "mean_abs")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
                    raise ValueError("not a RIFF/WAVE file")
                pos, rate, data = 12, None, None
                while pos + 8 <= len(buf):
                    cid = buf[pos : pos + 4]
                    (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
                    body = buf[pos + 8 : pos + 8 + size]
                    if cid == b"fmt ":
                        _, _, rate, _, _, bits = struct.unpack(
                            "<HHIIHH", body[:16]
                        )
                        if bits != 16:
                            raise ValueError(f"unsupported bit depth {bits}")
                    elif cid == b"data":
                        data = np.frombuffer(body, dtype="<i2")
                    pos += 8 + size + (size % 2)
                if rate is None or data is None:
                    raise ValueError("missing fmt/data chunk")
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(data))
                rows["mean_abs"].append(
                    round(float(np.abs(data.astype(np.float64)).mean()), 6)
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=WAV_FEATURES_SCHEMA)


def synth_ppm_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PPM payloads: dims and every pixel byte are pure
    functions of the doc id (width = 4 + id % 8, height = 3 + id % 5,
    byte j = (id * 7 + j) % 256), so an oracle can state the DECODED
    stats in closed form without ever touching the binary — the whole
    encode -> binary column -> real decode roundtrip is what's checked."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                w, h = 4 + i % 8, 3 + i % 5
                payloads.append(encode_ppm(
                    w, h, ((i * 7 + j) % 256 for j in range(w * h * 3))
                ))
                ids.append(i)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col)).mapInPandas(
        batches,
        schema=T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )


def synth_wav_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic WAV payloads, same closed-form contract as
    synth_ppm_media: sample_rate = 8000 + 1000*(id % 5), n_samples =
    16 + id % 17, sample j = (id*13 + j*7) % 4001 - 2000 (int16 range) —
    an oracle can state the decoded stats without touching the binary,
    so what's verified is the encode -> binary column -> real RIFF/PCM
    parse roundtrip."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                n = 16 + i % 17
                payloads.append(encode_wav(
                    8000 + 1000 * (i % 5),
                    ((i * 13 + j * 7) % 4001 - 2000 for j in range(n)),
                ))
                ids.append(i)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col)).mapInPandas(
        batches,
        schema=T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )


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


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("out_width", T.IntegerType()),
    T.StructField("out_height", T.IntegerType()),
    T.StructField("sum_rgb", T.LongType()),
])


def resize_ppm_items(media: DataFrame, max_side: int = 4) -> DataFrame:
    """REAL pixel resample (the step resize_items only plans): parse each
    P6 PPM payload, nearest-neighbor downscale so the longest side is
    ``max_side``, and emit the resized plane's dims + total channel sum.

    Geometry and sampling are INTEGER-only so an oracle can replay them
    exactly: out_w = max(1, w*max_side // longest) (aspect-preserving
    integer division, no float scale), and NN source index
    src = (y*h // out_h)*w + (x*w // out_w) — the classic floor-NN
    gather.  The resample itself is two numpy fancy-index gathers per
    image (row indexes, then column indexes), no Python loop over
    pixels; Arrow batches carry the payloads executor-side.  sum_rgb is
    an integer, so cross-engine equality is exact — a wrong gather order,
    off-by-one in the index map, or a lossy parse all shift the sum."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids, ows, ohs, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _parse_ppm(bytes(payload))
                plane = px.reshape(h, w, 3)
                longest = max(w, h)
                ow = max(w * max_side // longest, 1)
                oh = max(h * max_side // longest, 1)
                sy = (np.arange(oh) * h) // oh
                sx = (np.arange(ow) * w) // ow
                resized = plane[sy][:, sx]
                ids.append(int(doc_id))
                ows.append(ow)
                ohs.append(oh)
                sums.append(int(resized.astype(np.int64).sum()))
            yield pd.DataFrame({
                "doc_id": ids, "out_width": ows, "out_height": ohs,
                "sum_rgb": sums,
            })

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling: explode n_frames into frame indexes, keep every
    n-th — pure Column algebra (no Python), prunes before any heavy
    per-frame work downstream."""
    return decoded.select(
        "doc_id", "width", "height",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    ).where(F.col("frame_idx") % every_n == 0)


WAV_FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("mean_abs", T.DoubleType()),
])


def wav_frame_energy(media: DataFrame, frame: int = 8) -> DataFrame:
    """Framed audio feature extraction: parse RIFF/PCM (same walk as
    decode_wav_items), split samples into non-overlapping ``frame``-sized
    windows, and emit per-frame mean |amplitude| — the windowed-feature
    step an audio training pipeline runs before labeling/filtering.

    Partial tail frames are dropped (n_frames = n_samples // frame) so
    every emitted value is a closed-form function of a full window.
    Arrow-batched ``mapInPandas``; the per-frame reduction is one numpy
    reshape+mean per item, no Python loops over samples.  mean_abs =
    (int sum)/frame with frame a power of two — exact in double, so no
    rounding is needed for cross-engine equality.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in it:
            ids, fidx, energy = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
                    raise ValueError("not a RIFF/WAVE file")
                pos, data = 12, None
                while pos + 8 <= len(buf):
                    cid = buf[pos : pos + 4]
                    (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
                    if cid == b"data":
                        data = np.frombuffer(
                            buf[pos + 8 : pos + 8 + size], dtype="<i2"
                        )
                    pos += 8 + size + (size % 2)
                if data is None:
                    raise ValueError("missing data chunk")
                n_frames = len(data) // frame
                if n_frames == 0:
                    continue
                framed = np.abs(
                    data[: n_frames * frame].astype(np.float64)
                ).reshape(n_frames, frame).mean(axis=1)
                ids.extend([int(doc_id)] * n_frames)
                fidx.extend(range(n_frames))
                energy.extend(float(x) for x in framed)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": fidx, "mean_abs": energy}
            )

    return media.mapInPandas(batches, schema=WAV_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# video: YUV4MPEG2 (Y4M) container — synth, real parse, frame sampling

Y4M_FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("mean_y", T.DoubleType()),
])


def encode_y4m(width: int, height: int, fps: int, frames) -> bytes:
    """Minimal YUV4MPEG2 stream, C444 (three full planes per frame).
    ``frames`` is an iterable of per-frame byte iterables, each
    ``3 * width * height`` values in Y,U,V plane order."""
    out = bytearray(
        f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C444\n"
        .encode("ascii")
    )
    for frame in frames:
        out += b"FRAME\n"
        out += bytes(bytearray(frame))
    return bytes(out)


def _parse_y4m_header(buf: bytes):
    """Parse the stream header: returns (width, height, frames_offset,
    frame_bytes).  Only C444 is supported (frame = 3 full planes)."""
    nl = buf.find(b"\n")
    if nl < 0 or not buf.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    colorspace = "420jpeg"  # spec default when the C tag is absent
    for tok in buf[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            colorspace = tok[1:].decode("ascii")
    if w is None or h is None:
        raise ValueError("missing W/H in Y4M header")
    if colorspace != "444":
        raise ValueError(f"unsupported Y4M colorspace C{colorspace}")
    return w, h, nl + 1, 3 * w * h


def video_frame_sample_means(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampled video feature extraction over the standard media
    schema: walk the Y4M container, keep every ``every_n``-th frame, and
    emit that frame's luma (Y-plane) mean — the decimation step a video
    training pipeline runs before any expensive per-frame model.

    The container walk SKIPS unsampled frames arithmetically (fixed
    frame size from the header ⇒ pos += frame bytes) — their pixel
    bytes are never materialized as arrays, so cost scales with the
    SAMPLED frame count, not the video length.  Arrow-batched
    ``mapInPandas``; per sampled frame the reduction is one numpy
    slice+mean.  Y values are integers, so the plane sum is exact in
    double and the /n division is the same IEEE op in every engine —
    the round(6) is belt-and-braces, matching the WAV/PPM decoders."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = {k: [] for k in
                    ("doc_id", "width", "height", "frame_idx", "mean_y")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                w, h, pos, frame_bytes = _parse_y4m_header(buf)
                idx = 0
                while pos < len(buf):
                    if buf[pos:pos + 6] != b"FRAME\n":
                        raise ValueError(
                            f"bad FRAME marker at offset {pos}")
                    pos += 6
                    if idx % every_n == 0:
                        y = np.frombuffer(
                            buf, dtype=np.uint8, count=w * h, offset=pos
                        )
                        rows["doc_id"].append(int(doc_id))
                        rows["width"].append(w)
                        rows["height"].append(h)
                        rows["frame_idx"].append(idx)
                        rows["mean_y"].append(
                            round(float(y.astype(np.float64).mean()), 6)
                        )
                    pos += frame_bytes
                    idx += 1
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=Y4M_FRAME_SCHEMA)


def synth_y4m_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic Y4M payloads, same closed-form contract as
    synth_ppm_media / synth_wav_media: width = 4 + id % 6, height =
    2 + id % 4, n_frames = 3 + id % 5, and byte j of frame f's Y plane
    is (id*11 + f*5 + j*3) % 256 (U/V planes use offsets +1/+2) — an
    oracle can state any sampled frame's luma mean without touching the
    binary, so what's verified is the encode -> binary column -> real
    container walk roundtrip."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                w, h, n_frames = 4 + i % 6, 2 + i % 4, 3 + i % 5
                j = np.arange(w * h, dtype=np.int64)
                frames = []
                for f in range(n_frames):
                    y = (i * 11 + f * 5 + j * 3) % 256
                    u = (i * 11 + f * 5 + j * 3 + 1) % 256
                    v = (i * 11 + f * 5 + j * 3 + 2) % 256
                    frames.append(np.concatenate([y, u, v])
                                  .astype(np.uint8).tobytes())
                payloads.append(encode_y4m(w, h, 25, frames))
                ids.append(i)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col)).mapInPandas(
        batches,
        schema=T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )


WAV_DOC_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("peak_abs", T.LongType()),
    T.StructField("zero_crossings", T.LongType()),
    T.StructField("rms", T.DoubleType()),
])


def wav_doc_features(media: DataFrame) -> DataFrame:
    """Doc-level audio feature extraction over the REAL RIFF/PCM parse
    (same chunk walk as decode_wav_items): peak |amplitude|, strict
    zero-crossing count (s_j * s_{j-1} < 0 — int-exact), and RMS — the
    clip-level stats an audio curation pipeline filters on (silence /
    clipping / noise gates).  Arrow-batched ``mapInPandas``; per item
    the reductions are numpy ops over the int16 plane.  RMS is the only
    float: sqrt((Σs²)/n) from an exact int64 square-sum, deterministic
    on both engines, rounded to 6 at the edge."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math
        import struct

        import numpy as np

        for pdf in it:
            ids, ns, peak, zc, rms = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
                    raise ValueError("not a RIFF/WAVE file")
                pos, data = 12, None
                while pos + 8 <= len(buf):
                    cid = buf[pos : pos + 4]
                    (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
                    if cid == b"data":
                        data = np.frombuffer(
                            buf[pos + 8 : pos + 8 + size], dtype="<i2"
                        )
                    pos += 8 + size + (size % 2)
                if data is None:
                    raise ValueError("missing data chunk")
                d = data.astype(np.int64)
                ids.append(int(doc_id))
                ns.append(int(d.size))
                peak.append(int(np.abs(d).max()) if d.size else 0)
                zc.append(int(np.sum(d[1:] * d[:-1] < 0)))
                sq = int(np.dot(d, d))
                # half-up quantization (NOT Python round(): banker's)
                # — mirrors the oracle's floor(x*1e6+0.5)/1e6
                rms.append(
                    math.floor(math.sqrt(sq / d.size) * 1e6 + 0.5) / 1e6
                    if d.size
                    else 0.0
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_samples": ns,
                    "peak_abs": peak,
                    "zero_crossings": zc,
                    "rms": rms,
                }
            )

    return media.mapInPandas(batches, schema=WAV_DOC_FEATURES_SCHEMA)
