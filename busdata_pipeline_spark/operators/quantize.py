"""Embedding quantization — the storage/serving-side compression step of
an embedding pipeline (int8 symmetric absmax, the llama.cpp / FAISS
``SQ8`` scheme): at 100 TB an ``array<float>`` column is 4 bytes/dim,
and serving ANN from int8 cuts that 4× with ~0.3% cosine error.

Implemented over ``DataFrame.mapInArrow`` — the zero-copy Arrow seam
(no pandas materialization at all): each RecordBatch's list column is
reshaped into one (n, dim) float64 matrix and quantized with vectorized
numpy.  This is deliberately the fastest Python-side path Spark offers;
the per-element arithmetic is pinned to scalar-identical IEEE float64
ops so a DuckDB oracle can replay it bit-for-bit:

    scale = max_i |x_i|                      (exact: float32 -> float64)
    q_i   = floor(x_i * 127.0 / scale + 0.5) (half-up, in [-127, 127])
    err_i = (x_i - q_i * scale / 127.0)^2    (reconstruction error)

The query surface returns driver-hashable SCALARS, not the int8 vector
itself: order-independent integer signatures (sum, sum of squares, and
the position-weighted sum — together they pin the quantized vector far
beyond accidental collision) plus the 2^-20-quantized reconstruction
error, summed in integer space so summation order cannot perturb bits.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

_SIG_SCHEMA = (
    "vec_id long, scale double, q_sum long, q_sumsq long, q_poly long, "
    "recon_err double"
)


def int8_quantize_signatures(embeddings: DataFrame,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Symmetric absmax int8 quantization signatures per vector.

    Arrow-native: ``mapInArrow`` hands us pyarrow RecordBatches; the
    list column's flat values buffer is viewed as an (n, dim) matrix
    without any per-row Python.  Scales to any corpus — no shuffle, no
    driver traffic, embarrassingly parallel over input splits.
    """

    def quantize(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(batch.schema.get_field_index(id_col))
            emb = batch.column(batch.schema.get_field_index(vec_col))
            offs = emb.offsets.to_numpy(zero_copy_only=False)
            widths = offs[1:] - offs[:-1]
            dim = int(widths[0])
            if not (widths == dim).all():
                raise ValueError("ragged embedding column")
            flat = emb.values.to_numpy(zero_copy_only=False)
            x = flat[offs[0]:offs[-1]].astype(np.float64).reshape(n, dim)

            scale = np.abs(x).max(axis=1)                      # exact
            safe = np.where(scale == 0.0, 1.0, scale)
            q = np.floor(x * 127.0 / safe[:, None] + 0.5)
            q = np.where(scale[:, None] == 0.0, 0.0, q)
            qi = q.astype(np.int64)

            deq = q * scale[:, None] / 127.0
            err = (x - deq) ** 2
            errq = np.floor(err * 1048576.0 + 0.5).astype(np.int64)

            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.to_numpy(zero_copy_only=False),
                             type=pa.int64()),
                    pa.array(scale, type=pa.float64()),
                    pa.array(qi.sum(axis=1), type=pa.int64()),
                    pa.array((qi * qi).sum(axis=1), type=pa.int64()),
                    pa.array((qi * np.arange(1, dim + 1)).sum(axis=1),
                             type=pa.int64()),
                    pa.array(errq.sum(axis=1) / 1048576.0,
                             type=pa.float64()),
                ],
                names=["vec_id", "scale", "q_sum", "q_sumsq", "q_poly",
                       "recon_err"],
            )

    return embeddings.select(id_col, vec_col).mapInArrow(
        quantize, _SIG_SCHEMA
    )


def _sign_matrix(in_dim: int, out_dim: int):
    """Deterministic +-1 matrix from the portable 60-bit md5 of "j,p" —
    the same bits DuckDB derives via ('0x'||substr(md5(j||','||p),1,15))
    ::UBIGINT, so the oracle's relational replay sees identical signs."""
    import hashlib

    import numpy as np

    s = np.empty((in_dim, out_dim), dtype=np.int64)
    for j in range(in_dim):
        for p in range(out_dim):
            h = int(hashlib.md5(f"{j},{p}".encode()).hexdigest()[:15], 16)
            s[j, p] = 1 if h % 2 == 0 else -1
    return s


def sign_projection_signatures(embeddings: DataFrame,
                               out_dim: int = 16,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding") -> DataFrame:
    """JL sign projection norms per vector: (vec_id, sp2, sq2) where
    sp2 = sum_p (P x_q)_p^2 and sq2 = sum_j x_q_j^2 over the 2^20-
    micro-unit quantized vector x_q.  One int64 GEMM per Arrow batch
    (exact — |q| <= ~2^22, partial sums < 2^60); callers derive the
    norm-preservation ratio sqrt(sp2/m)/sqrt(sq2) in SQL so the
    rounding discipline stays visible in the plan.  Same scaling shape
    as int8_quantize_signatures: no shuffle, no driver traffic."""

    def project(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import numpy as np
        import pyarrow as pa

        signs = None
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(batch.schema.get_field_index(id_col))
            emb = batch.column(batch.schema.get_field_index(vec_col))
            offs = emb.offsets.to_numpy(zero_copy_only=False)
            widths = offs[1:] - offs[:-1]
            dim = int(widths[0])
            if not (widths == dim).all():
                raise ValueError("ragged embedding column")
            if signs is None:
                signs = _sign_matrix(dim, out_dim)
            elif signs.shape[0] != dim:
                # a later batch that is internally uniform but at a
                # different width would otherwise die inside q @ signs
                # with an opaque shape error (ADVICE r8)
                raise ValueError(
                    "ragged embedding column: batch dim "
                    f"{dim} != first batch dim {signs.shape[0]}"
                )
            flat = emb.values.to_numpy(zero_copy_only=False)
            x = flat[offs[0]:offs[-1]].astype(np.float64).reshape(n, dim)

            q = np.floor(x * 1048576.0 + 0.5).astype(np.int64)
            proj = q @ signs                                   # exact int64
            sp2 = (proj * proj).sum(axis=1)
            sq2 = (q * q).sum(axis=1)

            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.to_numpy(zero_copy_only=False),
                             type=pa.int64()),
                    pa.array(sp2, type=pa.int64()),
                    pa.array(sq2, type=pa.int64()),
                ],
                names=["vec_id", "sp2", "sq2"],
            )

    return embeddings.select(id_col, vec_col).mapInArrow(
        project, "vec_id long, sp2 long, sq2 long"
    )
