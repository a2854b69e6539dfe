"""Embedding quantization — the storage layer of a 100 TB vector
corpus: float32 vectors cost 4 bytes/dim; per-vector int8 scalar
quantization cuts that 4× with bounded recall loss, and the
(scale, zero-point) pair makes reconstruction a two-op affine map.
Standard practice in every large ANN deployment (IVF/PQ systems
quantize before the index; re-rank reads the float vectors only for
the final candidates).

Spark shape: pure Column expressions over the array — transform /
array_min / array_max / aggregate, all codegen, no UDF. Codes are
EXACT integers (floor of an affine map, bankers'-rounding-free), so
the reconstruction error metrics are deterministic doubles any
engine reproduces bit-for-bit from the same input.

Reference parity: cademirch/ccgp-data-wrangling has no vector layer;
beyond-reference ANN-family surface (operators/knn.py neighbors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize_stats"]


def quantize_stats(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    levels: int = 255,
) -> DataFrame:
    """Per-vector int8 quantization audit: quantize to ``levels``+1
    codes (0..levels), reconstruct, report the error profile —
    (id, n_dims, vmin, vmax, scale, mse, max_abs_err) with floats
    rounded where the pipeline consumes them (6 dp).

    ``code_i = floor((x_i − vmin) / scale + 0.5)`` — floor of a
    shifted value, not ROUND, so no engine-specific half-even
    disagreement exists anywhere. Degenerate constant vectors
    (vmax == vmin) take scale 1 and code 0 everywhere: exact
    reconstruction, no division by zero."""
    v = F.col(vec_col).cast("array<double>")
    vmin, vmax = F.array_min(v), F.array_max(v)
    scale = F.when(vmax == vmin, F.lit(1.0)).otherwise(
        (vmax - vmin) / F.lit(float(levels))
    )
    n = F.size(v)
    # reconstruction: vmin + floor((x-vmin)/scale + 0.5) * scale
    recon_err = F.transform(
        v,
        lambda x: x
        - (vmin + F.floor((x - vmin) / scale + F.lit(0.5)) * scale),
    )
    sq = F.aggregate(
        recon_err, F.lit(0.0), lambda acc, e: acc + e * e
    )
    mx = F.array_max(F.transform(recon_err, F.abs))
    return df.select(
        F.col(id_col).alias("id"),
        n.cast("int").alias("n_dims"),
        F.round(vmin, 6).alias("vmin"),
        F.round(vmax, 6).alias("vmax"),
        F.round(scale, 6).alias("scale"),
        F.round(sq / n, 6).alias("mse"),
        F.round(mx, 6).alias("max_abs_err"),
    )
