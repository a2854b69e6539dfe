"""Z-order (Morton curve) clustering for multi-dimensional pruning.

A parquet table sorted on ONE key prunes scans on that key only; a
100 TB fact table queried by (user, time), (lat, long), or
(domain, quality-band) needs *both* dimensions bounded per file so
min/max row-group statistics can exclude files for any box predicate.
Interleaving the quantized dimension bits (Morton 1966; the layout
behind Delta/Iceberg ``OPTIMIZE ZORDER BY``) gives every file a small
rectangle of the key space: a range-repartition + within-partition
sort on the z-key, nothing more exotic.

Everything is integer/IEEE arithmetic (quantize = bounded double
multiply + floor; interleave = shifts and masks), deterministic and
replayable in the DuckDB oracle bit-for-bit.

Scale shape: ``repartitionByRange`` on the z-key samples the key
distribution (one extra lightweight pass), so output files are
balanced even under skew; the sort is within-partition only — no
global sort, no single-partition stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["quantize", "morton2", "zorder_layout"]


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into ``0 .. 2^bits - 1`` over [lo, hi].

    Values outside the range clamp to the edge cells. Plain double
    multiply + floor — IEEE-identical across engines.
    """
    cells = (1 << bits) - 1
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        * F.lit(float(cells))
        / F.lit(float(hi - lo))
    )
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(cells)).cast("long")


def morton2(x: Column, y: Column, bits: int) -> Column:
    """Interleave two ``bits``-wide integers: x in even bit positions,
    y in odd — the 2-D Morton key. ``2*bits`` result bits, so up to
    31 bits per dimension fits int64.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_layout(
    df: DataFrame,
    z_col: Column,
    *,
    n_files: int,
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the z-key (one
    sampling pass keeps files balanced under skew), then sort within
    each partition so every row group's min/max covers a contiguous
    z-range — i.e. a small rectangle of the original key space.
    """
    out = df.withColumn("_z", z_col)
    return (
        out.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
