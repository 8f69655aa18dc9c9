"""Z-order (Morton) clustering for multi-column data skipping — the
lakehouse layout trick (Delta OPTIMIZE ZORDER BY, Iceberg sort orders)
re-expressed as plain DataFrame ops: interleave the bits of the clustering
columns into one Morton key, range-partition + sort by it, and every
written file ends up with TIGHT min/max ranges on ALL clustering columns
at once — so predicate pushdown can skip files for filters on any of
them, not just the primary sort column.

Why it matters at 100 TB: a frontier/events table sorted by host alone
skips nothing for time-range scans, and vice versa; Z-ordering by
(host_hash, ts) bounds BOTH spans per file at a modest cost to each.
Everything here is exact integer column arithmetic (shifts/masks via
multiplication by powers of two, bitwiseAND/OR) inside whole-stage
codegen — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def interleave_bits(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave ``bits`` low bits of each non-negative integer
    column: result bit (b * n + i) = bit b of cols[i]. n * bits must fit a
    signed 64-bit long (<= 62 keeps the sign bit clear)."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            out = out + bit * F.lit(1 << (b * n + i)).cast("long")
    return out


def with_zvalue(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS, out_col: str = "_z"
) -> DataFrame:
    """Add the Morton key for arbitrary NUMERIC columns: each column is
    min/max-scaled to [0, 2^bits) with a broadcast one-row stats subquery
    (no driver action), then bit-interleaved. Constant columns map to 0;
    nulls sort first (z contribution 0)."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__mx_{c}") for c in cols],
    )
    scaled = []
    top = float((1 << bits) - 1)
    with_stats = df.crossJoin(F.broadcast(stats))
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        scaled.append(
            F.floor(
                (F.coalesce(F.col(c).cast("double"), mn) - mn) / span * top
            ).cast("long")
        )
    return with_stats.withColumn(out_col, interleave_bits(scaled, bits)).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 8,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key: range
    repartition on z (balanced files via range sampling, the same
    machinery the distributed rank rides) + within-partition sort, key
    dropped before write. Readers see the identical rows; only file-level
    min/max statistics change."""
    z = with_zvalue(df, cols, bits)
    (
        z.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
