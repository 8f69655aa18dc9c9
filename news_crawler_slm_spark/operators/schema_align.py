"""Schema alignment across dataset splits (SURVEY.md §2.1 S9).

Reference semantics (data_extraction/upload_dataset.py:17-19): splits of the
same dataset can disagree on inferred column types — a split whose column is
all-missing gets a different Arrow dtype — so every split is ``cast()`` to
the *train* split's features before publishing. The remote Hub push itself
(upload_dataset.py:22) is out of scope offline; the cast is the operator.

Spark-first shape: a pure narrow projection — ``select(cast per reference
field)`` — so alignment never shuffles, fuses into whole-stage codegen, and
is applied per split before the union. Column ORDER is also normalized to
the reference schema (HF features are ordered), so unions downstream are
position-safe as well as name-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def align_to_schema(df: DataFrame, reference: StructType) -> DataFrame:
    """Cast ``df`` to the reference schema: reference column order, reference
    types. Missing columns raise (same contract as ``datasets.cast``, which
    refuses a features mismatch); extra columns are dropped — the reference
    dataset dict carries identical column *names* per split by construction
    (create_dataset.py), only dtypes drift.
    """
    have = {f.name for f in df.schema.fields}
    missing = [f.name for f in reference.fields if f.name not in have]
    if missing:
        raise ValueError(f"cannot align: columns missing from input: {missing}")
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in reference.fields]
    )


def align_splits(splits: dict[str, DataFrame], reference_split: str = "train") -> DataFrame:
    """Union all splits after casting each to the reference split's schema,
    tagging provenance in a ``split`` column (upload_dataset.py:19 analog —
    the DatasetDict comprehension over ``dataset.items()``)."""
    ref = splits[reference_split].schema
    out = None
    for name in sorted(splits):
        aligned = align_to_schema(splits[name], ref).withColumn("split", F.lit(name))
        out = aligned if out is None else out.unionByName(aligned)
    return out
