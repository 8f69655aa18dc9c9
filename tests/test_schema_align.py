"""S9 schema alignment (upload_dataset.py:17-19 semantics): every split cast
to the train split's features; missing columns refuse, extra columns drop,
column order normalizes. Value round-trip vs the DuckDB oracle is covered by
test_plans.py::test_query_matches_oracle[schema_align]."""

import pytest

from news_crawler_slm_spark.operators.schema_align import align_splits, align_to_schema


def test_drifted_types_restored_and_order_normalized(spark):
    train = spark.createDataFrame([(1, "a", 10)], "id long, s string, n long")
    # val drifted: id narrowed, n widened, columns reordered, extra column
    val = spark.createDataFrame([(20.0, 2, "b", True)], "n double, id int, s string, extra boolean")
    aligned = align_to_schema(val, train.schema)
    assert aligned.schema == train.schema  # order + types + no `extra`
    assert aligned.collect() == [(2, "b", 20)]


def test_missing_column_refuses(spark):
    train = spark.createDataFrame([(1, "a")], "id long, s string")
    bad = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="missing.*'s'"):
        align_to_schema(bad, train.schema)


def test_align_splits_tags_and_unions(spark):
    train = spark.createDataFrame([(1,)], "id long")
    test = spark.createDataFrame([(2,)], "id int")
    out = align_splits({"train": train, "test": test})
    rows = {(r.id, r.split) for r in out.collect()}
    assert rows == {(1, "train"), (2, "test")}
    assert [f.dataType.simpleString() for f in out.schema.fields] == ["bigint", "string"]
