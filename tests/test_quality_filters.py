"""Gopher-style quality filters: metric correctness on hand-checkable
documents, plus the scale-shape guarantee (no UDFs in the plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.quality_filters import (
    gopher_quality,
    line_shape_metrics,
    token_repetition_metrics,
    word_shape_metrics,
)


@pytest.fixture
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b a b a b"),  # "a b" 4/7 of bigrams
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "x"),  # shorter than every gram size
            (4, "p q r s t p q r s t p q r s t"),  # repeated 5-gram
        ],
        "doc_id long, text string",
    )


def test_token_repetition_exact_values(docs):
    m = {r["doc_id"]: r for r in token_repetition_metrics(docs).collect()}
    assert m[1]["top2gram_frac"] == pytest.approx(4 / 7)
    assert m[1]["top3gram_frac"] == pytest.approx(3 / 6)
    assert m[2]["top2gram_frac"] == pytest.approx(1 / 8)
    assert m[2]["dup5gram_frac"] == pytest.approx(0.0)
    # doc 4: 11 5-grams, 5 distinct -> 6/11 repeats
    assert m[4]["dup5gram_frac"] == pytest.approx(1 - 5 / 11)
    # too-short docs score 0, not null
    assert m[3]["top2gram_frac"] == 0.0
    assert m[3]["dup5gram_frac"] == 0.0


def test_word_shape_metrics(docs):
    m = {r["doc_id"]: r for r in word_shape_metrics(docs).collect()}
    assert m[2]["word_count"] == 9
    # 9 words, 35 non-space chars -> mean 35/9
    assert m[2]["mean_word_len"] == pytest.approx(35 / 9)
    assert m[3]["word_count"] == 1
    assert m[3]["mean_word_len"] == 1.0


def test_line_shape_metrics(spark):
    df = spark.createDataFrame(
        [(1, "alpha\nbeta\nalpha\n- bullet\ntrailing...")],
        "doc_id long, text string",
    )
    r = line_shape_metrics(df).first()
    assert r["dup_line_frac"] == pytest.approx(1 / 5)
    assert r["bullet_line_frac"] == pytest.approx(1 / 5)
    assert r["ellipsis_line_frac"] == pytest.approx(1 / 5)


def test_gopher_keep_thresholds(docs):
    out = gopher_quality(
        docs,
        thresholds={"min_words": 5, "min_mean_word_len": 0.0,
                    "max_top2gram_frac": 0.2},
    )
    kept = {r["doc_id"]: r["keep"] for r in out.collect()}
    assert kept[1] is False  # top2gram 0.571 > 0.2
    assert kept[2] is True
    assert kept[3] is False  # 1 word < 5
    assert kept[4] is False  # dup5gram 0.545 > 0.3


def test_no_python_udf_in_plan(docs):
    plan = token_repetition_metrics(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    plan2 = gopher_quality(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan2 and "ArrowEvalPython" not in plan2


def test_every_doc_gets_a_row(spark):
    # includes a doc that yields no grams at any size, and empty text
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["", "one", "two words", "a b c d e f"])],
        "doc_id long, text string",
    )
    out = gopher_quality(df)
    assert out.count() == 4
    assert out.filter(F.col("top2gram_frac").isNull()).count() == 0


def test_single_gram_size_configuration(spark):
    # regression: pivot names columns "<n>_<alias>" even for ONE pivot
    # value when there are multiple aggregations
    df = spark.createDataFrame(
        [(1, "a b a b a b a b")], "doc_id long, text string"
    )
    m = token_repetition_metrics(df, top_grams=(2,), dup_grams=(2,)).first()
    assert m["top2gram_frac"] == pytest.approx(4 / 7)
    assert m["dup2gram_frac"] == pytest.approx(1 - 2 / 7)
