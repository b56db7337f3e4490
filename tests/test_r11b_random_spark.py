"""Spark == oracle on RANDOM corpora for the second-session operators.

The driver gate proves Spark == oracle on the shipped fixtures and the
property layer proves oracle == mathematics on arbitrary inputs; this
file closes the last edge of the triangle — the SPARK implementation on
arbitrary inputs — by writing hypothesis corpora to a temp parquet dir
and running the registered operator against its registered oracle with
the same comparator the driver uses. Few examples (Spark jobs cost
seconds each); the cheap DuckDB-side layer carries the example count."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vena_etl_tool_spark.registry import all_specs
from vena_etl_tool_spark.testing import canonical_rows

_SPECS = all_specs()

_VOCAB = ["aa", "ab", "ba", "bb", "ca"]
_doc = st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=18).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=10)
_clones = st.lists(
    st.tuples(st.integers(min_value=0, max_value=9), st.sampled_from(_VOCAB)),
    max_size=3,
)

_settings = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _diff_on_random_corpus(spark, name: str, texts: list[str]) -> None:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).astype({"doc_id": "int64", "n_chars": "int64"})
    with tempfile.TemporaryDirectory(prefix="randcorpus_") as d:
        path = os.path.join(d, "documents.parquet")
        pdf.to_parquet(path)
        spark_pdf = _SPECS[name].fn(spark, d).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
        )
        oracle_pdf = con.execute(_SPECS[name].oracle).df()
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
    assert canonical_rows(spark_pdf) == canonical_rows(oracle_pdf)


@pytest.mark.parametrize("name", ["dedup_sorted_neighborhood", "dedup_winnowing"])
def test_spark_matches_oracle_on_random_corpora(spark, name):
    @given(texts=_corpus, clones=_clones)
    @_settings
    def run(texts, clones):
        full = list(texts)
        for idx, tok in clones:
            if idx < len(texts):
                full.append(texts[idx] + " " + tok)
        _diff_on_random_corpus(spark, name, full)

    run()


@pytest.mark.parametrize(
    "name",
    [
        "text_substring_dedup_spans",
        "text_substring_dedup_trim",
        "dedup_snm_multipass",
        "text_rake_keywords",
    ],
)
def test_spark_matches_oracle_on_random_corpora_r11c(spark, name):
    """Close the triangle for the third-session document operators too:
    the registered Spark implementation against its registered oracle on
    hypothesis corpora with the driver's comparator (the DuckDB-side
    property layer in test_r11c_properties.py carries the example
    count)."""

    @given(texts=_corpus, clones=_clones)
    @_settings
    def run(texts, clones):
        full = list(texts)
        for idx, tok in clones:
            if idx < len(texts):
                full.append(texts[idx] + " " + tok)
        _diff_on_random_corpus(spark, name, full)

    run()
