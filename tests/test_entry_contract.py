"""Replicates the driver's correctness gate locally: run every queries()
entry at sf0.001 and compare against its oracle_sql() via DuckDB
(row count + sorted-column values)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(list(pdf.columns), kind="stable").reset_index(drop=True)
    return pdf


ALL = sorted(entrymod.queries())
ORACLED = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(spark, name):
    fn = entrymod.queries()[name]
    got = fn(spark, SF_DIR).toPandas()
    if name not in ORACLED:
        assert len(got) >= 0  # rows-only check, mirror of the driver
        return
    want = _duck().execute(ORACLED[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    a, b = _normalize(got), _normalize(want)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False,
                                  rtol=0, atol=1e-9)
