"""Local mirror of the driver's correctness gate: run every
``queries()`` entry at sf0.001 and value-compare against its
``oracle_sql()`` via DuckDB (columns sorted by name, rows sorted,
values compared after normalization)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif not pd.api.types.is_object_dtype(df[c]) and not pd.api.types.is_string_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(name, ray_df, sql_df):
    a, b = _normalize(ray_df), _normalize(sql_df)
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ok = np.allclose(av.fillna(-1), bv.fillna(-1), atol=1e-4)
        else:
            ok = (av.fillna("∅").astype(str) == bv.fillna("∅").astype(str)).all()
        assert ok, f"{name}: column {c} differs\n{a[~ (av.astype(str)==bv.astype(str))].head()}\nvs\n{b[~ (av.astype(str)==bv.astype(str))].head()}"


def _to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # Dataset


@pytest.mark.parametrize(
    "name",
    sorted(
        __import__("importlib").import_module("rdf2smw_ray.pipelines.queries")
        .all_oracle_sql()
        .keys()
    ),
)
def test_query_matches_oracle(con, name):
    from rdf2smw_ray.pipelines.queries import all_oracle_sql, all_queries

    ray_df = _to_pandas(all_queries()[name](SF_DIR))
    sql_df = con.execute(all_oracle_sql()[name]).fetchdf()
    _compare(name, ray_df, sql_df)


def test_rows_only_queries_run():
    """Queries without SQL oracles must still run and return rows."""
    from rdf2smw_ray.pipelines.queries import all_oracle_sql, all_queries

    q = all_queries()
    no_oracle = set(q) - set(all_oracle_sql())
    for name in sorted(no_oracle):
        df = _to_pandas(q[name](SF_DIR))
        assert df is not None, name
        # near-dup results may legitimately be empty; others must not be
        if name not in ("embedding_near_dup", "minhash_dedup"):
            assert len(df) > 0, name


def test_entry_smoke():
    import __ray_entry__

    res = __ray_entry__.entry()
    df = _to_pandas(res)
    assert len(df) >= 0
    assert "title" in df.columns and "xml" in df.columns
