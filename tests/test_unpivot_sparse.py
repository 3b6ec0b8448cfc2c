"""event_counts_long zero-fill on SPARSE data (the shipped testdata is
dense — every user has every event type — so the explicit-zero path
needs a synthetic sparse table)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_event_counts_long_emits_zero_rows(ray_session, tmp_path):
    from rdf2smw_ray.pipelines.relational import (
        EVENT_COUNTS_LONG_SQL,
        event_counts_long,
    )

    rng = np.random.RandomState(0)
    n = 400
    types = np.array(["click", "error", "purchase", "signup", "view"])
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2025-01-01")
            + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
            # users 0-9 get only their own 1-2 types -> guaranteed zeros
            "user_id": rng.randint(0, 10, n).astype(np.int64),
            "value": rng.rand(n),
        }
    )
    df["event_type"] = types[df["user_id"].to_numpy() % 2 * 2]  # 'click' or 'purchase'
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")

    got = event_counts_long(str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.execute(EVENT_COUNTS_LONG_SQL).fetchdf()
    for c in want.columns:
        if want[c].dtype != got[c].dtype:
            want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want[got.columns].reset_index(drop=True))
    assert (got["n"] == 0).sum() > 0, "sparse input must produce explicit zero rows"
