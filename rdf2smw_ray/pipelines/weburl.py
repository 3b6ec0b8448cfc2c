"""URL parsing + per-domain corpus stats over Common-Crawl-style pages
(url, warc_ts, ...) — the standard first rollup a web pipeline runs
(domain allow/deny lists, crawl coverage, per-host dedup all start
from this table).

Shape: host/path come from ONE vectorized ``str.extract`` per batch; a
batch-local (domain, path) combiner collapses repeat fetches before
the shuffle; distinct-path counting is a native groupby over a
composite key (the shuffle carries one row per distinct (domain, path)
per batch, never per page); the per-domain rollup is a second, tiny
groupby. No driver-side state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# scheme://host[/path...] — host stops at / ? #; path stops at ? #
_URL_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)([^?#]*)"
_SEP = "\x01"  # never appears in a URL


def _partial(batch: pa.Table) -> pa.Table:
    u = pd.Series(batch["url"].to_pylist(), dtype=object).fillna("")
    ext = u.str.extract(_URL_RE)
    key = ext[0].fillna("") + _SEP + ext[1].fillna("")
    ts = batch["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    g = (
        pd.DataFrame({"dp": key, "ts": ts})
        .groupby("dp", sort=False)["ts"]
        .agg(["size", "min", "max"])
    )
    return pa.table(
        {
            "dp": pa.array(g.index.to_numpy(), pa.string()),
            "n": pa.array(g["size"].to_numpy().astype(np.int64), pa.int64()),
            "tmin": pa.array(g["min"].to_numpy(), pa.int64()),
            "tmax": pa.array(g["max"].to_numpy(), pa.int64()),
        }
    )


def _domain_partial(batch: pa.Table) -> pa.Table:
    dp = pd.Series(batch["dp"].to_pylist(), dtype=object)
    dom = dp.str.partition(_SEP)[0]
    df = pd.DataFrame(
        {
            "domain": dom,
            "n": batch["n"].to_numpy(),
            "tmin": batch["tmin"].to_numpy(),
            "tmax": batch["tmax"].to_numpy(),
        }
    )
    g = df.groupby("domain", sort=False).agg(
        n_pages=("n", "sum"),
        n_paths=("n", "size"),
        first_ts_us=("tmin", "min"),
        last_ts_us=("tmax", "max"),
    )
    return pa.table(
        {
            "domain": pa.array(g.index.to_numpy(), pa.string()),
            "n_pages": pa.array(g["n_pages"].to_numpy().astype(np.int64), pa.int64()),
            "n_paths": pa.array(g["n_paths"].to_numpy().astype(np.int64), pa.int64()),
            "first_ts_us": pa.array(g["first_ts_us"].to_numpy(), pa.int64()),
            "last_ts_us": pa.array(g["last_ts_us"].to_numpy(), pa.int64()),
        }
    )


def domain_stats(pages):
    """pages (url, warc_ts, ...) → (domain, n_pages, n_paths,
    first_ts_us, last_ts_us), n_paths = exact distinct paths."""
    from ray.data.aggregate import Max, Min, Sum

    per_path = (
        pages.map_batches(_partial, batch_format="pyarrow")
        .groupby("dp")
        .aggregate(
            Sum("n", alias_name="n"),
            Min("tmin", alias_name="tmin"),
            Max("tmax", alias_name="tmax"),
        )
    )
    return (
        per_path.map_batches(_domain_partial, batch_format="pyarrow")
        .groupby("domain")
        .aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Sum("n_paths", alias_name="n_paths"),
            Min("first_ts_us", alias_name="first_ts_us"),
            Max("last_ts_us", alias_name="last_ts_us"),
        )
    )


# ---------------------------------------------------------------------------
# URL canonicalization + crawl dedup
# ---------------------------------------------------------------------------
def canonicalize_urls(u: pd.Series) -> pd.Series:
    """Crawl-style URL canonicalization, fully vectorized, with RE2-safe
    patterns so the oracle can mirror every rule in DuckDB:

    1. drop the fragment (``#...``) and the whole query string
       (aggressive policy — tracking params dominate crawl dupes)
    2. lowercase the ``scheme://host`` head
    3. strip a ``www.`` host prefix
    4. strip one trailing slash from the path
    """
    s = u.fillna("").str.replace(r"#.*$", "", regex=True)
    s = s.str.replace(r"\?.*$", "", regex=True)
    ext = s.str.extract(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/]*)(.*)$")
    head = (
        ext[0]
        .fillna("")
        .str.lower()
        .str.replace("://www.", "://", regex=False)
    )
    tail = ext[1].fillna("").str.replace(r"/$", "", regex=True)
    out = head + tail
    # scheme-less / relative URLs don't match the head regex; pass the
    # fragment/query-stripped string through unchanged rather than
    # collapsing every such row to "" (which would merge all of them
    # into one bogus dedup group)
    no_scheme = ext[0].isna()
    out[no_scheme] = s[no_scheme]
    return out


def url_dedup(pages):
    """Exact crawl dedup on the CANONICAL url: keep the smallest doc_id
    per canonical form and count how many raw fetches collapsed into
    it. Per-batch combiner (canonicalize → partial min/count) runs
    before the ONE canonical-key shuffle, so the exchange carries at
    most one row per canonical url per block — raw fetch rows never
    move. Input: any Dataset with (doc_id, url) columns."""
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        u = pd.Series(batch["url"].to_pylist(), dtype=object)
        g = (
            pd.DataFrame(
                {
                    "canonical_url": canonicalize_urls(u),
                    "doc_id": batch["doc_id"].to_numpy(),
                }
            )
            .groupby("canonical_url", sort=False)["doc_id"]
            .agg(["min", "size"])
        )
        return pa.table(
            {
                "canonical_url": pa.array(g.index.to_numpy(), pa.string()),
                "keeper_doc": pa.array(g["min"].to_numpy().astype(np.int64), pa.int64()),
                "n_dups": pa.array(g["size"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    return (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby("canonical_url")
        .aggregate(
            Min("keeper_doc", alias_name="keeper_doc"),
            Sum("n_dups", alias_name="n_dups"),
        )
    )
