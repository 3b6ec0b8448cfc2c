"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline on /root/testdata/sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator for
the sf0.01 DuckDB cross-check. Ray is initialised by the driver BEFORE
this module is imported — nothing here calls ray.init/shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents →
    synthetic Common-Crawl-style web pages → extract_text →
    triple extraction → entity linking → groupby(subj) page fold →
    rendered pages. Returns the rendered content-page Dataset."""
    from rdf2smw_ray.pipelines.kg import flagship

    out = flagship("/root/testdata/sf0.001", concurrency=4, salt=4)
    return out["content"]


def queries() -> dict[str, Callable[[str], Any]]:
    from rdf2smw_ray.pipelines.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from rdf2smw_ray.pipelines.queries import all_oracle_sql

    return all_oracle_sql()
