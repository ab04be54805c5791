"""Single-process crawl oracle for end-to-end parity tests.

The implementation lives in ``lopez_ray.crawler.sim_oracle`` (it also
backs the driver-visible read_parquet DuckDB oracles); this shim keeps
the historical two-value signature the e2e tests use.
"""

from __future__ import annotations

from lopez_ray.crawler.sim_oracle import FETCH_SQL  # noqa: F401  (re-export)
from lopez_ray.crawler.sim_oracle import oracle_crawl as _oracle_crawl


def oracle_crawl(*args, **kwargs):
    status, order, _edges = _oracle_crawl(*args, **kwargs)
    return status, order
