"""Silence two benign Ray Data log nuisances (session owners only —
bench/CLI/tests call this BEFORE ray.init; library code never touches
logging or the environment).

1. ``RefBundle with a different schema … names=[]`` (driver,
   ``streaming_executor_state``): Ray emits a columnless placeholder
   block for a grouped-exchange partition that received no rows (fewer
   groups than partitions at small SF). Our map_groups functions never
   run on those partitions, so no typed-empty-frame fix on our side can
   reach them — the block is manufactured by Ray itself.
2. ``Failed to hash the schemas (for deduplication): unhashable type:
   'dict'`` (workers, ``transform_pyarrow.unify_schemas``): a
   best-effort schema-dedup fast path that falls back to the full
   unify when ``PandasBlockSchema`` isn't hashable; purely cosmetic.

Both are WARNING-level logs about states Ray handles correctly, and
both loggers are (re)configured by ``ray.data``'s own dictConfig on
import — in the driver AND in every worker — so a plain ``setLevel``
is overwritten. The supported override is the ``RAY_DATA_LOGGING_CONFIG``
env var: it points Ray's configure_logging at our YAML (the stock
config plus the two loggers pinned to ERROR) and, being an env var set
before ``ray.init``, it reaches every worker process without a
``runtime_env`` (whose per-worker setup-hook plumbing is both heavier
and unpicklable-import-prone).
"""

from __future__ import annotations

import os

_CONFIG_PATH = os.path.join(os.path.dirname(__file__), "ray_data_logging.yaml")


def quiet_data_logs() -> None:
    """Point Ray Data's logging at the quiet config. Call before
    ``ray.init`` (the env var must be set before workers start).
    Respects an explicit user-set RAY_DATA_LOGGING_CONFIG."""
    os.environ.setdefault("RAY_DATA_LOGGING_CONFIG", _CONFIG_PATH)
