"""`sample` — keep 1 in N events (T4).

Reference: config_panel.rs:1618-1638 — single `rate` option, default 10
("keep 1 out of every N events").

Spark design: `df.sample()` is seed-dependent on partitioning and therefore
not reproducible across cluster sizes; at 100 TB a re-run or an N→4N scale-up
would sample different rows.  We hash a stable key instead:
`xxhash64(key) % rate == 0` — deterministic per row, partitioning-independent,
pure JVM codegen, and still pushable past column-pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample(df: DataFrame, rate: int = 10, key: str | list[str] | None = None) -> DataFrame:
    """Keep rows where hash(key) ≡ 0 (mod rate). `key` defaults to all columns."""
    if rate <= 1:
        return df
    if key is None:
        cols = [F.col(c) for c in df.columns]
    elif isinstance(key, str):
        cols = [F.col(key)]
    else:
        cols = [F.col(c) for c in key]
    return df.filter(F.pmod(F.xxhash64(*cols), F.lit(rate)) == 0)


def sample_mod(df: DataFrame, rate: int, id_col: str) -> DataFrame:
    """Exact-arithmetic variant (id % rate == 0) — used when the oracle must
    reproduce the selection in ANSI SQL (xxhash64 is Spark-specific)."""
    if rate <= 1:
        return df
    return df.filter(F.pmod(F.col(id_col), F.lit(rate)) == 0)
