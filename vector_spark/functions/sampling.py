"""Deterministic sampling for data mixing.

Training-data pipelines re-weight domains/languages ("mix 50 % web, 30 %
code, 20 % academic") with per-stratum sampling rates.  `df.sampleBy` is
nondeterministic across retries and partition layouts, which breaks
reproducible dataset builds and lineage — so this module samples by HASH of
a stable key, the same reasoning that made the t4 sample operator
hash-based: a row's fate depends only on (key, seed, its stratum's rate),
never on partitioning, task retries, or row order.  Rate changes are
monotone by construction (raising a stratum's rate only ADDS rows — the
kept set at rate p is a subset of the kept set at p' > p), which is what
lets you grow a mix without resampling the world.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _bucket(key: Column, seed: str, method: str) -> Column:
    """Uniform [0, 1) bucket from a stable key.

    ``xxhash64`` — pure JVM, the throughput path.  ``md5`` — the
    SQL-recomputable twin (28-bit md5 prefix, the fingerprint_modular
    trick) so an external system (or the DuckDB oracle) can reproduce the
    exact sample membership."""
    salted = F.concat(key.cast("string"), F.lit(seed))
    if method == "xxhash64":
        h = F.pmod(F.xxhash64(salted), F.lit(_BUCKETS))
    elif method == "md5":
        h = F.conv(F.substring(F.md5(salted), 1, 7), 16, 10).cast("long") % _BUCKETS
    else:
        raise ValueError(f"unknown hash method {method!r} (expected xxhash64|md5)")
    return h / F.lit(float(_BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    seed: str = "",
    method: str = "xxhash64",
) -> DataFrame:
    """Keep each row iff bucket(key) < fraction(stratum) — a map-only
    filter, zero shuffle, pushed into the scan where the source supports
    it.  ``fractions`` maps stratum value → keep rate in [0, 1]; strata not
    listed use ``default_fraction``.  NULL strata use ``default_fraction``.

    At 100 TB this is the only sane shape: no count-first pass, no
    per-stratum state, and the sample is a pure function of the data — two
    runs (or a retried stage) agree row-for-row."""
    for k, v in fractions.items():
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"fraction for stratum {k!r} must be in [0,1], got {v}")
    if not (0.0 <= default_fraction <= 1.0):
        raise ValueError(f"default_fraction must be in [0,1], got {default_fraction}")
    rate = F.lit(default_fraction)
    for k, v in fractions.items():
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    return df.filter(_bucket(F.col(key_col), seed, method) < rate)
