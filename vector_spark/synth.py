"""Deterministic synthetic sources (the `demo_logs` analog).

The reference ships a configurable fake-data source — `demo_logs` with
format ∈ {json, apache_common, syslog, …}, count, interval
(ui/src/components/pipeline/config_panel.rs:775-900; used with count=10000 in
dev/configs/production/vector.toml:13-17).  Our analog generates the
Common-Crawl-style documents table of BASELINE `input_hint` plus the
enrichment tables, **distributed** (spark.range → mapInPandas, so a 10^12-row
generation plan parallelizes across executors) and **deterministic**: every
column is a pure function of doc_id via a splitmix64 hash chain — the same
row ids yield the same bytes on any cluster, any partitioning, any run.

Skew is built in: hosts follow a Zipfian(s=1.2) distribution so the hottest
host receives ~7% of all rows at 1000 hosts — enough to make the salting /
AQE-skew tests meaningful (SURVEY §7 "What's hard").
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from vector_spark.schema import DOCUMENTS_SCHEMA, HOST_GEO_SCHEMA, LANG_DICT_SCHEMA

SEED = 42
N_HOSTS = 1000
ZIPF_S = 1.2
BASE_TS = np.datetime64("2026-01-01T00:00:00", "s")

# Fixed 50-word vocabulary (FIXTURES.md §1).
VOCAB = (
    "the data spark table query scan filter join group agg window sort merge "
    "hash batch stream row column value key index part file block page cache "
    "disk net cpu node task stage shuffle skew salt plan cost rule tree leaf "
    "root span trace log event time byte rate mean count"
).split()
assert len(VOCAB) == 50

LANGS = ["en", "de", "fr", "es", "zh", "ru"]
LANG_CDF = np.cumsum([0.6, 0.1, 0.1, 0.08, 0.07, 0.05])

COUNTRIES = [
    "US", "DE", "FR", "ES", "CN", "RU", "GB", "JP", "BR", "IN",
    "CA", "AU", "NL", "SE", "PL", "IT", "KR", "MX", "TR", "ZA",
]
TLD_CLASSES = ["com", "org", "net", "edu"]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the one hash all pseudo-randomness derives from."""
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(1)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _uniform(ids: np.ndarray, stream: int) -> np.ndarray:
    """U[0,1) per id, independent per stream index."""
    h = _splitmix64(ids.astype(np.uint64) * np.uint64(1_000_003) + np.uint64(SEED * 97 + stream))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def zipf_cdf(n: int = N_HOSTS, s: float = ZIPF_S) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return np.cumsum(w / w.sum())


_ZIPF_CDF = zipf_cdf()


def _host_rank(ids: np.ndarray) -> np.ndarray:
    return np.searchsorted(_ZIPF_CDF, _uniform(ids, 1), side="right").clip(0, N_HOSTS - 1)


def _doc_batch(ids: np.ndarray) -> pd.DataFrame:
    """All document columns for a batch of doc_ids. Pure, vectorized."""
    ranks = _host_rank(ids)
    hosts = np.char.add("host-", np.char.zfill(ranks.astype("U4"), 4))
    urls = [f"https://{h}/p/{i}" for h, i in zip(hosts, ids)]
    ts = BASE_TS + (ids % 86400).astype("timedelta64[s]")

    # text: 5–60 words from VOCAB, word j of doc i = VOCAB[h(i, j) % 50]
    n_words = 5 + (_splitmix64(ids.astype(np.uint64) + np.uint64(SEED)) % np.uint64(56)).astype(np.int64)
    max_w = int(n_words.max()) if len(ids) else 0
    cols = np.arange(max_w, dtype=np.uint64)
    word_h = _splitmix64(ids.astype(np.uint64)[:, None] * np.uint64(64) + cols[None, :] + np.uint64(SEED * 31))
    word_idx = (word_h % np.uint64(50)).astype(np.int64)
    vocab_arr = np.array(VOCAB)
    texts = [" ".join(vocab_arr[word_idx[r, : n_words[r]]]) for r in range(len(ids))]

    htmls = [
        f"<html><head><title>T{i}</title></head><body><p>{t}</p></body></html>".encode()
        for i, t in zip(ids, texts)
    ]
    lang_idx = np.searchsorted(LANG_CDF, _uniform(ids, 2), side="right").clip(0, len(LANGS) - 1)
    langs = np.array(LANGS)[lang_idx]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(ts).dt.tz_localize("UTC"),
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def documents(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """The primary input table, generated distributed and deterministically."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _doc_batch(pdf["id"].to_numpy())

    return spark.range(0, n_rows, numPartitions=partitions).mapInPandas(gen, DOCUMENTS_SCHEMA)


def documents_pdf(n_rows: int) -> pd.DataFrame:
    """Driver-side generation for small fixtures/tests (identical bytes)."""
    return _doc_batch(np.arange(n_rows, dtype=np.int64))


# ---------------------------------------------------------------------------
# Enrichment tables (reference: `enrichment_tables` config key,
# vectorize-cli/src/validation/mod.rs:184) — small dims, broadcast-join sides.
# ---------------------------------------------------------------------------

def host_geo_pdf() -> pd.DataFrame:
    ranks = np.arange(N_HOSTS, dtype=np.int64)
    h = _splitmix64(ranks.astype(np.uint64) + np.uint64(SEED * 1009))
    present = (h % np.uint64(20)) != np.uint64(0)  # 5% of hosts absent → null tests
    ranks = ranks[present]
    h = h[present]
    return pd.DataFrame(
        {
            "host": ["host-%04d" % r for r in ranks],
            "country": np.array(COUNTRIES)[(h % np.uint64(len(COUNTRIES))).astype(int)],
            "asn": (64500 + (h % np.uint64(500)).astype(np.int64)).astype(np.int32),
            "tld_class": np.array(TLD_CLASSES)[((h >> np.uint64(8)) % np.uint64(4)).astype(int)],
        }
    )


def host_geo(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(host_geo_pdf(), HOST_GEO_SCHEMA)


_LANG_DICT_ROWS = [
    ("en", "English", "germanic"),
    ("de", "German", "germanic"),
    ("fr", "French", "romance"),
    ("es", "Spanish", "romance"),
    ("zh", "Chinese", "sinitic"),
    ("ru", "Russian", "slavic"),
]


def lang_dict(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_LANG_DICT_ROWS, LANG_DICT_SCHEMA)


# ---------------------------------------------------------------------------
# Sample log events — the Layer-4 functional-test input shape
# (functional_test.rs:26-37; UI generator view.rs:786-792, level cycles
# info/debug/warn/error per view.rs:771-772).
# ---------------------------------------------------------------------------

_LEVELS = ["info", "debug", "warn", "error"]
_STATUSES = ["200", "201", "301", "404", "500", "503"]


def sample_log_events(n: int) -> list[dict]:
    ids = np.arange(n, dtype=np.int64)
    h = _splitmix64(ids.astype(np.uint64) + np.uint64(SEED * 7))
    out = []
    for i in range(n):
        out.append(
            {
                "timestamp": pd.Timestamp("2026-01-31T17:30:00Z") + pd.Timedelta(seconds=i),
                "message": f"Processing incoming request {i}",
                "level": _LEVELS[i % 4],
                "host": "host-%04d" % (int(h[i]) % 20),
                "service": "demo-app",
                "pid": 12345 + i % 7,
                "status": _STATUSES[int(h[i] >> np.uint64(16)) % 6],
            }
        )
    return out
