"""Byte-identical text extraction from html (the per-row invariant).

The BASELINE contract requires the pipeline's extracted text to be
byte-identical, per url, to the reference extractor.  There is exactly ONE
extractor function (`extract_text_bytes`) — a pure function of the html
bytes with no library or environment dependence — used by:

  * the synthetic-data generator (to produce expected fixtures),
  * the vectorized pandas UDF in the parse stage,
  * the pytest invariant check (sha256 comparison per url).

This mirrors how the reference treats `remap` programs as deterministic
per-event functions (ui/src/components/pipeline/config_panel.rs:1420-1441);
the extraction itself is the html→text analog of the observed
`. = parse_json!(string!(.message))` parse step (shared/src/config.rs:412).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Order matters and is part of the byte-level contract:
# 1. drop <script>/<style> subtrees entirely
# 2. replace every remaining tag with a single space
# 3. decode the five standard HTML entities
# 4. collapse whitespace runs to one space, strip ends
_SCRIPT_STYLE = re.compile(rb"(?is)<(script|style)\b[^>]*>.*?</\1\s*>")
_TAG = re.compile(rb"<[^>]*>")
_WS = re.compile(rb"\s+")
_ENTITIES = (
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&#39;", b"'"),
    (b"&amp;", b"&"),  # last, so &amp;lt; decodes to &lt; not <
)


def extract_text_bytes(html: bytes | None) -> bytes:
    """Pure function html-bytes → extracted-text-bytes. Total: never raises."""
    if html is None:
        return b""
    out = _SCRIPT_STYLE.sub(b" ", html)
    out = _TAG.sub(b" ", out)
    for ent, ch in _ENTITIES:
        out = out.replace(ent, ch)
    out = _WS.sub(b" ", out).strip()
    return out


def extract_text_str(html: bytes | None) -> str:
    return extract_text_bytes(html).decode("utf-8", errors="replace")


def text_sha256(html: bytes | None) -> str:
    return hashlib.sha256(extract_text_bytes(html)).hexdigest()


# ---------------------------------------------------------------------------
# Vectorized (Arrow) UDFs — the only Python that touches the hot path.
# ---------------------------------------------------------------------------

@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched html→text; one Python call per ~10k-row batch."""
    return html.map(extract_text_str)


def extract_text_col(html_col) -> "F.Column":
    """JVM fast path: the SAME extraction pipeline as `extract_text_bytes`,
    expressed as chained regexp_replace/replace inside whole-stage codegen —
    no Python in the loop at all.

    Byte-identical to the reference extractor for VALID UTF-8 html (the
    whole corpus): every pattern is pure ASCII, and Python-bytes regex
    semantics coincide with Java-string semantics for ASCII classes —
    `\\s`/`\\b`/`(?i)` are ASCII-only in BOTH Python `bytes` patterns and
    Java regex defaults (no UNICODE_CHARACTER_CLASS/UNICODE_CASE), so
    operating on decoded text before vs after the byte-level ops commutes.
    Inputs with INVALID UTF-8 can differ (Java replaces per malformed
    sequence, Python per byte) — use `extract_text_udf` when that matters.
    Equality on the corpus + adversarial cases is pinned by
    tests/test_extract.py::test_jvm_path_matches_reference."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    s = F.decode(c, "UTF-8")
    s = F.regexp_replace(s, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " ")
    s = F.regexp_replace(s, r"<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent.decode()), F.lit(ch.decode()))
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return F.coalesce(s, F.lit(""))


@F.pandas_udf(T.StringType())
def text_sha256_udf(html: pd.Series) -> pd.Series:
    return html.map(text_sha256)
