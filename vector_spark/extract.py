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


@F.pandas_udf(T.StringType())
def text_sha256_udf(html: pd.Series) -> pd.Series:
    return html.map(text_sha256)
