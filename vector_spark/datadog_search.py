"""Datadog search syntax → Spark Column (filter ``condition_type =
"datadog_search"``).

Reference: the filter form's condition types are ``vrl | datadog_search |
is_log | is_metric | is_trace`` (ui/src/components/pipeline/config_panel.rs:
1461-1467, citing vector.dev's filter syntaxes).  This compiles the common
core of the public Datadog log-search grammar:

  bare term            ``error``              — word match on the default
                                               field (``message``),
                                               case-insensitive
  quoted phrase        ``"timed out"``        — phrase match on message
  attribute match      ``status:error``       — equality on the column
                                               (leading ``@`` stripped);
                                               numeric literals compare
                                               numerically
  wildcards            ``host:web-*``         — LIKE-style ``*`` anywhere in
                                               the value
  existence            ``user_id:*``          — attribute present (not null)
  ranges               ``status:>=400``, ``duration:[100 TO 500]`` (inclusive)
  boolean operators    ``a AND b``, ``a OR b``, ``NOT a``, ``-a``, parens;
                       juxtaposition (``a b``) is implicit AND

Everything compiles to JVM Column expressions (equality / comparison /
rlike / like), so datadog_search filters stay pushdown-eligible — never a
UDF.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_FIELD = "message"

_TOKEN_RE = re.compile(
    r"""
    \s*(
        \(|\)
      | -
      | "(?:[^"\\]|\\.)*"                      # quoted phrase
      | [@\w.][\w.@]*:\[[^\]]*\]               # key:[a TO b]
      | [@\w.][\w.@]*:(?:"(?:[^"\\]|\\.)*"|[^\s()]+)   # key:value
      | [^\s()]+                               # bare term / AND / OR / NOT
    )
    """,
    re.VERBOSE,
)


class DatadogSearchError(ValueError):
    pass


def _tokenize(src: str) -> list[str]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise DatadogSearchError(f"cannot tokenize at {src[pos:]!r}")
            break
        out.append(m.group(1))
        pos = m.end()
    return out


@dataclass
class _Parser:
    tokens: list[str]
    pos: int = 0
    columns: set[str] | None = None

    def peek(self) -> str | None:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def next(self) -> str:
        tok = self.peek()
        if tok is None:
            raise DatadogSearchError("unexpected end of query")
        self.pos += 1
        return tok

    # expr := and_expr (OR and_expr)*
    def expr(self) -> Column:
        left = self.and_expr()
        while self.peek() is not None and self.peek().upper() == "OR":
            self.next()
            left = left | self.and_expr()
        return left

    # and_expr := unary ((AND)? unary)*   — juxtaposition is implicit AND
    def and_expr(self) -> Column:
        left = self.unary()
        while True:
            tok = self.peek()
            if tok is None or tok == ")" or tok.upper() == "OR":
                return left
            if tok.upper() == "AND":
                self.next()
                tok = self.peek()
                if tok is None:
                    raise DatadogSearchError("dangling AND")
            left = left & self.unary()

    # unary := (NOT | -) unary | '(' expr ')' | atom
    def unary(self) -> Column:
        tok = self.peek()
        if tok is None:
            raise DatadogSearchError("unexpected end of query")
        if tok == "-" or tok.upper() == "NOT":
            self.next()
            return ~self.unary()
        if tok == "(":
            self.next()
            inner = self.expr()
            if self.next() != ")":
                raise DatadogSearchError("missing closing paren")
            return inner
        return self.atom(self.next())

    def atom(self, tok: str) -> Column:
        if (
            self.columns is not None
            and DEFAULT_FIELD not in self.columns
            and not re.match(r"^([@\w.][\w.@]*):", tok)
        ):
            return F.lit(False)  # full-text term but no message column
        if tok.startswith('"'):
            return _phrase_match(DEFAULT_FIELD, _unquote(tok))
        m = re.match(r"^([@\w.][\w.@]*):(.*)$", tok, re.DOTALL)
        if m:
            field = m.group(1).lstrip("@")
            # Schemaless events (same semantics as the VRL compiler): an
            # attribute the event doesn't carry matches nothing — not an
            # UNRESOLVED_COLUMN analysis error.
            if self.columns is not None and field.split(".")[0] not in self.columns:
                return F.lit(False)
            return _field_match(field, m.group(2))
        return _phrase_match(DEFAULT_FIELD, tok, word=True)


def _unquote(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s[1:-1])


def _phrase_match(field: str, phrase: str, word: bool = False) -> Column:
    """Case-insensitive full-text match on the default field; `word` adds
    word boundaries (bare terms match tokens, not substrings)."""
    pat = re.escape(phrase)
    if word:
        pat = rf"\b{pat}\b"
    return F.col(field).rlike(f"(?i){pat}")


_NUM_RE = re.compile(r"^-?\d+(\.\d+)?$")


def _field_match(field: str, raw: str) -> Column:
    col = F.col(field)
    if raw == "*":
        return col.isNotNull()
    range_m = re.match(r"^\[\s*(\S+)\s+TO\s+(\S+)\s*\]$", raw, re.IGNORECASE)
    if range_m:
        lo, hi = range_m.group(1), range_m.group(2)
        out = F.lit(True)
        if lo != "*":
            out = out & (_coerce(col, lo) >= _lit(lo))
        if hi != "*":
            out = out & (_coerce(col, hi) <= _lit(hi))
        return out
    cmp_m = re.match(r"^(>=|<=|>|<)(.+)$", raw)
    if cmp_m:
        op, val = cmp_m.group(1), cmp_m.group(2)
        c = _coerce(col, val)
        v = _lit(val)
        return {">": c > v, ">=": c >= v, "<": c < v, "<=": c <= v}[op]
    val = _unquote(raw) if raw.startswith('"') else raw
    if "*" in val:
        # LIKE-style wildcard; escape the escape char FIRST, then SQL
        # wildcards, in the literal part (a raw backslash would otherwise be
        # consumed as LIKE's escape character)
        like = (
            val.replace("\\", "\\\\")
            .replace("%", r"\%")
            .replace("_", r"\_")
            .replace("*", "%")
        )
        return col.like(like)
    if _NUM_RE.match(val):
        return _coerce(col, val) == _lit(val)
    return col == F.lit(val)


def _coerce(col: Column, val: str) -> Column:
    return col.try_cast("double") if _NUM_RE.match(val) else col


def _lit(val: str) -> Column:
    return F.lit(float(val)) if _NUM_RE.match(val) else F.lit(val)


def compile_datadog_search(src: str, columns: set[str] | None = None) -> Column:
    """Public entry: datadog_search query string → boolean Column.

    ``columns``: the event schema when known — attribute matches on fields
    outside it compile to FALSE (schemaless no-match semantics) instead of
    Spark analysis errors."""
    tokens = _tokenize(src)
    if not tokens:
        return F.lit(True)  # Datadog: empty query matches everything
    p = _Parser(tokens, columns=columns)
    out = p.expr()
    if p.peek() is not None:
        raise DatadogSearchError(f"trailing tokens at {p.tokens[p.pos:]!r}")
    return out
