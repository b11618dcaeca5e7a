"""VRL-subset → Spark Column compiler.

The reference's `remap`/`filter`/`route` transforms take VRL programs and
conditions (ui/src/components/pipeline/config_panel.rs:1420-1441 remap form,
:1449-1614 filter form with example conditions :1544-1581, :1643-1667 route).
This module compiles the observed VRL subset to **Spark Column expressions**,
never UDFs, so every condition stays inside Catalyst: predicate pushdown into
the parquet scan, constant folding, and whole-stage codegen all apply.

Supported grammar (every construct observed in the reference is covered):

    program   := (ident '=' expr (';'|newline))* expr
    expr      := or ;  or := and ('||' and)* ;  and := not ('&&' not)*
    not       := '!' not | cmp
    cmp       := coalesce (('=='|'!='|'>='|'<='|'>'|'<') coalesce)?
    coalesce  := add ('??' add)*
    add       := primary (('+'|'-') primary)*
    primary   := literal | path | ident | call | '(' expr ')'
    path      := '.' ident ('.' ident)*           → F.col
    literal   := string | r'regex' | number | true | false | null

Functions (observed forms cited per SURVEY §2):
    exists(.f)            → isNotNull            (config_panel.rs:1560)
    contains(s, "x")      → F.contains           (config_panel.rs:1568; demo.toml:15-21)
    match(s, r'..')       → rlike                (config_panel.rs:1576)
    starts_with/ends_with → startswith/endswith
    to_int / to_float     → try_cast (+ `??` → coalesce; production/vector.toml:32-39)
    string / to_string    → cast string
    parse_json(s)         → leave as string col; remap stage handles real JSON parsing
    length, downcase, upcase, now, is_log/is_metric/is_trace (schema-constant)

Error semantics: VRL `f!(..)` aborts the event on error; `??` recovers.  In
Column form a failed `try_cast` yields NULL, and NULL comparisons are
three-valued-false — so in a *filter* context, abort-on-error == drop, which
is exactly the reference behavior (dropped events counted, functional_test.rs:173).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


class VRLError(ValueError):
    pass


class RawRegex(str):
    """Marker for a pattern captured from an r'…' literal — functions that
    accept BOTH a literal string and a regex (replace, split) dispatch on
    it: plain strings mean themselves (escaped), r'…' means a pattern.
    Subclasses str so every existing `isinstance(raw, str)` path and dict
    lookup keeps working unchanged."""


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t]+)
  | (?P<comment>\#[^\n]*)
  | (?P<newline>[;\n]+)
  | (?P<rawstr>r'(?:[^'\\]|\\.)*')
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<number>\d+\.\d+|\d+)
  | (?P<path>\.[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
  | (?P<op>\|\||&&|\?\?|==|!=|>=|<=|[<>!()+,=\[\]*/%-])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*!?)
    """,
    re.VERBOSE,
)


@dataclass
class Tok:
    kind: str
    value: str


def _tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    pos = 0
    src = src.replace("\r\n", "\n")
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise VRLError(f"VRL syntax error at offset {pos}: {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):  # VRL `#` line comments (demo configs use them)
            continue
        toks.append(Tok(kind, m.group()))
    return toks


class _Parser:
    def __init__(
        self,
        toks: list[Tok],
        event_kind: str = "log",
        columns: set[str] | None = None,
    ):
        self.toks = toks
        self.i = 0
        self.env: dict[str, Column] = {}
        self.event_kind = event_kind
        self.columns = columns

    def peek(self) -> Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tok:
        t = self.peek()
        if t is None:
            raise VRLError("unexpected end of VRL expression")
        self.i += 1
        return t

    def accept(self, kind: str, value: str | None = None) -> Tok | None:
        t = self.peek()
        if t and t.kind == kind and (value is None or t.value == value):
            self.i += 1
            return t
        return None

    # --- program: assignments then a final boolean/value expression --------
    def program(self) -> Column:
        while self.accept("newline"):
            pass
        result: Column | None = None
        while self.peek() is not None:
            # lookahead: ident '=' (but not '==')
            t = self.peek()
            if (
                t.kind == "ident"
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1].kind == "op"
                and self.toks[self.i + 1].value == "="
            ):
                name = self.next().value
                self.next()  # '='
                self.env[name] = self.expr()
            else:
                result = self.expr()
            if not self.accept("newline") and self.peek() is not None:
                raise VRLError(f"unexpected token {self.peek()!r}")
            while self.accept("newline"):
                pass
        if result is None:
            raise VRLError("VRL program has no final expression")
        return result

    def expr(self) -> Column:
        return self.or_expr()

    def or_expr(self) -> Column:
        left = self.and_expr()
        while self.accept("op", "||"):
            left = left | self.and_expr()
        return left

    def and_expr(self) -> Column:
        left = self.not_expr()
        while self.accept("op", "&&"):
            left = left & self.not_expr()
        return left

    def not_expr(self) -> Column:
        if self.accept("op", "!"):
            return ~self.not_expr()
        return self.cmp()

    _CMP = {"==", "!=", ">=", "<=", ">", "<"}

    def cmp(self) -> Column:
        left = self.coalesce()
        t = self.peek()
        if t and t.kind == "op" and t.value in self._CMP:
            op = self.next().value
            right = self.coalesce()
            if op == "==":
                return left == right
            if op == "!=":
                return left != right
            if op == ">=":
                return left >= right
            if op == "<=":
                return left <= right
            if op == ">":
                return left > right
            return left < right
        return left

    def coalesce(self) -> Column:
        left = self.add()
        parts = [left]
        while self.accept("op", "??"):
            parts.append(self.add())
        if len(parts) > 1:
            return F.coalesce(*parts)
        return left

    def add(self) -> Column:
        left = self.mul()
        while True:
            t = self.peek()
            if t and t.kind == "op" and t.value in ("+", "-"):
                op = self.next().value
                right = self.mul()
                left = (left + right) if op == "+" else (left - right)
            else:
                return left

    def mul(self) -> Column:
        # multiplicative level binds tighter than +/- (standard VRL
        # arithmetic); % is integer/float modulo as in VRL's `mod`.
        left = self.primary()
        while True:
            t = self.peek()
            if t and t.kind == "op" and t.value in ("*", "/", "%"):
                op = self.next().value
                right = self.primary()
                if op == "*":
                    left = left * right
                elif op == "/":
                    left = left / right
                else:
                    left = left % right
            else:
                return left

    def primary(self) -> Column:
        t = self.next()
        if t.kind == "op" and t.value == "-":  # unary minus: -5, -.value
            return -self.primary()
        if t.kind == "op" and t.value == "(":
            inner = self.expr()
            if not self.accept("op", ")"):
                raise VRLError("expected ')'")
            return inner
        if t.kind == "op" and t.value == "[":
            # VRL array literal: [a, b, …]; empty [] is array<string> (the
            # schemaless build's overflow element type) so push/flatten
            # compose without a cast.
            items: list[Column] = []
            if not self.accept("op", "]"):
                while True:
                    items.append(self.expr())
                    if self.accept("op", "]"):
                        break
                    if not self.accept("op", ","):
                        raise VRLError("expected ',' or ']' in array literal")
            if not items:
                return F.array().cast("array<string>")
            return F.array(*items)
        if t.kind == "path":
            name = t.value[1:]
            # Vector events are SCHEMALESS: a path that doesn't exist is null
            # at runtime (then absorbed by `??`/exists()).  Our events are
            # typed DataFrames, so when the caller supplies the schema we map
            # missing paths to NULL literals instead of letting Spark raise
            # UNRESOLVED_COLUMN — e.g. the reference's production config
            # filters on `.status`, which its json demo events don't carry
            # (dev/configs/production/vector.toml:32-39).
            if self.columns is not None and name.split(".")[0] not in self.columns:
                return F.lit(None)
            return F.col(name)
        if t.kind == "string":
            return F.lit(_unescape(t.value[1:-1]))
        if t.kind == "rawstr":
            return F.lit(t.value[2:-1])
        if t.kind == "number":
            return F.lit(float(t.value) if "." in t.value else int(t.value))
        if t.kind == "ident":
            name = t.value
            if name in ("true", "false"):
                return F.lit(name == "true")
            if name == "null":
                return F.lit(None)
            if self.accept("op", "("):
                args: list[Column] = []
                raws: list[str | None] = []
                if not self.accept("op", ")"):
                    while True:
                        start = self.i
                        args.append(self.expr())
                        # raw literal capture: some functions (timestamp
                        # patterns) need the PATTERN STRING, not a Column —
                        # recorded when the whole argument was one string token
                        # "string" unescapes; "rawstr" (r'…' regex literal)
                        # is taken verbatim — parse_regex/parse_grok patterns
                        if self.i - start == 1 and self.toks[start].kind == "string":
                            raws.append(_unescape(self.toks[start].value[1:-1]))
                        elif self.i - start == 1 and self.toks[start].kind == "rawstr":
                            raws.append(RawRegex(self.toks[start].value[2:-1]))
                        elif self.i - start == 1 and self.toks[start].kind == "number":
                            # numeric literal capture — functions needing a
                            # compile-time constant (parse_int base)
                            nv = self.toks[start].value
                            raws.append(float(nv) if "." in nv else int(nv))
                        elif (
                            self.i - start == 2
                            and self.toks[start].kind == "op"
                            and self.toks[start].value == "-"
                            and self.toks[start + 1].kind == "number"
                        ):
                            # negative numeric literal (slice bounds)
                            nv = self.toks[start + 1].value
                            raws.append(-(float(nv) if "." in nv else int(nv)))
                        elif (
                            self.i - start == 1
                            and self.toks[start].kind == "ident"
                            and self.toks[start].value in ("true", "false")
                        ):
                            # boolean literal capture (case_sensitive flags)
                            raws.append(self.toks[start].value == "true")
                        else:
                            # array-of-literals capture ([r'a', "b"]) — some
                            # functions (redact filters) need the PATTERN
                            # STRINGS of a whole literal list, not Columns
                            raws.append(self._literal_list(start, self.i))
                        if self.accept("op", ")"):
                            break
                        if not self.accept("op", ","):
                            raise VRLError("expected ',' or ')' in call")
                return self._call(name, args, raws)
            if name in self.env:
                return self.env[name]
            raise VRLError(f"unknown identifier {name!r}")
        raise VRLError(f"unexpected token {t!r}")

    def _literal_list(self, start: int, end: int) -> list[str] | None:
        """If tokens [start, end) form a pure literal array `[lit, lit, …]`,
        return the unescaped literal strings; else None."""
        toks = self.toks[start:end]
        if (
            len(toks) < 3
            or toks[0].kind != "op" or toks[0].value != "["
            or toks[-1].kind != "op" or toks[-1].value != "]"
        ):
            return None
        out: list[str] = []
        expect_lit = True
        for t in toks[1:-1]:
            if expect_lit:
                if t.kind == "string":
                    out.append(_unescape(t.value[1:-1]))
                elif t.kind == "rawstr":
                    out.append(t.value[2:-1])
                else:
                    return None
            else:
                if t.kind != "op" or t.value != ",":
                    return None
            expect_lit = not expect_lit
        return out if out else None

    @staticmethod
    def _map_last_win(ents: Column) -> Column:
        """map_from_entries with LAST-occurrence-wins key dedup (upstream
        logfmt/kv semantics).  The default mapKeyDedupPolicy=EXCEPTION
        would abort the whole job on one `k=1 k=2` log line — never
        acceptable at 10^12 rows.  O(n²) per row via a lookahead filter,
        fine for the ≤ dozens of pairs a log line carries."""
        return F.map_from_entries(
            F.filter(
                ents,
                lambda e, i: ~F.exists(
                    F.slice(
                        ents, i + 2, F.greatest(F.size(ents) - i - 1, F.lit(0))
                    ),
                    lambda y: y["key"] == e["key"],
                ),
            )
        )

    def _call(
        self, name: str, args: list[Column], raws: list[str | None] | None = None
    ) -> Column:
        base = name.rstrip("!")  # `f!` = fallible-abort; NULL-on-error in Column form
        # upstream-VRL aliases that share an implementation 1:1
        base = {"parse_common_log": "parse_apache_log"}.get(base, base)
        if base == "exists":
            return args[0].isNotNull()
        if base in ("contains", "starts_with", "ends_with"):
            # VRL signature: f(value, substring, case_sensitive: true) —
            # the flag must be a boolean literal; false folds BOTH sides
            # to lower (still pure codegen, one extra lower() each side)
            s, sub = args[0].cast("string"), args[1]
            if len(args) > 2:
                flag = raws[2] if raws and len(raws) > 2 else None
                if not isinstance(flag, bool):
                    raise VRLError(
                        f"{base}: case_sensitive must be the literal "
                        "true or false"
                    )
                if flag is False:
                    s, sub = F.lower(s), F.lower(sub.cast("string"))
            if base == "contains":
                return F.contains(s, sub)
            if base == "starts_with":
                return s.startswith(sub)
            return s.endswith(sub)
        if base == "match":
            return F.regexp_like(args[0].cast("string"), args[1])
        if base == "to_int":
            return args[0].try_cast("long")
        if base == "to_float":
            return args[0].try_cast("double")
        if base in ("string", "to_string"):
            return args[0].cast("string")
        if base == "parse_json":
            # Two-arg TYPED form (r5, symmetric with parse_xml):
            # parse_json(.f, "a INT, b STRING") compiles to the JVM
            # from_json with the literal DDL schema — struct fields
            # accessible via ['a'].  One-arg form: real extraction is the
            # remap stage's job; inside a condition the value passes
            # through as a string column (dynamic typing has no place in
            # a typed build).
            if len(args) > 1:
                schema = raws[1] if raws and len(raws) > 1 else None
                if not isinstance(schema, str) or isinstance(schema, RawRegex):
                    raise VRLError(
                        "parse_json: schema must be a literal DDL string, "
                        'e.g. parse_json(.f, "a INT, b STRING")'
                    )
                return F.from_json(args[0].cast("string"), schema)
            return args[0].cast("string")
        if base == "length":
            return F.length(args[0].cast("string"))
        if base == "downcase":
            return F.lower(args[0].cast("string"))
        if base == "upcase":
            return F.upper(args[0].cast("string"))
        if base == "now":
            return F.current_timestamp()
        if base in ("is_log", "is_metric", "is_trace"):
            # Schema-constant in our typed build: a DataFrame is one event
            # kind (filter forms expose these as condition types,
            # config_panel.rs:1461-1467).
            return F.lit(base == f"is_{self.event_kind}")
        if base == "abs":
            return F.abs(args[0])
        # --- widened public-VRL subset (vector.dev/docs/reference/vrl/functions),
        # every one a 1:1 JVM Column expression — stays pushdown-eligible:
        if base == "strip_whitespace":
            return F.trim(args[0].cast("string"))
        if base == "replace":
            # VRL replace(value, pattern, with): a plain-string pattern
            # means ITSELF (literal replace); an r'…' pattern is a regex
            # with $1-style capture references in the replacement (both
            # must be literals for the regex form — regexp_replace compiles
            # the pattern once at plan time).
            pat = raws[1] if raws and len(raws) > 1 else None
            if isinstance(pat, RawRegex):
                rep = raws[2] if len(raws) > 2 else None
                if not isinstance(rep, str):
                    raise VRLError(
                        "replace with a regex pattern needs a literal "
                        "replacement string"
                    )
                return F.regexp_replace(args[0].cast("string"), pat, rep)
            return F.replace(args[0].cast("string"), args[1], args[2])
        if base == "truncate":
            # VRL truncate(value, limit, suffix: "") — suffix (e.g. "...")
            # appended ONLY when truncation actually happened
            s = args[0].cast("string")
            cut = F.substring(s, F.lit(1), args[1].cast("int"))
            if len(args) > 2:
                suffix = raws[2] if raws and len(raws) > 2 else None
                if not isinstance(suffix, str):
                    raise VRLError("truncate: suffix must be a string literal")
                return F.when(
                    F.length(s) > args[1].cast("int"),
                    F.concat(cut, F.lit(suffix)),
                ).otherwise(s)
            return cut
        if base == "slice":
            # VRL slice(value, start, end?) — 0-based, end exclusive,
            # negatives count from the end; strings only in this build
            # (arrays carry no dynamic typing here).  Bounds must be
            # integer literals so the arithmetic folds at compile time.
            start = raws[1] if raws and len(raws) > 1 else None
            if not isinstance(start, int):
                raise VRLError("slice: start must be an integer literal")
            s = args[0].cast("string")
            ln = F.length(s)
            b = (ln + F.lit(start)) if start < 0 else F.lit(start)
            b = F.greatest(b, F.lit(0))
            if len(args) > 2:
                end = raws[2] if len(raws) > 2 else None
                if not isinstance(end, int):
                    raise VRLError("slice: end must be an integer literal")
                e = (ln + F.lit(end)) if end < 0 else F.least(F.lit(end), ln)
            else:
                e = ln
            return F.substring(s, b + 1, F.greatest(e - b, F.lit(0)))
        if base == "find":
            # VRL find(value, pattern) → first 0-based index or -1; plain
            # string = literal substring, r'…' = regex
            pat = raws[1] if raws and len(raws) > 1 else None
            s = args[0].cast("string")
            if isinstance(pat, RawRegex):
                return F.regexp_instr(s, F.lit(str(pat))) - 1
            return F.instr(s, args[1]) - 1
        if base == "format_number":
            # VRL format_number(value, scale) → grouped decimal rendering
            scale = raws[1] if raws and len(raws) > 1 else 0
            if not isinstance(scale, int) or scale < 0:
                raise VRLError("format_number: scale must be a non-negative integer literal")
            return F.format_number(args[0].cast("double"), scale)
        if base == "titlecase":
            return F.initcap(args[0].cast("string"))
        if base == "strlen":
            # VRL strlen = UTF-8 BYTE length (length() is characters)
            return F.octet_length(args[0].cast("string"))
        if base == "sha2" or base == "sha256":
            return F.sha2(args[0].cast("string").cast("binary"), 256)
        if base == "md5":
            return F.md5(args[0].cast("string").cast("binary"))
        if base == "to_bool":
            return args[0].try_cast("boolean")
        if base == "round":
            return F.round(args[0])
        if base == "floor":
            return F.floor(args[0])
        if base == "ceil":
            return F.ceil(args[0])
        if base == "includes":
            return F.array_contains(args[0], args[1])
        if base == "split":
            # VRL split(value, separator, limit): a plain-string separator
            # means itself (F.split's pattern arg is a REGEX, so literal
            # strings are escaped — split(.s, ".") splits on dots, not on
            # every character); r'…' passes through as a pattern.  `limit`
            # must be a literal int when given.
            pat = raws[1] if raws and len(raws) > 1 else None
            if isinstance(pat, RawRegex):
                rx = str(pat)
            elif isinstance(pat, str):
                rx = re.escape(pat)
            else:
                raise VRLError("split needs a literal separator (string or r'…')")
            if len(args) > 2:
                lim = raws[2] if len(raws) > 2 else None
                if not isinstance(lim, int) or lim == 0:
                    raise VRLError("split: limit must be a non-zero integer literal")
                return F.split(args[0].cast("string"), rx, lim)
            return F.split(args[0].cast("string"), rx)
        if base == "is_nullish":
            s = args[0].cast("string")
            return args[0].isNull() | (F.trim(s) == "") | (F.trim(s) == "-")
        if base == "parse_int":
            # VRL parse_int(value, base: int) — base must be a literal so
            # the conversion compiles to the JVM conv(); base 10 (or
            # omitted) is a plain try_cast.  conv() is Java-side and
            # returns the decimal rendering; NULL on non-numeric input.
            if len(args) > 1:
                b = raws[1] if raws and len(raws) > 1 else None
                if not isinstance(b, int) or not 2 <= b <= 36:
                    raise VRLError(
                        "parse_int: base must be an integer literal in [2, 36]"
                    )
                if b == 10:
                    return args[0].try_cast("long")
                # conv() returns '0' for garbage and wraps negatives to
                # unsigned 2^64 — both silently wrong.  Gate on the base's
                # exact digit class (unsigned only) so invalid input is
                # NULL, the module's recoverable-parse convention.
                digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:b]
                rx = f"^[{digits}{digits.upper()}]+$"
                s = F.trim(args[0].cast("string"))
                return F.when(s.rlike(rx), F.conv(s, b, 10).try_cast("long"))
            return args[0].try_cast("long")
        if base == "to_timestamp":
            return args[0].try_cast("timestamp")
        if base == "to_unix_timestamp":
            return F.unix_timestamp(args[0].try_cast("timestamp"))
        if base == "from_unix_timestamp":
            return F.timestamp_seconds(args[0].try_cast("long"))
        if base in ("parse_timestamp", "format_timestamp"):
            # VRL: parse_timestamp(value, format: strftime) → timestamp;
            # format_timestamp(ts, format) → string.  The strftime pattern
            # must be a LITERAL (captured raw by the parser) so it converts
            # to a java date-format pattern at compile time.
            raw = raws[1] if raws and len(raws) > 1 else None
            if raw is None:
                raise VRLError(f"{base} needs a literal format string")
            from vector_spark.plans.sinks import strftime_to_java

            fmt = strftime_to_java(raw)
            if base == "parse_timestamp":
                # Spark's CORRECTED-mode parser rejects day-of-week patterns
                # ('E' is format-only since 3.0) — fail at compile time with
                # the reason, not per-row at execution.  Weekday text is
                # redundant for parsing; strip it from the format (the
                # reference's chrono parser also treats %a as a consistency
                # check only).
                if "%a" in raw or "%A" in raw:  # the only specifiers mapping to 'E'
                    raise VRLError(
                        f"parse_timestamp: weekday specifiers (%a/%A) are "
                        f"format-only in Spark's datetime parser — remove "
                        f"them from {raw!r} (weekday adds no information to "
                        f"a parse)"
                    )
                return F.try_to_timestamp(args[0].cast("string"), F.lit(fmt))
            return F.date_format(args[0].cast("timestamp"), fmt)
        if base == "ip_cidr_contains":
            # VRL ip_cidr_contains(cidr, ip) — IPv4, pure Column arithmetic:
            # both sides fold dotted-quad → uint32, then compare the top
            # `prefix` bits.  Invalid input → NULL → filter-false.
            def ip_to_long(c: Column) -> Column:
                parts = F.split(c.cast("string"), r"\.")
                valid = F.size(parts) == 4
                octets = [F.element_at(parts, i + 1).try_cast("long") for i in range(4)]
                num = octets[0] * 16777216 + octets[1] * 65536 + octets[2] * 256 + octets[3]
                ok = valid
                for o in octets:
                    ok = ok & o.isNotNull() & (o >= 0) & (o <= 255)
                return F.when(ok, num)

            cidr = args[0].cast("string")
            base_ip = ip_to_long(F.element_at(F.split(cidr, "/"), 1))
            prefix = F.element_at(F.split(cidr, "/"), 2).try_cast("int")
            ip_num = ip_to_long(args[1])
            # same /prefix network ⇔ xor differs only in the low 32-prefix
            # bits ⇔ xor < 2^(32-prefix)  (shiftright needs a literal count,
            # so compare against the power instead)
            return F.when(
                prefix.isNotNull() & (prefix >= 0) & (prefix <= 32),
                base_ip.bitwiseXOR(ip_num) < F.pow(F.lit(2.0), (F.lit(32) - prefix)),
            )
        if base == "parse_key_value":
            # VRL signature (vector.dev function reference):
            # parse_key_value(value, key_value_delimiter: "=",
            #                 field_delimiter: " ")
            kv = args[1] if len(args) > 1 else F.lit("=")
            pair = args[2] if len(args) > 2 else F.lit(" ")
            return F.str_to_map(args[0].cast("string"), pair, kv)
        if base == "parse_syslog":
            # VRL parse_syslog(value) → map of syslog fields; RFC 5424 with
            # 3164 fallback, sharing the decoder's regex pair (codegen,
            # NULL map on non-syslog lines → `??`-recoverable).
            from vector_spark.sources.codecs import _RFC3164, _RFC5424, _syslog_columns

            msg = args[0].cast("string")
            names = ["facility", "severity", "syslog_ts", "host", "appname", "procid", "message"]
            entries = [
                x
                for n, c in zip(names, _syslog_columns(msg))
                for x in (F.lit(n), c.cast("string"))
            ]
            return F.when(msg.rlike(_RFC5424) | msg.rlike(_RFC3164), F.create_map(*entries))
        if base == "parse_apache_log":
            # VRL parse_apache_log(value, format: "common") → map; shares
            # the operator layer's APACHE_COMMON_RE so remap-option and
            # VRL-function paths cannot drift apart.
            from vector_spark.operators.remap import APACHE_COMMON_RE

            # 'argument absent' (→ default "common") is not 'argument present
            # but non-literal' (raws entry None): parse_regex/parse_grok raise
            # on non-literal patterns, and a silently-defaulted variable
            # format here would parse with the wrong grammar unnoticed.
            if len(args) > 1 and (not raws or raws[1] is None):
                raise VRLError(
                    "parse_apache_log: the format argument must be a string "
                    "literal (got a non-literal expression)"
                )
            fmt = (raws[1] if raws and len(raws) > 1 else "common") or "common"
            if fmt != "common":
                raise VRLError(
                    f"parse_apache_log: only the 'common' format is supported, got {fmt!r}"
                )
            msg = args[0].cast("string")
            names = ["client_ip", "ident", "auth", "timestamp", "method", "path",
                     "protocol", "status", "size"]
            entries = [
                x
                for i, n in enumerate(names, start=1)
                for x in (F.lit(n), F.regexp_extract(msg, APACHE_COMMON_RE, i))
            ]
            return F.when(msg.rlike(APACHE_COMMON_RE), F.create_map(*entries))
        if base == "to_syslog_level":
            # VRL to_syslog_level(severity int) → keyword (RFC 5424 table).
            names = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]
            sev = args[0].try_cast("int")
            return F.when(
                sev.isNotNull() & (sev >= 0) & (sev <= 7),
                F.element_at(F.array(*[F.lit(n) for n in names]), sev + 1),
            )
        if base == "flatten":
            # arrays only (VRL also flattens maps; our typed build keeps
            # nested maps out of the hot schema)
            return F.flatten(args[0])
        if base == "unique":
            return F.array_distinct(args[0])
        if base == "push":
            return F.array_append(args[0], args[1])
        if base == "parse_duration":
            # VRL parse_duration(value, unit: "s") → float in `unit`.
            # Simple magnitude+unit strings (the VRL grammar): "300ms",
            # "1.5h", " 2 d ".  Unit must be a literal so the conversion
            # factor folds at compile time; NULL on non-duration input
            # (recoverable).
            _FACTORS = {
                "ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3, "cs": 1e-2,
                "ds": 1e-1, "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0,
            }
            out_unit = raws[1] if raws and len(raws) > 1 else None
            if out_unit is None or out_unit not in _FACTORS:
                raise VRLError(
                    f"parse_duration needs a literal output unit from "
                    f"{sorted(_FACTORS)}, got {out_unit!r}"
                )
            s = F.trim(args[0].cast("string"))
            rx = r"^([0-9]*\.?[0-9]+)\s*(ns|us|µs|ms|cs|ds|s|m|h|d)$"
            mag = F.regexp_extract(s, rx, 1).try_cast("double")
            unit_in = F.regexp_extract(s, rx, 2)
            factor = F.lit(None).cast("double")
            for u, f in _FACTORS.items():
                factor = F.when(unit_in == u, F.lit(f)).otherwise(factor)
            return F.when(
                s.rlike(rx), mag * factor / F.lit(_FACTORS[out_unit])
            )
        if base == "parse_url":
            # VRL parse_url(value) → map of URL parts; shares the canonical
            # _URL_PARTS_RE with functions/urls.py normalize_url so the
            # VRL-function and curation paths cannot drift apart.  Fallible:
            # NULL map when the string has no scheme://host (VRL's
            # recoverable parse → `??`).  Delta vs upstream: query is the
            # RAW query string (use parse_query_string for the decoded map),
            # and username/password are not modeled (absent from the corpus
            # shape).
            from vector_spark.functions.urls import _URL_PARTS_RE

            u = args[0].cast("string")
            scheme = F.lower(F.regexp_extract(u, _URL_PARTS_RE, 1))
            host = F.lower(F.regexp_extract(u, _URL_PARTS_RE, 2))
            entries = [
                F.lit("scheme"), scheme,
                F.lit("host"), host,
                F.lit("port"), F.regexp_replace(F.regexp_extract(u, _URL_PARTS_RE, 3), ":", ""),
                F.lit("path"), F.regexp_extract(u, _URL_PARTS_RE, 4),
                F.lit("query"), F.regexp_replace(F.regexp_extract(u, _URL_PARTS_RE, 5), r"^\?", ""),
                F.lit("fragment"), F.regexp_replace(F.regexp_extract(u, _URL_PARTS_RE, 6), r"^#", ""),
            ]
            return F.when(host != "", F.create_map(*entries))
        if base == "parse_query_string":
            # VRL parse_query_string(value) → map<string,string> with
            # percent-decoding ('+' → space first, html-form style).  One
            # str_to_map + two transform_* — pure codegen.  Duplicate keys
            # follow the session's spark.sql.mapKeyDedupPolicy (upstream VRL
            # collects repeats into arrays — documented delta).
            q = F.regexp_replace(args[0].cast("string"), r"^\?", "")
            m = F.str_to_map(q, F.lit("&"), F.lit("="))
            # try_url_decode, not url_decode: a malformed percent-sequence
            # ('a=100%') in ONE log line must not abort the job — fall back
            # to the raw token, which is also what upstream VRL emits.
            dec = lambda c: F.coalesce(
                F.try_url_decode(F.regexp_replace(c, r"\+", " ")), c
            )
            return F.transform_values(F.transform_keys(m, lambda k, v: dec(k)), lambda k, v: dec(v))
        if base == "encode_base64":
            return F.base64(args[0].cast("string").cast("binary"))
        if base == "decode_base64":
            return F.unbase64(args[0].cast("string")).cast("string")
        if base == "encode_percent":
            return F.url_encode(args[0].cast("string"))
        if base == "decode_percent":
            # NULL on malformed input (the module's recoverable-parse
            # convention) instead of url_decode's job-fatal error.
            return F.try_url_decode(args[0].cast("string"))
        if base == "join":
            # VRL join(value, separator) — separator must be a literal (the
            # JVM array_join takes a constant delimiter).
            sep = raws[1] if raws and len(raws) > 1 else None
            if sep is None:
                raise VRLError("join needs a literal separator string")
            return F.array_join(args[0], sep)
        if base == "parse_csv":
            # VRL parse_csv(value, delimiter: ",") → array<string> of fields,
            # RFC-4180 quote-aware: delimiters inside "…" do not split, and
            # doubled quotes inside a quoted field unescape to one.  The
            # split regex uses a lookahead (delimiter followed by an EVEN
            # number of remaining quotes ⇒ we are outside a quoted field) —
            # Java-regex-only, so this function has no DuckDB oracle twin;
            # its contract is pinned by unit tests instead.
            raw_delim = raws[1] if raws and len(raws) > 1 else ","
            if raw_delim is None:
                raise VRLError("parse_csv: delimiter must be a string literal")
            fields = F.split(
                args[0].cast("string"),
                re.escape(raw_delim) + r'(?=(?:[^"]*"[^"]*")*[^"]*$)',
            )
            unq = lambda x: F.when(
                x.rlike(r'^".*"$'),
                F.replace(F.substring(x, 2, F.length(x) - 2), F.lit('""'), F.lit('"')),
            ).otherwise(x)
            return F.transform(fields, unq)
        if base == "parse_user_agent":
            # VRL parse_user_agent(value) → flat map {browser_family,
            # browser_version, os_family, os_version, device_family} via the
            # standard ordered token heuristics (Edg before Chrome before
            # Safari; ua-parser-style public rules).  Pure regexp codegen —
            # at 100 TB this is one scan-speed projection, no dictionary.
            ua = args[0].cast("string")
            v = lambda pat: F.regexp_extract(ua, pat, 1)
            browser = (
                F.when(ua.rlike(r"(?i)bot|crawler|spider|slurp|curl|wget"), F.lit("Bot"))
                .when(ua.contains("Edg/"), F.lit("Edge"))
                .when(ua.contains("OPR/"), F.lit("Opera"))
                .when(ua.contains("Chrome/"), F.lit("Chrome"))
                .when(ua.contains("Firefox/"), F.lit("Firefox"))
                .when(ua.rlike(r"Version/[\d.]+.*Safari"), F.lit("Safari"))
                .otherwise(F.lit("Other"))
            )
            bver = (
                F.when(ua.contains("Edg/"), v(r"Edg/([\d.]+)"))
                .when(ua.contains("OPR/"), v(r"OPR/([\d.]+)"))
                .when(ua.contains("Chrome/"), v(r"Chrome/([\d.]+)"))
                .when(ua.contains("Firefox/"), v(r"Firefox/([\d.]+)"))
                .when(ua.rlike(r"Version/[\d.]+.*Safari"), v(r"Version/([\d.]+)"))
                .otherwise(F.lit(""))
            )
            os_fam = (
                F.when(ua.contains("Windows NT"), F.lit("Windows"))
                .when(ua.rlike(r"iPhone OS|iPad.*CPU OS|CPU iPhone OS"), F.lit("iOS"))
                .when(ua.contains("Mac OS X"), F.lit("Mac OS X"))
                .when(ua.contains("Android"), F.lit("Android"))
                .when(ua.contains("Linux"), F.lit("Linux"))
                .otherwise(F.lit("Other"))
            )
            os_ver = F.regexp_replace(
                F.when(ua.contains("Windows NT"), v(r"Windows NT ([\d.]+)"))
                .when(ua.rlike(r"(?:iPhone )?OS ([\d_]+)") & os_fam.eqNullSafe(F.lit("iOS")),
                      v(r"OS ([\d_]+)"))
                .when(ua.contains("Mac OS X"), v(r"Mac OS X ([\d_.]+)"))
                .when(ua.contains("Android"), v(r"Android ([\d.]+)"))
                .otherwise(F.lit("")),
                "_", ".",
            )
            device = (
                F.when(browser == "Bot", F.lit("Spider"))
                .when(ua.contains("iPhone"), F.lit("iPhone"))
                .when(ua.contains("iPad"), F.lit("iPad"))
                .when(ua.contains("Android"), F.lit("Android"))
                .otherwise(F.lit("Other"))
            )
            return F.create_map(
                F.lit("browser_family"), browser,
                F.lit("browser_version"), bver,
                F.lit("os_family"), os_fam,
                F.lit("os_version"), os_ver,
                F.lit("device_family"), device,
            )
        if base in ("parse_regex", "parse_grok"):
            # VRL parse_regex(value, r'(?P<name>…)') / parse_grok(value,
            # "%{PATTERN:field} …") → map<string,string> of named captures,
            # NULL when the pattern doesn't match (VRL's fallible parse →
            # `??` recoverable).  The pattern must be a literal so the
            # regex compiles ONCE at plan time into pure regexp_extract
            # columns (codegen) — never a per-row Python regex.
            raw = raws[1] if raws and len(raws) > 1 else None
            if raw is None:
                raise VRLError(f"{base} needs a literal pattern string")
            rx = grok_to_regex(raw) if base == "parse_grok" else raw
            java_rx, names = _strip_named_groups(rx)
            if not names:
                raise VRLError(f"{base}: pattern has no named capture groups")
            s = args[0].cast("string")
            entries = [
                x
                for nm, idx in names.items()
                for x in (F.lit(nm), F.regexp_extract(s, java_rx, idx))
            ]
            return F.when(s.rlike(java_rx), F.create_map(*entries))
        if base == "sha1":
            return F.sha1(args[0].cast("string").cast("binary"))
        if base == "crc32":
            return F.crc32(args[0].cast("string").cast("binary"))
        if base == "mod":
            return args[0] % args[1]
        if base == "is_empty":
            # strings (and anything string-renderable): true iff length 0.
            # Our typed build has no dynamically-typed arrays/maps flowing
            # through conditions, so the string form covers the observed use.
            return F.length(args[0].cast("string")) == 0
        if base == "encode_json":
            # VRL encode_json(value) → JSON text for CONTAINER columns
            # (map/struct/array) via the JVM to_json.  Scalar columns are
            # rejected by Spark at analysis time (INVALID_JSON_SCHEMA) —
            # the column type isn't visible at VRL compile time, so the
            # clear error has to come from the analyzer; quote scalars
            # with string concatenation instead.
            return F.to_json(args[0])
        if base == "strip_ansi_escape_codes":
            # CSI sequences (colors, cursor), OSC titles, and bare 2-char
            # escapes — one compiled regex, pure codegen.
            return F.regexp_replace(
                args[0].cast("string"),
                "(?:\\[[0-?]*[ -/]*[@-~]|\\][^]*(?:|\\\\)|[@-Z\\\\^_-])",
                "",
            )
        if base == "redact":
            # VRL redact(value, filters: [r'…', …]) — every match of every
            # literal regex filter replaced by [REDACTED].  Patterns must be
            # literals (single or an array of them) so they compile ONCE at
            # plan time; applied left-to-right as regexp_replace chain.
            pats = raws[1] if raws and len(raws) > 1 else None
            if isinstance(pats, str):
                pats = [pats]
            if not pats or not isinstance(pats, list):
                raise VRLError(
                    "redact needs literal regex filter(s): "
                    "redact(.field, r'…') or redact(.field, [r'…', r'…'])"
                )
            out = args[0].cast("string")
            for p in pats:
                out = F.regexp_replace(out, p, "[REDACTED]")
            return out
        if base in ("camelcase", "pascalcase", "snakecase", "kebabcase",
                    "screamingsnakecase"):
            # VRL case conversions.  Word split: lower→upper boundaries plus
            # any run of '-', '_' or whitespace (documented delta vs upstream:
            # no acronym lookahead — "HTTPServer" is one word).
            s = args[0].cast("string")
            spaced = F.regexp_replace(s, r"([a-z0-9])([A-Z])", r"$1 $2")
            words = F.trim(F.regexp_replace(spaced, r"[-_\s]+", " "))
            if base == "snakecase":
                return F.lower(F.regexp_replace(words, " ", "_"))
            if base == "screamingsnakecase":
                return F.upper(F.regexp_replace(words, " ", "_"))
            if base == "kebabcase":
                return F.lower(F.regexp_replace(words, " ", "-"))
            pascal = F.regexp_replace(F.initcap(F.lower(words)), " ", "")
            if base == "pascalcase":
                return pascal
            return F.concat(
                F.lower(F.substring(pascal, 1, 1)),
                F.substring(pascal, F.lit(2), F.length(pascal)),
            )
        if base == "parse_logfmt":
            # VRL parse_logfmt(value) → map<string,string>.  Inverse of the
            # sink encoder (plans/sinks.py logfmt_expr): tokens split on
            # whitespace OUTSIDE double quotes (even-remaining-quotes
            # lookahead, as parse_csv), `k="…"` values unquoted with the
            # encoder's escapes reversed (\\ via a private-use sentinel so
            # `\\n` stays a literal backslash-n), bare `k` → value "".
            s = F.trim(args[0].cast("string"))
            # token = `key="quoted, \-escapes allowed"` | plain run of
            # non-space.  Matching tokens (not splitting on spaces) keeps
            # escaped quotes inside quoted values intact.
            toks = F.regexp_extract_all(
                s, F.lit(r'[^\s"]+="(?:[^"\\]|\\.)*"|\S+'), 0
            )
            SENT = ""

            def unq(x: Column) -> Column:
                inner = F.substring(x, F.lit(2), F.length(x) - 2)
                inner = F.replace(inner, F.lit("\\\\"), F.lit(SENT))
                inner = F.replace(inner, F.lit('\\"'), F.lit('"'))
                inner = F.replace(inner, F.lit("\\n"), F.lit("\n"))
                inner = F.replace(inner, F.lit("\\r"), F.lit("\r"))
                inner = F.replace(inner, F.lit("\\t"), F.lit("\t"))
                return F.replace(inner, F.lit(SENT), F.lit("\\"))

            def entry(t: Column) -> Column:
                eq = F.instr(t, "=")
                key = F.substring_index(t, "=", 1)
                val = F.substring(t, eq + 1, F.length(t))
                val = F.when(val.rlike('^".*"$'), unq(val)).otherwise(val)
                return F.struct(
                    key.alias("key"),
                    F.when(eq > 0, val).otherwise(F.lit("")).alias("value"),
                )

            return F.when(
                s != "",
                self._map_last_win(F.transform(toks, entry)),
            )
        if base == "parse_nginx_log":
            # VRL parse_nginx_log(value, format) — format ∈
            # {combined, error}, literal (regex chosen at compile time).
            fmt = (raws[1] if raws and len(raws) > 1 else "combined") or "combined"
            if len(args) > 1 and (not raws or not isinstance(raws[1], str)):
                raise VRLError("parse_nginx_log: format must be a string literal")
            msg = args[0].cast("string")
            if fmt == "combined":
                rx = (
                    r'^(\S+) - (\S+) \[([^\]]+)\] "(\S+) (\S+) (\S+)" '
                    r'(\d+) (\d+) "([^"]*)" "([^"]*)"'
                )
                names = ["client", "user", "timestamp", "method", "path",
                         "protocol", "status", "size", "referer", "agent"]
            elif fmt == "error":
                rx = (
                    r"^(\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}) \[(\w+)\] "
                    r"(\d+)#(\d+): (?:\*(\d+) )?(.*)$"
                )
                names = ["timestamp", "severity", "pid", "tid", "cid", "message"]
            else:
                raise VRLError(
                    f"parse_nginx_log: format must be 'combined' or 'error', got {fmt!r}"
                )
            entries = [
                x
                for i, n in enumerate(names, start=1)
                for x in (F.lit(n), F.regexp_extract(msg, rx, i))
            ]
            return F.when(msg.rlike(rx), F.create_map(*entries))
        if base == "parse_glog":
            # VRL parse_glog(value) — google log lines
            # `I0920 15:09:48.577 12345 file.go:42] msg`.  Delta vs upstream:
            # `timestamp` is the raw MMDD+time portion (upstream injects the
            # CURRENT year, which is nondeterministic in a batch replay).
            rx = (
                r"^([IWEF])(\d{4} \d{2}:\d{2}:\d{2}(?:\.\d+)?)\s+(\d+) "
                r"([^\]:]+):(\d+)\] (.*)$"
            )
            msg = args[0].cast("string")
            level = F.element_at(
                F.create_map(
                    F.lit("I"), F.lit("info"), F.lit("W"), F.lit("warning"),
                    F.lit("E"), F.lit("error"), F.lit("F"), F.lit("fatal"),
                ),
                F.regexp_extract(msg, rx, 1),
            )
            entries = [
                F.lit("level"), level,
                F.lit("timestamp"), F.regexp_extract(msg, rx, 2),
                F.lit("id"), F.regexp_extract(msg, rx, 3),
                F.lit("file"), F.regexp_extract(msg, rx, 4),
                F.lit("line"), F.regexp_extract(msg, rx, 5),
                F.lit("message"), F.regexp_extract(msg, rx, 6),
            ]
            return F.when(msg.rlike(rx), F.create_map(*entries))
        if base == "parse_cef":
            # VRL parse_cef(value) → flat map: the 7 CEF headers (split on
            # unescaped '|', `\|`/`\\` unescaped) + the extension key=value
            # pairs (keys are \w+, values run to the next `key=` token).
            s = args[0].cast("string")
            body = F.regexp_extract(s, r"(CEF:.*)$", 1)
            parts = F.split(body, r"(?<!\\)\|", 8)
            unesc = lambda c: F.replace(
                F.replace(c, F.lit(r"\|"), F.lit("|")), F.lit("\\\\"), F.lit("\\")
            )
            hdr = ["deviceVendor", "deviceProduct", "deviceVersion",
                   "deviceEventClassId", "name", "severity"]
            entries = [
                F.lit("cefVersion"),
                F.regexp_extract(F.element_at(parts, 1), r"CEF:(\d+)", 1),
            ]
            for i, n in enumerate(hdr, start=2):
                entries += [F.lit(n), unesc(F.element_at(parts, i))]
            ext = F.element_at(parts, 8)
            # keep only real `key=…` tokens: an empty/blank extension block
            # (a trailing '|') must yield an EMPTY map, not a ""→"" entry
            ext_toks = F.filter(
                F.split(F.trim(ext), r"\s+(?=\w+=)"),
                lambda t: F.instr(t, "=") > 0,
            )
            ext_map = self._map_last_win(
                F.transform(
                    ext_toks,
                    lambda t: F.struct(
                        F.substring_index(t, "=", 1).alias("key"),
                        F.substring(t, F.instr(t, "=") + 1, F.length(t)).alias("value"),
                    ),
                )
            )
            header_map = F.create_map(*entries)
            return F.when(
                body.rlike(r"^CEF:\d+(\|(?:[^|\\]|\\.)*){7}"),
                F.map_concat(header_map, ext_map),
            ).when(
                body.rlike(r"^CEF:\d+(\|(?:[^|\\]|\\.)*){6}\|?$"), header_map
            )
        if base == "parse_xml":
            # VRL parse_xml(value) is dynamically typed; the typed-DataFrame
            # analog takes an explicit literal DDL schema for the document
            # root — parse_xml(.field, "a STRING, b STRUCT<c: INT>") — and
            # compiles to the JVM from_xml (codegen, NULL on malformed
            # input).  Requiring the schema up front is the same trade the
            # remap stage's parse_json makes: no per-row type inference at
            # 10^12 rows.
            if len(args) < 2 or not raws or not isinstance(raws[1], str):
                raise VRLError(
                    "parse_xml needs a literal DDL schema: "
                    'parse_xml(.field, "a STRING, b INT")'
                )
            return F.from_xml(args[0].cast("string"), raws[1])
        if base == "encode_logfmt":
            # VRL encode_logfmt(map) → `k=v` pairs, KEYS SORTED (upstream
            # contract), values with whitespace/quotes/'='/backslashes
            # double-quoted with the sink encoder's escape order — the
            # inverse of parse_logfmt by construction.
            entries = F.sort_array(F.map_entries(args[0]))

            def fmt(e: Column) -> Column:
                v = e["value"].cast("string")
                needs_quote = v.rlike('[\\s"=\\\\]') | (v == "")
                esc = F.replace(v, F.lit("\\"), F.lit("\\\\"))
                esc = F.replace(esc, F.lit('"'), F.lit('\\"'))
                esc = F.replace(esc, F.lit("\n"), F.lit("\\n"))
                esc = F.replace(esc, F.lit("\r"), F.lit("\\r"))
                esc = F.replace(esc, F.lit("\t"), F.lit("\\t"))
                quoted = F.concat(F.lit('"'), esc, F.lit('"'))
                return F.concat(
                    e["key"].cast("string"), F.lit("="),
                    F.when(needs_quote, quoted).otherwise(v),
                )

            return F.array_join(F.transform(entries, fmt), " ")
        if base == "encode_csv":
            # VRL encode_csv(array) → one RFC-4180 line: fields containing
            # delimiter/quote/newline double-quoted, inner quotes doubled.
            def csvq(x: Column) -> Column:
                s = x.cast("string")
                needs = s.rlike('[",\n\r]')
                doubled = F.replace(s, F.lit('"'), F.lit('""'))
                return F.when(
                    needs, F.concat(F.lit('"'), doubled, F.lit('"'))
                ).otherwise(s)

            return F.array_join(F.transform(args[0], csvq), ",", "")
        if base == "parse_aws_vpc_flow_log":
            # VRL parse_aws_vpc_flow_log(value) — the 14-field v2 default
            # format, space-separated.  Values stay strings ('-' markers
            # included verbatim — the caller decides nullability), NULL map
            # when the field count is wrong (recoverable).
            names = ["version", "account_id", "interface_id", "srcaddr",
                     "dstaddr", "srcport", "dstport", "protocol", "packets",
                     "bytes", "start", "end", "action", "log_status"]
            s = F.trim(args[0].cast("string"))
            toks = F.regexp_extract_all(s, F.lit(r"\S+"), 0)
            entries = [
                x
                for i, n in enumerate(names, start=1)
                for x in (F.lit(n), F.element_at(toks, i))
            ]
            return F.when(F.size(toks) == len(names), F.create_map(*entries))
        if base == "parse_aws_alb_log":
            # VRL parse_aws_alb_log(value) — the ALB access-log grammar:
            # space-separated tokens where some fields are double-quoted
            # (request line, user agent, trace id…).  Token-matching split
            # (quoted-or-bare, as parse_logfmt), positional field names per
            # the AWS spec (first 18 canonical fields; ALB appends new
            # trailing fields over time, so extra tokens are tolerated),
            # client/target `ip:port` pairs split out.
            names = ["type", "time", "elb", "client", "target",
                     "request_processing_time", "target_processing_time",
                     "response_processing_time", "elb_status_code",
                     "target_status_code", "received_bytes", "sent_bytes",
                     "request", "user_agent", "ssl_cipher", "ssl_protocol",
                     "target_group_arn", "trace_id"]
            s = F.trim(args[0].cast("string"))
            toks = F.regexp_extract_all(s, F.lit(r'"[^"]*"|\S+'), 0)
            unq = lambda x: F.regexp_replace(x, r'^"|"$', "")
            cols: dict[str, Column] = {
                n: unq(F.element_at(toks, i)) for i, n in enumerate(names, start=1)
            }
            for side in ("client", "target"):
                pair = cols.pop(side)
                cols[f"{side}_ip"] = F.substring_index(pair, ":", 1)
                cols[f"{side}_port"] = F.when(
                    pair.contains(":"), F.substring_index(pair, ":", -1)
                ).otherwise(F.lit(""))
            entries = [x for n, c in cols.items() for x in (F.lit(n), c)]
            return F.when(F.size(toks) >= len(names), F.create_map(*entries))
        if base == "to_syslog_facility":
            # RFC 5424 facility code → keyword (VRL table).
            fac = ["kern", "user", "mail", "daemon", "auth", "syslog", "lpr",
                   "news", "uucp", "cron", "authpriv", "ftp", "ntp",
                   "security", "console", "solaris-cron"] + [
                       f"local{i}" for i in range(8)]
            code = args[0].try_cast("int")
            return F.when(
                code.isNotNull() & (code >= 0) & (code <= 23),
                F.element_at(F.array(*[F.lit(n) for n in fac]), code + 1),
            )
        raise VRLError(f"unsupported VRL function {name!r}")


#: grok pattern library — the core subset of the upstream grok names that
#: Vector's parse_grok examples use (vector.dev/docs/reference/vrl/functions
#: #parse_grok); each expands to a plain regex (no backtracking surprises).
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "POSINT": r"\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"\d{1,3}(?:\.\d{1,3}){3}",
    "IPORHOST": r"[\w.\-]+",
    "HOSTNAME": r"[\w.\-]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|FATAL|CRITICAL)",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2}\s[+-]\d{4}",
    "QS": r'"[^"]*"',
    "QUOTEDSTRING": r'"[^"]*"',
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
}

_GROK_TOKEN = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def grok_to_regex(pattern: str) -> str:
    """`%{NAME:field}` → `(?P<field>rx)`, `%{NAME}` → `(?:rx)`; text between
    tokens passes through as regex (upstream grok semantics).  Unknown
    pattern names fail at compile time."""

    def sub(m: re.Match) -> str:
        name, field = m.group(1), m.group(2)
        rx = GROK_PATTERNS.get(name)
        if rx is None:
            raise VRLError(f"parse_grok: unknown grok pattern %{{{name}}}")
        return f"(?P<{field}>{rx})" if field else f"(?:{rx})"

    return _GROK_TOKEN.sub(sub, pattern)


def _strip_named_groups(rx: str) -> tuple[str, dict[str, int]]:
    """Replace (?P<name>/(?<name> groups with plain capturing groups and
    return (java-safe regex, {name: 1-based capture index}).  Names are
    resolved to NUMERIC indexes because Java group names reject
    underscores, which log field names use constantly.  The scanner counts
    every capturing group (named or not) and skips escapes and character
    classes, so unnamed groups in the pattern keep their positions."""
    out: list[str] = []
    names: dict[str, int] = {}
    idx = 0
    i = 0
    in_class = False
    while i < len(rx):
        ch = rx[i]
        if ch == "\\" and i + 1 < len(rx):
            out.append(rx[i : i + 2])
            i += 2
            continue
        if in_class:
            out.append(ch)
            if ch == "]":
                in_class = False
            i += 1
            continue
        if ch == "[":
            in_class = True
            out.append(ch)
            i += 1
            continue
        if ch == "(":
            m = re.match(r"\(\?P?<([A-Za-z_][A-Za-z0-9_]*)>", rx[i:])
            if m and not rx.startswith(("(?<=", "(?<!"), i):
                idx += 1
                if m.group(1) in names:
                    # An alternation reusing a field name (%{INT:v}|%{WORD:v})
                    # would map the name to whichever group LAST appeared —
                    # the non-participating branch extracts "" and the match
                    # silently vanishes.  Fail at compile time instead.
                    raise VRLError(
                        f"duplicate capture group name {m.group(1)!r} — Spark "
                        f"regexp_extract addresses groups by index, so each "
                        f"field name may capture in only one branch"
                    )
                names[m.group(1)] = idx
                out.append("(")
                i += m.end()
                continue
            if not rx.startswith("(?", i):
                idx += 1
            out.append(ch)
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out), names


def _unescape(s: str) -> str:
    return s.encode().decode("unicode_escape")


def compile_condition(
    src: str,
    event_kind: str = "log",
    columns: set[str] | None = None,
) -> Column:
    """Compile a VRL condition/program to one Spark Column (boolean or value).

    ``columns``: the event schema, when known — paths outside it become NULL
    literals (Vector's schemaless missing-field semantics) instead of Spark
    analysis errors."""
    return _Parser(_tokenize(src), event_kind, columns).program()
