"""VRL-subset compiler goldens — mirrors the filter examples in the
reference's config forms (config_panel.rs:1544-1581) and live configs."""

from __future__ import annotations

import pandas as pd
import pytest

from vector_spark.synth import sample_log_events
from vector_spark.vrl import VRLError, compile_condition


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(pd.DataFrame(sample_log_events(40)))


def test_equality(ev):
    # `.level == "error"` (config_panel.rs:1549)
    assert ev.filter(compile_condition('.level == "error"')).count() == 10


def test_numeric_comparison_with_coalesce(ev):
    # `status = to_int(.status) ?? 200; status >= 400` (production/vector.toml:32-39)
    got = ev.filter(compile_condition("status = to_int(.status) ?? 200; status >= 400"))
    rows = got.select("status").distinct().collect()
    assert {r.status for r in rows} <= {"404", "500", "503"}


def test_exists(ev):
    # `exists(.user_id)` (config_panel.rs:1560)
    assert ev.filter(compile_condition("exists(.level)")).count() == 40
    assert ev.filter(compile_condition("!exists(.level)")).count() == 0


def test_contains(ev):
    # `contains(string!(.message), "error")` (config_panel.rs:1568; demo.toml:15-21)
    n = ev.filter(compile_condition('contains(string!(.message), "request 1")')).count()
    assert n == 11  # "request 1" and "request 10"…"request 19"


def test_match_regex(ev):
    # `match(.message, r'ERROR|FATAL')` (config_panel.rs:1576)
    n = ev.filter(compile_condition(r"match(.message, r'request [12]\d')")).count()
    assert n == 20


def test_boolean_operators(ev):
    c = compile_condition('.level == "error" || .level == "warn"')
    assert ev.filter(c).count() == 20
    c2 = compile_condition('.level == "error" && .service == "demo-app"')
    assert ev.filter(c2).count() == 10


def test_string_functions(ev):
    assert ev.filter(compile_condition('starts_with(.message, "Processing")')).count() == 40
    assert ev.filter(compile_condition("length(.level) == 4")).count() == 20  # info, warn
    assert ev.filter(compile_condition('upcase(.level) == "ERROR"')).count() == 10


def test_is_log_kind():
    assert compile_condition("is_log()", event_kind="log") is not None


def test_arith_and_null(ev):
    assert ev.filter(compile_condition(".pid - 12345 >= 3")).count() > 0
    assert ev.filter(compile_condition("to_int(.service) == null")).count() == 0  # NULL == NULL → drop all


def test_widened_function_surface(spark):
    """Round-2 widened public-VRL subset — every function stays a JVM Column
    (no UDF), checked by value."""
    df = spark.createDataFrame(
        [("  pad  ", "a,b,c", 3.7, "TRUE", None, "-")],
        "w string, csv string, v double, b string, n string, dash string",
    )
    row = df.select(
        compile_condition('strip_whitespace(.w) == "pad"').alias("strip"),
        compile_condition('replace(.csv, ",", "|") == "a|b|c"').alias("rep"),
        compile_condition('truncate(.csv, 3) == "a,b"').alias("trunc"),
        compile_condition("round(.v) == 4").alias("round"),
        compile_condition("floor(.v) == 3").alias("floor"),
        compile_condition("ceil(.v) == 4").alias("ceil"),
        compile_condition("to_bool(.b) == true").alias("bool"),
        compile_condition("is_nullish(.n)").alias("null1"),
        compile_condition("is_nullish(.dash)").alias("null2"),
        compile_condition("is_nullish(.csv)").alias("null3"),
        compile_condition('includes(split(.csv, ","), "b")').alias("incl"),
        compile_condition('md5(.csv) == md5(.csv)').alias("md5"),
        compile_condition("parse_int(.b) == null").alias("pint"),
    ).collect()[0]
    assert row.strip and row.rep and row.trunc
    assert row.round and row.floor and row.ceil and row.bool
    assert row.null1 and row.null2 and not row.null3
    assert row.incl and row.md5
    assert not row.pint  # NULL == NULL is NULL → falsy


def test_widened_functions_no_udf(spark):
    df = spark.createDataFrame([("x",)], "s string")
    plan = df.filter(
        compile_condition('sha2(strip_whitespace(.s)) != "" && round(length(.s)) >= 1')
    )
    assert "pythonudf" not in plan._jdf.queryExecution().optimizedPlan().toString().lower()


def test_syntax_error():
    with pytest.raises(VRLError):
        compile_condition(".level === 3")
    with pytest.raises(VRLError):
        compile_condition("unknown_fn(.x)")


def test_timestamp_and_key_value_functions(spark):
    df = spark.createDataFrame(
        [("2026-01-02 03:04:05", "a=1 b=two c=3")], "ts string, kv string"
    )
    row = df.select(
        compile_condition("to_unix_timestamp(to_timestamp(.ts)) == 1767323045").alias("unix"),
        compile_condition('parse_key_value(.kv)').alias("m"),
        compile_condition('parse_key_value(.kv, "=", " ")').alias("m2"),
    ).collect()[0]
    assert row.unix
    assert row.m == {"a": "1", "b": "two", "c": "3"}
    assert row.m2 == row.m


def test_parse_and_format_timestamp(spark):
    df = spark.createDataFrame([("02/01/2026 03:04:05",)], "raw string")
    row = df.select(
        compile_condition(
            'to_unix_timestamp(parse_timestamp(.raw, "%d/%m/%Y %H:%M:%S")) == 1767323045'
        ).alias("parsed"),
        compile_condition(
            'format_timestamp(parse_timestamp(.raw, "%d/%m/%Y %H:%M:%S"), "%Y-%m-%d") == "2026-01-02"'
        ).alias("fmt"),
    ).collect()[0]
    assert row.parsed and row.fmt


def test_parse_timestamp_requires_literal_pattern(spark):
    with pytest.raises(VRLError, match="literal format"):
        compile_condition("parse_timestamp(.raw, .fmt)")


def test_parse_timestamp_month_name_and_day_of_year(spark):
    """%b/%a/%j/%y specifiers map to real patterns (previously they were
    silently quoted as literals, making every parse NULL)."""
    df = spark.createDataFrame([("10/Oct/2000:13:55:36",)], "raw string")
    row = df.select(
        compile_condition(
            'format_timestamp(parse_timestamp(.raw, "%d/%b/%Y:%H:%M:%S"), "%Y-%m-%d") == "2000-10-10"'
        ).alias("ok"),
        compile_condition(
            'format_timestamp(parse_timestamp(.raw, "%d/%b/%Y:%H:%M:%S"), "logs-%y.%j") == "logs-00.284"'
        ).alias("es_index"),
    ).collect()[0]
    assert row.ok and row.es_index


def test_strftime_rejects_unknown_specifier():
    from vector_spark.plans.sinks import strftime_to_java

    assert strftime_to_java("vector-%Y.%m.%d") == "'vector-'yyyy'.'MM'.'dd"
    assert strftime_to_java("100%%") == "'100%'"
    with pytest.raises(ValueError, match="unsupported strftime"):
        strftime_to_java("logs-%Q")
    with pytest.raises(ValueError, match="dangling"):
        strftime_to_java("logs-%")


def test_ip_cidr_contains(spark):
    df = spark.createDataFrame(
        [("10.1.2.3",), ("10.2.0.1",), ("192.168.0.5",), ("garbage",), (None,)],
        "ip string",
    )
    kept = {r.ip for r in df.filter(
        compile_condition('ip_cidr_contains("10.1.0.0/16", .ip)')
    ).collect()}
    assert kept == {"10.1.2.3"}
    allv4 = df.filter(compile_condition('ip_cidr_contains("0.0.0.0/0", .ip)')).count()
    assert allv4 == 3  # every VALID ip matches /0; garbage and NULL drop


def test_parse_timestamp_rejects_weekday_specifiers(spark):
    """Spark's CORRECTED-mode parser bans 'E' patterns in parsing; the VRL
    compiler surfaces that at compile time with the reason, instead of a
    per-row execution error."""
    with pytest.raises(VRLError, match="weekday"):
        compile_condition(
            'parse_timestamp(.raw, "%a, %d %b %Y %H:%M:%S") != null'
        )
    # formatting with weekday is fine
    df = spark.createDataFrame([("2026-01-05 00:00:00",)], "raw string")
    row = df.select(
        compile_condition(
            'format_timestamp(to_timestamp(.raw), "%a %Y-%m-%d") == "Mon 2026-01-05"'
        ).alias("ok")
    ).collect()[0]
    assert row.ok


def test_parse_regex_named_captures(spark):
    """parse_regex → map of named captures, NULL on non-match; unnamed
    groups in the pattern don't shift the named indexes."""
    df = spark.createDataFrame([("GET /api/v1 200", "nope")], "req string, bad string")
    m = df.select(
        compile_condition(
            r'parse_regex(.req, r'"'"'(?P<method>\w+) (\/\S*) (?P<status>\d+)'"'"')'
        ).alias("m"),
        compile_condition(
            r'parse_regex(.bad, r'"'"'(?P<status>\d+)'"'"')'
        ).alias("nomatch"),
    ).collect()[0]
    assert m.m == {"method": "GET", "status": "200"}
    assert m.nomatch is None


def test_parse_grok_apache_line(spark):
    """parse_grok with real %{NAME:field} syntax over an apache-style line."""
    line = '127.0.0.1 frank 200 1234 "GET /index.html" 2026-01-02T03:04:05Z'
    df = spark.createDataFrame([(line,)], "msg string")
    m = df.select(
        compile_condition(
            'parse_grok(.msg, "%{IP:client} %{USER:user} %{INT:status} '
            '%{INT:bytes} %{QS:request} %{TIMESTAMP_ISO8601:ts}")'
        ).alias("m")
    ).collect()[0].m
    assert m["client"] == "127.0.0.1"
    assert m["user"] == "frank"
    assert m["status"] == "200"
    assert m["request"] == '"GET /index.html"'
    assert m["ts"] == "2026-01-02T03:04:05Z"


def test_parse_grok_unknown_pattern_fails_compile():
    with pytest.raises(VRLError, match="unknown grok pattern"):
        compile_condition('parse_grok(.msg, "%{NOPE:x}")')
    with pytest.raises(VRLError, match="no named capture"):
        compile_condition('parse_grok(.msg, "%{IP} only")')


def test_parse_regex_duplicate_group_name_rejected():
    with pytest.raises(VRLError, match="duplicate capture group"):
        compile_condition(r"parse_regex(.m, r'(?P<v>\d+)|(?P<v>\w+)')")


def test_parse_syslog_and_apache_log(spark):
    """VRL parse_syslog / parse_apache_log return field maps sharing the
    decoder/operator regexes; non-matching input yields NULL."""
    df = spark.createDataFrame(
        [(
            "<34>1 2026-01-02T03:04:05Z host1 app 123 ID47 - took fire",
            '10.0.0.1 - frank [10/Oct/2000:13:55:36 +0000] "GET /x HTTP/1.0" 200 2326',
        )],
        "sl string, ap string",
    )
    row = df.select(
        compile_condition("parse_syslog(.sl)").alias("sl"),
        compile_condition('parse_apache_log(.ap, "common")').alias("ap"),
        compile_condition("parse_syslog(.ap)").alias("not_syslog"),
    ).collect()[0]
    assert row.sl["host"] == "host1" and row.sl["appname"] == "app"
    assert row.sl["severity"] == "2" and row.sl["facility"] == "4"  # pri 34
    assert row.sl["message"] == "took fire"
    assert row.ap["client_ip"] == "10.0.0.1" and row.ap["status"] == "200"
    assert row.ap["method"] == "GET" and row.ap["size"] == "2326"
    assert row.not_syslog is None
    with pytest.raises(VRLError, match="only the 'common'"):
        compile_condition('parse_apache_log(.ap, "combined")')


def test_parse_url_and_query_string(spark):
    """VRL parse_url shares _URL_PARTS_RE with functions/urls.py; fallible
    → NULL on non-URLs.  parse_query_string percent-decodes keys+values."""
    df = spark.createDataFrame(
        [(
            "HTTPS://Ex.COM:8443/a/b?x=1&y=two#frag",
            "a=1&b=hello%20world&c=x%2By&plus=a+b",
            "not a url",
        )],
        "u string, q string, bad string",
    )
    row = df.select(
        compile_condition("parse_url(.u)").alias("u"),
        compile_condition("parse_query_string(.q)").alias("q"),
        compile_condition("parse_url(.bad)").alias("bad"),
    ).collect()[0]
    assert row.u["scheme"] == "https" and row.u["host"] == "ex.com"
    assert row.u["port"] == "8443" and row.u["path"] == "/a/b"
    assert row.u["query"] == "x=1&y=two" and row.u["fragment"] == "frag"
    assert row.bad is None
    assert row.q == {"a": "1", "b": "hello world", "c": "x+y", "plus": "a b"}


def test_base64_and_percent_codecs(spark):
    df = spark.createDataFrame([("hello/world?",)], "s string")
    row = df.select(
        compile_condition("encode_base64(.s)").alias("b64"),
        compile_condition("decode_base64(encode_base64(.s))").alias("rt"),
        compile_condition("encode_percent(.s)").alias("pct"),
        compile_condition("decode_percent(encode_percent(.s))").alias("prt"),
    ).collect()[0]
    assert row.b64 == "aGVsbG8vd29ybGQ/"
    assert row.rt == "hello/world?" and row.prt == "hello/world?"
    assert "%2F" in row.pct and "%3F" in row.pct


def test_parse_csv_and_join(spark):
    """RFC-4180 quote-awareness: embedded delimiters and doubled quotes."""
    df = spark.createDataFrame(
        [('a,"b,with,commas",c,"say ""hi""",42',)], "line string"
    )
    row = df.select(
        compile_condition("parse_csv(.line)").alias("f"),
        compile_condition('join(parse_csv(.line), "|")').alias("j"),
    ).collect()[0]
    assert row.f == ["a", "b,with,commas", "c", 'say "hi"', "42"]
    assert row.j == 'a|b,with,commas|c|say "hi"|42'
    with pytest.raises(VRLError, match="literal separator"):
        compile_condition("join(parse_csv(.line), .line)")


def test_parse_user_agent(spark):
    rows = spark.createDataFrame(
        [
            ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
             "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",),
            ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
             "(KHTML, like Gecko) Version/17.1 Safari/605.1.15",),
            ("Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X) "
             "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.6 Mobile/15E148 Safari/604.1",),
            ("Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",),
            ("Googlebot/2.1 (+http://www.google.com/bot.html)",),
        ],
        "ua string",
    ).select(compile_condition("parse_user_agent(.ua)").alias("m")).collect()
    got = [
        (r.m["browser_family"], r.m["browser_version"], r.m["os_family"],
         r.m["os_version"], r.m["device_family"])
        for r in rows
    ]
    assert got[0] == ("Chrome", "120.0.0.0", "Windows", "10.0", "Other")
    assert got[1] == ("Safari", "17.1", "Mac OS X", "10.15.7", "Other")
    assert got[2] == ("Safari", "16.6", "iOS", "16.6", "iPhone")
    assert got[3] == ("Firefox", "115.0", "Linux", "", "Other")
    assert got[4][0] == "Bot" and got[4][4] == "Spider"


def test_parse_query_string_malformed_percent(spark):
    """A bare '%' must not abort the job (ANSI url_decode would) — the raw
    token passes through, matching upstream VRL."""
    df = spark.createDataFrame([("a=100%&b=ok%20go",)], "q string")
    row = df.select(
        compile_condition("parse_query_string(.q)").alias("m"),
        compile_condition('decode_percent("100%")').alias("bad"),
    ).collect()[0]
    assert row.m == {"a": "100%", "b": "ok go"}
    assert row.bad is None  # recoverable-parse convention


def test_parse_duration(spark):
    df = spark.createDataFrame(
        [("300ms", "1.5h", " 2 d", "fast", "90s")],
        "a string, b string, c string, bad string, e string",
    )
    row = df.select(
        compile_condition('parse_duration(.a, "s")').alias("a"),
        compile_condition('parse_duration(.b, "m")').alias("b"),
        compile_condition('parse_duration(.c, "h")').alias("c"),
        compile_condition('parse_duration(.bad, "s")').alias("bad"),
        compile_condition('parse_duration(.e, "ms")').alias("e"),
    ).collect()[0]
    assert row.a == 0.3 and row.b == 90.0 and row.c == 48.0
    assert row.bad is None and row.e == 90000.0
    with pytest.raises(VRLError, match="literal output unit"):
        compile_condition("parse_duration(.a, .b)")


def test_syslog_level_and_array_helpers(spark):
    df = spark.createDataFrame([(3, "x"), (9, "y"), (None, "z")], "sev int, t string")
    rows = df.select(
        compile_condition("to_syslog_level(.sev)").alias("lvl"),
        compile_condition('unique(push(split("a b a", " "), "c"))').alias("arr"),
        compile_condition('flatten([split("a b", " "), split("c d", " ")])').alias("fl"),
        compile_condition('includes(["x", "y"], .t)').alias("inc"),
        compile_condition('includes([], .t)').alias("empty"),
    ).collect()
    assert [r.lvl for r in rows] == ["err", None, None]  # 9 and NULL → NULL
    assert rows[0].arr == ["a", "b", "c"]
    assert rows[0].fl == ["a", "b", "c", "d"]
    assert [r.inc for r in rows] == [True, True, False]
    assert [r.empty for r in rows] == [False, False, False]


def test_multiplicative_arithmetic(spark):
    """Round-5 grammar widening: * / % bind tighter than +/-."""
    df = spark.createDataFrame([(7, 2.0)], "i long, f double")
    row = df.select(
        compile_condition(".i * 3").alias("mul"),
        compile_condition(".i % 4").alias("mod_op"),
        compile_condition("mod(.i, 4)").alias("mod_fn"),
        compile_condition(".f / 4").alias("div"),
        compile_condition(".i + 2 * 3").alias("prec"),
        compile_condition("(.i + 2) * 3").alias("paren"),
        compile_condition("-.i * 2").alias("neg"),
    ).collect()[0]
    assert row.mul == 21 and row.mod_op == 3 and row.mod_fn == 3
    assert row.div == 0.5
    assert row.prec == 13 and row.paren == 27 and row.neg == -14


def test_hash_and_json_functions(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    row = df.select(
        compile_condition("sha1(.s)").alias("sha1"),
        compile_condition("crc32(.s)").alias("crc"),
        compile_condition('encode_json(parse_key_value("a=1", "=", " "))').alias("ej"),
        compile_condition("is_empty(.s)").alias("ne"),
        compile_condition('is_empty("")').alias("e"),
    ).collect()[0]
    assert row.sha1 == "a9993e364706816aba3e25717850c26c9cd0d89d"  # known sha1("abc")
    assert row.crc == 891568578  # known crc32("abc")
    assert row.ej == '{"a":"1"}'
    assert not row.ne and row.e


def test_redact(spark):
    df = spark.createDataFrame(
        [("card 4111-1111-1111-1111 from bob@example.com",)], "s string"
    )
    single = df.select(
        compile_condition(r"redact(.s, r'\d{4}(?:-\d{4}){3}')").alias("v")
    ).collect()[0].v
    assert single == "card [REDACTED] from bob@example.com"
    multi = df.select(
        compile_condition(
            r"redact(.s, [r'\d{4}(?:-\d{4}){3}', r'[\w.]+@[\w.]+'])"
        ).alias("v")
    ).collect()[0].v
    assert multi == "card [REDACTED] from [REDACTED]"
    with pytest.raises(VRLError, match="literal regex"):
        compile_condition("redact(.s, .s)")


def test_case_conversions(spark):
    df = spark.createDataFrame([("my_snake-case exampleValue",)], "s string")
    row = df.select(
        compile_condition("camelcase(.s)").alias("c"),
        compile_condition("pascalcase(.s)").alias("p"),
        compile_condition("snakecase(.s)").alias("sn"),
        compile_condition("kebabcase(.s)").alias("k"),
        compile_condition("screamingsnakecase(.s)").alias("sc"),
    ).collect()[0]
    assert row.c == "mySnakeCaseExampleValue"
    assert row.p == "MySnakeCaseExampleValue"
    assert row.sn == "my_snake_case_example_value"
    assert row.k == "my-snake-case-example-value"
    assert row.sc == "MY_SNAKE_CASE_EXAMPLE_VALUE"


def test_strip_ansi_escape_codes(spark):
    df = spark.createDataFrame(
        [("\x1b[31;1mred\x1b[0m plain \x1b]0;title\x07after \x1bMup",)], "s string"
    )
    got = df.select(
        compile_condition("strip_ansi_escape_codes(.s)").alias("v")
    ).collect()[0].v
    assert got == "red plain after up"


def test_parse_logfmt_round_trip(spark):
    """parse_logfmt inverts the sink logfmt encoder (quotes, escapes,
    newline folds) — checked against logfmt_expr output, not hand-written
    strings, so the two paths cannot drift."""
    from vector_spark.plans.sinks import logfmt_expr

    df = spark.createDataFrame(
        [("plain", 'sp ace', 'q"uote', "back\\slash", "line\nbreak", None)],
        "a string, b string, c string, d string, e string, f string",
    )
    line = df.select(logfmt_expr(df).alias("line"))
    m = line.select(
        compile_condition("parse_logfmt(.line)", columns=["line"]).alias("m")
    ).collect()[0].m
    assert m == {
        "a": "plain", "b": "sp ace", "c": 'q"uote',
        "d": "back\\slash", "e": "line\nbreak",
    }  # NULL f omitted by the encoder
    # bare token → "" value; blank line → NULL map (recoverable)
    df2 = spark.createDataFrame([("x=1 flag", "  ")], "s string, blank string")
    row = df2.select(
        compile_condition("parse_logfmt(.s)").alias("m"),
        compile_condition("parse_logfmt(.blank)").alias("b"),
    ).collect()[0]
    assert row.m == {"x": "1", "flag": ""} and row.b is None


def test_parse_nginx_log(spark):
    combined = (
        '203.0.113.9 - alice [12/Mar/2024:09:30:01 +0000] '
        '"POST /api/v1 HTTP/1.1" 201 512 "https://ref.example/" "curl/8.0"'
    )
    err_line = "2024/03/12 09:30:02 [warn] 77#3: *9 upstream timed out"
    df = spark.createDataFrame([(combined, err_line)], "c string, e string")
    row = df.select(
        compile_condition('parse_nginx_log(.c, "combined")').alias("c"),
        compile_condition('parse_nginx_log(.e, "error")').alias("e"),
        compile_condition('parse_nginx_log(.e, "combined")').alias("miss"),
    ).collect()[0]
    assert row.c["client"] == "203.0.113.9" and row.c["user"] == "alice"
    assert row.c["method"] == "POST" and row.c["status"] == "201"
    assert row.c["size"] == "512" and row.c["agent"] == "curl/8.0"
    assert row.e == {
        "timestamp": "2024/03/12 09:30:02", "severity": "warn",
        "pid": "77", "tid": "3", "cid": "9", "message": "upstream timed out",
    }
    assert row.miss is None
    with pytest.raises(VRLError, match="combined.*or.*error"):
        compile_condition('parse_nginx_log(.c, "main")')


def test_parse_glog(spark):
    df = spark.createDataFrame(
        [("W0102 03:04:05.000001  9 server.cc:123] slow request",)], "s string"
    )
    m = df.select(compile_condition("parse_glog(.s)").alias("m")).collect()[0].m
    assert m == {
        "level": "warning", "timestamp": "0102 03:04:05.000001", "id": "9",
        "file": "server.cc", "line": "123", "message": "slow request",
    }


def test_parse_cef(spark):
    line = (
        "CEF:1|Sec\\|Vendor|tm|2.0|100|detected \\\\ thing|7|"
        "src=10.0.0.1 msg=two words dst=10.0.0.2"
    )
    bare = "CEF:0|v|p|1|id|n|3|"
    df = spark.createDataFrame([(line, bare, "not cef")], "a string, b string, c string")
    row = df.select(
        compile_condition("parse_cef(.a)").alias("a"),
        compile_condition("parse_cef(.b)").alias("b"),
        compile_condition("parse_cef(.c)").alias("c"),
    ).collect()[0]
    assert row.a["cefVersion"] == "1"
    assert row.a["deviceVendor"] == "Sec|Vendor"  # \| unescaped
    assert row.a["name"] == "detected \\ thing"  # \\ unescaped
    assert row.a["severity"] == "7"
    assert row.a["src"] == "10.0.0.1" and row.a["dst"] == "10.0.0.2"
    assert row.a["msg"] == "two words"  # value spaces kept until next key=
    assert row.b["deviceEventClassId"] == "id" and "src" not in row.b
    assert row.c is None


def test_to_syslog_facility(spark):
    df = spark.createDataFrame([(0,), (4,), (16,), (23,), (24,)], "f int")
    got = [
        r.v
        for r in df.select(
            compile_condition("to_syslog_facility(.f)").alias("v")
        ).collect()
    ]
    assert got == ["kern", "auth", "local0", "local7", None]


def test_round5_functions_stay_jvm(spark):
    """Every round-5 addition compiles to pure Column expressions — no
    Python UDF anywhere in the optimized plan."""
    df = spark.createDataFrame([("x",)], "s string")
    plan = df.select(
        compile_condition("sha1(.s)").alias("a"),
        compile_condition("crc32(.s)").alias("b"),
        compile_condition("redact(.s, r'x')").alias("c"),
        compile_condition("snakecase(.s)").alias("d"),
        compile_condition("parse_logfmt(.s)").alias("e"),
        compile_condition('parse_nginx_log(.s, "combined")').alias("f"),
        compile_condition("parse_cef(.s)").alias("g"),
        compile_condition("strip_ansi_escape_codes(.s)").alias("h"),
    )
    assert "pythonudf" not in plan._jdf.queryExecution().optimizedPlan().toString().lower()


def test_parse_aws_vpc_flow_log(spark):
    line = "2 123456789010 eni-1235b8ca 172.31.16.139 172.31.16.21 20641 22 6 20 4249 1418530010 1418530070 ACCEPT OK"
    df = spark.createDataFrame([(line, "2 short")], "a string, b string")
    row = df.select(
        compile_condition("parse_aws_vpc_flow_log(.a)").alias("m"),
        compile_condition("parse_aws_vpc_flow_log(.b)").alias("bad"),
    ).collect()[0]
    assert row.m["srcaddr"] == "172.31.16.139" and row.m["dstport"] == "22"
    assert row.m["action"] == "ACCEPT" and row.m["log_status"] == "OK"
    assert row.m["bytes"] == "4249" and row.m["version"] == "2"
    assert row.bad is None


def test_parse_aws_alb_log(spark):
    line = (
        'https 2024-03-12T09:30:01.123456Z app/my-lb/50dc6c495c0c9188 '
        '192.168.131.39:2817 10.0.0.1:80 0.000 0.001 0.000 200 200 34 366 '
        '"GET https://www.example.com:443/path?q=1 HTTP/1.1" '
        '"Mozilla/5.0 (compatible)" ECDHE-RSA-AES128-GCM-SHA256 TLSv1.2 '
        'arn:aws:elasticloadbalancing:us-east-1:123:targetgroup/tg/6d0ecf83 '
        '"Root=1-58337262-36d228ad5d99923122bbe354" extra trailing'
    )
    df = spark.createDataFrame([(line,)], "s string")
    m = df.select(
        compile_condition("parse_aws_alb_log(.s)").alias("m")
    ).collect()[0].m
    assert m["type"] == "https" and m["elb"] == "app/my-lb/50dc6c495c0c9188"
    assert m["client_ip"] == "192.168.131.39" and m["client_port"] == "2817"
    assert m["target_ip"] == "10.0.0.1" and m["target_port"] == "80"
    assert m["elb_status_code"] == "200" and m["sent_bytes"] == "366"
    assert m["request"] == "GET https://www.example.com:443/path?q=1 HTTP/1.1"
    assert m["user_agent"] == "Mozilla/5.0 (compatible)"
    assert m["ssl_protocol"] == "TLSv1.2"
    assert m["trace_id"] == "Root=1-58337262-36d228ad5d99923122bbe354"


def test_encode_logfmt_round_trip(spark):
    df = spark.createDataFrame([("x",)], "s string")
    enc = df.select(
        compile_condition(
            'encode_logfmt(parse_logfmt("b=2 a=\\"one two\\" c=plain"))'
        ).alias("v")
    ).collect()[0].v
    assert enc == 'a="one two" b=2 c=plain'  # keys sorted, quoting kept
    # full round trip: encode(parse(encode(parse(x)))) is stable
    again = df.select(
        compile_condition(
            'encode_logfmt(parse_logfmt(encode_logfmt(parse_logfmt('
            '"b=2 a=\\"one two\\" c=plain"))))'
        ).alias("v")
    ).collect()[0].v
    assert again == enc


def test_encode_csv(spark):
    df = spark.createDataFrame([("x",)], "s string")
    got = df.select(
        compile_condition(
            'encode_csv(["plain", "with,comma", "with\\"quote", ""])'
        ).alias("v")
    ).collect()[0].v
    assert got == 'plain,"with,comma","with""quote",'


def test_parse_xml(spark):
    df = spark.createDataFrame(
        [("<doc><title>hi</title><n>7</n></doc>", "not xml")], "x string, bad string"
    )
    row = df.select(
        compile_condition('parse_xml(.x, "title STRING, n INT")').alias("m"),
        compile_condition('parse_xml(.bad, "title STRING")').alias("b"),
    ).collect()[0]
    assert row.m.title == "hi" and row.m.n == 7
    assert row.b.title is None  # malformed -> null fields, recoverable
    with pytest.raises(VRLError, match="literal DDL schema"):
        compile_condition("parse_xml(.x, .bad)")


def test_parse_int_with_base(spark):
    df = spark.createDataFrame([("ff", "777", "42")], "h string, o string, d string")
    row = df.select(
        compile_condition("parse_int(.h, 16)").alias("hx"),
        compile_condition("parse_int(.o, 8)").alias("oc"),
        compile_condition("parse_int(.d)").alias("dec"),
        compile_condition("parse_int(.d, 10)").alias("dec10"),
    ).collect()[0]
    assert row.hx == 255 and row.oc == 511
    assert row.dec == 42 and row.dec10 == 42
    with pytest.raises(VRLError, match="base"):
        compile_condition("parse_int(.h, 99)")


def test_logfmt_round_trip_randomized(spark):
    """encode_logfmt ∘ parse_logfmt is identity over 300 adversarial value
    pairs (quotes, backslashes, newlines, tabs, '=', unicode) — seeded
    random, one DataFrame, no per-example Spark round trips."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(20260821)
    alphabet = 'ab "\\\n\t=寿 x'
    rows = [
        (
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12))),
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))),
        )
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "v1 string, v2 string")
    m = F.create_map(F.lit("k1"), F.col("v1"), F.lit("k2"), F.col("v2"))
    stage = df.select("v1", "v2", m.alias("m")).select(
        "v1", "v2",
        compile_condition("encode_logfmt(.m)", columns=["v1", "v2", "m"]).alias("line"),
    )
    back = stage.select(
        "v1", "v2",
        compile_condition("parse_logfmt(.line)", columns=["v1", "v2", "line"]).alias("rt"),
    ).collect()
    for r in back:
        assert r.rt["k1"] == r.v1, (r.v1, r.rt)
        assert r.rt["k2"] == r.v2, (r.v2, r.rt)


def test_parse_logfmt_duplicate_keys_last_wins(spark):
    """A repeated key must not abort the job (mapKeyDedupPolicy=EXCEPTION
    default) — upstream kv semantics: the LAST occurrence wins."""
    df = spark.createDataFrame([("a=1 b=2 a=3",)], "s string")
    m = df.select(compile_condition("parse_logfmt(.s)").alias("m")).collect()[0].m
    assert m == {"a": "3", "b": "2"}
    cef = spark.createDataFrame(
        [("CEF:0|v|p|1|id|n|3|src=1.1.1.1 src=2.2.2.2 dst=3.3.3.3",)], "s string"
    )
    mc = cef.select(compile_condition("parse_cef(.s)").alias("m")).collect()[0].m
    assert mc["src"] == "2.2.2.2" and mc["dst"] == "3.3.3.3"


def test_parse_int_base_rejects_garbage_and_negatives(spark):
    """conv() would return 0 for garbage and wrap negatives unsigned —
    both must surface as NULL (recoverable), never as a valid 0."""
    df = spark.createDataFrame([("zz", "-ff", " ff ", "")],
                               "g string, n string, pad string, e string")
    row = df.select(
        compile_condition("parse_int(.g, 16)").alias("g"),
        compile_condition("parse_int(.n, 16)").alias("n"),
        compile_condition("parse_int(.pad, 16)").alias("pad"),
        compile_condition("parse_int(.e, 16)").alias("e"),
    ).collect()[0]
    assert row.g is None and row.n is None and row.e is None
    assert row.pad == 255  # whitespace trimmed, then valid


def test_replace_and_split_regex_vs_literal(spark):
    """Plain-string patterns mean THEMSELVES; r'…' patterns are regexes
    (with $1 capture refs in replace)."""
    df = spark.createDataFrame([("a.b.c", "x1y22z")], "dots string, nums string")
    row = df.select(
        compile_condition('replace(.dots, ".", "-")').alias("lit"),
        compile_condition("replace(.nums, r'(\\d+)', \"[$1]\")").alias("rx"),
        compile_condition('split(.dots, ".")').alias("slit"),
        compile_condition("split(.nums, r'\\d+')").alias("srx"),
        compile_condition('split(.dots, ".", 2)').alias("slim"),
    ).collect()[0]
    assert row.lit == "a-b-c"          # '.' is literal, not any-char
    assert row.rx == "x[1]y[22]z"      # capture reference
    assert row.slit == ["a", "b", "c"]
    assert row.srx == ["x", "y", "z"]
    assert row.slim == ["a", "b.c"]    # limit honored
    with pytest.raises(VRLError, match="limit"):
        compile_condition('split(.dots, ".", 0)')


def test_case_insensitive_string_predicates(spark):
    df = spark.createDataFrame([("Hello World",)], "s string")
    row = df.select(
        compile_condition('contains(.s, "WORLD", false)').alias("c"),
        compile_condition('contains(.s, "WORLD", true)').alias("cs"),
        compile_condition('starts_with(.s, "hELLO", false)').alias("sw"),
        compile_condition('ends_with(.s, "WORLD", false)').alias("ew"),
    ).collect()[0]
    assert row.c and not row.cs and row.sw and row.ew
    with pytest.raises(VRLError, match="literal"):
        compile_condition("contains(.s, .s, .s)")


def test_truncate_slice_find_format(spark):
    df = spark.createDataFrame([("abcdefgh", 1234567.891, "日本語x")],
                               "s string, n double, u string")
    row = df.select(
        compile_condition('truncate(.s, 4, "...")').alias("t"),
        compile_condition('truncate(.s, 99, "...")').alias("t2"),
        compile_condition("slice(.s, 2, 5)").alias("sl"),
        compile_condition("slice(.s, -3)").alias("sneg"),
        compile_condition("slice(.s, 2, -1)").alias("smix"),
        compile_condition('find(.s, "cd")').alias("f"),
        compile_condition('find(.s, "zz")').alias("fm"),
        compile_condition("find(.s, r'[fg]+')").alias("fr"),
        compile_condition("format_number(.n, 2)").alias("fmt"),
        compile_condition("titlecase(.s)").alias("tc"),
        compile_condition("strlen(.u)").alias("bytes"),
        compile_condition("length(.u)").alias("chars"),
    ).collect()[0]
    assert row.t == "abcd..." and row.t2 == "abcdefgh"
    assert row.sl == "cde" and row.sneg == "fgh" and row.smix == "cdefg"
    assert row.f == 2 and row.fm == -1 and row.fr == 5
    assert row.fmt == "1,234,567.89"
    assert row.tc == "Abcdefgh"
    assert row.bytes == 10 and row.chars == 4  # 3×3-byte chars + 'x'


def test_parse_json_typed_form(spark):
    df = spark.createDataFrame(
        [('{"status": 404, "path": "/x"}', "not json")], "j string, bad string"
    )
    row = df.select(
        compile_condition('parse_json(.j, "status INT, path STRING")').alias("m"),
        compile_condition('parse_json(.bad, "status INT")').alias("b"),
        compile_condition("parse_json(.j)").alias("passthru"),
    ).collect()[0]
    assert row.m.status == 404 and row.m.path == "/x"
    assert row.b.status is None  # malformed -> null fields, recoverable
    assert row.passthru.startswith("{")  # 1-arg form unchanged
    with pytest.raises(VRLError, match="DDL"):
        compile_condition("parse_json(.j, .bad)")
