"""The reference's OWN pipeline configs, loaded verbatim, build and run with
the documented semantics — direct parity evidence.

Sources: /root/reference/config/demo.toml and
/root/reference/dev/configs/production/vector.toml (studied for behavior;
reproduced here as literal strings so the suite does not read outside the
repo).  Only the demo_logs `count` is scaled down for test speed.
"""

from __future__ import annotations

from vector_spark.plans.pipeline import Pipeline

# config/demo.toml — verbatim except count (uncapped there = infinite stream)
DEMO_TOML = """
[api]
enabled = true
address = "127.0.0.1:8686"
playground = true

[sources.demo_logs]
format = "syslog"
type = "demo_logs"
count = 200

[transforms]

[transforms.filter]
condition = '''
contains(string!(.message), ">")

'''
inputs = ["demo_logs"]
type = "filter"

[sinks.console]
encoding.codec = "json"
inputs = ["filter"]
type = "memory"
"""

# dev/configs/production/vector.toml — verbatim except count
PRODUCTION_TOML = """
[api]
enabled = true
address = "0.0.0.0:8686"
playground = true

[sources.demo_logs]
type = "demo_logs"
format = "json"
interval = 1
count = 300

[transforms.parse_json]
type = "remap"
inputs = ["demo_logs"]
source = '''
# Add production metadata
.environment = "production"
.processed_at = now()
'''

[transforms.filter_errors]
type = "filter"
inputs = ["parse_json"]
condition = '''
# Only pass through logs with status >= 400 (errors)
status = to_int(.status) ?? 200
status >= 400
'''

[sinks.console_all]
type = "memory"
inputs = ["parse_json"]
encoding.codec = "json"
target = "stdout"

[sinks.console_errors]
type = "memory"
inputs = ["filter_errors"]
encoding.codec = "json"
target = "stderr"
"""


def test_reference_demo_toml_runs(spark):
    p = Pipeline.from_toml(DEMO_TOML)
    assert [i for i in p.validate() if i.severity == "error"] == []
    res = p.run(spark)
    rows = res["console"]
    assert len(rows) == 200  # every syslog demo line contains ">"
    assert all(">" in e["message"] for e in rows)


def test_reference_production_toml_runs(spark):
    p = Pipeline.from_toml(PRODUCTION_TOML)
    assert [i for i in p.validate() if i.severity == "error"] == []
    res = p.run(spark)
    all_rows = res["console_all"]
    err_rows = res["console_errors"]
    assert len(all_rows) == 300
    # remap added the production metadata to every event
    assert all(e["environment"] == "production" for e in all_rows)
    assert all(e["processed_at"] is not None for e in all_rows)
    # Faithful schemaless semantics: the config's filter reads `.status`,
    # but demo_logs json events carry the fields INSIDE the json message
    # string — `.status` doesn't exist, `to_int(.status) ?? 200` → 200,
    # 200 < 400 → console_errors receives ZERO events.  That is exactly what
    # the real engine does with this config (the remap only adds metadata;
    # nothing parses the json).  Previously our typed build raised
    # UNRESOLVED_COLUMN here; now missing paths are NULL, like Vector.
    assert err_rows == []


def test_production_toml_with_json_parse_yields_errors(spark):
    """The config as a Vector user would FIX it — parse the json message
    first — produces the status >= 400 subset the comments intend."""
    fixed = PRODUCTION_TOML.replace(
        """source = '''
# Add production metadata
.environment = "production"
.processed_at = now()
'''""",
        """source = '''
.environment = "production"
'''
parse_json = "method string, path string, status int, bytes int, ip string"
source_col = "message"
""",
    )
    p = Pipeline.from_toml(fixed)
    res = p.run(spark)
    all_rows, err_rows = res["console_all"], res["console_errors"]
    assert len(all_rows) == 300
    assert 0 < len(err_rows) < len(all_rows)
    assert all(e["status"] >= 400 for e in err_rows)


# dev/configs/staging/vector.toml — verbatim except count
STAGING_TOML = """
[api]
enabled = true
address = "0.0.0.0:8686"
playground = true

[sources.demo_logs]
type = "demo_logs"
format = "syslog"
interval = 2
count = 150

[transforms.add_metadata]
type = "remap"
inputs = ["demo_logs"]
source = '''
# Add staging metadata
.environment = "staging"
.processed_at = now()
'''

[sinks.console]
type = "memory"
inputs = ["add_metadata"]
encoding.codec = "text"
target = "stdout"
"""


def test_reference_staging_toml_runs(spark):
    p = Pipeline.from_toml(STAGING_TOML)
    assert [i for i in p.validate() if i.severity == "error"] == []
    res = p.run(spark)
    rows = res["console"]
    assert len(rows) == 150
    assert all(e["environment"] == "staging" for e in rows)
    assert all(e["message"].startswith("<") for e in rows)  # RFC 5424 lines
