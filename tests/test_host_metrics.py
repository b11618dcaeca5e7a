"""host_metrics source — synthetic-procfs exactness + live smoke.

Reference: host_metrics collector form (config_panel.rs:1290-1415)."""

import os

import pytest

from vector_spark.sources.host_metrics import COLLECTORS, host_metrics_source


@pytest.fixture()
def fake_proc(tmp_path):
    (tmp_path / "net").mkdir()
    (tmp_path / "stat").write_text(
        "cpu  100 0 200 3000 40 5 6 7 0 0\n"
        "cpu0 60 0 120 1500 20 3 3 4 0 0\n"
        "cpu1 40 0 80 1500 20 2 3 3 0 0\n"
        "intr 12345\n"
        "ctxt 999\n"
    )
    (tmp_path / "meminfo").write_text(
        "MemTotal:       2048 kB\n"
        "MemFree:         512 kB\n"
        "MemAvailable:   1024 kB\n"
        "Buffers:          64 kB\n"
        "Cached:          128 kB\n"
        "SwapCached:        0 kB\n"
        "SwapTotal:       256 kB\n"
        "SwapFree:        256 kB\n"
    )
    (tmp_path / "loadavg").write_text("1.50 0.75 0.25 2/345 6789\n")
    (tmp_path / "uptime").write_text("12345.67 45678.90\n")
    (tmp_path / "net" / "dev").write_text(
        "Inter-|   Receive                                                |  Transmit\n"
        " face |bytes    packets errs drop fifo frame compressed multicast|bytes    packets errs"
        " drop fifo colls carrier compressed\n"
        "    lo: 1000     10    0    0    0     0          0         0     1000     10    0"
        "    0    0    0    0          0\n"
        "  eth0: 5000     50    1    0    0     0          0         0     7000     70    2"
        "    0    0    0    0          0\n"
    )
    (tmp_path / "diskstats").write_text(
        "   8       0 sda 100 0 2000 50 200 0 4000 80 0 120 130\n"
        "   7       0 loop0 1 0 2 0 0 0 0 0 0 0 0\n"
        " 253       0 dm-0 10 0 20 5 30 0 40 8 0 12 13\n"
    )
    return str(tmp_path)


def test_synthetic_proc_exact_values(spark, fake_proc):
    df = host_metrics_source(
        spark,
        collectors=("cpu", "memory", "load", "uptime", "network", "disk"),
        proc_root=fake_proc,
        user_hz=100.0,
    )
    rows = {(r["name"], tuple(sorted(r["tags"].items()))): r for r in df.collect()}

    # cpu: ticks / USER_HZ seconds, aggregate + per-core, one row per mode
    total_user = rows[("cpu_seconds_total", (("cpu", "total"), ("mode", "user")))]
    assert total_user["value"] == pytest.approx(1.0)  # 100 ticks @ 100 Hz
    assert total_user["kind"] == "counter"
    cpu1_idle = rows[("cpu_seconds_total", (("cpu", "1"), ("mode", "idle")))]
    assert cpu1_idle["value"] == pytest.approx(15.0)
    assert sum(1 for (n, _t) in rows if n == "cpu_seconds_total") == 3 * 8

    # memory: kB → bytes gauges
    assert rows[("memory_total_bytes", ())]["value"] == 2048 * 1024
    assert rows[("memory_available_bytes", ())]["value"] == 1024 * 1024
    assert rows[("memory_total_bytes", ())]["kind"] == "gauge"

    # load / uptime
    assert rows[("load1", ())]["value"] == pytest.approx(1.50)
    assert rows[("load15", ())]["value"] == pytest.approx(0.25)
    assert rows[("uptime_seconds", ())]["value"] == pytest.approx(12345.67)

    # network: per-device receive/transmit counters, transmit at stat col 8
    eth = ("network_transmit_bytes_total", (("device", "eth0"),))
    assert rows[eth]["value"] == 7000.0
    assert rows[("network_receive_errs_total", (("device", "eth0"),))]["value"] == 1.0

    # disk: sectors × 512, loop devices excluded, dm devices kept
    assert rows[("disk_read_bytes_total", (("device", "sda"),))]["value"] == 2000 * 512.0
    assert rows[("disk_written_bytes_total", (("device", "dm-0"),))]["value"] == 40 * 512.0
    assert not any(t == (("device", "loop0"),) for (_n, t) in rows)


def test_live_proc_smoke(spark):
    """Against the real /proc: every collector yields rows, filesystem gauges
    satisfy total = used + free, and counters are non-negative."""
    if not os.path.exists("/proc/stat"):
        pytest.skip("no procfs on this platform")
    df = host_metrics_source(spark)
    rows = df.collect()
    names = {r["name"] for r in rows}
    assert {"cpu_seconds_total", "memory_total_bytes", "load1", "uptime_seconds"} <= names
    assert all(r["value"] >= 0 for r in rows if r["kind"] == "counter")
    fs = {r["name"]: r["value"] for r in rows if r["name"].startswith("filesystem_")}
    if fs:
        assert fs["filesystem_total_bytes"] == pytest.approx(
            fs["filesystem_used_bytes"] + fs["filesystem_free_bytes"]
        )


def test_unknown_collector_raises(spark):
    with pytest.raises(ValueError, match="unknown host_metrics collectors"):
        host_metrics_source(spark, collectors=("cpu", "gpu"))
    assert set(COLLECTORS) == {
        "cpu", "memory", "load", "uptime", "network", "disk", "filesystem",
    }
