"""`host_metrics` source — a /proc-backed host telemetry snapshot.

Reference: the `host_metrics` source form (config_panel.rs:1290-1415) with
its collector list (cpu / memory / load / network / disk / filesystem /
uptime).  The reference agent scrapes the host it runs on and emits gauge /
counter metric events; here the scrape is a driver-side read of the public
Linux procfs interfaces (/proc/stat, /proc/meminfo, /proc/loadavg,
/proc/uptime, /proc/net/dev, /proc/diskstats) plus os.statvfs, turned into
a small DataFrame in the repo's metric-event shape.

Design note (scale doctrine): a host scrape is a point-in-time read of a
few KB that MUST happen on one specific machine — there is nothing to
distribute, so this is one of the sanctioned driver-side reads (like the
checkpoint markers and console test sink).  In a fleet deployment each
node's agent produces this table and the engine unions/aggregates them —
that downstream path is the ordinary metrics pipeline (operators/
metrics_conv, plans/metrics), already distributed.

All values are float64; `kind` says whether the reading is a monotone
`counter` (e.g. cpu_seconds_total, network_*_total) or an instantaneous
`gauge` (memory/load/filesystem), mirroring the reference's metric model.
``proc_root`` / ``mounts`` exist so tests can point the collectors at a
synthetic procfs and assert exact values.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

COLLECTORS = ("cpu", "memory", "load", "uptime", "network", "disk", "filesystem")

_SCHEMA = "name string, tags map<string,string>, value double, kind string"

#: /proc/meminfo kB fields → metric names (the reference's memory collector
#: gauge set; swap fields ride along under the same collector).
_MEMINFO_FIELDS = {
    "MemTotal": "memory_total_bytes",
    "MemFree": "memory_free_bytes",
    "MemAvailable": "memory_available_bytes",
    "Buffers": "memory_buffers_bytes",
    "Cached": "memory_cached_bytes",
    "SwapTotal": "memory_swap_total_bytes",
    "SwapFree": "memory_swap_free_bytes",
}

#: /proc/stat cpu line columns, in order (man 5 proc).
_CPU_MODES = ("user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal")


def _read(proc_root: str, rel: str) -> list[str]:
    with open(os.path.join(proc_root, rel), "r", encoding="ascii", errors="replace") as f:
        return f.read().splitlines()


def _collect_cpu(proc_root: str, rows: list, user_hz: float) -> None:
    for line in _read(proc_root, "stat"):
        parts = line.split()
        if not parts or not parts[0].startswith("cpu"):
            continue
        cpu = "total" if parts[0] == "cpu" else parts[0][3:]
        for mode, raw in zip(_CPU_MODES, parts[1:]):
            rows.append(
                ("cpu_seconds_total", {"cpu": cpu, "mode": mode}, int(raw) / user_hz, "counter")
            )


def _collect_memory(proc_root: str, rows: list) -> None:
    for line in _read(proc_root, "meminfo"):
        field, _, rest = line.partition(":")
        name = _MEMINFO_FIELDS.get(field.strip())
        if name is None:
            continue
        kb = int(rest.split()[0])  # meminfo values are kB (man 5 proc)
        rows.append((name, {}, float(kb) * 1024.0, "gauge"))


def _collect_load(proc_root: str, rows: list) -> None:
    parts = _read(proc_root, "loadavg")[0].split()
    for name, raw in zip(("load1", "load5", "load15"), parts[:3]):
        rows.append((name, {}, float(raw), "gauge"))


def _collect_uptime(proc_root: str, rows: list) -> None:
    rows.append(("uptime_seconds", {}, float(_read(proc_root, "uptime")[0].split()[0]), "gauge"))


def _collect_network(proc_root: str, rows: list) -> None:
    # /proc/net/dev: 2 header lines, then "iface: rbytes rpackets rerrs ... "
    # receive is cols 0-3 of the stats, transmit starts at col 8 (man 5 proc).
    for line in _read(proc_root, "net/dev")[2:]:
        iface, _, stats = line.partition(":")
        iface = iface.strip()
        if not iface:
            continue
        s = stats.split()
        tags = {"device": iface}
        rows.append(("network_receive_bytes_total", tags, float(s[0]), "counter"))
        rows.append(("network_receive_packets_total", tags, float(s[1]), "counter"))
        rows.append(("network_receive_errs_total", tags, float(s[2]), "counter"))
        rows.append(("network_transmit_bytes_total", tags, float(s[8]), "counter"))
        rows.append(("network_transmit_packets_total", tags, float(s[9]), "counter"))
        rows.append(("network_transmit_errs_total", tags, float(s[10]), "counter"))


def _collect_disk(proc_root: str, rows: list) -> None:
    # /proc/diskstats: major minor name reads reads_merged sectors_read ms
    # writes writes_merged sectors_written ...; sectors are 512 bytes by
    # definition of the interface regardless of the device's real size.
    for line in _read(proc_root, "diskstats"):
        parts = line.split()
        if len(parts) < 10:
            continue
        name = parts[2]
        if name.startswith(("loop", "ram")):
            continue
        tags = {"device": name}
        rows.append(("disk_reads_completed_total", tags, float(parts[3]), "counter"))
        rows.append(("disk_read_bytes_total", tags, float(parts[5]) * 512.0, "counter"))
        rows.append(("disk_writes_completed_total", tags, float(parts[7]), "counter"))
        rows.append(("disk_written_bytes_total", tags, float(parts[9]) * 512.0, "counter"))


def _collect_filesystem(rows: list, mounts: tuple[str, ...]) -> None:
    for mount in mounts:
        try:
            st = os.statvfs(mount)
        except OSError:
            continue
        tags = {"mountpoint": mount}
        total = float(st.f_blocks) * st.f_frsize
        free = float(st.f_bfree) * st.f_frsize
        rows.append(("filesystem_total_bytes", tags, total, "gauge"))
        rows.append(("filesystem_free_bytes", tags, free, "gauge"))
        rows.append(("filesystem_used_bytes", tags, total - free, "gauge"))


def host_metrics_source(
    spark: SparkSession,
    collectors: tuple[str, ...] = COLLECTORS,
    proc_root: str = "/proc",
    mounts: tuple[str, ...] = ("/",),
    user_hz: float | None = None,
) -> DataFrame:
    """One host-telemetry snapshot as (name, tags, value, kind) rows.

    ``collectors`` mirrors the reference form's collector checklist; unknown
    names raise rather than silently scraping nothing.  ``proc_root`` points
    the procfs readers elsewhere for tests; ``user_hz`` overrides the
    sysconf clock-tick divisor the cpu collector uses (procfs cpu times are
    in USER_HZ ticks)."""
    unknown = set(collectors) - set(COLLECTORS)
    if unknown:
        raise ValueError(f"unknown host_metrics collectors {sorted(unknown)}; known: {COLLECTORS}")
    if user_hz is None:
        user_hz = float(os.sysconf("SC_CLK_TCK"))
    rows: list = []
    if "cpu" in collectors:
        _collect_cpu(proc_root, rows, user_hz)
    if "memory" in collectors:
        _collect_memory(proc_root, rows)
    if "load" in collectors:
        _collect_load(proc_root, rows)
    if "uptime" in collectors:
        _collect_uptime(proc_root, rows)
    if "network" in collectors:
        _collect_network(proc_root, rows)
    if "disk" in collectors:
        _collect_disk(proc_root, rows)
    if "filesystem" in collectors:
        _collect_filesystem(rows, mounts)
    return spark.createDataFrame(rows, schema=_SCHEMA)
