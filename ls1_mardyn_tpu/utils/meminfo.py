"""Memory usage reporting.

The role of /root/reference/src/io/MemoryProfiler.{h,cpp} (registered
objects report their sizes, printed with --print-meminfo): here host
RSS from procfs plus per-device HBM stats from JAX.
"""

from __future__ import annotations


def host_rss_mib() -> float:
    """Resident set size in MiB (procfs; the reference reads
    /proc/self/status the same way, MemoryProfiler.cpp)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def device_memory_stats():
    """[(device_str, bytes_in_use, bytes_limit)] where available."""
    import jax

    out = []
    for d in jax.devices():
        try:
            st = d.memory_stats() or {}
        except Exception:
            st = {}
        out.append(
            (
                str(d),
                int(st.get("bytes_in_use", 0)),
                int(st.get("bytes_limit", 0)),
            )
        )
    return out


def print_meminfo(log=None) -> str:
    lines = [f"host RSS: {host_rss_mib():.1f} MiB"]
    for dev, used, limit in device_memory_stats():
        if limit:
            lines.append(
                f"{dev}: {used / 2**20:.1f} / {limit / 2**20:.1f} MiB HBM"
            )
        else:
            lines.append(f"{dev}: {used / 2**20:.1f} MiB in use")
    text = "\n".join(lines)
    if log is not None:
        log.info("Memory info:\n%s", text)
    return text
