"""Device memory counters (reference parity: peak GPU MB per run,
``maggie/engine/test.py:155-156,291-293`` via torch.cuda.max_memory_allocated)."""

from __future__ import annotations


def device_peak_memory_mb() -> float | None:
    """Peak bytes in use on the first local device, in MB. Returns None when the
    backend does not expose memory stats (e.g. the CPU platform in tests)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use"))
    if peak is None:
        return None
    return float(peak) / (1024.0 * 1024.0)
