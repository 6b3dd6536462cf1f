"""Persistent XLA compilation cache for the CLI entry points.

The full-size GAN train step takes ~2 min per bucket shape to compile
through the TPU tunnel's remote compile helper, and a training restart
(resume / fine-tune) re-pays every bucket shape again (~6 shapes ≈ 20 min
measured on the overfit run). The reference has no equivalent problem —
eager torch recompiles nothing — so this is a TPU-native must-have, not a
port: jax's persistent cache keys executables by HLO hash and reloads them
across processes.

Enabled by every CLI (train/convert/encode/bench). Set ``QVC_COMPILE_CACHE``
to move the directory, or to ``0``/``off`` to disable. Backends whose PJRT
plugin cannot serialize executables simply skip the cache (jax warns once).
"""

from __future__ import annotations

import os


def enable_persistent_cache(default_dir: str | None = None) -> str | None:
    """Turn on jax's persistent compilation cache. Returns the dir or None."""
    loc = os.environ.get("QVC_COMPILE_CACHE")
    if loc in ("0", "off", "none"):
        return None
    if not loc:
        loc = default_dir or os.path.expanduser("~/.cache/qvc_compile_cache")
    os.makedirs(loc, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", loc)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return loc
