"""Persistent-compile-cache helpers.

XLA:CPU persistent-cache entries embed AOT-compiled executables stamped with
the compiling host's machine features; the loader (cpu_aot_loader) REJECTS
entries whose features don't match the running host, so a cache dir shared
across heterogeneous hosts yields hits that always fail validation and
recompile from scratch — a silently dead cache (observed round 3: 72
"machine type doesn't match" rejections in one 9-minute dryrun).  Keying the
dir by a host CPU fingerprint makes every hit actually loadable.
"""

import hashlib
import platform


class CacheCounter:
    """Counts persistent-compile-cache hits/requests via jax.monitoring.

    misses = requests - hits; surfaced in the bench JSON and the dryrun
    output so a dead cache is observable instead of silent (VERDICT r3 #2)."""

    def __init__(self):
        import jax.monitoring

        self.hits = 0
        self.requests = 0
        jax.monitoring.register_event_listener(self._on_event)

    def _on_event(self, event: str, **kwargs) -> None:
        if event == "/jax/compilation_cache/cache_hits":
            self.hits += 1
        elif event == "/jax/compilation_cache/compile_requests_use_cache":
            self.requests += 1

    @property
    def misses(self) -> int:
        return self.requests - self.hits

    def line(self) -> str:
        return f"compile-cache: {self.hits} hits / {self.misses} misses"


def host_cpu_fingerprint() -> str:
    """Short stable fingerprint of this host's CPU feature set."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{feats}".encode()
    return hashlib.sha256(raw).hexdigest()[:10]


def host_keyed_cache_dir(base: str) -> str:
    """Cache dir under ``base`` keyed by the host CPU fingerprint.

    Use for CPU-platform processes (the multichip dryrun bootstrap); TPU
    executables carry no host-CPU AOT code, so the TPU bench keeps ``base``
    itself and stays shareable across hosts."""
    return f"{base}_host_{host_cpu_fingerprint()}"
