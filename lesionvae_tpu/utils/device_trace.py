"""True on-device execution time from a jax.profiler trace (VERDICT r3 #3).

The bench's ``device_time_s`` was host wall-clock spent *waiting* on device
programs — it moves with link weather.  This module parses the xplane proto
(``jax.profiler.ProfileData``, no TensorBoard needed) and sums the device
planes' per-module execution durations: a weather-independent signal that
only moves when the compiled programs themselves change.

Attribution: device planes carry an "XLA Modules" line whose events are the
executed module names (e.g. ``jit_fleet_train(...)``); summing those avoids
double-counting the nested "XLA Ops" line.  When no module line exists
(interpreter/CPU quirks), falls back to the busiest line per plane.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path
from typing import Dict


def _is_device_plane(name: str) -> bool:
    low = name.lower()
    return "tpu" in low or ("/device:" in low and "cpu" not in low)


def _is_host_plane(name: str) -> bool:
    low = name.lower()
    return any(k in low for k in ("/host", "python", "metadata", "task env"))


def device_exec_by_module(trace_dir: str) -> Dict[str, float]:
    """Seconds of on-device execution per XLA module name, summed over all
    device planes/cores under ``trace_dir`` (latest xplane.pb)."""
    import jax

    files = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    if not files:
        return {}
    pd = jax.profiler.ProfileData.from_file(str(files[-1]))
    planes = list(pd.planes)
    device_planes = [p for p in planes if _is_device_plane(p.name)]
    if not device_planes:
        # plugin backends may name planes unconventionally: anything that is
        # clearly not a host/python plane is treated as device
        device_planes = [p for p in planes if not _is_host_plane(p.name)]
    per_module: Dict[str, float] = defaultdict(float)
    for plane in device_planes:
        module_lines = [ln for ln in plane.lines
                        if "module" in ln.name.lower()]
        if module_lines:
            for line in module_lines:
                for ev in line.events:
                    per_module[_clean(ev.name)] += ev.duration_ns / 1e9
        else:
            # fallback: the busiest single line approximates exec time
            # without double-counting nested op events
            best: Dict[str, float] = {}
            best_total = -1.0
            for line in plane.lines:
                cur: Dict[str, float] = defaultdict(float)
                for ev in line.events:
                    cur[_clean(ev.name)] += ev.duration_ns / 1e9
                if sum(cur.values()) > best_total:
                    best_total = sum(cur.values())
                    best = dict(cur)
            for k, v in best.items():
                per_module[k] += v
    return dict(per_module)


def _clean(name: str) -> str:
    # module events render as "jit_fn(arg_shapes)" or "jit_fn.N"; strip to
    # the program name so re-jits aggregate together
    return name.split("(")[0].split(".")[0]


_STAGE_RULES = (
    ("geometry", ("streamline_metrics",)),
    ("sh", ("sh_fit", "radius", "sph", "legendre")),
    ("fleet", ("fleet_train", "train_one")),
    ("normative", ("member_summary", "normative", "score")),
)


def stage_breakdown(per_module: Dict[str, float]) -> Dict[str, float]:
    """Fold per-module exec seconds into the bench's pipeline stages."""
    out = {stage: 0.0 for stage, _ in _STAGE_RULES}
    out["other"] = 0.0
    for name, secs in per_module.items():
        low = name.lower()
        for stage, keys in _STAGE_RULES:
            if any(k in low for k in keys):
                out[stage] += secs
                break
        else:
            out["other"] += secs
    out["total"] = sum(out.values())
    return {k: round(v, 3) for k, v in out.items()}
