"""Pin the xplane device-trace parser against the real axon naming scheme.

``utils/device_trace.py`` supplies the bench's ``device_exec_s`` (VERDICT r3
#3) by parsing ``jax.profiler`` traces — but CPU traces carry no device
planes, so CI could never exercise the TPU path until now.  These tests
hand-encode a minimal XSpace protobuf (the xplane wire format: XSpace.planes
= 1, XPlane.name = 2 / lines = 3 / event_metadata = 4, XLine.name = 2 /
events = 4, XEvent.metadata_id = 1 / duration_ps = 3) using the plane/line
names observed in a REAL axon TPU trace (/device:TPU:0 with "XLA Modules" /
"XLA Ops" lines; captured 2026-08-16 on the round-3 chip) and feed it through
the production entry point ``device_exec_by_module``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lesionvae_tpu.utils.device_trace import (device_exec_by_module,  # noqa: E402
                                              stage_breakdown)

PS = 1_000_000_000_000  # picoseconds per second


# --- minimal protobuf wire encoder ------------------------------------------
def _vint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _len_field(num: int, data: bytes) -> bytes:
    return _vint((num << 3) | 2) + _vint(len(data)) + data


def _i64(num: int, val: int) -> bytes:
    return _vint(num << 3) + _vint(val)


def _event(metadata_id: int, duration_ps: int) -> bytes:
    return _i64(1, metadata_id) + _i64(2, 0) + _i64(3, duration_ps)


def _line(name: str, events) -> bytes:
    body = _len_field(2, name.encode())
    for ev in events:
        body += _len_field(4, ev)
    return body


def _plane(name: str, lines, event_names) -> bytes:
    body = _len_field(2, name.encode())
    for ln in lines:
        body += _len_field(3, ln)
    for mid, ev_name in event_names.items():
        meta = _i64(1, mid) + _len_field(2, ev_name.encode())
        body += _len_field(4, _i64(1, mid) + _len_field(2, meta))
    return body


def _xspace(planes) -> bytes:
    return b"".join(_len_field(1, p) for p in planes)


def _write(tmp_path: Path, planes) -> str:
    d = tmp_path / "trace"
    d.mkdir(exist_ok=True)
    (d / "vm.xplane.pb").write_bytes(_xspace(planes))
    return str(d)


def test_module_line_preferred_and_host_excluded(tmp_path):
    """Device planes sum the XLA Modules line only (no double-counting the
    nested XLA Ops events); /host planes are ignored entirely."""
    names = {1: "jit_fleet_train(12345)", 2: "jit_sh_fit_all",
             3: "%fusion.1 = f32[8]{0} fusion()"}
    tpu = _plane("/device:TPU:0", [
        _line("XLA Modules", [_event(1, 3 * PS), _event(2, 1 * PS)]),
        _line("XLA Ops", [_event(3, 2 * PS)]),
    ], names)
    host = _plane("/host:CPU", [
        _line("python", [_event(1, 9 * PS)]),
    ], {1: "PjitFunction(train_one)"})
    pm = device_exec_by_module(_write(tmp_path, [tpu, host]))
    assert pm == {"jit_fleet_train": 3.0, "jit_sh_fit_all": 1.0}
    stages = stage_breakdown(pm)
    assert stages["fleet"] == 3.0 and stages["sh"] == 1.0
    assert stages["total"] == 4.0 and stages["other"] == 0.0


def test_rejit_suffixes_aggregate(tmp_path):
    """"jit_fn.1"/"jit_fn(shapes)" render variants fold into one module."""
    names = {1: "jit_streamline_metrics.1", 2: "jit_streamline_metrics(777)"}
    tpu = _plane("/device:TPU:0", [
        _line("XLA Modules", [_event(1, 2 * PS), _event(2, 1 * PS)]),
    ], names)
    pm = device_exec_by_module(_write(tmp_path, [tpu]))
    assert pm == {"jit_streamline_metrics": 3.0}
    assert stage_breakdown(pm)["geometry"] == 3.0


def test_fallback_busiest_line_without_module_line(tmp_path):
    """Plugin backends may omit the Modules line; the busiest single line
    approximates exec time without double-counting."""
    names = {1: "jit_fleet_train", 2: "small_op"}
    dev = _plane("/device:TPU:0", [
        _line("Steps", [_event(2, 1 * PS)]),
        _line("Ops", [_event(1, 5 * PS), _event(2, 1 * PS)]),
    ], names)
    pm = device_exec_by_module(_write(tmp_path, [dev]))
    assert pm == {"jit_fleet_train": 5.0, "small_op": 1.0}


def test_cpu_only_trace_yields_nothing(tmp_path):
    """A CPU trace (only /host + Task Environment planes — verified live)
    must produce {} so bench omits device_exec_s instead of reporting host
    time as device time."""
    host = _plane("/host:CPU", [_line("python", [_event(1, 9 * PS)])],
                  {1: "PjitFunction(train_one)"})
    meta = _plane("/host:metadata", [], {})
    env = _plane("Task Environment", [], {})
    assert device_exec_by_module(_write(tmp_path, [host, meta, env])) == {}


def test_empty_dir_yields_nothing(tmp_path):
    assert device_exec_by_module(str(tmp_path)) == {}
