"""Probe: does the axon attachment stream H2D bytes WHILE a program runs?

Decides whether member-chunked fleet launches can pipeline chunk N+1's
upload under chunk N's execution (train.batched upload_chunks).  Method:
warm a ~4 s device program, enqueue it, immediately start a ~130 MB
device_put, and barrier the transfer with a 1-element fetch — if the
transfer completes in ~wire time while the program is still executing, the
link and the core overlap; if it takes wire time + exec time, dispatches
serialize.  Inputs vary per repeat (the attachment caches byte-identical
calls; see benchmarks/fleet_step.py).

Run with no other jax process on the host.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax


def make_burn(n_iter):
    @jax.jit
    def burn(x):
        def body(c, _):
            return jnp.tanh(c @ c) + 1e-6, ()
        y, _ = lax.scan(body, x, None, length=n_iter)
        return y
    return burn


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}")
    burn = make_burn(2000)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2048, 2048)),
                    jnp.float32)
    # warm + measure exec time (barrier on a real fetch of the full output)
    y = burn(x)
    np.asarray(y)
    t0 = time.perf_counter()
    y = burn(x + 1.0)
    np.asarray(y)
    t_exec = time.perf_counter() - t0
    print(f"burn exec (fetch-barriered): {t_exec:.2f}s")

    rng = np.random.default_rng(1)
    H = rng.normal(size=(32, 1024, 1024)).astype(np.float32)  # 128 MB
    # serial baseline: transfer with the device idle
    hb = jnp.asarray(H)
    np.asarray(hb[0, 0, :1])
    t0 = time.perf_counter()
    hb2 = jnp.asarray(H + 1.0)
    np.asarray(hb2[0, 0, :1])
    t_xfer_idle = time.perf_counter() - t0
    mb = H.nbytes / 1e6
    print(f"H2D idle: {mb:.0f} MB in {t_xfer_idle:.2f}s "
          f"({mb / t_xfer_idle:.1f} MB/s)")

    # overlapped: enqueue the burn, then transfer
    for rep in range(2):
        xr = x + (2.0 + rep)
        Hr = H + (2.0 + rep)
        t0 = time.perf_counter()
        yr = burn(xr)                      # async enqueue
        t1 = time.perf_counter()
        hr = jnp.asarray(Hr)               # H2D while burn runs?
        np.asarray(hr[0, 0, :1])           # barrier the transfer
        t_xfer = time.perf_counter() - t1
        np.asarray(yr)                     # barrier the program
        t_total = time.perf_counter() - t0
        overlap = "OVERLAPS" if t_xfer < t_xfer_idle + 0.5 * t_exec \
            else "SERIALIZES"
        print(f"rep {rep}: enqueue {t1 - t0:.2f}s, transfer-during-exec "
              f"{t_xfer:.2f}s (idle {t_xfer_idle:.2f}s), total {t_total:.2f}s"
              f" vs serial {t_exec + t_xfer_idle:.2f}s -> {overlap}")


if __name__ == "__main__":
    main()
