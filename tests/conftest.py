"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding logic is tested on a fake CPU mesh (SURVEY.md §4): set the
XLA host-platform device count BEFORE jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when axon/TPU is attached
# low-dpi figures: production renders at the reference's 300 dpi convention
# (viz/style.py); tests only check artifact existence/content, not resolution
os.environ.setdefault("LESIONVAE_DPI", "72")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin overrides the JAX_PLATFORMS env var; the config API is
# authoritative, so force CPU here (XLA_FLAGS above must be set pre-import).
jax.config.update("jax_platforms", "cpu")

# float64 available for parity-vs-oracle tests; f32 paths request their dtype
# explicitly so TPU behavior is still exercised.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the 1-core CI host pays heavy XLA compile
# times; caching makes repeated test runs much faster.  Shared policy
# (utils/cache.configure_cache, role=cpu): repo-local host-keyed live dir —
# the same dir the multichip dryrun bootstrap uses, so tests and dryrun
# share compiles — pre-seeded from the committed cache_seed/cpu_*.
import sys  # noqa: E402
from pathlib import Path  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from lesionvae_tpu.utils.cache import configure_cache  # noqa: E402

configure_cache("cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
