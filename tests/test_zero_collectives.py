"""Regression guard: the member-sharded fleet program must contain ZERO
collectives in its partitioned HLO.

Round 4's best multi-chip finding: letting GSPMD partition the vmapped fleet
program from input shardings inserted 228 all-gathers (it replicated the
epoch permutation + batch gathers on every device), costing ~8x the per-chip
compute (156 s vs 19.7 s on the 8-virtual-device mesh).  The fix wraps the
member program in shard_map over the ``data`` axis (train/batched.py
_fleet_program) so every op is member-local by construction.  The numeric
tests (test_parallel.py, test_shardmap.py) would NOT catch a revert — a
reintroduced all-gather is numerically identical, just ~8x slower on real
hardware — so this test asserts on the compiled HLO text itself.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from lesionvae_tpu.parallel.mesh import make_mesh
from lesionvae_tpu.train.batched import _fleet_program

# collective HLO ops that a member-local program must not contain.  Word
# boundaries: "all-reduce-start", "all-gather-done" etc. must also match.
_COLLECTIVE_RE = re.compile(
    r"\b(all-gather|all-reduce|collective-permute|all-to-all|"
    r"reduce-scatter|collective-broadcast)\b")


def _production_fleet_args(mesh, T=8, n_pad=16, seq_len=12, micro_ch=3,
                           lesion_ch=2, batch_size=8, n_seg=4):
    """ShapeDtypeStructs matching launch_many_vaes' staging for the
    production configuration (normalize_on_device + fused summary), sharded
    over the mesh's data axis like _put does."""
    sh = NamedSharding(mesh, P("data"))

    def s(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sh)

    return (s((T, n_pad, seq_len, micro_ch), jnp.float32),
            s((T, n_pad, seq_len, lesion_ch), jnp.float32),
            s((T,), jnp.int32),
            s((T, 2), jnp.uint32),
            s((T, n_pad), jnp.float32),
            s((T, n_pad), jnp.int32))


def test_fleet_partitioned_hlo_has_zero_collectives():
    """The shard_map fleet program compiles with no collective ops on an
    8-device mesh — the property that made sharded execution 156 s -> 9 s."""
    mesh = make_mesh(8, model_parallel=1)
    program, _module, _nb = _fleet_program(
        n_pad=16, seq_len=12, micro_ch=3, lesion_ch=2, latent_dim=2,
        epochs=2, batch_size=8, lr=2e-4, weight_decay=1e-3, grad_clip=2.0,
        summary_n_seg=4, summary_seed=0, normalize=True, mesh=mesh)
    args = _production_fleet_args(mesh)
    hlo = program.lower(*args).compile().as_text()
    hits = sorted(set(_COLLECTIVE_RE.findall(hlo)))
    assert not hits, (
        f"fleet program's partitioned HLO contains collectives {hits} — "
        f"members are independent models; a collective here means GSPMD-style "
        f"replication crept back (round 4 measured 228 all-gathers = 8x "
        f"slower sharded execution)")


def test_fleet_sharded_executes_and_matches_layout():
    """The same program executes on the mesh and yields finite member
    histories (compile-only guards can pass on programs that then fail to
    run under shard_map's vma checks)."""
    mesh = make_mesh(8, model_parallel=1)
    T, n_pad, seq_len, micro_ch, lesion_ch = 8, 16, 12, 3, 2
    program, _module, _nb = _fleet_program(
        n_pad=n_pad, seq_len=seq_len, micro_ch=micro_ch, lesion_ch=lesion_ch,
        latent_dim=2, epochs=2, batch_size=8, lr=2e-4, weight_decay=1e-3,
        grad_clip=2.0, summary_n_seg=4, summary_seed=0, normalize=True,
        mesh=mesh)
    rng = np.random.default_rng(0)
    sh = NamedSharding(mesh, P("data"))
    put = lambda x: jax.device_put(x, sh)  # noqa: E731
    Xm = put(rng.normal(size=(T, n_pad, seq_len, micro_ch))
             .astype(np.float32))
    Xl = put(rng.uniform(size=(T, n_pad, seq_len, lesion_ch))
             .astype(np.float32))
    n_real = put(np.full(T, 12, np.int32))
    keys = put(np.asarray(jax.random.split(jax.random.PRNGKey(0), T)))
    sham = put((rng.uniform(size=(T, n_pad)) < 0.5).astype(np.float32))
    subj = put(rng.integers(0, 3, (T, n_pad)).astype(np.int32))
    out = program(Xm, Xl, n_real, keys, sham, subj)
    hist = np.asarray(out[2])
    assert hist.shape[:2] == (T, 2) and np.isfinite(hist).all()
