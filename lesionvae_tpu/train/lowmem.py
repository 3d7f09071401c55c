"""bf16-STORAGE fast path for the fleet trainer (opt-in).

Measured basis (benchmarks/profile_fleet.py + fleet_ablate.py on v5e):
the fleet step is HBM-bound, not MXU-bound — conv/matmul is ~2% of device
time, while the fused clip→decay→Adam pass ALONE costs 9.3 of the
16.6 ms/fleet-step because each step streams every member's f32 params +
both moment trees (fc_dec's 1610x1536 kernel is 2.47M of each member's
~2.8M params).  The forward and backward read the same f32 weights again.
Unroll, bf16-moments-only, and optimizer refactors all measured
neutral-or-worse: the bytes are the cost.  bf16 storage for the conv/dense
weight leaves + their moments measured 17.2 -> 13.0 ms/fleet-step (1.33x).

Numerics: optimizer MATH stays float32; only storage rounds to bf16, and
the write-back uses STOCHASTIC ROUNDING — round-to-nearest measurably
stalls convergence (toy fleet: final loss 0.151 vs 0.112 at 12 epochs)
because late-training updates shrink below half a bf16 ulp of the weight
and get swallowed; SR keeps the EXPECTED update exact, so the curve tracks
f32 distributionally (tests/test_lowmem.py).  SR is three fused integer
ops: f32 bits + uniform-16-bit noise, truncate the low 16 bits — no Pallas
needed, XLA fuses it into the optimizer loop.  Noise comes from a
murmur-style hash of (element index, step count, per-member salt): SR needs
decorrelated bits, not cryptographic ones, and a fused hash avoids both a
threefry pass and materializing 180M random words per step.

BatchNorm affine/statistics leaves stay float32 (tiny + sensitive).

Reference semantics preserved: formulas and order match
train.trainer.make_optimizer (= torch clip_grad_norm_ + Adam(weight_decay),
src/vae/vae_model.py:198-200); only storage precision changes, as an opt-in
(train.batched ``store_dtype`` / bench ``BENCH_FLEET_STORE``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax


def _is_weight_leaf(path) -> bool:
    """conv / dense kernels+biases (the HBM-dominant leaves); BatchNorm
    scale/bias and batch_stats are excluded and stay float32."""
    names = [getattr(k, "key", None) for k in path]
    return any(n in ("conv", "dense") for n in names)


def cast_params_storage(params, dtype=jnp.bfloat16):
    """Cast the weight leaves of a param tree to the storage dtype."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: x.astype(dtype) if _is_weight_leaf(p) else x, params)


def _hash_bits(shape, salt):
    """Per-element uniform uint32 noise from a fused murmur-style mixer of
    (flat index, salt) — fuses into the elementwise optimizer loop."""
    n = max(1, math.prod(shape))
    h = jax.lax.iota(jnp.uint32, n).reshape(shape)
    h = h * jnp.uint32(0x9E3779B9) + salt
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _store_round(x32: jnp.ndarray, bits, dtype) -> jnp.ndarray:
    """Stochastically round an f32 array to the storage dtype.

    bf16 = the top 16 bits of the f32 pattern, so adding uniform 16-bit
    noise and truncating implements exact SR between the two neighboring
    bf16 values (carry into the exponent IS the rounding-up case).  A
    finite value within one ulp of bf16-max could stochastically carry to
    the inf pattern — a permanently-poisoned weight the finite-loss
    rollback cannot undo — so finite inputs saturate at ±bf16-max."""
    if dtype == jnp.float32:
        return x32
    assert dtype == jnp.bfloat16, "only f32/bf16 storage supported"
    x32 = x32.astype(jnp.float32)  # x64 mode can promote the update math
    u = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    u = (u + (bits & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    r = jax.lax.bitcast_convert_type(u, jnp.float32)
    big = jnp.float32(3.3895313892515355e38)      # bf16 max finite
    r = jnp.where(jnp.isfinite(x32) & ~jnp.isfinite(r),
                  jnp.sign(x32) * big, r)
    return r.astype(jnp.bfloat16)


def _fused_update(opt, g, p, m, v, salt, trigger, g_norm, bc1, bc2):
    """The ONE fused clip→decay→Adam→SR body shared by the per-leaf
    (LowmemOptimizer) and flat-buffer (FlatLowmemOptimizer) forms — the two
    may only differ in how they reduce the grad norm and index the SR salt,
    never in the update formula itself."""
    g = g.astype(jnp.float32)
    p32 = p.astype(jnp.float32)
    g = jax.lax.select(trigger, g, (g / g_norm) * opt.clip)
    g = g + opt.wd * p32
    m2 = (1 - opt.b1) * g + opt.b1 * m.astype(jnp.float32)
    v2 = (1 - opt.b2) * jnp.square(g) + opt.b2 * v.astype(jnp.float32)
    u = -opt.lr * ((m2 / bc1) / (jnp.sqrt(v2 / bc2) + opt.eps))
    if p.dtype == jnp.float32:
        return p32 + u, m2, v2
    bits = _hash_bits(p.shape, salt)
    return (_store_round(p32 + u, bits, p.dtype),
            _store_round(m2, bits ^ jnp.uint32(0x55555555), m.dtype),
            _store_round(v2, bits + jnp.uint32(0x33333333), v.dtype))


class LowmemOptimizer:
    """Fused clip→decay→Adam producing NEW PARAMS directly (the SR rounding
    of p+u must see the f32 sum, so update/apply cannot be split).

    Identical formulas/order to train.trainer.make_optimizer; on f32 leaves
    the result is bitwise identical (SR is the identity there)."""

    def __init__(self, lr, weight_decay, grad_clip, b1=0.9, b2=0.999,
                 eps=1e-8):
        self.lr, self.wd, self.clip = lr, weight_decay, grad_clip
        self.b1, self.b2, self.eps = b1, b2, eps

    def init(self, params, salt=None):
        return {"count": jnp.zeros([], jnp.int32),
                "salt": (jnp.zeros([], jnp.uint32) if salt is None
                         else salt.astype(jnp.uint32)),
                "mu": jax.tree.map(jnp.zeros_like, params),
                "nu": jax.tree.map(jnp.zeros_like, params)}

    def step(self, grads, state, params):
        b1, b2 = self.b1, self.b2
        g_norm = jnp.sqrt(sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree.leaves(grads)))
        trigger = g_norm < self.clip
        count_inc = optax.safe_increment(state["count"])
        # f32 throughout: under jax x64 the float**int power promotes to
        # f64, which would silently widen the whole update chain
        bc1 = (1 - b1 ** count_inc).astype(jnp.float32)
        bc2 = (1 - b2 ** count_inc).astype(jnp.float32)
        step_salt = (state["salt"]
                     + count_inc.astype(jnp.uint32) * jnp.uint32(0x01000193))

        leaf_idx = [0]

        def leaf(g, p, m, v):
            salt = step_salt + jnp.uint32(
                (leaf_idx[0] * 0x9E3779B1) & 0xFFFFFFFF)
            leaf_idx[0] += 1
            return _fused_update(self, g, p, m, v, salt, trigger, g_norm,
                                 bc1, bc2)

        out = jax.tree.map(leaf, grads, params, state["mu"], state["nu"])
        is_triple = lambda x: isinstance(x, tuple) and len(x) == 3  # noqa
        new_p = jax.tree.map(lambda t: t[0], out, is_leaf=is_triple)
        mu = jax.tree.map(lambda t: t[1], out, is_leaf=is_triple)
        nu = jax.tree.map(lambda t: t[2], out, is_leaf=is_triple)
        return new_p, {"count": count_inc, "salt": state["salt"],
                       "mu": mu, "nu": nu}


def flatten_partition(params):
    """Split a (already storage-cast) param tree into two ONE-DIMENSIONAL
    buffers — ``fw`` concatenating the weight leaves (conv/dense, storage
    dtype) and ``fo`` the rest (f32) — plus an ``unflatten(fw, fo)`` that
    rebuilds the tree with static slices + reshapes.

    Hypothesis: the per-leaf Adam pass is dispatch-bound (~30 leaves x 6
    elementwise streams per member-step); on flat buffers the same math is
    ~6 ops over 2 contiguous streams, and because the loss unflattens
    inside, gradients EMERGE flat (the unflatten's backward IS the
    cotangent concatenation) — no extra pass.

    MEASURED RESULT (benchmarks/fleet_ablate.py trainflat, v5e, T=64):
    77.9 vs 13.0 ms/fleet-step — 6x WORSE, REJECTED as the default.  TPU
    tiled layouts are why: a 2D bf16 array lives in (16, 128) tiles, so the
    1D-slice+reshape that rebuilds each kernel is a full relayout copy per
    weight per step, and the backward concat pays it again — the relayout
    bytes dwarf the dispatch savings the flat form buys.  Kept as an
    opt-in (``flat_opt``) with its numbers so future hardware/compiler
    revisions can re-measure cheaply."""
    leaves_with_path = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    infos = []                              # (is_weight, shape, size)
    w_parts, o_parts = [], []
    for path, x in leaves_with_path:
        w = _is_weight_leaf(path)
        infos.append((w, x.shape, x.size))
        (w_parts if w else o_parts).append(x.reshape(-1))
    fw = (jnp.concatenate(w_parts) if w_parts
          else jnp.zeros((0,), jnp.float32))
    fo = (jnp.concatenate(o_parts) if o_parts
          else jnp.zeros((0,), jnp.float32))

    def unflatten(fw, fo):
        out, iw, io = [], 0, 0
        for w, shape, size in infos:
            if w:
                out.append(jax.lax.slice_in_dim(fw, iw, iw + size)
                           .reshape(shape))
                iw += size
            else:
                out.append(jax.lax.slice_in_dim(fo, io, io + size)
                           .reshape(shape))
                io += size
        return jax.tree_util.tree_unflatten(treedef, out)

    return fw, fo, unflatten


class FlatLowmemOptimizer:
    """LowmemOptimizer on the two flat buffers of :func:`flatten_partition`
    (measured SLOWER in production — see that docstring; kept opt-in).

    Same fused clip→decay→Adam formulas and SR storage write-back; ``params``
    / ``grads`` are ``(fw, fo)`` pairs instead of trees, so the whole
    optimizer is ~6 big contiguous elementwise ops instead of ~180 per-leaf
    ones.  The ONLY numerical difference vs the per-leaf form: the global
    grad-norm reduces over 2 concatenated buffers rather than summing ~30
    per-leaf partial sums (different fp reduction order, same value to
    ~1e-7 rel), and the SR noise stream is indexed by flat-buffer position
    rather than (leaf, position) — SR is stochastic by design, parity is
    distributional (tests/test_lowmem.py)."""

    def __init__(self, lr, weight_decay, grad_clip, b1=0.9, b2=0.999,
                 eps=1e-8):
        self.lr, self.wd, self.clip = lr, weight_decay, grad_clip
        self.b1, self.b2, self.eps = b1, b2, eps

    def init(self, pp, salt=None):
        fw, fo = pp
        zeros = lambda x: jnp.zeros_like(x)  # noqa: E731
        return {"count": jnp.zeros([], jnp.int32),
                "salt": (jnp.zeros([], jnp.uint32) if salt is None
                         else salt.astype(jnp.uint32)),
                "mu": (zeros(fw), zeros(fo)),
                "nu": (zeros(fw), zeros(fo))}

    def step(self, grads, state, pp):
        b1, b2 = self.b1, self.b2
        gw, go = grads
        fw, fo = pp
        g_norm = jnp.sqrt(jnp.sum(jnp.square(gw.astype(jnp.float32)))
                          + jnp.sum(jnp.square(go.astype(jnp.float32))))
        trigger = g_norm < self.clip
        count_inc = optax.safe_increment(state["count"])
        bc1 = (1 - b1 ** count_inc).astype(jnp.float32)
        bc2 = (1 - b2 ** count_inc).astype(jnp.float32)
        step_salt = (state["salt"]
                     + count_inc.astype(jnp.uint32) * jnp.uint32(0x01000193))

        def upd(g, p, m, v, salt_off):
            return _fused_update(self, g, p, m, v,
                                 step_salt + jnp.uint32(salt_off), trigger,
                                 g_norm, bc1, bc2)

        mw, mo = state["mu"]
        vw, vo = state["nu"]
        new_fw, mw2, vw2 = upd(gw, fw, mw, vw, 0)
        new_fo, mo2, vo2 = upd(go, fo, mo, vo, 0x9E3779B1)
        return (new_fw, new_fo), {"count": count_inc, "salt": state["salt"],
                                  "mu": (mw2, mo2), "nu": (vw2, vo2)}
