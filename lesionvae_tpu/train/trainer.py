"""Fully-jitted VAE training — the TPU rebuild of train_lesion_vae
(src/vae/vae_model.py:140-222, HOT LOOP #3 of SURVEY.md §3.3).

Where the reference crosses the host↔device boundary every batch
(``.to(device)`` at vae_model.py:184-185), here the entire run — 40 epochs x
all batches, shuffling, optimizer, β schedule, loss history — is ONE jitted
``lax.scan`` program with the dataset resident in device memory.

Exact-semantics notes (SURVEY.md §7 hard part #2):
- optimizer chain = global-norm clip 2.0 → additive weight decay 1e-3 → Adam,
  matching torch clip_grad_norm_ + Adam(weight_decay=1e-3) order;
- non-finite-loss batches skip the parameter/optimizer update via lax.cond but
  still update BatchNorm running stats (torch runs the forward before the
  finite check, vae_model.py:188-196);
- the final partial batch is padded with masked rows; masked BatchNorm and
  masked ELBO make it numerically identical to a short batch;
- per-epoch averages weight each batch by its real row count (:202-206).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from ..models.elbo import elbo
from ..models.lesion_vae import LesionConditionedVAE
from ..utils.logging import get_logger

log = get_logger("train")


@dataclasses.dataclass
class TrainedVAE:
    """Trained model bundle: module + params + BatchNorm running stats."""

    module: LesionConditionedVAE
    params: dict
    batch_stats: dict

    def apply(self, x_micro, x_lesion, rng, train: bool = False):
        """Eval-mode forward (running BN stats), sampling z ~ q(z|x) with the
        given key — the reference's eval forward also samples
        (vae_model.py:117-121 under torch.no_grad)."""
        xh, mu, logv = self.module.apply(
            {"params": self.params, "batch_stats": self.batch_stats},
            jnp.asarray(x_micro), jnp.asarray(x_lesion), rng,
            None, train)
        return xh, mu, logv

    def encode(self, x_micro, x_lesion):
        return self.module.apply(
            {"params": self.params, "batch_stats": self.batch_stats},
            jnp.asarray(x_micro), jnp.asarray(x_lesion), None, False,
            method=LesionConditionedVAE.encode)


def make_optimizer_reference(lr: float, weight_decay: float,
                             grad_clip: float):
    """The optax chain spelled out — kept as the parity oracle for the
    fused optimizer below (tests/test_trainer.py)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-lr),
    )


def make_optimizer(lr: float, weight_decay: float, grad_clip: float,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Single-pass clip→decay→Adam→scale, numerically identical to
    :func:`make_optimizer_reference` (= torch clip_grad_norm_ +
    Adam(weight_decay), the reference's order at vae_model.py:198-200).

    Writing the whole per-leaf expression in ONE tree_map guarantees XLA
    emits a single fused elementwise kernel per leaf — reads (g, p, mu,
    nu), writes (update, mu, nu), the HBM-traffic floor.  Measured on the
    v5e fleet program this EQUALS the optax chain (16.1 ms/fleet-step both
    ways): XLA already fused the chain; the explicit form is kept because
    it makes the floor structural rather than an optimization the compiler
    may or may not find.  Formulas follow the optax source exactly (clip
    trigger/select, (1-b)·g+b·m moment order, bias-correction division
    placement, safe count increment); exactness pinned by
    tests/test_trainer.py::test_fused_optimizer_matches_optax_chain.
    """
    def init(params):
        return {"count": jnp.zeros([], jnp.int32),
                "mu": jax.tree.map(jnp.zeros_like, params),
                "nu": jax.tree.map(jnp.zeros_like, params)}

    def update(grads, state, params):
        g_norm = jnp.sqrt(sum(
            jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)))
        trigger = g_norm < grad_clip
        count_inc = optax.safe_increment(state["count"])
        bc1 = 1 - b1 ** count_inc
        bc2 = 1 - b2 ** count_inc

        def leaf(g, p, m, v):
            g = jax.lax.select(trigger, g,
                               (g / g_norm.astype(g.dtype)) * grad_clip)
            g = g + weight_decay * p
            m2 = (1 - b1) * g + b1 * m
            v2 = (1 - b2) * (g ** 2) + b2 * v
            m_hat = m2 / bc1.astype(m2.dtype)
            v_hat = v2 / bc2.astype(v2.dtype)
            u = -lr * (m_hat / (jnp.sqrt(v_hat) + eps))
            return u, m2, v2

        out = jax.tree.map(leaf, grads, params, state["mu"], state["nu"])
        is_triple = lambda x: isinstance(x, tuple) and len(x) == 3  # noqa
        updates = jax.tree.map(lambda t: t[0], out, is_leaf=is_triple)
        mu = jax.tree.map(lambda t: t[1], out, is_leaf=is_triple)
        nu = jax.tree.map(lambda t: t[2], out, is_leaf=is_triple)
        return updates, {"count": count_inc, "mu": mu, "nu": nu}

    return optax.GradientTransformation(init, update)


@functools.lru_cache(maxsize=16)
def _train_program(n: int, n_pad: int, seq_len: int, micro_ch: int,
                   lesion_ch: int, latent_dim: int, epochs: int,
                   batch_size: int, lr: float, weight_decay: float,
                   grad_clip: float):
    """Cached (module, jitted run) per static config — retracing the full
    training program costs tens of client seconds per call otherwise."""
    n_batches = n_pad // batch_size
    module = LesionConditionedVAE(seq_len=seq_len, micro_ch=micro_ch,
                                  lesion_ch=lesion_ch, latent=latent_dim)
    tx = make_optimizer(lr, weight_decay, grad_clip)
    betas = jnp.asarray([
        0.1 + 1.9 * (ep / (epochs - 1)) if epochs > 1 else 1.0
        for ep in range(epochs)], jnp.float32)

    def loss_fn(p, stats, xb_m, xb_l, mask, rng, beta):
        (xh, mu, logv), new_vars = module.apply(
            {"params": p, "batch_stats": stats}, xb_m, xb_l, rng, mask, True,
            mutable=["batch_stats"])
        # nan_to_num on outputs, as the reference does (vae_model.py:189-191)
        xh = jnp.nan_to_num(xh, nan=0.0)
        mu = jnp.nan_to_num(mu, nan=0.0)
        logv = jnp.nan_to_num(logv, nan=0.0)
        loss, recon, kld = elbo(xh, xb_m, mu, logv, beta=beta, mask=mask)
        return loss, (recon, kld, new_vars["batch_stats"])

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def epoch_step(Xm, Xl, carry, inputs):
        ep_key, beta = inputs
        k_perm, k_eps = jax.random.split(ep_key)
        # permute real rows; dummy rows stay at the tail → exactly one
        # partial batch per epoch, like torch DataLoader(drop_last=False).
        # ONE gather per epoch, contiguous slices per batch.
        perm = jnp.concatenate([jax.random.permutation(k_perm, n),
                                jnp.arange(n, n_pad)])
        Xm_ep = jnp.take(Xm, perm, axis=0)
        Xl_ep = jnp.take(Xl, perm, axis=0)
        mask_ep = (perm < n).astype(jnp.float32)
        rngs = jax.random.split(k_eps, n_batches)

        def batch_step(carry, inputs):
            params, batch_stats, opt_state = carry
            b, rng = inputs
            start = b * batch_size
            xb_m = jax.lax.dynamic_slice_in_dim(Xm_ep, start, batch_size)
            xb_l = jax.lax.dynamic_slice_in_dim(Xl_ep, start, batch_size)
            mask = jax.lax.dynamic_slice_in_dim(mask_ep, start, batch_size)
            (loss, (recon, kld, new_stats)), grads = grad_fn(
                params, batch_stats, xb_m, xb_l, mask, rng, beta)

            finite = jnp.isfinite(loss)

            def do_update(_):
                updates, new_opt = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), new_opt

            new_params, new_opt_state = jax.lax.cond(
                finite, do_update, lambda _: (params, opt_state), operand=None)
            # BN running stats always advance (forward ran before the check)
            n_valid = jnp.sum(mask)
            stats_out = jnp.where(finite, 1.0, 0.0) * jnp.stack(
                [loss * n_valid, recon * n_valid, kld * n_valid, n_valid])
            return (new_params, new_stats, new_opt_state), stats_out

        carry, stats = jax.lax.scan(batch_step, carry,
                                    (jnp.arange(n_batches), rngs))
        sums = jnp.sum(stats, axis=0)       # Σ loss·n, Σ recon·n, Σ kld·n, Σ n
        seen = sums[3]
        avg = jnp.where(seen > 0, sums[:3] / seen, jnp.nan)
        return carry, jnp.concatenate([avg, beta[None]])

    @jax.jit
    def run(params, batch_stats, opt_state, Xm, Xl, key):
        ep_keys = jax.random.split(key, epochs)
        carry, hist = jax.lax.scan(
            lambda c, i: epoch_step(Xm, Xl, c, i),
            (params, batch_stats, opt_state), (ep_keys, betas))
        return carry, hist

    return module, run


def train_lesion_vae(X_micro: np.ndarray, X_lesion: np.ndarray,
                     latent_dim: int = 10, epochs: int = 40,
                     batch_size: int = 64, lr: float = 2e-4,
                     weight_decay: float = 1e-3, grad_clip: float = 2.0,
                     seed: int = 42,
                     mesh=None) -> Tuple[TrainedVAE, pd.DataFrame]:
    """Preserved public API: returns (model, history DataFrame with columns
    loss/recon/kld/beta, one row per epoch) like vae_model.py:140-222.

    ``mesh``: optional jax.sharding.Mesh with a "data" axis — the dataset and
    every batch are sharded over it (data parallel; gradients are reduced by
    XLA collectives inserted automatically under jit).
    """
    X_micro = np.nan_to_num(np.asarray(X_micro, np.float32), nan=0.0)
    X_lesion = np.nan_to_num(np.asarray(X_lesion, np.float32), nan=0.0)
    n, seq_len, micro_ch = X_micro.shape
    lesion_ch = X_lesion.shape[2]

    n_batches = max(1, -(-n // batch_size))
    n_pad = n_batches * batch_size
    pad = n_pad - n
    if pad:
        X_micro = np.concatenate([X_micro, np.zeros((pad, seq_len, micro_ch),
                                                    np.float32)])
        X_lesion = np.concatenate([X_lesion, np.zeros((pad, seq_len, lesion_ch),
                                                      np.float32)])

    module, run = _train_program(n, n_pad, seq_len, micro_ch, lesion_ch,
                                 latent_dim, epochs, batch_size, lr,
                                 weight_decay, grad_clip)
    root = jax.random.PRNGKey(seed)
    k_init, k_eps0, k_train = jax.random.split(root, 3)
    variables = module.init(
        {"params": k_init}, jnp.asarray(X_micro[:2]), jnp.asarray(X_lesion[:2]),
        k_eps0, jnp.ones(2, jnp.float32), True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = make_optimizer(lr, weight_decay, grad_clip).init(params)

    Xm = jnp.asarray(X_micro)
    Xl = jnp.asarray(X_lesion)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        data_sh = NamedSharding(mesh, P("data"))
        Xm = jax.device_put(Xm, data_sh)
        Xl = jax.device_put(Xl, data_sh)

    (params, batch_stats, opt_state), hist = run(params, batch_stats,
                                                 opt_state, Xm, Xl, k_train)
    hist = np.asarray(hist)
    hist_df = pd.DataFrame(hist, columns=["loss", "recon", "kld", "beta"])
    for ep in (1, 10, 20, 30, 40):
        if ep <= epochs:
            r = hist_df.iloc[ep - 1]
            log.info("[%02d/%d] loss=%.3f | recon=%.3f | kld=%.3f | beta=%.2f",
                     ep, epochs, r.loss, r.recon, r.kld, r.beta)
    return TrainedVAE(module, params, batch_stats), hist_df
