"""VAE ↔ PyTorch oracle parity with transplanted weights (float64).

The torch model below is re-written from the documented architecture
(SURVEY.md §2 C12, vae_model.py:17-121), NOT imported from /root/reference.
Weights are copied torch → flax with the layout permutations implied by our
channel-last design; forwards must then agree to ~1e-10 in float64.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lesionvae_tpu.models.elbo import beta_schedule, elbo
from lesionvae_tpu.models.lesion_vae import LesionConditionedVAE

SEQ, MC, LC, LAT = 48, 5, 3, 4  # small dims for test speed (seq%8==0)


class TorchVAE(tnn.Module):
    """Oracle: dual-pathway conv VAE, reference architecture."""

    def __init__(self, seq_len=SEQ, micro_ch=MC, lesion_ch=LC, latent=LAT):
        super().__init__()
        self.sequence_length = seq_len
        self.micro_c1 = tnn.Conv1d(micro_ch, 64, 5, padding=2)
        self.micro_b1 = tnn.BatchNorm1d(64)
        self.micro_c2 = tnn.Conv1d(64, 128, 5, padding=2)
        self.micro_b2 = tnn.BatchNorm1d(128)
        self.micro_c3 = tnn.Conv1d(128, 128, 5, padding=2)
        self.micro_b3 = tnn.BatchNorm1d(128)
        self.pool = tnn.AvgPool1d(2)
        micro_out = 128 * (seq_len // 8)

        self.lesion_c1 = tnn.Conv1d(lesion_ch, 32, 5, padding=2)
        self.lesion_b1 = tnn.BatchNorm1d(32)
        self.lesion_c2 = tnn.Conv1d(32, 64, 5, padding=2)
        self.lesion_b2 = tnn.BatchNorm1d(64)
        lesion_out = 64 * (seq_len // 4)

        self.fc_mu = tnn.Linear(micro_out + lesion_out, latent)
        self.fc_logv = tnn.Linear(micro_out + lesion_out, latent)
        self.fc_dec = tnn.Linear(latent + lesion_out, micro_out)

        self.dec_t1 = tnn.ConvTranspose1d(128, 64, 5, padding=2)
        self.dec_b1 = tnn.BatchNorm1d(64)
        self.dec_t2 = tnn.ConvTranspose1d(64, 64, 5, padding=2)
        self.dec_b2 = tnn.BatchNorm1d(64)
        self.dec_t3 = tnn.ConvTranspose1d(64, micro_ch, 5, padding=2)
        self.up = tnn.Upsample(scale_factor=2, mode="linear",
                               align_corners=False)

    def encode(self, xm, xl):
        x = xm.transpose(1, 2)
        h = self.pool(F.relu(self.micro_b1(self.micro_c1(x))))
        h = self.pool(F.relu(self.micro_b2(self.micro_c2(h))))
        h = self.pool(F.relu(self.micro_b3(self.micro_c3(h))))
        hm = h.reshape(h.size(0), -1)
        x = xl.transpose(1, 2)
        h = self.pool(F.relu(self.lesion_b1(self.lesion_c1(x))))
        h = self.pool(F.relu(self.lesion_b2(self.lesion_c2(h))))
        hl = h.reshape(h.size(0), -1)
        hcat = torch.cat([hm, hl], dim=1)
        return self.fc_mu(hcat), self.fc_logv(hcat), hl

    def decode(self, z, hl):
        h = self.fc_dec(torch.cat([z, hl], dim=1))
        h = h.view(h.size(0), 128, -1)
        h = self.up(F.relu(self.dec_b1(self.dec_t1(h))))
        h = self.up(F.relu(self.dec_b2(self.dec_t2(h))))
        h = self.up(self.dec_t3(h))
        if h.size(2) != self.sequence_length:
            h = F.interpolate(h, size=self.sequence_length, mode="linear",
                              align_corners=False)
        return h.transpose(1, 2)


def _flat_perm(L, C):
    """ours l-major (l*C + c) → torch channel-major (c*L + l)."""
    j = np.arange(L * C)
    l, c = j // C, j % C
    return c * L + l


def transplant(tm: TorchVAE, seq_len=SEQ):
    """torch state_dict → flax {params, batch_stats} trees."""
    # .copy() matters: on the CPU backend jnp.asarray may zero-copy numpy
    # memory that aliases torch's buffers; torch's later in-place
    # running-stat updates would then mutate the transplanted flax arrays.
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}

    def conv(name):
        return {"conv": {"kernel": sd[f"{name}.weight"].transpose(2, 1, 0),
                         "bias": sd[f"{name}.bias"]}}

    def convT(name):
        w = sd[f"{name}.weight"]        # (in, out, k)
        return {"conv": {"kernel": w[:, :, ::-1].transpose(2, 0, 1).copy(),
                         "bias": sd[f"{name}.bias"]}}

    def bn_p(name):
        return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}

    def bn_s(name):
        return {"mean": sd[f"{name}.running_mean"],
                "var": sd[f"{name}.running_var"]}

    Lm, Ll = seq_len // 8, seq_len // 4
    pm = _flat_perm(Lm, 128)            # micro flatten perm
    pl = _flat_perm(Ll, 64)             # lesion flatten perm
    enc_cols = np.concatenate([pm, Lm * 128 + pl])

    def dense_enc(name):
        W = sd[f"{name}.weight"]        # (out, in_torch)
        return {"dense": {"kernel": W[:, enc_cols].T,
                          "bias": sd[f"{name}.bias"]}}

    W = sd["fc_dec.weight"]             # (micro_out, latent + lesion_out)
    lat = W.shape[1] - Ll * 64
    dec_cols = np.concatenate([np.arange(lat), lat + pl])
    fc_dec = {"dense": {"kernel": W[pm][:, dec_cols].T,
                        "bias": sd["fc_dec.bias"][pm]}}

    params = {
        "micro_c1": conv("micro_c1"), "micro_b1": bn_p("micro_b1"),
        "micro_c2": conv("micro_c2"), "micro_b2": bn_p("micro_b2"),
        "micro_c3": conv("micro_c3"), "micro_b3": bn_p("micro_b3"),
        "lesion_c1": conv("lesion_c1"), "lesion_b1": bn_p("lesion_b1"),
        "lesion_c2": conv("lesion_c2"), "lesion_b2": bn_p("lesion_b2"),
        "fc_mu": dense_enc("fc_mu"), "fc_logv": dense_enc("fc_logv"),
        "fc_dec": fc_dec,
        "dec_t1": convT("dec_t1"), "dec_b1": bn_p("dec_b1"),
        "dec_t2": convT("dec_t2"), "dec_b2": bn_p("dec_b2"),
        "dec_t3": convT("dec_t3"),
    }
    batch_stats = {
        "micro_b1": bn_s("micro_b1"), "micro_b2": bn_s("micro_b2"),
        "micro_b3": bn_s("micro_b3"), "lesion_b1": bn_s("lesion_b1"),
        "lesion_b2": bn_s("lesion_b2"), "dec_b1": bn_s("dec_b1"),
        "dec_b2": bn_s("dec_b2"),
    }
    to64 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), t)
    return to64(params), to64(batch_stats)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tm = TorchVAE().double()
    # randomize running stats so eval-mode BN is non-trivial
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm1d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 2.0)
    params, batch_stats = transplant(tm)
    fm = LesionConditionedVAE(seq_len=SEQ, micro_ch=MC, lesion_ch=LC,
                              latent=LAT)
    rng = np.random.default_rng(1)
    xm = rng.normal(size=(7, SEQ, MC))
    xl = rng.normal(size=(7, SEQ, LC))
    return tm, fm, params, batch_stats, xm, xl


def test_eval_encode_parity(models):
    tm, fm, params, batch_stats, xm, xl = models
    tm.eval()
    with torch.no_grad():
        mu_t, logv_t, hl_t = tm.encode(torch.tensor(xm), torch.tensor(xl))
    mu, logv, hl = fm.apply({"params": params, "batch_stats": batch_stats},
                            jnp.asarray(xm), jnp.asarray(xl), None, False,
                            method=LesionConditionedVAE.encode)
    np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(), atol=1e-10)
    np.testing.assert_allclose(np.asarray(logv), logv_t.numpy(), atol=1e-10)
    Ll = SEQ // 4
    pl = _flat_perm(Ll, 64)
    np.testing.assert_allclose(np.asarray(hl), hl_t.numpy()[:, pl], atol=1e-10)


def test_eval_decode_parity(models):
    tm, fm, params, batch_stats, xm, xl = models
    tm.eval()
    rng = np.random.default_rng(2)
    z = rng.normal(size=(7, LAT))
    with torch.no_grad():
        _, _, hl_t = tm.encode(torch.tensor(xm), torch.tensor(xl))
        xh_t = tm.decode(torch.tensor(z), hl_t)
    _, _, hl = fm.apply({"params": params, "batch_stats": batch_stats},
                        jnp.asarray(xm), jnp.asarray(xl), None, False,
                        method=LesionConditionedVAE.encode)
    xh = fm.apply({"params": params, "batch_stats": batch_stats},
                  jnp.asarray(z), hl, None, False,
                  method=LesionConditionedVAE.decode)
    np.testing.assert_allclose(np.asarray(xh), xh_t.numpy(), atol=1e-9)


def test_train_mode_bn_and_running_stats_parity(models):
    tm, fm, params, batch_stats, xm, xl = models
    tm.train()
    with torch.no_grad():
        mu_t, logv_t, _ = tm.encode(torch.tensor(xm), torch.tensor(xl))
    rm_t = tm.micro_b1.running_mean.numpy().copy()
    rv_t = tm.micro_b1.running_var.numpy().copy()

    (mu, logv, _), mut = fm.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(xm), jnp.asarray(xl), jnp.ones(7), True,
        method=LesionConditionedVAE.encode, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(), atol=1e-9)
    np.testing.assert_allclose(np.asarray(logv), logv_t.numpy(), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["micro_b1"]["mean"]), rm_t, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["micro_b1"]["var"]), rv_t, atol=1e-10)


def test_masked_padding_invariance(models):
    """A padded batch with masked rows must equal the unpadded forward."""
    tm, fm, params, batch_stats, xm, xl = models
    pad_m = np.concatenate([xm, 999 * np.ones((3, SEQ, MC))])
    pad_l = np.concatenate([xl, 999 * np.ones((3, SEQ, LC))])
    mask = jnp.asarray([1.0] * 7 + [0.0] * 3)

    (mu_u, _, _), mut_u = fm.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(xm), jnp.asarray(xl), jnp.ones(7), True,
        method=LesionConditionedVAE.encode, mutable=["batch_stats"])
    (mu_p, _, _), mut_p = fm.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(pad_m), jnp.asarray(pad_l), mask, True,
        method=LesionConditionedVAE.encode, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(mu_p)[:7], np.asarray(mu_u),
                               atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(mut_p["batch_stats"]["micro_b1"]["mean"]),
        np.asarray(mut_u["batch_stats"]["micro_b1"]["mean"]), atol=1e-12)


def test_elbo_parity(models):
    tm, fm, params, batch_stats, xm, xl = models
    rng = np.random.default_rng(3)
    xh = rng.normal(size=xm.shape)
    mu = rng.normal(size=(7, LAT))
    logv = rng.normal(size=(7, LAT)) * 0.3
    beta = beta_schedule(5, 40)

    recon_t = F.mse_loss(torch.tensor(xh), torch.tensor(xm), reduction="mean")
    kld_t = -0.5 * torch.mean(1 + torch.tensor(logv)
                              - torch.tensor(mu) ** 2
                              - torch.tensor(logv).exp())
    loss_t = recon_t + beta * kld_t

    loss, recon, kld = elbo(jnp.asarray(xh), jnp.asarray(xm), jnp.asarray(mu),
                            jnp.asarray(logv), beta=beta)
    np.testing.assert_allclose(float(recon), recon_t.item(), rtol=1e-12)
    np.testing.assert_allclose(float(kld), kld_t.item(), rtol=1e-12)
    np.testing.assert_allclose(float(loss), loss_t.item(), rtol=1e-12)

    # masked = unmasked when all rows valid; padded rows don't change it
    loss_m, _, _ = elbo(jnp.asarray(xh), jnp.asarray(xm), jnp.asarray(mu),
                        jnp.asarray(logv), beta=beta, mask=jnp.ones(7))
    np.testing.assert_allclose(float(loss_m), loss_t.item(), rtol=1e-12)


def test_beta_schedule_values():
    # vae_model.py:135-137: 0.1 → 2.0 linear over epochs (0-based epoch)
    assert beta_schedule(0, 40) == pytest.approx(0.1)
    assert beta_schedule(39, 40) == pytest.approx(2.0)
    assert beta_schedule(0, 1) == 1.0


def test_full_forward_noise_statistics(models):
    """Full __call__ with keyed reparam noise: xh finite, shapes right."""
    _, fm, params, batch_stats, xm, xl = models
    xh, mu, logv = fm.apply({"params": params, "batch_stats": batch_stats},
                            jnp.asarray(xm), jnp.asarray(xl),
                            jax.random.PRNGKey(0), None, False)
    assert xh.shape == xm.shape
    assert np.isfinite(np.asarray(xh)).all()
