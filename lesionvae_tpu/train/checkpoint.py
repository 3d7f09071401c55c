"""Checkpoint/restore for trained VAEs and normalization stats (orbax).

The reference never persists the trained model (vae_model.py:221-222 returns
the live module; SURVEY.md §5.4) — checkpointing is an addition here, kept off
the numeric-parity path.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..models.lesion_vae import LesionConditionedVAE
from .trainer import TrainedVAE


def save_vae(path: str | Path, model: TrainedVAE,
             norm_stats: Optional[Dict[str, np.ndarray]] = None) -> None:
    """Persist params + batch_stats (+ normalization stats) and the module
    hyperparameters needed to rebuild it."""
    path = Path(path).resolve()
    path.mkdir(parents=True, exist_ok=True)
    meta = {
        "seq_len": model.module.seq_len,
        "micro_ch": model.module.micro_ch,
        "lesion_ch": model.module.lesion_ch,
        "latent": model.module.latent,
    }
    payload = {"params": model.params, "batch_stats": model.batch_stats}
    if norm_stats is not None:
        arrays = {k: np.asarray(v) for k, v in norm_stats.items()}
        payload["norm_stats"] = arrays
        # record the exact keys/shapes/dtypes so load_vae can build the
        # restore template from metadata instead of guessing — norm_stats is
        # an arbitrary Dict[str, ndarray], not a fixed schema
        meta["norm_stats_spec"] = {
            k: {"shape": list(v.shape), "dtype": str(v.dtype)}
            for k, v in arrays.items()}
    (path / "module.json").write_text(json.dumps(meta))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "state", payload, force=True)
    ckptr.wait_until_finished()


def _make_template(meta: dict, norm_spec):
    """Structure/dtype template for orbax restoration of one member.

    ``meta`` holds the module hyperparameters (module.json minus the
    norm_stats_spec key); the template's norm_stats part is rebuilt from the
    recorded keys/shapes/dtypes."""
    module = LesionConditionedVAE(**meta)
    key = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    variables = module.init(
        {"params": key},
        jnp.zeros((2, meta["seq_len"], meta["micro_ch"]), jnp.float32),
        jnp.zeros((2, meta["seq_len"], meta["lesion_ch"]), jnp.float32),
        key, jnp.ones(2, jnp.float32), True)
    template = {"params": variables["params"],
                "batch_stats": variables["batch_stats"]}
    if norm_spec is not None:
        template["norm_stats"] = {
            k: np.zeros(tuple(spec["shape"]), np.dtype(spec["dtype"]))
            for k, spec in norm_spec.items()}
    return module, template


def _unpack(module, restored, norm_spec):
    norm = ({k: np.asarray(v) for k, v in restored["norm_stats"].items()}
            if norm_spec is not None else None)
    model = TrainedVAE(module, restored["params"], restored["batch_stats"])
    return model, norm


def load_vae(path: str | Path
             ) -> Tuple[TrainedVAE, Optional[Dict[str, np.ndarray]]]:
    path = Path(path).resolve()
    meta = json.loads((path / "module.json").read_text())
    norm_spec = meta.pop("norm_stats_spec", None)
    module, template = _make_template(meta, norm_spec)

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path / "state", template)
    return _unpack(module, restored, norm_spec)


def load_vae_many(paths, max_workers: int = 8):
    """Restore many member checkpoints concurrently (VERDICT r3 #7).

    ``load_vae`` in a loop pays one module.init (template trace) and one
    serial orbax restore per member; at the production 64-member cohort
    scale that serializes ~64 rounds of file IO on the host.  Here the
    init-derived template is built ONCE per distinct architecture/spec and
    the restores (IO-bound, GIL-releasing) run in a thread pool.

    Returns a list aligned with ``paths``: ``(model, norm_stats)`` per
    member, or the raised exception object for unreadable members (callers
    keep their skip-and-continue semantics by checking isinstance)."""
    import concurrent.futures as cf

    paths = [Path(p).resolve() for p in paths]
    templates = {}  # (meta items, spec json) -> (module, template)

    def restore_one(path):
        meta = json.loads((path / "module.json").read_text())
        norm_spec = meta.pop("norm_stats_spec", None)
        tkey = (tuple(sorted(meta.items())), json.dumps(norm_spec,
                                                        sort_keys=True))
        if tkey not in templates:  # pre-populated sequentially below
            templates[tkey] = _make_template(meta, norm_spec)
        module, template = templates[tkey]
        restored = ocp.StandardCheckpointer().restore(path / "state",
                                                      template)
        return _unpack(module, restored, norm_spec)

    # build the (usually one) template sequentially — module.init is a jax
    # trace and not thread-safe to race on first touch
    for path in paths:
        try:
            meta = json.loads((path / "module.json").read_text())
            norm_spec = meta.pop("norm_stats_spec", None)
            tkey = (tuple(sorted(meta.items())), json.dumps(norm_spec,
                                                            sort_keys=True))
            if tkey not in templates:
                templates[tkey] = _make_template(meta, norm_spec)
        except Exception:
            pass  # surfaced as the member's exception by restore_one

    with cf.ThreadPoolExecutor(max_workers=max_workers) as pool:
        futs = [pool.submit(restore_one, p) for p in paths]
        out = []
        for f in futs:
            try:
                out.append(f.result())
            except Exception as e:  # member-level failure, caller skips
                out.append(e)
    return out
