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
    (path / "module.json").write_text(json.dumps(meta))
    payload = {"params": model.params, "batch_stats": model.batch_stats}
    if norm_stats is not None:
        payload["norm_stats"] = {k: np.asarray(v) for k, v in norm_stats.items()}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "state", payload, force=True)
    ckptr.wait_until_finished()


def load_vae(path: str | Path
             ) -> Tuple[TrainedVAE, Optional[Dict[str, np.ndarray]]]:
    path = Path(path).resolve()
    meta = json.loads((path / "module.json").read_text())
    module = LesionConditionedVAE(**meta)

    # template for structure/dtype restoration
    key = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    variables = module.init(
        {"params": key},
        jnp.zeros((2, meta["seq_len"], meta["micro_ch"]), jnp.float32),
        jnp.zeros((2, meta["seq_len"], meta["lesion_ch"]), jnp.float32),
        key, jnp.ones(2, jnp.float32), True)
    template = {"params": variables["params"],
                "batch_stats": variables["batch_stats"]}

    ckptr = ocp.StandardCheckpointer()
    try:
        restored = ckptr.restore(path / "state", template)
        norm = None
    except Exception:
        # payload may carry norm_stats too
        template2 = dict(template)
        template2["norm_stats"] = {
            "median": np.zeros(meta["micro_ch"], np.float32),
            "mean": np.zeros(meta["micro_ch"], np.float32),
            "std": np.ones(meta["micro_ch"], np.float32)}
        restored = ckptr.restore(path / "state", template2)
        norm = {k: np.asarray(v) for k, v in restored["norm_stats"].items()}
    model = TrainedVAE(module, restored["params"], restored["batch_stats"])
    return model, norm
