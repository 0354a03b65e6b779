"""Training checkpoint save/restore (reference capture/restore,
gaussian_model.py:124-177 + torch.save((capture(), iteration)) at
train_refnerf.py:1482-1484).

Uses Orbax for the TrainState pytree (params + optimizer state + env lights
+ env gaussians); the iteration is stored alongside. Note the reference's
restore quirk — `_indirect_asg` re-zeroed on restore (gaussian_model.py:173)
— is reproduced.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(state, iteration: int, path: str):
    """Write chkpnt{iteration} under `path`."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(os.path.join(path, f"chkpnt{iteration}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_dir, state, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "chkpnt_meta.json"), "w") as f:
        json.dump(
            {
                "iteration": iteration,
                # Restore templates must match the saved pytree structure:
                # record whether the EnvGS branch was active.
                "has_env_gs": getattr(state, "env_gs", None) is not None,
            },
            f,
        )


def load_checkpoint(template_state, path: str, iteration: int | None = None):
    """Restore into the structure of `template_state` (same capacities).

    Returns (state, iteration)."""
    import orbax.checkpoint as ocp

    meta = {}
    meta_path = os.path.join(path, "chkpnt_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    if iteration is None:
        if "iteration" not in meta:
            raise FileNotFoundError(
                f"no chkpnt_meta.json with an iteration at {path}; pass "
                f"iteration= explicitly"
            )
        iteration = meta["iteration"]
    # Structural self-check: orbax raises an opaque pytree mismatch if the
    # template lacks env_gs a post-indirect checkpoint recorded. The meta
    # file describes only the LAST save, so the guard applies only when
    # restoring that same iteration (an explicit earlier checkpoint may
    # legitimately predate env-GS init).
    if (
        meta.get("has_env_gs")
        and meta.get("iteration") == iteration
        and template_state.env_gs is None
    ):
        raise ValueError(
            "checkpoint was saved with env gaussians (has_env_gs=true) but "
            "template_state.env_gs is None — initialize the env-GS branch "
            "(Trainer._init_env_gs) before restoring"
        )
    ckpt_dir = os.path.abspath(os.path.join(path, f"chkpnt{iteration}"))
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
        if hasattr(a, "shape")
        else a,
        template_state,
    )
    state = ckptr.restore(ckpt_dir, abstract)
    # Reference restore quirk: ASG params re-zeroed (gaussian_model.py:173).
    state = state.replace(
        model=state.model.replace(
            params=state.model.params.replace(
                indirect_asg=jnp.zeros_like(state.model.params.indirect_asg)
            )
        )
    )
    return state, iteration
