"""Checkpoint save/restore via orbax.

Replaces the reference's torch.save dict of
{opt_encoder, ep, total_it, encoder} → latest.tar
(mul_ddpm_trainer.py:269-287) with orbax checkpoints carrying the same
information; the experiment directory (opt.txt + model/ + meta/) remains the
unit of reproducibility.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_state(path: str, state, epoch: int, total_it: int) -> None:
    path = os.path.abspath(path)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
        "total_it": np.asarray(total_it),
    }
    if getattr(state, "ema_params", None) is not None:
        payload["ema_params"] = state.ema_params
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def restore_state(path: str, abstract_state) -> tuple[Any, int, int]:
    """Restore (TrainState-like payload, epoch, total_it).

    ``abstract_state`` is a pytree with the target structure (e.g. a freshly
    initialized TrainState) used to interpret the stored arrays.
    """
    path = os.path.abspath(path)
    target = {
        "params": abstract_state.params,
        "opt_state": abstract_state.opt_state,
        "step": np.asarray(abstract_state.step),
        "epoch": np.asarray(0),
        "total_it": np.asarray(0),
    }
    # EMA is stored only when the run had --ema_decay on — the checkpoint's
    # own metadata decides. A run resuming WITH EMA from a pre-EMA
    # checkpoint seeds it from params.
    ckptr = ocp.StandardCheckpointer()
    try:
        has_ema = "ema_params" in ckptr.metadata(path).item_metadata.tree
    except Exception:
        has_ema = False
    want_ema = getattr(abstract_state, "ema_params", None) is not None
    if has_ema:
        target["ema_params"] = (
            abstract_state.ema_params if want_ema else abstract_state.params
        )
    restored = ckptr.restore(path, target)
    ema = restored.get("ema_params")
    if want_ema and ema is None:
        # seed from params as a copy — aliased buffers break step donation
        ema = jax.tree_util.tree_map(jax.numpy.copy, restored["params"])
    if not want_ema and ema is not None:
        # Resuming WITHOUT --ema_decay from an EMA checkpoint: the train step
        # would never update the restored EMA, yet eval_params() prefers it —
        # all post-resume training would be silently shadowed by the frozen
        # stale average at inference. Drop it (and say so) instead.
        print(
            "checkpoint has ema_params but this run has no --ema_decay; "
            "discarding the stored EMA (evaluation will use live params)"
        )
        ema = None
    state = type(abstract_state)(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(restored["step"]),
        ema_params=ema,
    )
    return state, int(restored["epoch"]), int(restored["total_it"])


def save_params(path: str, params) -> None:
    """Parameter-only checkpoint (eval models' best_eval_model equivalent,
    ref train_evaluation_model.py:140)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), {"params": params}, force=True)
    ckptr.wait_until_finished()


def restore_params(path: str, abstract_params):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), {"params": abstract_params})["params"]
