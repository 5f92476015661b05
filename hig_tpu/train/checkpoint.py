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
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, target)
    state = type(abstract_state)(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(restored["step"]),
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
