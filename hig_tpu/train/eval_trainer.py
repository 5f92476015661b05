"""Trainers for the evaluator models (classifier + consistency).

Re-implementation of codes/tools/train_evaluation_model.py (26-way
cross-entropy on MotionEncoder, Adam lr 2e-4, val-accuracy model selection)
and train_consistency_evaluation_model.py (binary CE on
MotionConsistencyEvalModel, Adam lr/5). Both run as one jitted step; the
per-epoch val accuracy loop drives best-checkpoint selection exactly as the
reference does (train_evaluation_model.py:110-142).
"""

from __future__ import annotations

import dataclasses
from os.path import join as pjoin
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hig_tpu.config import ExperimentConfig
from hig_tpu.data.dataset import epoch_batches
from hig_tpu.models.eval_models import MotionConsistencyEvalModel, MotionEncoder
from hig_tpu.train import checkpoint as ckpt


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EvalTrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def _make_state(model, tx, sample_x, sample_len, seed):
    params = jax.jit(model.init)(jax.random.key(seed), sample_x, sample_len)
    return EvalTrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def make_classifier_step(model: MotionEncoder, tx) -> Callable:
    def loss_fn(params, motion, lengths, labels):
        logits, _ = model.apply(params, motion, lengths)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        return loss, logits

    @jax.jit
    def step(state, motion, lengths, labels):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, motion, lengths, labels
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return (
            EvalTrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "acc": acc},
        )

    return step


def make_consistency_step(model: MotionConsistencyEvalModel, tx) -> Callable:
    def loss_fn(params, motion, lengths, labels):
        logits = model.apply(params, motion, lengths)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        return loss, logits

    @jax.jit
    def step(state, motion, lengths, labels):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, motion, lengths, labels
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return (
            EvalTrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "acc": acc},
        )

    return step


def _strip_contacts(motion: np.ndarray) -> np.ndarray:
    """dim_pose 263 → 259: foot contacts excluded
    (ref train_evaluation_model.py:70: 4+63+126+66)."""
    return motion[..., :-4]


class EvalModelTrainer:
    """Shared epoch loop with val-accuracy best-model selection."""

    def __init__(self, cfg: ExperimentConfig, kind: str = "classifier"):
        assert kind in ("classifier", "consistency")
        self.cfg = cfg
        self.kind = kind
        common = dict(
            input_feats=cfg.dim_pose - 4,
            num_frames=cfg.max_motion_length,
            latent_dim=cfg.latent_dim,
            ff_size=cfg.ff_size,
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            dropout=cfg.dropout,
        )
        if kind == "classifier":
            self.model = MotionEncoder(class_num=26, **common)
            lr = cfg.lr
        else:
            self.model = MotionConsistencyEvalModel(class_num=2, **common)
            lr = cfg.lr / 5  # (ref train_consistency_evaluation_model.py:87)
        self.tx = optax.adam(lr)
        self.step_fn = (
            make_classifier_step(self.model, self.tx)
            if kind == "classifier"
            else make_consistency_step(self.model, self.tx)
        )
        self._apply = jax.jit(self.model.apply)

    def init_state(self) -> EvalTrainState:
        T = self.cfg.window_size + 1
        x = jnp.zeros((1, 2, T, self.cfg.dim_pose - 4))
        lengths = jnp.full((1,), T, jnp.int32)
        return _make_state(self.model, self.tx, x, lengths, self.cfg.seed)

    def _labels(self, batch):
        return batch["dummy_label"] if self.kind == "consistency" else batch["class_id"]

    def _epoch(self, state, dataset, epoch, train=True):
        accs = []
        for batch in epoch_batches(
            dataset, self.cfg.batch_size, epoch, shuffle=train, drop_last=train,
            seed=self.cfg.seed,
        ):
            motion = jnp.asarray(_strip_contacts(batch["motion"]))
            lengths = jnp.asarray(batch["lengths"])
            labels = jnp.asarray(self._labels(batch))
            if train:
                state, metrics = self.step_fn(state, motion, lengths, labels)
                accs.append(float(metrics["acc"]))
            else:
                if self.kind == "classifier":
                    logits, _ = self._apply(state.params, motion, lengths)
                else:
                    logits = self._apply(state.params, motion, lengths)
                accs.append(
                    float(jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32)))
                )
        return state, (float(np.mean(accs)) if accs else 0.0)

    def train(self, train_dataset, val_dataset, state=None, num_epochs=None, log=print):
        state = state or self.init_state()
        num_epochs = num_epochs or self.cfg.num_epochs
        best_acc, best_path = 0.0, pjoin(self.cfg.model_dir, "best_eval_model")
        saved_once = False
        history = []
        for epoch in range(1, num_epochs):
            state, train_acc = self._epoch(state, train_dataset, epoch, train=True)
            _, val_acc = self._epoch(state, val_dataset, epoch, train=False)
            history.append({"epoch": epoch, "train_acc": train_acc, "val_acc": val_acc})
            log(f"[{self.kind}] epoch {epoch} train_acc {train_acc:.3f} val_acc {val_acc:.3f}")
            if val_acc > best_acc or not saved_once:
                best_acc = max(best_acc, val_acc)
                ckpt.save_params(best_path, state.params)
                saved_once = True
                log(f"[{self.kind}] best acc {best_acc:.3f} — model saved")
        return state, best_acc, history
