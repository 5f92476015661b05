"""Progressive distillation of the DDIM sampler (Salimans & Ho, ICLR 2022).

A beat-the-reference axis: the reference samples with 1000 sequential
ancestral steps and ships DDIM dormant (codes/models/gaussian_diffusion.py:
668-769, 771-941); hig_tpu already promotes DDIM-50 to the production path.
Progressive distillation halves the sampling grid stage by stage
(50 -> 25 -> 13 -> 7 ...): at each stage a student (initialized from the
teacher) is trained so that ONE student DDIM step reproduces TWO teacher
DDIM steps, then becomes the teacher for the next stage.

Construction (discrete-time variant of the paper's Algorithm 2):

* The student samples on the standard ``ddim_timesteps(T, N)`` grid — the
  exact grid ``ddim_sample_loop(num_steps=N)`` uses, so a distilled
  checkpoint is evaluated/served by the existing production sampler with
  ``--sampler ddim --ddim_steps N`` and inherits its fused fast path.
* The teacher's two half-steps run ``t -> mid -> t_prev`` where ``mid`` is
  the midpoint of each student transition (``t_prev = -1`` denotes the final
  hop to x0, i.e. alpha_bar = 1, matching the sampler's ``ts_prev`` tail).
* The target is the x0 (equivalently eps) that makes the single student
  DDIM update from ``x_t`` land exactly on the teacher's two-step result —
  solved in closed form from the linearity of the eta=0 update.
* The loss is the paper's truncated-SNR weighting
  ``max(alpha_bar/(1-alpha_bar), 1) * ||x0_hat - x0_target||^2`` in x-space,
  masked with the same init-token/length conventions as training
  (train/trainer.py::per_token_loss).

Everything is a pure function over the schedule tables; the teacher is an
opaque ``model(x, t) -> eps`` callable, so the same machinery distills the
interaction model, the single-person model, or any future denoiser.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from hig_tpu.diffusion import gaussian as g


@dataclasses.dataclass(frozen=True)
class DistillGrids:
    """Per-student-step timestep triples, all shape (N,), int32.

    ``ts``      — the student's (and the evaluator's) DDIM grid, descending.
    ``ts_prev`` — the student transition target; -1 means alpha_bar = 1 (x0).
    ``ts_mid``  — the teacher's intermediate step inside each transition.
    """

    ts: np.ndarray
    ts_prev: np.ndarray
    ts_mid: np.ndarray

    @property
    def num_steps(self) -> int:
        return len(self.ts)


def distill_grids(
    T: int, num_steps: int, teacher_steps: int | None = None
) -> DistillGrids:
    """Build the nested teacher/student grids for one distillation stage.

    The student grid is exactly :func:`gaussian.ddim_timesteps`, so sampling
    the distilled model needs no new sampler. Requires every transition to
    span >= 2 timesteps (i.e. roughly ``num_steps <= T // 2``) so the
    teacher midpoint is strictly interior — except the final ``0 -> -1``
    hop, which always spans one step: there ``mid`` is clamped to ``t``,
    making the first half-step an exact identity
    (``ddim_step(x, eps, t, t) == x``) and the target the teacher's own
    single-step endpoint.

    ``teacher_steps``: the teacher's own sampling-grid size. When given,
    each midpoint is snapped to the nearest teacher grid point strictly
    inside the transition. A distilled teacher has only ever been
    *supervised* at its own ``ddim_timesteps(T, teacher_steps)`` points, so
    querying it at a blind arithmetic midpoint asks for an extrapolation it
    was never trained to make. The effect grows as the ladder descends and
    is decisive at the final 2 -> 1 rung: the 2-step teacher's grid is
    ``{T-1, 0}``, so the student's single ``T-1 -> x0`` transition must use
    mid = 0 (the teacher's own two-step path), not the midpoint ``T//2``
    where the 2-step teacher is undefined. For a stage-0 teacher (trained
    at all t) snapping is harmless — its grid brackets every midpoint
    closely.
    """
    ts = g.ddim_timesteps(T, num_steps).astype(np.int32)
    ts_prev = np.append(ts[1:], np.int32(-1)).astype(np.int32)
    gaps = ts - ts_prev
    if np.any((gaps < 2) & (ts != 0)):
        raise ValueError(
            f"distill grid too dense: num_steps={num_steps} leaves a "
            f"transition of {int(gaps[(gaps < 2) & (ts != 0)].min())} < 2 "
            f"timesteps (T={T})"
        )
    ts_mid = np.where(gaps >= 2, (ts + ts_prev) // 2, ts).astype(np.int32)
    if teacher_steps is not None:
        tgrid = g.ddim_timesteps(T, teacher_steps).astype(np.int32)
        for i in range(len(ts)):
            interior = tgrid[(tgrid < ts[i]) & (tgrid > ts_prev[i])]
            if len(interior):
                ts_mid[i] = interior[np.argmin(np.abs(interior - int(ts_mid[i])))]
    return DistillGrids(ts=ts, ts_prev=ts_prev, ts_mid=ts_mid)


def halving_stages(start_steps: int, min_steps: int = 4) -> list[int]:
    """The stage ladder: ceil-halve from ``start_steps`` down to
    ``min_steps`` (50 -> 25 -> 13 -> 7 -> 4)."""
    stages = []
    n = start_steps
    while n > min_steps:
        n = (n + 1) // 2
        stages.append(n)
    return stages


def _ab_prev(sched: g.DiffusionSchedule, t_prev: jax.Array, ndim: int) -> jax.Array:
    """alpha_bar at t_prev with the -1 -> 1.0 (x0 state) convention."""
    ab_ext = jnp.concatenate(
        [sched.alphas_cumprod, jnp.ones((1,), sched.alphas_cumprod.dtype)]
    )
    idx = jnp.where(t_prev < 0, sched.num_timesteps, t_prev)
    return g._extract(ab_ext, idx, ndim)


def ddim_step(
    sched: g.DiffusionSchedule,
    x: jax.Array,
    eps: jax.Array,
    t: jax.Array,
    t_prev: jax.Array,
) -> jax.Array:
    """One deterministic (eta=0, unclipped) DDIM update with per-sample
    batched ``t``/``t_prev`` (the sampler's scan carries scalars; the
    distillation batch mixes grid positions). ``t_prev = -1`` lands on x0.
    """
    x0 = g.predict_xstart_from_eps(sched, x, t, eps)
    abp = _ab_prev(sched, t_prev, x.ndim)
    return jnp.sqrt(abp) * x0 + jnp.sqrt(1.0 - abp) * eps.astype(x.dtype)


def distill_targets(
    sched: g.DiffusionSchedule,
    teacher: g.Denoiser,
    x_t: jax.Array,
    t: jax.Array,
    t_mid: jax.Array,
    t_prev: jax.Array,
):
    """Run the teacher two DDIM half-steps and solve the one-step target.

    Returns ``(x0_target, weight)`` where ``x0_target`` is the x0 whose
    single student DDIM step from ``x_t`` at ``t`` lands exactly on the
    teacher's two-step endpoint, and ``weight`` is the truncated-SNR loss
    weight ``max(SNR, 1)`` (shape (B,)).

    Derivation: the eta=0 update is linear in (x, eps) —
    ``x'' = sqrt(ab'')*x0 + sqrt(1-ab'')*eps`` with
    ``eps = (x - sqrt(ab)*x0)/sqrt(1-ab)``; solving for x0 given the
    teacher endpoint x'' gives
    ``x0 = (x'' - frac*x) / (sqrt(ab'') - frac*sqrt(ab))`` with
    ``frac = sqrt(1-ab'')/sqrt(1-ab)``. At ``t_prev = -1`` (ab''=1) this
    degenerates to ``x0 = x''`` — the teacher endpoint IS the target.
    """
    eps1 = teacher(x_t, t)
    x_mid = ddim_step(sched, x_t, eps1, t, t_mid)
    eps2 = teacher(x_mid, t_mid)
    x_pp = ddim_step(sched, x_mid, eps2, t_mid, t_prev)

    ab = g._extract(sched.alphas_cumprod, t, x_t.ndim)
    abp = _ab_prev(sched, t_prev, x_t.ndim)
    frac = jnp.sqrt(1.0 - abp) / jnp.sqrt(1.0 - ab)
    denom = jnp.sqrt(abp) - frac * jnp.sqrt(ab)
    x0_target = (x_pp - frac * x_t) / denom
    snr = sched.alphas_cumprod[t] / (1.0 - sched.alphas_cumprod[t])  # (B,)
    weight = jnp.maximum(snr, 1.0)
    return jax.lax.stop_gradient(x0_target), weight


def make_distill_loss(
    model,
    sched: g.DiffusionSchedule,
    grids: DistillGrids,
    distill_w: float = 1.0,
) -> Callable:
    """loss_fn(student_params, teacher_params, batch, rng) -> (scalar, aux).

    ``batch`` is the supervised (non-PIT) training batch of
    train/trainer.py::make_loss_fn: motion (B,2,T,D), lengths (B,), and
    tower_feats+tokens / tokens / cap_ids conditioning. Teacher and student
    encode the conditioning with their own parameters (they share the
    architecture; the student starts as a copy).

    Distillation runs on the final text-conditioned model — role labels are
    already resolved, so the PIT assignment axis never appears here.

    CFG teachers (``model.cond_drop_prob > 0``) support two modes:

    * ``distill_w == 1`` (default): the teacher's caption dropout is applied
      here too — the same per-sample keep mask swaps in the null conditioning
      for teacher and student together, distilling the conditional and null
      branches independently on the same grid (same trick as train-time CFG
      dropout, trainer.py::make_loss_fn). HONEST GAP: progressive
      distillation's one-step==two-step guarantee then holds PER BRANCH, not
      for the guided composite — the teacher's second half-step input depends
      on its first half-step output, and under guided sampling that output is
      the w-blend, so branchwise distillation approximates (not equals) the
      guided trajectory. Sampling a branch-distilled student with
      ``--guidance_scale != 1`` carries that approximation gap; quantify it
      with the w-sweep eval (results/cfg_run) before relying on it.
    * ``distill_w != 1`` (fixed-w guided distillation, the approach of the
      guided-distillation literature, e.g. Meng et al. 2023): every teacher
      eps is the guided blend ``eps_u + w*(eps_c - eps_u)`` — both half-steps
      run the actual guided trajectory — and the student is supervised with
      conditional conditioning only, INTERNALIZING the guidance. The student
      must then be sampled with ``--guidance_scale 1`` (one denoiser call per
      step: the w!=1 two-call price is distilled away). Requires a CFG
      teacher.
    """
    from hig_tpu.models.interaction_model import InteractionModel
    from hig_tpu.train.trainer import per_token_loss

    cond_drop_prob = float(getattr(model, "cond_drop_prob", 0.0))
    distill_w = float(distill_w)
    if distill_w != 1.0 and cond_drop_prob <= 0.0:
        raise ValueError(
            f"distill_w={distill_w} needs a CFG teacher "
            f"(model.cond_drop_prob > 0) — the guided blend queries the "
            f"null branch"
        )

    ts = jnp.asarray(grids.ts)
    ts_prev = jnp.asarray(grids.ts_prev)
    ts_mid = jnp.asarray(grids.ts_mid)

    def cond_of(batch):
        if model.cap_id:
            return batch["cap_ids"]
        if "tower_feats" in batch:
            return (batch["tower_feats"], batch["tokens"])
        return batch["tokens"]

    def enc(params, c):
        if isinstance(c, tuple):
            feats, tk = c
            return model.apply(
                params, feats, tk, True,
                method=InteractionModel.encode_text_from_tower,
            )
        return model.apply(params, c, True, method=InteractionModel.encode_text)

    def loss_fn(student_params, teacher_params, batch, rng):
        motion = batch["motion"]
        B, _, T, _ = motion.shape
        lengths = jnp.minimum(batch["lengths"], T)
        mask = (jnp.arange(T) < lengths[:, None]).astype(motion.dtype)
        cond = cond_of(batch)

        i_rng, n_rng = jax.random.split(rng)
        i = jax.random.randint(i_rng, (B,), 0, grids.num_steps)
        t, t_mid, t_prev = ts[i], ts_mid[i], ts_prev[i]
        noise = jax.random.normal(n_rng, motion.shape, motion.dtype)
        x_t = g.q_sample(sched, motion, t, noise)

        t_xf_proj, t_xf_out = enc(teacher_params, cond)
        s_xf_proj, s_xf_out = enc(student_params, cond)
        if distill_w != 1.0:
            # fixed-w guided distillation: the teacher runs the REAL guided
            # trajectory (blended eps in both half-steps); the student sees
            # conditional conditioning only and internalizes the guidance.
            n_proj, n_out = model.apply(
                teacher_params, B, t_xf_out.shape[2],
                method=InteractionModel.null_conditioning,
            )
            n_proj = n_proj.astype(t_xf_proj.dtype)
            n_out = n_out.astype(t_xf_out.dtype)

            def teacher(x, tt):
                eps_c = model.apply(
                    teacher_params, x, tt, lengths, t_xf_proj, t_xf_out, True,
                    method=InteractionModel.denoise,
                )
                eps_u = model.apply(
                    teacher_params, x, tt, lengths, n_proj, n_out, True,
                    method=InteractionModel.denoise,
                )
                return eps_u + distill_w * (eps_c - eps_u)

            x0_target, weight = distill_targets(
                sched, teacher, x_t, t, t_mid, t_prev
            )

            eps_hat = model.apply(
                student_params, x_t, t, lengths, s_xf_proj, s_xf_out, True,
                method=InteractionModel.denoise,
            )
            x0_hat = g.predict_xstart_from_eps(sched, x_t, t, eps_hat)
            per_tok = per_token_loss(x0_hat, x0_target) * mask[:, None, :]
            per_sample = jnp.sum(per_tok, axis=(1, 2))  # (B,)
            loss = jnp.sum(per_sample * weight) / (2.0 * jnp.sum(mask))
            return loss, {"t": t, "per_sample": per_sample}
        if cond_drop_prob > 0.0:
            keep = jax.random.bernoulli(
                jax.random.fold_in(rng, 7), 1.0 - cond_drop_prob, (B,)
            )

            def drop(params, xf_proj, xf_out):
                n_proj, n_out = model.apply(
                    params, B, xf_out.shape[2],
                    method=InteractionModel.null_conditioning,
                )
                return (
                    jnp.where(keep[:, None, None], xf_proj,
                              n_proj.astype(xf_proj.dtype)),
                    jnp.where(keep[:, None, None, None], xf_out,
                              n_out.astype(xf_out.dtype)),
                )

            t_xf_proj, t_xf_out = drop(teacher_params, t_xf_proj, t_xf_out)
            s_xf_proj, s_xf_out = drop(student_params, s_xf_proj, s_xf_out)

        def teacher(x, tt):
            return model.apply(
                teacher_params, x, tt, lengths, t_xf_proj, t_xf_out, True,
                method=InteractionModel.denoise,
            )

        x0_target, weight = distill_targets(sched, teacher, x_t, t, t_mid, t_prev)

        eps_hat = model.apply(
            student_params, x_t, t, lengths, s_xf_proj, s_xf_out, True,
            method=InteractionModel.denoise,
        )
        x0_hat = g.predict_xstart_from_eps(sched, x_t, t, eps_hat)

        per_tok = per_token_loss(x0_hat, x0_target) * mask[:, None, :]
        per_sample = jnp.sum(per_tok, axis=(1, 2))  # (B,)
        loss = jnp.sum(per_sample * weight) / (2.0 * jnp.sum(mask))
        return loss, {"t": t, "per_sample": per_sample}

    return loss_fn


def make_distill_step(model, sched: g.DiffusionSchedule, tx, grids: DistillGrids,
                      distill_w: float = 1.0):
    """step(state, teacher_params, batch, rng) -> (state, metrics); jittable.
    Same TrainState/optimizer plumbing as the diffusion train step (EMA,
    grad-norm) so distilled checkpoints are drop-in for the eval tools."""
    import optax

    from hig_tpu.train.trainer import TrainState

    loss_fn = make_distill_loss(model, sched, grids, distill_w=distill_w)

    def step(state: TrainState, teacher_params, batch, rng):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, teacher_params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1,
            ema_params=state.ema_params,
        )
        return new_state, {"loss_distill": loss, "grad_norm": optax.global_norm(grads)}

    return step
