"""Generate a two-person motion from captions and render it.

Equivalent of codes/tools/visualization.py: sample with the trained model,
de-normalize with the experiment's meta stats, recover world-frame joints
via recover_from_ric2, save the (2, T, 22, 3) npy and a gif.
"""

import argparse
import os
from os.path import join as pjoin

import jax
import jax.numpy as jnp
import numpy as np

from _common import load_stats, restore_trainer_state  # noqa: E402

from hig_tpu.config import load_opt_txt
from hig_tpu.data.vocab import CLASSID2CAPS
from hig_tpu.models.tokenizer import tokenize
from hig_tpu.train.trainer import make_sampler
from hig_tpu.utils.kinematics import T2M_KINEMATIC_CHAIN
from hig_tpu.utils.motion_codec import recover_from_ric2


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--opt_path", type=str, required=True)
    parser.add_argument("--which_epoch", type=str, default="latest")
    parser.add_argument("--caption1", type=str, default=None)
    parser.add_argument("--caption2", type=str, default=None)
    parser.add_argument("--class_id", type=int, default=None,
                        help="use the canonical captions of this NTU class")
    parser.add_argument("--motion_length", type=int, default=60)
    parser.add_argument("--result_path", type=str, default="./result")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--gif", action="store_true", default=True)
    parser.add_argument("--no-gif", dest="gif", action="store_false")
    parser.add_argument("--single", action="store_true",
                        help="single-person model (ref visualization.py non-interaction branch)")
    parser.add_argument("--sampler", type=str, default=None,
                        choices=[None, "ddpm", "ddim", "dpm"],
                        help="override the checkpoint's sampler")
    parser.add_argument("--guidance_scale", type=float, default=None,
                        help="classifier-free guidance weight override "
                             "(needs a --cond_drop_prob-trained checkpoint)")
    parser.add_argument("--ddim_steps", type=int, default=None,
                        help="override the checkpoint's ddim/dpm step count")
    args = parser.parse_args()

    if args.single:
        return run_single(args)

    cfg = load_opt_txt(args.opt_path, is_train=False)
    if args.sampler:
        cfg.sampler = args.sampler
    if args.ddim_steps:
        cfg.ddim_steps = args.ddim_steps
    if args.guidance_scale is not None:
        cfg.guidance_scale = args.guidance_scale
    if args.class_id is not None:
        caption1, caption2 = CLASSID2CAPS[args.class_id]
    else:
        caption1 = args.caption1 or CLASSID2CAPS[2][0]
        caption2 = args.caption2 or CLASSID2CAPS[2][1]
    print(f"caption1: {caption1}\ncaption2: {caption2}")

    mean, std = load_stats(cfg, for_training=False)
    trainer, state, _, _ = restore_trainer_state(cfg, args.which_epoch)

    T = args.motion_length + 1  # + init token
    sample_fn = make_sampler(
        trainer.model, trainer.sched, T=T, dim_pose=cfg.dim_pose,
        sampler=cfg.sampler, ddim_steps=cfg.ddim_steps,
        unroll=getattr(cfg, 'sampler_unroll', 1),
        guidance_scale=getattr(cfg, 'guidance_scale', 1.0),
    )
    if cfg.cap_id:
        # PIT-mode models condition on caption-key ids, not BPE tokens
        # (ref interaction_transformer.py:436; evaluation.py does the same)
        from hig_tpu.data.vocab import CAP2KEY

        tokens = np.asarray([[CAP2KEY[caption1], CAP2KEY[caption2]]], np.int32)
    else:
        tokens = np.stack([tokenize(caption1)[0], tokenize(caption2)[0]])[None]
    out = sample_fn(
        state.params, jnp.asarray(tokens), jnp.asarray([T], np.int32),
        jax.random.key(args.seed),
    )
    out = np.asarray(out)[0]  # (2, T, D); row 0 = init token

    # de-normalize (ref: visualization.py:149-155)
    denorm = out.copy()
    denorm[:, 1:] = out[:, 1:] * std[:-4] + mean[:-4]
    denorm[:, 0, :4] = out[:, 0, :4] * std[-4:] + mean[-4:]
    # init token to the last row for recover_from_ric2
    rolled = np.concatenate([denorm[:, 1:], denorm[:, :1]], axis=1)
    j1, j2 = recover_from_ric2(
        jnp.asarray(rolled[0]), jnp.asarray(rolled[1]), cfg.joints_num, init_last=True
    )
    joints = np.stack([np.asarray(j1), np.asarray(j2)])

    os.makedirs(args.result_path, exist_ok=True)
    stem = pjoin(args.result_path, f"sample_c{args.class_id if args.class_id is not None else 'x'}_s{args.seed}")
    np.save(stem + ".npy", joints)
    print(f"wrote {stem}.npy {joints.shape}")
    if args.gif:
        from hig_tpu.viz.plot import plot_3d_motion2

        plot_3d_motion2(
            stem + ".gif", T2M_KINEMATIC_CHAIN, joints[0], joints[1],
            title=caption1,
        )
        print(f"wrote {stem}.gif")


def run_single(args):
    """Single-person sampling + decode (ref: visualization.py:60-84)."""
    import jax

    from hig_tpu.config import load_opt_txt
    from hig_tpu.models.interaction_model import SingleMotionModel
    from hig_tpu.train import checkpoint as ckpt
    from hig_tpu.train.trainer import make_single_sampler
    from hig_tpu.diffusion import gaussian as g
    from hig_tpu.utils.motion_codec import recover_from_ric

    cfg = load_opt_txt(args.opt_path, is_train=False)
    if args.sampler:
        cfg.sampler = args.sampler
    if args.ddim_steps:
        cfg.ddim_steps = args.ddim_steps
    if args.guidance_scale is not None:
        cfg.guidance_scale = args.guidance_scale
    caption = args.caption1 or "a person walks forward"
    mean, std = load_stats(cfg, for_training=False)

    model = SingleMotionModel(
        input_feats=cfg.dim_pose, num_frames=cfg.max_motion_length,
        latent_dim=cfg.latent_dim, ff_size=cfg.ff_size,
        num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        text_latent_dim=cfg.text_latent_dim, text_ff_size=cfg.text_ff_size,
        text_num_heads=cfg.text_num_heads, num_text_layers=cfg.num_text_layers,
    )
    T = args.motion_length + 1  # + trailing init token (SingleMotionDataset layout)
    x = jnp.zeros((1, T, cfg.dim_pose))
    tokens = jnp.asarray(tokenize([caption]))
    init = jax.jit(model.init)(
        jax.random.key(0), x, jnp.zeros((1,), np.int32),
        jnp.full((1,), T, np.int32), tokens,
    )
    # tools/train_single.py checkpoints a full TrainState; standalone
    # params-only checkpoints (converted donors) also load.
    try:
        from hig_tpu.train.trainer import TrainState, make_optimizer

        tx = make_optimizer(cfg, init)
        abstract = TrainState(params=init, opt_state=tx.init(init),
                              step=jnp.zeros((), np.int32))
        state, _, _ = ckpt.restore_state(pjoin(cfg.model_dir, args.which_epoch), abstract)
        from hig_tpu.train.trainer import eval_params
        restored = eval_params(state)
    except Exception:
        restored = ckpt.restore_params(pjoin(cfg.model_dir, args.which_epoch), init)
    sched = g.make_schedule(g.named_betas("linear", cfg.diffusion_steps))
    sample = make_single_sampler(model, sched, T=T, dim_pose=cfg.dim_pose,
                                 sampler=cfg.sampler, ddim_steps=cfg.ddim_steps)
    out = np.asarray(
        sample(restored, tokens, jnp.full((1,), T, np.int32), jax.random.key(args.seed))
    )[0]
    # de-normalize per the single-person convention: frame rows vs the main
    # stats, trailing init row (channels 0:3) vs the 3 trailing init stats
    # (ref dataset.py:118-121); the init token only carries world placement,
    # so decoding uses the frame rows.
    if mean.shape[0] == cfg.dim_pose + 3:
        frame_mean, frame_std = mean[:-3], std[:-3]
    else:
        frame_mean, frame_std = mean[: cfg.dim_pose], std[: cfg.dim_pose]
    denorm = out[:-1] * frame_std + frame_mean
    joints = np.asarray(recover_from_ric(jnp.asarray(denorm), cfg.joints_num))
    os.makedirs(args.result_path, exist_ok=True)
    stem = pjoin(args.result_path, f"single_s{args.seed}")
    np.save(stem + ".npy", joints)
    print(f"wrote {stem}.npy {joints.shape}")
    if args.gif:
        from hig_tpu.viz.plot import plot_3d_motion

        plot_3d_motion(stem + ".gif", T2M_KINEMATIC_CHAIN, joints, title=caption)
        print(f"wrote {stem}.gif")


if __name__ == "__main__":
    main()
