"""Mechanical check that guidance is actually applied by the eval path.

Loads the finetuned CFG checkpoint, reports the null-branch parameter
magnitudes (zero-init at graft time — any nonzero value proves the finetune
trained them), and samples the same seed at w=1 vs w=5 to measure how much
the guided trajectory moves. Run on CPU (~3 min):

    cd /tmp/eqrun3 && PYTHONPATH=/root/repo/tools:/root/repo:/root/.axon_site \
        python /root/repo/results/cfg_run/probe_w_effect.py

Round-5 output (latest = donor e40 + 10 CFG epochs):
    null_xf_proj |mean abs|: 0.0133   null_xf_token |mean abs|: 0.0024
    mean|x_w1|: 86.24   mean|diff w1 vs w5|: 0.81   max: 8.68
i.e. guidance shifts the trajectory by ~1% of signal — applied, but small,
because eps_c ~= eps_u at this model scale (see README.md).
"""
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from hig_tpu.config import load_opt_txt
from _common import restore_trainer_state
from hig_tpu.train.trainer import make_sampler, eval_params
from hig_tpu.models.tokenizer import tokenize

cfg = load_opt_txt(
    "/tmp/eqrun3/ckpt/synthetic_mul/eq_interaction_cfg/opt.txt", is_train=False
)
trainer, state, _, _ = restore_trainer_state(cfg, "latest")
params = eval_params(state)
p = params["params"] if "params" in params else params
print("null_xf_proj |mean abs|:", float(jnp.abs(p["null_xf_proj"]).mean()))
print("null_xf_token |mean abs|:", float(jnp.abs(p["null_xf_token"]).mean()))

toks = np.stack(
    [tokenize("one person walks towards the other")[0],
     tokenize("one person walks towards the other")[0]]
)
cond = jnp.asarray(np.stack([toks] * 2))
lengths = jnp.full((2,), 91, jnp.int32)
rng = jax.random.key(0)
outs = {}
for w in (1.0, 5.0):
    fn = make_sampler(
        trainer.model, trainer.sched, T=91, dim_pose=cfg.dim_pose,
        sampler="ddim", ddim_steps=8, guidance_scale=w,
    )
    outs[w] = np.asarray(fn(params, cond, lengths, rng))
d = np.abs(outs[1.0] - outs[5.0])
print(
    "mean|x_w1|:", np.abs(outs[1.0]).mean(),
    " mean|diff w1 vs w5|:", d.mean(), " max:", d.max(),
)
