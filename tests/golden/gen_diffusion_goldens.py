"""Golden vectors for the diffusion engine, from the reference implementation.

Produces tests/golden/diffusion.npz (committed). Loads the reference's
gaussian_diffusion.py standalone.
"""

import importlib.util
import sys

import numpy as np
import torch

np.float = float
np.bool = bool

spec = importlib.util.spec_from_file_location(
    "ref_gd", "/root/reference/codes/models/gaussian_diffusion.py"
)
gd = importlib.util.module_from_spec(spec)
sys.modules["ref_gd"] = gd
spec.loader.exec_module(gd)

out = {}
for name, steps in [("linear", 1000), ("cosine", 1000), ("linear", 50)]:
    betas = gd.get_named_beta_schedule(name, steps)
    out[f"betas_{name}_{steps}"] = betas
    diff = gd.GaussianDiffusion(
        betas=betas,
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
    )
    for tab in [
        "alphas_cumprod",
        "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod",
        "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod",
        "posterior_variance",
        "posterior_log_variance_clipped",
        "posterior_mean_coef1",
        "posterior_mean_coef2",
    ]:
        out[f"{tab}_{name}_{steps}"] = getattr(diff, tab)

# Functional goldens at the reference's training config (1000, linear).
betas = gd.get_named_beta_schedule("linear", 1000)
diff = gd.GaussianDiffusion(
    betas=betas,
    model_mean_type=gd.ModelMeanType.EPSILON,
    model_var_type=gd.ModelVarType.FIXED_SMALL,
    loss_type=gd.LossType.MSE,
)
rng = np.random.RandomState(1)
x0 = rng.randn(4, 8, 6).astype(np.float32)
noise = rng.randn(4, 8, 6).astype(np.float32)
eps_pred = rng.randn(4, 8, 6).astype(np.float32)
t = np.array([0, 250, 700, 999])
out["x0"], out["noise"], out["eps_pred"], out["t"] = x0, noise, eps_pred, t

x0_t, noise_t, t_t = map(torch.from_numpy, (x0, noise, t))
x_t = diff.q_sample(x0_t, t_t, noise=noise_t)
out["q_sample"] = x_t.numpy()

pm, pv, plv = diff.q_posterior_mean_variance(x0_t, x_t, t_t)
out["post_mean"], out["post_var"], out["post_logvar"] = (
    pm.numpy(), pv.numpy(), plv.numpy(),
)

pred_x0 = diff._predict_xstart_from_eps(x_t, t_t, torch.from_numpy(eps_pred))
out["pred_xstart"] = pred_x0.numpy()


class FakeModel(torch.nn.Module):
    def forward(self, x, ts, **kw):
        return torch.from_numpy(eps_pred)

    def parameters(self):
        return iter([torch.nn.Parameter(torch.zeros(1))])


pmv = diff.p_mean_variance(FakeModel(), x_t, t_t, clip_denoised=False)
out["p_mean"] = pmv["mean"].numpy()
out["p_logvar"] = pmv["log_variance"].numpy()
out["p_pred_xstart"] = pmv["pred_xstart"].numpy()

vb = diff._vb_terms_bpd(FakeModel(), x0_t, x_t, t_t, clip_denoised=False)
out["vb_output"] = vb["output"].numpy()
out["prior_bpd"] = diff._prior_bpd(x0_t).numpy()

np.savez_compressed("tests/golden/diffusion.npz", **out)
print("wrote tests/golden/diffusion.npz with", len(out), "arrays")
