"""Configuration system: typed dataclasses with opt.txt round-trip.

Replaces the reference's three-tier argparse stack + opt.txt re-parser
(codes/options/base_options.py, train_options.py, evaluate_options.py,
utils/get_opt.py) with one typed config. ``save_opt_txt`` / ``load_opt_txt``
keep the reference's on-disk ``key: value`` format so experiment directories
stay the unit of reproducibility, and :func:`add_dataset_paths` injects the
same per-dataset constants as get_opt.py:63-94.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from os.path import join as pjoin
from typing import Optional


@dataclasses.dataclass
class MeshConfig:
    """Device-mesh layout. The reference's only parallelism is DP over gloo
    (SURVEY.md §2.6); here DP rides the ``data`` axis and the ``model`` axis
    is used for FSDP sharding when enabled.

    ``dcn_data`` > 1 builds the data axis DCN-aware for multi-slice pods
    (jax mesh_utils.create_hybrid_device_mesh): the slowest-varying blocks
    of the data axis align with slice/process granules, so the gradient
    all-reduce decomposes into fast intra-slice ICI reductions plus one
    small inter-slice DCN exchange."""

    data: int = -1  # -1: all devices
    model: int = 1
    dcn_data: int = 1  # number of DCN granules (slices/hosts) on the data axis


@dataclasses.dataclass
class ExperimentConfig:
    # identification / paths (ref: base_options.py:14-40)
    name: str = "test"
    dataset_name: str = "ntu_mul"
    checkpoints_dir: str = "./checkpoints"
    data_root: Optional[str] = None

    # task flags (ref: base_options.py:17-27)
    multi: bool = True
    cap_id: bool = False
    cap_same: bool = False
    pretrained: bool = False
    only_language: bool = False
    only_motion: bool = False
    label_path: Optional[str] = None
    save_label_dir: Optional[str] = None

    # model (ref: train_options.py:7-13)
    num_layers: int = 8
    latent_dim: int = 512
    ff_size: int = 1024
    num_heads: int = 8
    num_text_layers: int = 4
    text_latent_dim: int = 256
    text_ff_size: int = 2048
    text_num_heads: int = 4
    diffusion_steps: int = 1000
    no_clip: bool = False
    no_eff: bool = False
    no_cross_attn: bool = False
    label_model: bool = False
    dropout: float = 0.0
    # --causal / --single_transformer are parsed-but-dead in the reference
    # (base_options.py:19,21 — grep-verified unconsumed); here they are real:
    # causal masks attention to the past, single_transformer swaps the layer
    # stack for the baseline layer over the concatenated two-actor timeline
    # (ref interaction_transformer.py:618-639).
    causal: bool = False
    single_transformer: bool = False

    # optimization (ref: train_options.py:15-28)
    num_epochs: int = 50
    limit_data_num: int = -1
    lr: float = 2e-4
    batch_size: int = 32  # global batch (the reference's is per-GPU)
    times: int = 1
    feat_bias: float = 5.0
    grad_clip: float = 0.5
    is_continue: bool = False
    log_every: int = 50
    save_every_e: int = 5
    eval_every_e: int = 5
    save_latest: int = 500

    # sampling / eval (ref: evaluate_options.py)
    which_epoch: str = "latest"
    split_file: str = "test_sub.txt"
    result_path: str = "./result"
    # "ddpm" (ancestral) | "ddim" (1st-order ODE fast path) | "dpm"
    # (DPM-Solver++(2M), 2nd-order multistep — better few-step quality at
    # the same one-call-per-step cost; diffusion/solvers.py)
    sampler: str = "ddpm"
    ddim_steps: int = 50  # step count for BOTH ddim and dpm grids
    # lax.scan unroll for the sampling loops (measured +1.7% at unroll=4 on
    # v5e bf16 DDPM-1000; costs compile time)
    sampler_unroll: int = 1

    # TPU-native additions
    seed: int = 0
    # Pallas fused attention (two variants in ops/pallas_attention.py).
    # Measured on v5e at reference shapes (B=64, T=91, D=512): the fused
    # core alone is 2.8x the einsum path in isolation but loses end-to-end
    # (relayout fusion barrier: 292 f/s); fusing the QKV projections into
    # the kernel recovers parity (817 vs 831 f/s) but does not beat XLA —
    # the model is compute-roofline-bound either way. Off by default; the
    # kernels become interesting at longer T / larger d.
    use_pallas: bool = False
    # monolithic fused block kernels (ops/fused_block.py) in the denoiser.
    # 3.2x the XLA block standalone but ~6% slower inside the full sampler
    # (XLA's cross-block scan fusion wins) — off by default; inference-only
    fused_blocks: bool = False
    use_native_loader: bool = False  # C++ batch loader fast path (native/)
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    # keep LayerNorm statistics in the compute dtype instead of flax's f32
    # promotion — removes the f32 convert/copy churn around every norm in
    # bf16 graphs (~19% of the DDIM step was f32 layout copies, ROOFLINE.md).
    # Opt-in: changes numerics; five-metric eval parity evidence in NOTES.md.
    fast_ln: bool = False
    # RMSNorm instead of LayerNorm in the denoiser blocks (training-time
    # architecture choice; the text tower keeps LayerNorm for CLIP weight
    # portability). The DDIM scan body is latency-bound on ~56 serialized
    # norm reduce fusions (ROOFLINE.md); RMSNorm drops the mean subtraction
    # and bias from each. Scale-only param tree — checkpoints do not swap
    # with LayerNorm models. Requires the efficient path; no --fused_blocks.
    rms_norm: bool = False
    # classifier-free guidance (absent in the reference). cond_drop_prob > 0
    # trains with caption dropout against a learned null conditioning
    # (final text-conditioned stage only — meaningless under the PIT
    # min-assignment loss); guidance_scale != 1 samples
    # eps_uncond + w·(eps_cond − eps_uncond) at 2 denoiser calls per step
    # and requires a cond_drop_prob-trained checkpoint.
    cond_drop_prob: float = 0.0
    guidance_scale: float = 1.0
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    window_size: int = 90  # training window frames (ref: mul_dataset.py:186)
    # multi-host: call jax.distributed.initialize at CLI entry (the
    # reference's --distributed SLURM path, base_options.py:77-78)
    distributed: bool = False
    # FSDP: shard params + optimizer state on the mesh's model axis
    fsdp: bool = False
    # Tensor parallelism: Megatron-style column/row weight sharding of the
    # attention QKV and FFN matmuls on the mesh's model axis (the GSPMD
    # partitioner inserts the collectives). Mutually exclusive with fsdp —
    # both consume the model axis. At reference scale (d=512) TP is capacity
    # headroom for larger variants, not a speedup; see parallel/mesh.py.
    tp: bool = False
    # Pipeline parallelism: >0 enables the GPipe schedule over the mesh's
    # model axis with this many microbatches (parallel/pipeline.py). The
    # layer stack is stage-sharded; the schedule is exact vs the sequential
    # stack and differentiable, so training under PP reproduces DP
    # loss/grads (tests/test_parallel_pp.py). Consumes the model axis —
    # mutually exclusive with fsdp/tp. Like TP, capacity headroom for
    # deeper variants; the reference has no PP (SURVEY.md §2.6).
    pp_micro: int = 0
    # capture a jax.profiler trace of training steps into save_root/profile
    profile: bool = False
    # importance-sample timesteps by recent loss second moment
    # (ref: LossSecondMomentResampler, gaussian_diffusion.py:123 — dormant there)
    loss_aware_sampler: bool = False
    # learning-rate schedule: "constant" (reference behavior) or "cosine"
    # (linear warmup over warmup_steps, cosine decay over lr_decay_steps).
    # warmup_steps also applies to "constant".
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    lr_decay_steps: int = 0
    # exponential-moving-average of the parameters, updated every step and
    # preferred by the inference tools (evaluation/serve/visualization) when
    # present. 0 disables (reference behavior: no EMA, SURVEY.md §6);
    # typical 0.9999.
    ema_decay: float = 0.0
    # split each batch into N microbatches, accumulate grads under lax.scan,
    # apply one averaged update — large effective batches (the reference's
    # B=160/GPU, codes/README.md:71-79) at one microbatch's activation
    # memory. batch_size must divide evenly.
    grad_accum: int = 1

    # dataset-derived (filled by add_dataset_paths; ref get_opt.py:63-94)
    joints_num: int = 22
    dim_pose: int = 263
    max_motion_length: int = 196
    is_train: bool = True

    # --- derived paths -----------------------------------------------------
    @property
    def save_root(self) -> str:
        return pjoin(self.checkpoints_dir, self.dataset_name, self.name)

    @property
    def model_dir(self) -> str:
        return pjoin(self.save_root, "model")

    @property
    def meta_dir(self) -> str:
        return pjoin(self.save_root, "meta")

    @property
    def motion_dir(self) -> str:
        return pjoin(self.data_root, "new_joint_vecs")

    @property
    def text_dir(self) -> str:
        return pjoin(self.data_root, "texts")


_DATASET_PRESETS = {
    # (ref: get_opt.py:67-94)
    "t2m": dict(data_root="./data/HumanML3D", joints_num=22, dim_pose=263,
                max_motion_length=196, multi=False),
    "kit": dict(data_root="./data/KIT-ML", joints_num=21, dim_pose=251,
                max_motion_length=196, multi=False),
    "ntu_mul": dict(data_root="./data/NTURGBD_multi", joints_num=22, dim_pose=263,
                    max_motion_length=196, multi=True),
    "synthetic_mul": dict(data_root="./data/synthetic_mul", joints_num=22, dim_pose=263,
                          max_motion_length=196, multi=True),
}


def add_dataset_paths(cfg: ExperimentConfig) -> ExperimentConfig:
    preset = _DATASET_PRESETS.get(cfg.dataset_name)
    if preset is None:
        raise KeyError(f"Dataset not recognized: {cfg.dataset_name}")
    for k, v in preset.items():
        if k == "data_root" and cfg.data_root:
            continue
        setattr(cfg, k, v)
    return cfg


# --------------------------------------------------------------------------
# opt.txt round-trip (reference format: base_options.py:86-95, get_opt.py)
# --------------------------------------------------------------------------

_HEADER = "------------ Options -------------"
_FOOTER = "-------------- End ----------------"


def _flatten(cfg: ExperimentConfig) -> dict:
    d = dataclasses.asdict(cfg)
    mesh = d.pop("mesh")
    d["mesh_data"] = mesh["data"]
    d["mesh_model"] = mesh["model"]
    d["mesh_dcn_data"] = mesh["dcn_data"]
    return d


def save_opt_txt(cfg: ExperimentConfig, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(_HEADER + "\n")
        for k, v in sorted(_flatten(cfg).items()):
            f.write(f"{k}: {v}\n")
        f.write(_FOOTER + "\n")


def load_opt_txt(path: str, **overrides) -> ExperimentConfig:
    fields = {f.name: f for f in dataclasses.fields(ExperimentConfig)}
    raw: dict = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line in (_HEADER, _FOOTER):
                continue
            key, _, value = line.partition(": ")
            raw[key] = value
    mesh = MeshConfig(
        data=int(raw.pop("mesh_data", -1)), model=int(raw.pop("mesh_model", 1)),
        dcn_data=int(raw.pop("mesh_dcn_data", 1)),
    )
    kwargs = {}
    for key, value in raw.items():
        if key not in fields:
            continue  # tolerate reference opt.txt extras
        ftype = fields[key].type
        if value == "None":
            kwargs[key] = None
        elif ftype in ("bool", bool):
            kwargs[key] = value == "True"
        elif ftype in ("int", int):
            kwargs[key] = int(float(value))
        elif ftype in ("float", float):
            kwargs[key] = float(value)
        else:
            kwargs[key] = value
    kwargs["mesh"] = mesh
    kwargs.update(overrides)
    return add_dataset_paths(ExperimentConfig(**kwargs))


# --------------------------------------------------------------------------
# argparse bridge for the tools/ CLIs
# --------------------------------------------------------------------------


def add_config_args(parser: argparse.ArgumentParser) -> None:
    """Expose every ExperimentConfig field as a --flag (bools as
    --flag/--no-flag pairs), mirroring the reference CLI surface."""
    for f in dataclasses.fields(ExperimentConfig):
        if f.name == "mesh":
            parser.add_argument("--mesh_data", type=int, default=-1)
            parser.add_argument("--mesh_model", type=int, default=1)
            parser.add_argument("--mesh_dcn_data", type=int, default=1)
            continue
        default = f.default if f.default is not dataclasses.MISSING else None
        if f.type in ("bool", bool):
            parser.add_argument(
                f"--{f.name}", action=argparse.BooleanOptionalAction, default=default
            )
        elif f.type in ("int", int):
            parser.add_argument(f"--{f.name}", type=int, default=default)
        elif f.type in ("float", float):
            parser.add_argument(f"--{f.name}", type=float, default=default)
        else:
            parser.add_argument(f"--{f.name}", type=str, default=default)


def config_from_args(args: argparse.Namespace, is_train: bool = True) -> ExperimentConfig:
    kwargs = {
        f.name: getattr(args, f.name)
        for f in dataclasses.fields(ExperimentConfig)
        if f.name != "mesh" and hasattr(args, f.name)
    }
    kwargs["mesh"] = MeshConfig(data=args.mesh_data, model=args.mesh_model,
                                dcn_data=getattr(args, "mesh_dcn_data", 1))
    kwargs["is_train"] = is_train
    return add_dataset_paths(ExperimentConfig(**kwargs))
