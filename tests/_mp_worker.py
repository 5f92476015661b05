"""Multi-process worker for tests/test_multiprocess.py.

Run as: python _mp_worker.py <process_id> <num_processes> <port> <outdir>

Each process gets 2 virtual CPU devices, joins the coordination service,
builds the global (data[, model]) mesh, feeds its own contiguous slice of a
deterministic global batch through the real PIT train step, and writes the
resulting loss (a globally-reduced, replicated scalar — it must be identical
across processes) plus sharding facts to <outdir>/proc<i>.json.

This is the fake-multi-host backend the reference lacks entirely
(SURVEY.md §4): its DDP path can only be exercised on real multi-GPU hosts.
"""

import json
import os
import sys

proc_id, nprocs, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hig_tpu.parallel import distributed as dist

dist.initialize(coordinator=f"127.0.0.1:{port}", num_processes=nprocs, process_id=proc_id)
assert jax.process_count() == nprocs

import numpy as np

from hig_tpu.config import ExperimentConfig, MeshConfig, add_dataset_paths
from hig_tpu.models.text_encoder import ClipTextConfig
from hig_tpu.parallel import mesh as pmesh
from hig_tpu.train.trainer import Trainer, make_train_step


def run_case(mode: str, dcn: int = 1) -> dict:
    """mode: dp | fsdp | tp | pp — all share the same model/init seed and
    global batch, so their globally-reduced losses must agree."""
    fsdp = mode == "fsdp"
    model2 = mode in ("fsdp", "tp", "pp")
    n_global = nprocs * 2
    cfg = add_dataset_paths(
        ExperimentConfig(
            dataset_name="synthetic_mul",
            num_layers=2, latent_dim=32, ff_size=64, num_heads=4,
            num_text_layers=1, text_latent_dim=16, text_ff_size=32,
            text_num_heads=2, diffusion_steps=50,
            batch_size=n_global * 2, window_size=8,
            mesh=MeshConfig(data=n_global // (2 if model2 else 1),
                            model=2 if model2 else 1, dcn_data=dcn),
            fsdp=fsdp, tp=mode == "tp",
            pp_micro=2 if mode == "pp" else 0,
        )
    )
    trainer = Trainer(cfg, clip_config=ClipTextConfig(width=16, heads=2, layers=1))
    state = trainer.init_state()
    tower_feats, tokens = trainer.precompute_tower(state.params)
    tower_feats, tokens = np.asarray(tower_feats), np.asarray(tokens)

    B, T, D = cfg.batch_size, cfg.window_size + 1, cfg.dim_pose
    rng = np.random.RandomState(0)  # same global batch on every process
    global_batch = {
        "motion": rng.randn(B, 2, T, D).astype(np.float32),
        "lengths": np.full((B,), T, np.int32),
        "tokens": np.stack([tokens[:2]] * B).astype(np.int32),
        "tower_feats": np.stack([tower_feats[:2]] * B).astype(np.float32),
    }
    # this process's contiguous slice (what epoch_batches would emit)
    local_bs = B // nprocs
    local = {k: v[proc_id * local_bs : (proc_id + 1) * local_bs] for k, v in global_batch.items()}

    state_sh = trainer._state_shardings(state)
    step = jax.jit(
        make_train_step(trainer.model, trainer.sched, trainer.tx, pit=True,
                        state_shardings=state_sh,
                        pp_mesh=trainer.mesh if mode == "pp" else None,
                        pp_micro=2 if mode == "pp" else 0),
    )
    dev_batch = pmesh.shard_batch(trainer.mesh, local)
    assert dev_batch["motion"].shape[0] == B, "global batch axis must be reassembled"
    new_state, metrics = step(state, dev_batch, jax.random.key(0))
    loss = float(metrics["loss_mot_rec"])

    ckpt_roundtrip = False
    if mode == "dp" and dcn == 1:
        # multi-host checkpointing: every process calls save/restore on the
        # same path; orbax coordinates via the jax.distributed service
        import jax.numpy as jnp

        from hig_tpu.train import checkpoint as ckpt

        path = os.path.join(outdir, "mp_ckpt")
        ckpt.save_state(path, new_state, epoch=1, total_it=1)
        dist.barrier("ckpt_saved")
        fresh = trainer.init_state()
        restored, ep, it = ckpt.restore_state(path, fresh)
        restored = trainer.place_state(restored)
        ref_leaf = jax.tree_util.tree_leaves(new_state.params)[0]
        got_leaf = jax.tree_util.tree_leaves(restored.params)[0]
        ckpt_roundtrip = bool(
            ep == 1 and it == 1
            and jnp.allclose(jnp.asarray(got_leaf), jnp.asarray(ref_leaf))
        )

    model_sharded_leaves = 0
    if mode in ("fsdp", "tp"):
        for leaf in jax.tree_util.tree_leaves(new_state.params):
            spec = getattr(leaf.sharding, "spec", None)
            if spec and pmesh.MODEL_AXIS in [s for s in spec if s]:
                model_sharded_leaves += 1
    return {
        "loss": loss,
        "global_devices": len(jax.devices()),
        "global_batch": int(dev_batch["motion"].shape[0]),
        "model_sharded_leaves": model_sharded_leaves,
        "ckpt_roundtrip": ckpt_roundtrip,
    }


out = {
    "dp": run_case("dp"),
    "fsdp": run_case("fsdp"),
    # tensor- and pipeline-parallel train steps across OS processes: the
    # model axis spans BOTH processes, so TP's psums and PP's ppermute hops
    # ride the (simulated) cross-host fabric
    "tp": run_case("tp"),
    "pp": run_case("pp"),
    # DCN-aware hybrid mesh: processes act as the DCN granules
    # (multi-slice pods use device.slice_index instead)
    "hybrid_dcn": run_case("dp", dcn=nprocs),
}
with open(os.path.join(outdir, f"proc{proc_id}.json"), "w") as f:
    json.dump(out, f)
print(f"[{proc_id}] done: {out}", flush=True)
