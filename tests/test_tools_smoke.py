"""Smoke coverage for tools that ship apparatus (VERDICT r4 next #4).

tools/add_cfg_branch.py — graft a tiny trained donor and pin the tool's
contract: the tree diff is EXACTLY the two null leaves, every other leaf is
bit-identical to the donor, the donor's trained EMA survives the graft
(round-4 advisor medium: init-state EMA would silently corrupt
eval_params()), and w=1 sampling of the grafted checkpoint bit-matches the
donor.

tools/layout_probe.py — CPU-backend run on a tiny model proving the A/B
harness executes end-to-end and the HLO copy-counting regex matches real
compiled HLO text (the production numbers still require the real chip).
"""

import dataclasses
import json
import os
import runpy
import sys
from os.path import join as pjoin

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
)


def run_tool(name, argv):
    sys.path.insert(0, TOOLS)
    old = sys.argv
    sys.argv = [name + ".py"] + argv
    try:
        runpy.run_path(os.path.join(TOOLS, name + ".py"), run_name="__main__")
    finally:
        sys.argv = old
        sys.path.remove(TOOLS)


class TestAddCfgBranch:
    def test_graft_tree_diff_ema_and_w1_bitmatch(self, tmp_path):
        from hig_tpu.config import ExperimentConfig, add_dataset_paths, save_opt_txt, load_opt_txt
        from hig_tpu.train import checkpoint as ckpt
        from hig_tpu.train.trainer import Trainer, TrainState, make_sampler

        cfg = add_dataset_paths(ExperimentConfig(
            name="graft_donor", dataset_name="synthetic_mul",
            data_root=str(tmp_path / "d"), checkpoints_dir=str(tmp_path / "c"),
            num_layers=2, latent_dim=32, ff_size=64, num_heads=4,
            num_text_layers=1, text_latent_dim=16, text_ff_size=32,
            text_num_heads=2, diffusion_steps=50, batch_size=4,
            window_size=24, label_path="x", ema_decay=0.999,
        ))
        trainer = Trainer(cfg)  # default (full) CLIP tower, as the tool uses
        state = trainer.init_state()
        # make params non-init and EMA differ from params, simulating a
        # trained donor — the graft must preserve BOTH trees verbatim
        perturb = lambda d: jax.tree_util.tree_map(
            lambda l: l + d if jnp.issubdtype(l.dtype, jnp.floating) else l,
            state.params,
        )
        donor_params, donor_ema = perturb(0.01), perturb(0.05)
        state = TrainState(params=donor_params, opt_state=state.opt_state,
                           step=state.step, ema_params=donor_ema)
        os.makedirs(cfg.model_dir, exist_ok=True)
        save_opt_txt(cfg, pjoin(cfg.save_root, "opt.txt"))
        ckpt.save_state(pjoin(cfg.model_dir, "latest"), state, epoch=3,
                        total_it=17)

        run_tool("add_cfg_branch", [
            "--opt_path", pjoin(cfg.save_root, "opt.txt"),
            "--name", "graft_cfg", "--cond_drop_prob", "0.2",
        ])

        cfg2 = load_opt_txt(
            pjoin(cfg.checkpoints_dir, "synthetic_mul", "graft_cfg", "opt.txt"),
            is_train=True,
        )
        assert cfg2.cond_drop_prob == pytest.approx(0.2)
        trainer2 = Trainer(cfg2)
        state2 = trainer2.init_state()
        state2, epoch, it = ckpt.restore_state(
            pjoin(cfg2.model_dir, "latest"), state2
        )
        assert (epoch, it) == (3, 17)

        def flat(tree):
            return {
                jax.tree_util.keystr(p): np.asarray(l)
                for p, l in jax.tree_util.tree_flatten_with_path(tree)[0]
            }

        fd, f2 = flat(donor_params), flat(state2.params)
        new_keys = set(f2) - set(fd)
        assert new_keys == {"['params']['null_xf_proj']",
                            "['params']['null_xf_token']"}
        assert not (set(fd) - set(f2))
        for k in fd:
            np.testing.assert_array_equal(fd[k], f2[k], err_msg=k)
        # advisor r4 medium: the donor's trained EMA (not a fresh-init EMA)
        # must land in the grafted checkpoint
        fe, f2e = flat(donor_ema), flat(state2.ema_params)
        for k in fe:
            np.testing.assert_array_equal(fe[k], f2e[k], err_msg=k)

        # w=1 sampling of the grafted checkpoint IS the donor, bit for bit
        tokens = jnp.asarray(
            np.random.default_rng(0).integers(0, 100, size=(2, 2, 77)),
            jnp.int32,
        )
        lengths = jnp.asarray([20, 25], jnp.int32)
        rng = jax.random.key(5)
        kw = dict(T=25, dim_pose=263, sampler="ddim", ddim_steps=4)
        out_donor = make_sampler(trainer.model, trainer.sched, **kw)(
            donor_params, tokens, lengths, rng
        )
        out_graft = make_sampler(trainer2.model, trainer2.sched, **kw)(
            state2.params, tokens, lengths, rng
        )
        np.testing.assert_array_equal(np.asarray(out_donor),
                                      np.asarray(out_graft))

    def test_refuses_cfg_donor(self, tmp_path):
        from hig_tpu.config import ExperimentConfig, add_dataset_paths, save_opt_txt

        cfg = add_dataset_paths(ExperimentConfig(
            name="already_cfg", dataset_name="synthetic_mul",
            data_root=str(tmp_path / "d"), checkpoints_dir=str(tmp_path / "c"),
            window_size=24, label_path="x", cond_drop_prob=0.1,
        ))
        os.makedirs(cfg.save_root, exist_ok=True)
        save_opt_txt(cfg, pjoin(cfg.save_root, "opt.txt"))
        with pytest.raises(SystemExit, match="cond_drop_prob"):
            run_tool("add_cfg_branch", [
                "--opt_path", pjoin(cfg.save_root, "opt.txt"),
                "--name", "x2",
            ])


class TestLayoutProbe:
    def test_copy_regex_matches_hlo_syntax(self):
        sys.path.insert(0, TOOLS)
        try:
            import layout_probe
        finally:
            sys.path.remove(TOOLS)
        hlo = "\n".join([
            "  %copy.1 = f32[64,2,91,512]{3,2,1,0} copy(f32[64,2,91,512]"
            "{2,3,1,0} %fusion.5)",
            "  %copy.2 = f32[64,2,91,512]{2,3,1,0} copy(f32[64,2,91,512]"
            "{3,2,1,0} %fusion.9)",
            "  %transpose.3 = bf16[91,64,2,512]{3,2,1,0} transpose(%p), "
            "dimensions={2,0,1,3}",
            "  %add.1 = f32[64]{0} add(%a, %b)",
        ])
        counts = layout_probe.count_copy_ops(hlo)
        # per-shape aggregation: the two layout assignments share one key
        assert counts == {"copy f32[64,2,91,512]": 2,
                          "transpose bf16[91,64,2,512]": 1}

    def test_tiny_cpu_smoke(self, tmp_path, capsys):
        run_tool("layout_probe",
                 ["--variant", "base", "--tiny", "--reps", "1", "--hlo"])
        line = [l for l in capsys.readouterr().out.splitlines()
                if l.startswith("{")][-1]
        out = json.loads(line)
        assert out["variant"] == "base"
        assert out["seconds_per_batch"] > 0
        hlo_path = "/tmp/layout_base.hlo"
        assert os.path.getsize(hlo_path) > 1000
        # the regex matches the real compiled-HLO dialect (CPU backends still
        # emit transpose/copy ops for a scan over attention blocks)
        assert isinstance(out["copy_ops"], dict)
