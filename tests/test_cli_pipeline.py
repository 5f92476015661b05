"""CLI-level pipeline test: the full three-stage protocol through tools/*.

Everything tiny (1 clip/class, 2-layer d=32 models, 40-step diffusion) so
the whole chain runs in a few minutes on the CPU mesh. This guards the
tool layer itself — argument plumbing, opt.txt round-trips, checkpoint
paths — not model quality.
"""

import json
import os
import runpy
import sys

import numpy as np
import pytest


TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
SMALL = [
    "--num_layers", "2", "--latent_dim", "32", "--ff_size", "64",
    "--num_heads", "4", "--num_text_layers", "1", "--text_latent_dim", "16",
    "--text_ff_size", "32", "--text_num_heads", "2", "--diffusion_steps", "40",
    "--batch_size", "8", "--window_size", "24",  # divisible by the 8-device mesh
]


def run_tool(name, argv):
    sys.path.insert(0, TOOLS)
    old = sys.argv
    sys.argv = [name + ".py"] + argv
    try:
        runpy.run_path(os.path.join(TOOLS, name + ".py"), run_name="__main__")
    finally:
        sys.argv = old
        sys.path.remove(TOOLS)


@pytest.fixture(scope="module")
def world(tmp_path_factory, synth_root):
    root = tmp_path_factory.mktemp("cli")
    return dict(data=synth_root, ckpt=str(root / "ckpt"), out=str(root / "out"))


class TestCLIPipeline:
    def test_stage11_pit_training(self, world):
        run_tool("train", [
            "--name", "pit", "--dataset_name", "synthetic_mul",
            "--data_root", world["data"], "--checkpoints_dir", world["ckpt"],
            "--cap_id", *SMALL, "--times", "1", "--num_epochs", "1",
            "--log_every", "2", "--save_latest", "100",
        ])
        assert os.path.exists(os.path.join(world["ckpt"], "synthetic_mul", "pit", "opt.txt"))
        assert os.path.isdir(os.path.join(world["ckpt"], "synthetic_mul", "pit", "model", "latest"))

    def test_stage12_labeling(self, world):
        anns = {n: i % 2 for i, n in enumerate(
            open(os.path.join(world["data"], "val_sub.txt")).read().split())}
        ann_path = os.path.join(world["data"], "test_active_anns.json")
        json.dump(anns, open(ann_path, "w"))
        run_tool("label_data", [
            "--opt_path", os.path.join(world["ckpt"], "synthetic_mul", "pit", "opt.txt"),
            "--label_model", "--save_label", "--ann_split", "val_sub.txt",
            "--batch_size", "8",
        ])
        labels = json.load(open(os.path.join(world["data"], "pseudo_labels.json")))
        assert len(labels) > 10 and set(labels.values()) <= {0, 1}

    def test_stage13_supervised_training(self, world):
        run_tool("train", [
            "--name", "interaction", "--dataset_name", "synthetic_mul",
            "--data_root", world["data"], "--checkpoints_dir", world["ckpt"],
            "--label_path", os.path.join(world["data"], "pseudo_labels.json"),
            *SMALL, "--times", "1", "--num_epochs", "1", "--log_every", "2",
        ])
        assert os.path.isdir(
            os.path.join(world["ckpt"], "synthetic_mul", "interaction", "model", "latest")
        )

    def test_stage2_eval_models(self, world):
        run_tool("train_evaluation_model", [
            "--name", "eval_model", "--dataset_name", "synthetic_mul",
            "--data_root", world["data"], "--checkpoints_dir", world["ckpt"],
            *SMALL, "--num_epochs", "2",
        ])
        run_tool("train_consistency_evaluation_model", [
            "--name", "consistency_eval_model", "--dataset_name", "synthetic_mul",
            "--data_root", world["data"], "--checkpoints_dir", world["ckpt"],
            *SMALL, "--num_epochs", "2",
        ])
        for name in ("eval_model", "consistency_eval_model"):
            assert os.path.isdir(
                os.path.join(world["ckpt"], "synthetic_mul", name, "model", "best_eval_model")
            )

    def test_stage3_evaluation(self, world, monkeypatch):
        monkeypatch.chdir(os.path.dirname(world["ckpt"]))
        run_tool("evaluation", [
            "--opt_path", os.path.join(world["ckpt"], "synthetic_mul", "interaction", "opt.txt"),
            "--eval_model_dir", os.path.join(world["ckpt"], "synthetic_mul", "eval_model", "model"),
            "--consistency_model_dir",
            os.path.join(world["ckpt"], "synthetic_mul", "consistency_eval_model", "model"),
            "--sampler", "ddim", "--gen_T", "41",
        ])
        log_dir = os.path.join(
            os.path.dirname(world["ckpt"]), "result", "interaction", "latest"
        )
        summary = json.load(open(os.path.join(log_dir, "summary0.json")))
        for metric in ("Acc", "FID", "Consistency", "Diversity", "MultiModality"):
            assert metric in summary
            assert np.isfinite(summary[metric]["text2motion"][0])

    def test_distillation_stage_and_eval(self, world, monkeypatch):
        """tools/distill.py: one progressive-distillation stage (DDIM-10 on
        the 40-step tiny teacher) writes a standalone experiment dir that the
        standard evaluation harness consumes as-is."""
        monkeypatch.chdir(os.path.dirname(world["ckpt"]))
        run_tool("distill", [
            "--opt_path", os.path.join(world["ckpt"], "synthetic_mul", "interaction", "opt.txt"),
            "--stages", "10", "--epochs_per_stage", "1", "--log_every", "2",
        ])
        stage_dir = os.path.join(world["ckpt"], "synthetic_mul", "interaction_distill10")
        assert os.path.isdir(os.path.join(stage_dir, "model", "latest"))
        assert os.path.exists(os.path.join(stage_dir, "meta", "mean.npy"))
        opt = open(os.path.join(stage_dir, "opt.txt")).read()
        assert "sampler: ddim" in opt and "ddim_steps: 10" in opt
        run_tool("evaluation", [
            "--opt_path", os.path.join(stage_dir, "opt.txt"),
            "--eval_model_dir", os.path.join(world["ckpt"], "synthetic_mul", "eval_model", "model"),
            "--consistency_model_dir",
            os.path.join(world["ckpt"], "synthetic_mul", "consistency_eval_model", "model"),
            "--gen_T", "41", "--file_id", "d10",
        ])
        log_dir = os.path.join(
            os.path.dirname(world["ckpt"]), "result", "interaction_distill10", "latest"
        )
        summary = json.load(open(os.path.join(log_dir, "summaryd10.json")))
        assert np.isfinite(summary["FID"]["text2motion"][0])

    def test_visualization(self, world, monkeypatch, tmp_path):
        monkeypatch.chdir(str(tmp_path))
        run_tool("visualization", [
            "--opt_path", os.path.join(world["ckpt"], "synthetic_mul", "interaction", "opt.txt"),
            "--class_id", "2", "--motion_length", "24",
            "--result_path", str(tmp_path / "viz"), "--no-gif",
        ])
        files = os.listdir(str(tmp_path / "viz"))
        assert any(f.endswith(".npy") for f in files)

    def test_visualization_cap_id_model(self, world, monkeypatch, tmp_path):
        """Sampling from the --cap_id (PIT) checkpoint conditions on caption
        keys, not BPE tokens (found by an end-to-end drive in round 3: the
        token path fed (1,2,77) into a class-embedding conditioner)."""
        monkeypatch.chdir(str(tmp_path))
        run_tool("visualization", [
            "--opt_path", os.path.join(world["ckpt"], "synthetic_mul", "pit", "opt.txt"),
            "--class_id", "2", "--motion_length", "24",
            "--result_path", str(tmp_path / "viz_pit"), "--no-gif",
        ])
        files = os.listdir(str(tmp_path / "viz_pit"))
        assert any(f.endswith(".npy") for f in files)

    def test_eval_model_testers(self, world, monkeypatch, tmp_path):
        monkeypatch.chdir(str(tmp_path))
        run_tool("test_evaluation_model", [
            "--opt_path", os.path.join(world["ckpt"], "synthetic_mul", "eval_model", "opt.txt"),
            "--split_file", "test_sub.txt",
        ])
        run_tool("test_consistency_evaluation_model", [
            "--opt_path",
            os.path.join(world["ckpt"], "synthetic_mul", "consistency_eval_model", "opt.txt"),
            "--split_file", "test_sub.txt",
        ])

    def test_serve(self, world, tmp_path):
        reqs = [
            {"caption1": "A person is pushing the other person.",
             "caption2": "A person is pushed by the other person.",
             "length": 24, "id": "r0"},
            {"caption1": "A person is hugging the other person.",
             "caption2": "A person is hugging the other person.", "id": "r1"},
        ]
        req_path = str(tmp_path / "reqs.jsonl")
        with open(req_path, "w") as f:
            for r in reqs:
                f.write(json.dumps(r) + "\n")
        out_dir = str(tmp_path / "serve")
        run_tool("serve", [
            "--opt_path", os.path.join(world["ckpt"], "synthetic_mul", "interaction", "opt.txt"),
            "--requests", req_path, "--out_dir", out_dir,
            "--batch_size", "8", "--motion_length", "24", "--sampler", "ddim",
        ])
        index = json.load(open(os.path.join(out_dir, "index.json")))
        assert len(index) == 2
        data = np.load(index[0]["path"])
        assert data["joints"].shape == (2, 24, 22, 3)
        assert np.isfinite(data["joints"]).all()

    def test_serve_tp(self, world, tmp_path):
        """`serve.py --tp` serves with Megatron-sharded weights on a 4x2
        mesh (numeric sampler parity is pinned in tests/test_parallel_tp.py;
        this drives the CLI wiring: mesh override + TP placement)."""
        reqs = [{"caption1": "A person is pushing the other person.",
                 "caption2": "A person is pushed by the other person.",
                 "length": 24, "id": "r0"}]
        req_path = str(tmp_path / "reqs.jsonl")
        with open(req_path, "w") as f:
            for r in reqs:
                f.write(json.dumps(r) + "\n")
        out_dir = str(tmp_path / "serve_tp")
        run_tool("serve", [
            "--opt_path", os.path.join(world["ckpt"], "synthetic_mul", "interaction", "opt.txt"),
            "--requests", req_path, "--out_dir", out_dir,
            "--batch_size", "8", "--motion_length", "24", "--sampler", "ddim",
            "--tp", "--mesh_model", "2",
        ])
        index = json.load(open(os.path.join(out_dir, "index.json")))
        data = np.load(index[0]["path"])
        assert data["joints"].shape == (2, 24, 22, 3)
        assert np.isfinite(data["joints"]).all()

    def test_render_smpl_synthetic(self, world, tmp_path):
        joints = np.random.randn(2, 3, 22, 3).astype(np.float32) * 0.1
        npy = str(tmp_path / "motion.npy")
        np.save(npy, joints)
        run_tool("render_smpl", [
            "--file_name", npy, "--save_dir", str(tmp_path / "smpl"),
            "--num_smplify_iters", "3", "--gmm", "/nonexistent",
            "--mean_params", "/nonexistent",
        ])
        out = np.load(str(tmp_path / "smpl" / "motion_params.npz"))
        assert out["pose"].shape == (6, 72)
        assert np.isfinite(out["pose"]).all()


class TestSinglePersonKITPipeline:
    """KIT-ML single-person donor training end-to-end through the CLI
    (VERDICT r1 next #9): f_tag/to_tag caption segmenting, dim 251 /
    21 joints, train_single.py → checkpoint → single-person sampling."""

    @pytest.fixture(scope="class")
    def kit_root(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("kit") / "KIT-ML"
        (root / "new_joint_vecs").mkdir(parents=True)
        (root / "texts").mkdir()
        rng = np.random.RandomState(0)
        names = []
        for i in range(8):
            name = f"{i:05d}"
            T = 40 + 8 * i
            # (T, 251) frames + trailing 3-channel init row convention
            np.save(root / "new_joint_vecs" / f"{name}.npy",
                    (0.1 * rng.randn(T + 1, 251)).astype(np.float32))
            lines = ["a person walks forward#walk/VERB#0.0#0.0"]
            if i % 2 == 0:  # segment captions (ref dataset.py:46-73)
                lines.append(f"a person turns around#turn/VERB#0.5#{0.5 + T / 40:.1f}")
            (root / "texts" / f"{name}.txt").write_text("\n".join(lines) + "\n")
            names.append(name)
        (root / "train.txt").write_text("\n".join(names))
        np.save(root / "Mean.npy", np.zeros(254, np.float32))
        np.save(root / "Std.npy", np.ones(254, np.float32))
        return str(root)

    def test_segments_become_clips(self, kit_root):
        from hig_tpu.config import ExperimentConfig, add_dataset_paths
        from hig_tpu.data.dataset import SingleMotionDataset

        cfg = add_dataset_paths(ExperimentConfig(dataset_name="kit"))
        cfg.data_root = kit_root
        mean = np.zeros(254, np.float32)
        std = np.ones(254, np.float32)
        ds = SingleMotionDataset(cfg, mean, std, "train.txt")
        # 8 whole clips + segment pseudo-clips from the even-indexed ones
        assert ds.real_len() > 8
        seg_names = [c.name for c in ds.clips if c.name.startswith("S")]
        assert seg_names, "segment pseudo-clips missing"
        seg = next(c for c in ds.clips if c.name.startswith("S"))
        assert seg.texts == ["a person turns around"]
        s = ds[0]
        assert s["motion"].shape == (61, 251)

    def test_kit_train_and_sample_cli(self, kit_root):
        ckpt_dir = os.path.join(os.path.dirname(kit_root), "ckpt")
        run_tool("train_single", [
            "--name", "kit_single", "--dataset_name", "kit",
            "--data_root", kit_root, "--checkpoints_dir", ckpt_dir,
            "--num_layers", "2", "--latent_dim", "32", "--ff_size", "64",
            "--num_heads", "4", "--num_text_layers", "1",
            "--text_latent_dim", "16", "--text_ff_size", "32",
            "--text_num_heads", "2", "--diffusion_steps", "40",
            "--batch_size", "8", "--window", "24",
            "--times", "1", "--num_epochs", "1", "--log_every", "1",
            "--save_latest", "100",
        ])
        opt_path = os.path.join(ckpt_dir, "kit", "kit_single", "opt.txt")
        assert os.path.exists(opt_path)
        assert os.path.isdir(os.path.join(ckpt_dir, "kit", "kit_single",
                                          "model", "latest"))
        # single-person sampling through the visualization CLI
        out_dir = os.path.join(os.path.dirname(kit_root), "viz_out")
        run_tool("visualization", [
            "--opt_path", opt_path, "--single", "--caption1", "a person walks",
            "--motion_length", "24", "--result_path", out_dir,
            "--no-gif",
        ])
        joints = np.load(os.path.join(out_dir, "single_s0.npy"))
        assert joints.shape == (24, 21, 3)  # KIT skeleton
        assert np.isfinite(joints).all()


class TestEvaluationCaching:
    """--cache_generations / --use_cache: cached re-eval skips sampling and
    reproduces the metrics; confusion matrices render to PNG
    (VERDICT r1 next #6)."""

    def test_cached_re_eval_matches(self, world, monkeypatch):
        monkeypatch.chdir(os.path.dirname(world["ckpt"]))
        common = [
            "--opt_path", os.path.join(world["ckpt"], "synthetic_mul", "interaction", "opt.txt"),
            "--eval_model_dir", os.path.join(world["ckpt"], "synthetic_mul", "eval_model", "model"),
            "--consistency_model_dir",
            os.path.join(world["ckpt"], "synthetic_mul", "consistency_eval_model", "model"),
            "--sampler", "ddim", "--gen_T", "41",
        ]
        run_tool("evaluation", common + ["--file_id", "c1", "--cache_generations"])
        log_dir = os.path.join(
            os.path.dirname(world["ckpt"]), "result", "interaction", "latest"
        )
        cache = os.path.join(log_dir, "generationsc1_rep0.pkl")
        assert os.path.exists(cache)
        assert os.path.exists(os.path.join(log_dir, "confusion_matrixc1_rep0.png"))
        s1 = json.load(open(os.path.join(log_dir, "summaryc1.json")))

        # cached re-eval: identical metrics without re-sampling
        run_tool("evaluation", common + ["--file_id", "c1", "--use_cache"])
        s2 = json.load(open(os.path.join(log_dir, "summaryc1.json")))
        for metric in ("Acc", "FID", "Consistency", "Diversity"):
            assert s1[metric]["text2motion"] == s2[metric]["text2motion"], metric
