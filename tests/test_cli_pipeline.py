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

    def test_visualization(self, world, monkeypatch, tmp_path):
        monkeypatch.chdir(str(tmp_path))
        run_tool("visualization", [
            "--opt_path", os.path.join(world["ckpt"], "synthetic_mul", "interaction", "opt.txt"),
            "--class_id", "2", "--motion_length", "24",
            "--result_path", str(tmp_path / "viz"), "--no-gif",
        ])
        files = os.listdir(str(tmp_path / "viz"))
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
