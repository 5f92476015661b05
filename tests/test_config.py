"""Config system tests: dataclass ↔ opt.txt round-trip, argparse bridge."""

import argparse

import pytest

from hig_tpu.config import (
    ExperimentConfig, MeshConfig, add_config_args, add_dataset_paths,
    config_from_args, load_opt_txt, save_opt_txt,
)


class TestOptTxtRoundTrip:
    def test_round_trip(self, tmp_path):
        cfg = add_dataset_paths(
            ExperimentConfig(
                name="exp1", dataset_name="ntu_mul", num_layers=4, lr=1e-3,
                cap_id=True, label_path="labels.json", times=30,
                mesh=MeshConfig(data=4, model=2), sampler="ddim", ddim_steps=25,
            )
        )
        path = str(tmp_path / "opt.txt")
        save_opt_txt(cfg, path)
        loaded = load_opt_txt(path)
        assert loaded.name == "exp1"
        assert loaded.num_layers == 4
        assert loaded.lr == pytest.approx(1e-3)
        assert loaded.cap_id is True
        assert loaded.label_path == "labels.json"
        assert loaded.mesh.data == 4 and loaded.mesh.model == 2
        assert loaded.sampler == "ddim" and loaded.ddim_steps == 25
        assert loaded.dim_pose == 263 and loaded.joints_num == 22

    def test_none_fields_round_trip(self, tmp_path):
        cfg = add_dataset_paths(ExperimentConfig(dataset_name="ntu_mul"))
        path = str(tmp_path / "opt.txt")
        save_opt_txt(cfg, path)
        loaded = load_opt_txt(path)
        assert loaded.label_path is None

    def test_tolerates_reference_extras(self, tmp_path):
        """opt.txt files written by the reference contain extra keys."""
        path = str(tmp_path / "opt.txt")
        with open(path, "w") as f:
            f.write("------------ Options -------------\n")
            f.write("name: reftrial\n")
            f.write("dataset_name: ntu_mul\n")
            f.write("decomp_name: Decomp_SP001_SM001_H512\n")  # ref-only key
            f.write("dim_att_vec: 512\n")  # ref-only key
            f.write("num_layers: 8\n")
            f.write("-------------- End ----------------\n")
        loaded = load_opt_txt(path)
        assert loaded.name == "reftrial" and loaded.num_layers == 8

    def test_dataset_presets(self):
        kit = add_dataset_paths(ExperimentConfig(dataset_name="kit"))
        assert kit.joints_num == 21 and kit.dim_pose == 251 and kit.multi is False
        with pytest.raises(KeyError):
            add_dataset_paths(ExperimentConfig(dataset_name="nope"))


class TestArgparseBridge:
    def test_args_to_config(self):
        parser = argparse.ArgumentParser()
        add_config_args(parser)
        args = parser.parse_args(
            ["--name", "x", "--dataset_name", "ntu_mul", "--cap_id",
             "--batch_size", "64", "--mesh_data", "2", "--no-no_eff"]
        )
        cfg = config_from_args(args, is_train=True)
        assert cfg.name == "x" and cfg.cap_id and cfg.batch_size == 64
        assert cfg.mesh.data == 2 and cfg.no_eff is False
        assert cfg.is_train


class TestKitCodecSpec:
    def test_kit_spec_dims(self):
        from hig_tpu.utils.motion_codec import kit_spec

        spec = kit_spec()
        assert spec.joints_num == 21
        assert spec.dim_pose == 251
