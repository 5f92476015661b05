"""The vendored NTU split/annotation files + the real-format discovery path.

The reference carries the NTU RGB+D split lists and the 255 human role
annotations in-repo (codes/data/NTURGBD_multi/); we vendor the same data
files under data/NTURGBD_multi/ (VERDICT r2 next #2). These tests pin their
integrity and prove that stage 1-2 role discovery (tools/label_data.py's
path: PairDataset(ann_split, label_path=test_active_anns.json) →
labeling.discover_roles) consumes the REAL annotation format — synthetic
features keyed to real clip names — so the pipeline is one command away the
moment real feature files land.
"""

import json
import os
import re
from os.path import join as pjoin

import numpy as np
import pytest

from hig_tpu.data.vocab import NTU_ACTION_MULTI, NUM_CLASSES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NTU_DIR = pjoin(REPO, "data", "NTURGBD_multi")

# e.g. S010C002P025R002A050_rgb → setup 10, camera 2, performer 25, rep 2,
# action 50 (NTU RGB+D naming convention)
NAME_RE = re.compile(r"^S(\d{3})C(\d{3})P(\d{3})R(\d{3})A(\d{3})_rgb$")


def read_ids(fname):
    with open(pjoin(NTU_DIR, fname)) as f:
        return [l.strip() for l in f if l.strip()]


class TestVendoredFiles:
    def test_split_sizes(self):
        assert len(read_ids("train_sub.txt")) == 14669
        assert len(read_ids("val_sub.txt")) == 2651
        assert len(read_ids("test_sub.txt")) == 3259
        assert len(read_ids("test_ann_ids.txt")) == 255

    def test_all_names_are_mutual_actions(self):
        for fname in ("train_sub.txt", "val_sub.txt", "test_sub.txt",
                      "test_ann_ids.txt"):
            for name in read_ids(fname):
                m = NAME_RE.match(name)
                assert m, f"{fname}: unparseable clip name {name!r}"
                action = int(m.group(5))
                assert action in NTU_ACTION_MULTI, (
                    f"{fname}: {name} is not a mutual-action clip"
                )

    def test_annotations_cover_the_annotated_split(self):
        with open(pjoin(NTU_DIR, "test_active_anns.json")) as f:
            anns = json.load(f)
        ann_ids = set(read_ids("test_ann_ids.txt"))
        assert set(anns) == ann_ids  # exactly the annotated split
        assert set(anns.values()) <= {0, 1}

    def test_splits_are_disjoint(self):
        train = set(read_ids("train_sub.txt"))
        val = set(read_ids("val_sub.txt"))
        test = set(read_ids("test_sub.txt"))
        assert not (train & val) and not (train & test) and not (val & test)
        assert set(read_ids("test_ann_ids.txt")) <= test


@pytest.fixture(scope="module")
def real_name_root(tmp_path_factory):
    """A data_root with synthetic features keyed to REAL annotated clip
    names, plus the vendored annotation files — the exact on-disk layout
    tools/label_data.py discovery expects once real features land."""
    root = tmp_path_factory.mktemp("ntu_real_names") / "data"
    os.makedirs(root / "new_joint_vecs")
    os.makedirs(root / "texts")

    with open(pjoin(NTU_DIR, "test_active_anns.json")) as f:
        anns = json.load(f)
    # A few clips per asymmetric class + any symmetric ones encountered,
    # keeping the fixture small (the full annotated split is 255 clips).
    per_class: dict[int, list[str]] = {}
    for name in read_ids("test_ann_ids.txt"):
        action = int(NAME_RE.match(name).group(5))
        per_class.setdefault(action, []).append(name)
    chosen = [n for names in per_class.values() for n in names[:2]]

    rng = np.random.RandomState(0)
    T = 30
    for name in chosen:
        action = int(NAME_RE.match(name).group(5))
        caps = NTU_ACTION_MULTI[action]
        cap1, cap2 = (caps[0], caps[1]) if len(caps) == 2 else (caps[0], caps[0])
        # (2, T+1, 263): T frames + trailing init row, the reference layout
        clip = (0.1 * rng.randn(2, T + 1, 263)).astype(np.float32)
        np.save(root / "new_joint_vecs" / f"{name}.npy", clip)
        (root / "texts" / f"{name}.txt").write_text(f"{cap1}_{cap2}#none#0.0#0.0\n")
    (root / "test_ann_ids.txt").write_text("\n".join(chosen) + "\n")
    # the REAL human annotations, verbatim
    import shutil

    shutil.copy(pjoin(NTU_DIR, "test_active_anns.json"),
                root / "test_active_anns.json")
    mean = np.zeros(267, np.float32)
    std = np.ones(267, np.float32)
    np.save(root / "Mean.npy", mean)
    np.save(root / "Std.npy", std)
    return str(root), chosen, anns


class TestRealFormatDiscovery:
    def test_dataset_swaps_per_real_annotation(self, real_name_root):
        """PairDataset built the way label_data.py builds the annotated
        dataset (label_path=test_active_anns.json) must orient actor 0 to
        the annotated active role: annotation==1 → actors swapped."""
        from hig_tpu.config import ExperimentConfig, add_dataset_paths
        from hig_tpu.data.dataset import PairDataset

        root, chosen, anns = real_name_root
        cfg = add_dataset_paths(ExperimentConfig(
            name="anns", dataset_name="ntu_mul", data_root=root,
        ))
        cfg.data_root = root
        mean, std = np.load(pjoin(root, "Mean.npy")), np.load(pjoin(root, "Std.npy"))
        ds = PairDataset(cfg, mean, std, "test_ann_ids.txt",
                         label_path=pjoin(root, "test_active_anns.json"))
        assert ds.real_len() == len(chosen)
        swapped = {}
        for i in range(ds.real_len()):
            s = ds[i]
            swapped[s["name"]] = s["swapped"]
        for name in chosen:
            assert swapped[name] == bool(anns[name]), name

    def test_discovery_consumes_real_annotations(self, real_name_root):
        """labeling.discover_roles over the real-named, really-annotated
        dataset produces a reference-format pit_labels dict (26 classes,
        17 asymmetric with distinct active/passive caption keys)."""
        from hig_tpu.config import ExperimentConfig, add_dataset_paths
        from hig_tpu.data.dataset import PairDataset, epoch_batches
        from hig_tpu.models.text_encoder import ClipTextConfig
        from hig_tpu.train import labeling
        from hig_tpu.train.trainer import Trainer

        root, chosen, _ = real_name_root
        cfg = add_dataset_paths(ExperimentConfig(
            name="anns", dataset_name="ntu_mul", data_root=root,
            checkpoints_dir=pjoin(os.path.dirname(root), "ckpt"),
            num_layers=2, latent_dim=32, ff_size=64, num_heads=4,
            num_text_layers=1, text_latent_dim=16, text_ff_size=32,
            text_num_heads=2, batch_size=8, window_size=24,
        ))
        cfg.data_root = root
        mean, std = np.load(pjoin(root, "Mean.npy")), np.load(pjoin(root, "Std.npy"))
        trainer = Trainer(cfg, clip_config=ClipTextConfig(width=32, heads=4, layers=2))
        state = trainer.init_state()
        scorer = labeling.make_assignment_scorer(trainer.model, trainer.sched)
        annotated = PairDataset(cfg, mean, std, "test_ann_ids.txt",
                                label_path=pjoin(root, "test_active_anns.json"))
        roles = labeling.discover_roles(
            scorer, state.params, annotated, batch_size=8,
            epoch_batches=epoch_batches,
        )
        assert len(roles) == NUM_CLASSES
        asym = {c: r for c, r in roles.items() if "active_index" in r}
        assert len(asym) == 17
        for r in asym.values():
            assert r["active_index"] != r["passive_index"]
        # reference pit_labels.json format: category + caption-key indices
        for r in roles.values():
            assert "category" in r
