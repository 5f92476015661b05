"""Inventory external assets and run every parity check they unlock.

Round-3+ readiness probe (VERDICT r1 next #10): this environment is
air-gapped, so the CLIP BPE vocab, OpenAI CLIP weights, real NTU feature
files, reference checkpoints, SMPL_NEUTRAL.pkl, the GMM pose prior, and
GloVe vectors may be absent. This tool reports exactly which of them are
present (searching the conventional locations) and immediately runs the
gated verification each asset enables, so parity can be quantified the
moment anything lands.

Usage:
  python tools/check_assets.py [--assets_dir assets] [--data_root ...]
"""

import argparse
import os
import sys
from os.path import exists, join as pjoin

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _find(paths):
    for p in paths:
        if p and exists(p):
            return p
    return None


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--assets_dir", type=str, default="assets")
    parser.add_argument("--data_root", type=str, default="data/NTURGBD_multi")
    parser.add_argument("--reference_ckpt", type=str,
                        default="checkpoints/ntu_mul/ntu_mul_interaction/model/latest.tar")
    args = parser.parse_args()
    A = args.assets_dir

    report: list[tuple[str, str | None, str]] = []  # (asset, path, verification result)

    # ---- CLIP BPE vocabulary -------------------------------------------------
    bpe = _find([
        os.environ.get("HIG_TPU_BPE_PATH"),
        pjoin(A, "bpe_simple_vocab_16e6.txt.gz"),
    ])
    if bpe:
        os.environ["HIG_TPU_BPE_PATH"] = bpe
        from hig_tpu.models import tokenizer as T

        T.default_tokenizer.cache_clear()
        tok = T.default_tokenizer()
        status = "ERROR: hash fallback selected despite asset"
        if isinstance(tok, T.ClipBPETokenizer):
            from hig_tpu.data.vocab import CAPS

            ids = T.tokenize(CAPS)
            n_tok = [int((row > 0).sum()) for row in ids]
            ok = all(3 <= n <= 30 for n in n_tok) and all(
                row[0] == T.SOT and T.EOT in row for row in ids
            )
            status = (f"BPE active; 43 NTU captions tokenize to "
                      f"{min(n_tok)}-{max(n_tok)} ids ({'ok' if ok else 'SUSPECT'})")
    else:
        status = "hash-tokenizer fallback in use"
    report.append(("CLIP BPE vocab", bpe, status))

    # ---- CLIP ViT-B/32 weights ----------------------------------------------
    clip_w = _find([
        pjoin(A, "ViT-B-32.pt"),
        pjoin(A, "clip_vit_b32.pt"),
        os.path.expanduser("~/.cache/clip/ViT-B-32.pt"),
    ])
    if clip_w:
        try:
            from hig_tpu.train import torch_port as tp

            sd = tp.load_torch_state_dict(clip_w)
            sd = {f"clip.{k}": v for k, v in sd.items()}
            converted = tp.convert_clip_text_tower(sd, layers=12)
            import jax.numpy as jnp
            import numpy as np

            from hig_tpu.models.text_encoder import ClipTextTower

            tower = ClipTextTower()
            from hig_tpu.models.tokenizer import tokenize

            toks = jnp.asarray(tokenize("a person is pushing the other person"))
            out = tower.apply({"params": converted}, toks)
            status = (f"converted 12-layer tower; features finite="
                      f"{bool(np.isfinite(np.asarray(out)).all())}, "
                      f"norm={float(np.linalg.norm(np.asarray(out))):.2f}")
        except Exception as e:  # noqa: BLE001 — report, don't crash the inventory
            status = f"conversion FAILED: {e}"
    else:
        status = "tower runs randomly initialized"
    report.append(("CLIP ViT-B/32 weights", clip_w, status))

    # ---- NTU split/annotation files (vendored, VERDICT r2 next #2) -----------
    split_files = ["train_sub.txt", "val_sub.txt", "test_sub.txt",
                   "test_ann_ids.txt", "test_active_anns.json"]
    have = [f for f in split_files if exists(pjoin(args.data_root, f))]
    splits = args.data_root if len(have) == len(split_files) else None
    if splits:
        import json as _json

        counts = {f: len([l for l in open(pjoin(splits, f)) if l.strip()])
                  for f in split_files[:4]}
        anns = _json.load(open(pjoin(splits, "test_active_anns.json")))
        ann_ids = {l.strip() for l in open(pjoin(splits, "test_ann_ids.txt"))
                   if l.strip()}
        covered = sum(k in ann_ids for k in anns)
        status = (f"train/val/test = {counts['train_sub.txt']}/"
                  f"{counts['val_sub.txt']}/{counts['test_sub.txt']} ids; "
                  f"{len(anns)} role annotations ({covered} on the "
                  f"{len(ann_ids)}-id annotated split)")
    else:
        status = f"INCOMPLETE: have {len(have)}/{len(split_files)} files"
    report.append(("NTU split/annotation files", splits, status))

    # ---- NTU feature files ----------------------------------------------------
    vec_dir = pjoin(args.data_root, "new_joint_vecs")
    ntu = args.data_root if exists(vec_dir) and os.listdir(vec_dir) else None
    if ntu:
        n_vec = len(os.listdir(vec_dir))
        has_stats = exists(pjoin(ntu, "Mean.npy")) and exists(pjoin(ntu, "Std.npy"))
        status = f"{n_vec} feature files, Mean/Std={'yes' if has_stats else 'MISSING'}"
        import numpy as np

        name = open(pjoin(ntu, "train_sub.txt")).read().split()[0]
        p = pjoin(vec_dir, f"{name}.npy")
        if exists(p):
            arr = np.load(p)
            ok = arr.ndim == 3 and arr.shape[0] == 2 and arr.shape[2] == 263
            status += f"; first clip shape {arr.shape} ({'ok' if ok else 'WRONG'})"
    else:
        status = "absent (synthetic data only)"
    report.append(("NTU mutual features", ntu, status))

    # ---- reference generator checkpoint ---------------------------------------
    ref_ckpt = _find([args.reference_ckpt, pjoin(A, "latest.tar")])
    if ref_ckpt:
        try:
            from hig_tpu.train import torch_port as tp

            sd = tp.load_torch_state_dict(ref_ckpt)
            n_dec = len([k for k in sd if k.startswith("temporal_decoder_blocks.")])
            status = (f"{len(sd)} tensors, {n_dec} decoder-block entries — run "
                      f"tools/parity_smoke.py for an end-to-end diff")
        except Exception as e:  # noqa: BLE001
            status = f"load FAILED: {e}"
    else:
        status = "absent"
    report.append(("reference checkpoint (.tar)", ref_ckpt, status))

    # ---- SMPL assets -----------------------------------------------------------
    smpl = _find([pjoin(A, "SMPL_NEUTRAL.pkl"), "smpl_models/SMPL_NEUTRAL.pkl"])
    if smpl:
        try:
            from hig_tpu.smpl.lbs import load_smpl_model

            m = load_smpl_model(smpl)
            status = f"loads; {m.v_template.shape[0]} vertices"
        except Exception as e:  # noqa: BLE001
            status = f"load FAILED: {e}"
    else:
        status = "synthetic SMPL used in tests"
    report.append(("SMPL_NEUTRAL.pkl", smpl, status))
    gmm = _find([pjoin(A, "gmm_08.pkl"), "smpl_models/gmm_08.pkl"])
    if gmm:
        try:
            from hig_tpu.smpl.prior import load_gmm_prior

            load_gmm_prior(gmm)
            status = "GMM prior loads"
        except Exception as e:  # noqa: BLE001
            status = f"load FAILED: {e}"
    else:
        status = "uniform prior fallback"
    report.append(("GMM pose prior (gmm_08.pkl)", gmm, status))

    # ---- GloVe vectors ----------------------------------------------------------
    glove = _find([pjoin(A, "glove"), "data/glove"])
    report.append(("GloVe+POS vectors", glove,
                    "word_vectorizer uses assets" if glove else "hash fallback"))

    print(f"{'asset':34s} {'present':8s} status")
    print("-" * 100)
    missing = 0
    for name, path, status in report:
        present = "yes" if path else "no"
        missing += path is None
        print(f"{name:34s} {present:8s} {status}")
        if path:
            print(f"{'':34s} {'':8s} @ {path}")
    print("-" * 100)
    print(f"{len(report) - missing}/{len(report)} assets present")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
