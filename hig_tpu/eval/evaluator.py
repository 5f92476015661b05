"""Evaluation harness: generate → embed → metrics with replications.

Re-implementation of the reference's evaluation stack
(codes/datasets/evaluator.py + codes/tools/evaluation.py): for every test
clip, generate a motion pair from its captions, window generated and
ground-truth pairs to the 91-token layout, embed both with the trained
MotionEncoder / consistency model, and compute Accuracy, FID, Consistency,
Diversity, and MultiModality with mean ± 1.96·σ/√n over replications.

Protocol constants follow evaluation.py:278-283: mm_num_repeats=20,
mm_num_times=15, diversity_times=300, batch_size=32.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from hig_tpu.eval import metrics as M

MM_NUM_REPEATS = 20
MM_NUM_TIMES = 15
DIVERSITY_TIMES = 300
EVAL_BATCH = 32


def window_rows(motion: np.ndarray, m_length: int, rng: np.random.Generator,
                num_frames: int = 90) -> np.ndarray:
    """Window a (2, T, D) clip whose row 0 is the init token to (2, 91, D).

    Mirrors EvaluationDataset.__getitem__ (evaluator.py:143-166): truncate to
    m_length rows, roll init last, then the standard window indexing puts it
    back at index 0.
    """
    clip = motion[:, :m_length]
    rolled = np.concatenate([clip[:, 1:], clip[:, :1]], axis=1)
    nframes = m_length - 1
    if nframes < num_frames:
        padding = (nframes - 1) * np.ones(num_frames - nframes, dtype=int)
        ix = np.concatenate(([nframes], np.arange(nframes), padding))
    else:
        shift_max = nframes - num_frames
        shift = int(rng.integers(0, shift_max if shift_max > 0 else 1))
        ix = np.concatenate(([nframes], shift + np.arange(num_frames)))
    return rolled[:, ix]


@dataclasses.dataclass
class GeneratedSet:
    """Generated eval set + multimodality groups (generated and GT)."""

    motions: list  # per test clip: dict(motion (2,Tm,D), length, class_id)
    mm_groups: dict  # class_id → list of generated dicts (≤ MM_NUM_REPEATS+1)
    gt_mm_groups: dict


def generate_test_set(
    sample_fn,
    params,
    eval_samples: list[dict],
    tokens_of,
    T_gen: int,
    rng: jax.Array,
    batch_size: int = 512,
    mm_num_repeats: int = MM_NUM_REPEATS,
) -> GeneratedSet:
    """Generate one pair per test clip (chunked ≤512 pairs per device call,
    ref mul_ddpm_trainer.py:200) and collect per-class MM subsets
    (ref evaluator.py:39-127)."""
    motions = []
    mm_groups: dict[int, list] = {}
    gt_mm_groups: dict[int, list] = {}
    mm_count: dict[int, int] = {}
    n = len(eval_samples)
    for lo in range(0, n, batch_size):
        chunk = eval_samples[lo : lo + batch_size]
        tokens = np.stack([tokens_of(s) for s in chunk])  # (b, 2, 77)
        lengths = np.asarray([s["length"] for s in chunk], np.int32)
        rng, sub = jax.random.split(rng)
        out = np.asarray(
            sample_fn(params, jnp.asarray(tokens), jnp.asarray(lengths), sub)
        )  # (b, 2, T_gen, D)
        for i, s in enumerate(chunk):
            m_length = min(int(s["length"]), T_gen)
            item = dict(
                motion=out[i], length=m_length, class_id=int(s["class_id"])
            )
            motions.append(item)
            cid = item["class_id"]
            if mm_count.get(cid, 0) <= mm_num_repeats:
                mm_count[cid] = mm_count.get(cid, 0) + 1
                mm_groups.setdefault(cid, []).append(item)
                gt_mm_groups.setdefault(cid, []).append(
                    dict(motion=s["motion"], length=min(int(s["length"]),
                                                        s["motion"].shape[1]),
                         class_id=cid)
                )
    return GeneratedSet(motions=motions, mm_groups=mm_groups, gt_mm_groups=gt_mm_groups)


def make_embedder(encoder, enc_params, consistency, cons_params):
    """Returns embed(motions (B,2,91,D), lengths) → (logits, emb, cons_logits).

    Foot-contact channels are stripped (evaluator.py:488-489). Params are
    jit arguments, not closures (closures embed them as HLO constants).
    """

    @jax.jit
    def embed(enc_p, cons_p, motion, lengths):
        x = motion[..., :-4]
        logits, emb = encoder.apply(enc_p, x, lengths)
        cons = consistency.apply(cons_p, x, lengths)
        return logits, emb, cons

    return lambda motion, lengths: embed(enc_params, cons_params, motion, lengths)


def _batched_embeddings(embed_fn, items: list[dict], rng: np.random.Generator):
    """Window each item and embed in fixed-size batches (padded)."""
    windows = np.stack([window_rows(it["motion"], it["length"], rng) for it in items])
    lengths = np.asarray([min(it["length"], 91) for it in items], np.int32)
    logits_all, emb_all, cons_all = [], [], []
    n = len(items)
    for lo in range(0, n, EVAL_BATCH):
        w = windows[lo : lo + EVAL_BATCH]
        l = lengths[lo : lo + EVAL_BATCH]
        pad = EVAL_BATCH - len(w)
        if pad:
            w = np.concatenate([w, np.repeat(w[-1:], pad, axis=0)])
            l = np.concatenate([l, np.repeat(l[-1:], pad)])
        logits, emb, cons = embed_fn(jnp.asarray(w), jnp.asarray(l))
        logits_all.append(np.asarray(logits)[: EVAL_BATCH - pad])
        emb_all.append(np.asarray(emb)[: EVAL_BATCH - pad])
        cons_all.append(np.asarray(cons)[: EVAL_BATCH - pad])
    return (
        np.concatenate(logits_all),
        np.concatenate(emb_all),
        np.concatenate(cons_all),
    )


def evaluate_once(
    embed_fn,
    gt_items: list[dict],
    gen: GeneratedSet,
    rng: np.random.Generator,
    diversity_times: int = DIVERSITY_TIMES,
    mm_num_times: int = MM_NUM_TIMES,
) -> OrderedDict:
    """One replication of the full metric suite (ref evaluation.py:179-246)."""
    results = OrderedDict()

    def acc_and_embeds(items):
        logits, emb, cons = _batched_embeddings(embed_fn, items, rng)
        class_ids = np.asarray([it["class_id"] for it in items])
        acc = float((logits.argmax(-1) == class_ids).mean())
        consistency = float((cons.argmax(-1) == 0).mean())
        return acc, emb, consistency, logits, class_ids

    gt_acc, gt_emb, gt_cons, _, _ = acc_and_embeds(gt_items)
    gen_acc, gen_emb, gen_cons, gen_logits, gen_cids = acc_and_embeds(gen.motions)

    results["Acc"] = {"ground truth": gt_acc, "text2motion": gen_acc}
    results["Consistency"] = {"ground truth": gt_cons, "text2motion": gen_cons}
    gt_mu, gt_cov = M.calculate_activation_statistics(gt_emb)
    # GT-vs-GT FID uses a second, independently-windowed embedding of the
    # same clips (the reference embeds GT through two independently-random
    # loaders, so its GT FID is a small nonzero sanity value, not 0).
    _, gt_emb2, _ = _batched_embeddings(embed_fn, gt_items, rng)
    results["FID"] = {
        "ground truth": M.calculate_frechet_distance(
            gt_mu, gt_cov, *M.calculate_activation_statistics(gt_emb2)
        ),
        "text2motion": M.calculate_frechet_distance(
            gt_mu, gt_cov, *M.calculate_activation_statistics(gen_emb)
        ),
    }
    div_times = min(diversity_times, len(gt_items) - 1)
    results["Diversity"] = {
        "ground truth": M.calculate_diversity(gt_emb, div_times, rng),
        "text2motion": M.calculate_diversity(gen_emb, div_times, rng),
    }

    def multimodality(groups):
        per_class = []
        for cid, items in groups.items():
            if len(items) <= mm_num_times:
                continue
            _, emb, _ = _batched_embeddings(embed_fn, items, rng)
            per_class.append(emb)
        if not per_class:
            return 0.0
        k = min(len(e) for e in per_class)
        stacked = np.stack([e[:k] for e in per_class])
        return M.calculate_multimodality(stacked, min(mm_num_times, k - 1), rng)

    results["MultiModality"] = {
        "ground truth": multimodality(gen.gt_mm_groups),
        "text2motion": multimodality(gen.mm_groups),
    }
    results["_confusion"] = {
        "text2motion": _confusion(gen_logits.argmax(-1), gen_cids)
    }
    return results


def _confusion(pred: np.ndarray, gt: np.ndarray, n: int = 26) -> np.ndarray:
    cm = np.zeros((n, n), np.int64)
    for p, g in zip(pred, gt):
        cm[g, p] += 1
    return cm


def summarize(replications: list[OrderedDict], replication_times: int) -> OrderedDict:
    """mean ± CI per metric per model (ref evaluation.py:248-264)."""
    out = OrderedDict()
    for metric in replications[0]:
        if metric.startswith("_"):
            continue
        out[metric] = OrderedDict()
        for model_name in replications[0][metric]:
            vals = np.asarray([r[metric][model_name] for r in replications])
            mean, conf = M.get_metric_statistics(vals, replication_times)
            out[metric][model_name] = (float(mean), float(conf))
    return out
