"""PIT role discovery and pseudo-label generation (pipeline stages 1-2/1-3).

Re-implementation of the reference's labeling machinery
(mul_ddpm_trainer.py:343-475 + tools/label_data.py):

1. *Discovery* — on the ~254 human-annotated clips (actor 1 oriented to the
   active role via test_active_anns.json), run the trained PIT model's
   two-assignment losses at fixed high noise levels t ∈ {830,860,890,920},
   5 repeats each, and majority-vote which caption the model matches to the
   annotated active actor per class → pit_labels.json.
2. *Labeling* — on all training clips, same loss comparison (41 repeats per
   t), oriented by the discovery result, majority-vote a 0/1 role label per
   clip → pseudo_labels.json (0: actor 1 is active).

The per-repeat computation is one jitted call over the whole batch and both
assignments; the reference's Counter-based voting survives on host.
"""

from __future__ import annotations

import collections
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from hig_tpu.data.vocab import CAP2KEY, CLASSID2CAPS, NUM_CLASSES
from hig_tpu.diffusion import gaussian as g
from hig_tpu.models.interaction_model import InteractionModel

LABEL_T_VALUES = (830, 860, 890, 920)  # (ref: mul_ddpm_trainer.py:441,464)
DISCOVERY_REPEATS = 5  # (ref :443)
LABELING_REPEATS = 41  # (ref :465)


def make_assignment_scorer(model: InteractionModel, sched: g.DiffusionSchedule):
    """Returns (encode, score):

      encode(params, cond_a, cond_b) → (xf_proj, xf_out) for the stacked
        [A; B] assignments — computed ONCE per batch (the conditioning is
        loop-invariant across the t-values × repeats sweep; re-running the
        frozen CLIP tower 164× per batch was pure waste).
      score(params, motion, lengths, xf_proj, xf_out, t, rng) → (B, 2)
        summed masked losses for assignment A=(c1,c2) and B=(c2,c1)
        (the loss computation of label_batch, mul_ddpm_trainer.py:373-396).
    """

    @jax.jit
    def encode(params, cond_a, cond_b):
        enc = lambda c: model.apply(
            params, c, True, method=InteractionModel.encode_text
        )
        pa, oa = enc(cond_a)
        pb, ob = enc(cond_b)
        return (
            jnp.concatenate([pa, pb], axis=0),
            jnp.concatenate([oa, ob], axis=0),
        )

    @jax.jit
    def score(params, motion, lengths, xf_proj, xf_out, t_scalar, rng):
        B, _, T, _ = motion.shape
        lengths = jnp.minimum(lengths, T)
        t = jnp.full((B,), t_scalar, jnp.int32)
        noise = jax.random.normal(rng, motion.shape, motion.dtype)
        x_t, target = g.training_targets(sched, motion, t, noise)
        mask = (jnp.arange(T) < lengths[:, None]).astype(motion.dtype)

        pred = model.apply(
            params,
            jnp.concatenate([x_t, x_t], axis=0),
            jnp.concatenate([t, t], axis=0),
            jnp.concatenate([lengths, lengths], axis=0),
            xf_proj,
            xf_out,
            True,
            method=InteractionModel.denoise,
        )
        target2 = jnp.concatenate([target, target], axis=0)
        init = jnp.mean((pred[:, :, 0, :4] - target2[:, :, 0, :4]) ** 2, axis=-1)
        move = jnp.mean((pred[:, :, 1:] - target2[:, :, 1:]) ** 2, axis=-1)
        per_tok = jnp.concatenate([init[:, :, None], move], axis=-1)
        mask2 = jnp.concatenate([mask, mask], axis=0)[:, None, :]
        sums = jnp.sum(per_tok * mask2, axis=(1, 2))  # (2B,) over both actors
        return jnp.stack([sums[:B], sums[B:]], axis=1)  # (B, 2)

    return encode, score


def _iter_scored_batches(scorer, params, dataset, batch_size, repeats, rng_seed,
                         epoch_batches, cap_id=False):
    """Yield (names, cap_ids, votes) where votes is (B,) lists of argmins."""
    encode, score = scorer
    rng = jax.random.key(rng_seed)
    for batch in epoch_batches(dataset, batch_size, epoch=0, shuffle=False, drop_last=False):
        votes = [[] for _ in range(len(batch["names"]))]
        cond_a = jnp.asarray(batch["cap_ids"] if cap_id else batch["tokens"])
        cond_b = jnp.flip(cond_a, axis=1)
        motion = jnp.asarray(batch["motion"])
        lengths = jnp.asarray(batch["lengths"])
        xf_proj, xf_out = encode(params, cond_a, cond_b)  # once per batch
        for t in LABEL_T_VALUES:
            for _ in range(repeats):
                rng, sub = jax.random.split(rng)
                s = score(params, motion, lengths, xf_proj, xf_out, t, sub)
                result = np.asarray(jnp.argmin(s, axis=1))
                for i, r in enumerate(result):
                    votes[i].append(int(r))
        yield batch, votes


def discover_roles(
    scorer, params, annotated_dataset, batch_size, epoch_batches, rng_seed=0,
    cap_id=False,
) -> dict:
    """Stage 1-2a: per-class model-role orientation → pit_labels dict.

    ``annotated_dataset`` must be built with the human annotation labels so
    motion index 0 is the active actor (ref label_data.py:114-117).
    Output format matches the reference's pit_labels.json
    (label_data.py:120-133).
    """
    tallies: dict[int, collections.Counter] = collections.defaultdict(collections.Counter)
    for batch, votes in _iter_scored_batches(
        scorer, params, annotated_dataset, batch_size, DISCOVERY_REPEATS, rng_seed,
        epoch_batches, cap_id=cap_id,
    ):
        for i, v in enumerate(votes):
            class_id = int(batch["class_id"][i])
            cap1, cap2 = int(batch["cap_ids"][i][0]), int(batch["cap_ids"][i][1])
            if cap1 == cap2:
                continue  # symmetric class: no role
            for r in v:
                # r==0: model matches caption1 to the annotated active actor
                tallies[class_id][cap1 if r == 0 else cap2] += 1

    roles = {}
    for class_id in range(NUM_CLASSES):
        cap_active, cap_passive = CLASSID2CAPS[class_id]
        if cap_active == cap_passive:
            roles[class_id] = {"category": cap_active}
            continue
        k1, k2 = CAP2KEY[cap_active], CAP2KEY[cap_passive]
        counts = tallies.get(class_id)
        if counts and counts[k2] > counts[k1]:
            active, passive = k2, k1  # model's convention is inverted
        else:
            active, passive = k1, k2
        roles[class_id] = {
            "category": cap_active,
            "active_index": active,
            "passive_index": passive,
        }
    return roles


def pseudo_label(
    scorer, params, dataset, batch_size, roles: dict, epoch_batches,
    repeats: int = LABELING_REPEATS, rng_seed: int = 1, cap_id: bool = False,
) -> dict:
    """Stage 1-2b: majority-vote 0/1 role labels for every clip.

    Returns {clip_name: 0|1}; 0 means actor 1 is the active role
    (consumed by PairDataset's swap, mul_dataset.py:246-251).
    """
    labels: dict[str, int] = {}
    for batch, votes in _iter_scored_batches(
        scorer, params, dataset, batch_size, repeats, rng_seed, epoch_batches,
        cap_id=cap_id,
    ):
        for i, v in enumerate(votes):
            class_id = int(batch["class_id"][i])
            role = roles.get(class_id, roles.get(str(class_id), {}))
            if "active_index" not in role:
                labels[batch["names"][i]] = 0  # symmetric class
                continue
            cap1 = int(batch["cap_ids"][i][0])
            expected = 0 if cap1 == role["active_index"] else 1
            outs = [0 if r == expected else 1 for r in v]
            labels[batch["names"][i]] = int(
                collections.Counter(outs).most_common(1)[0][0]
            )
    return labels


def save_json(obj: dict, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)
