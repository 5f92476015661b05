"""NTU two-person motion dataset pipeline (host-side, deterministic).

Equivalent of the reference's codes/datasets/mul_dataset.py +
dataloader.py, re-designed for a jit-compiled trainer: everything here is
plain numpy on host and every batch is a dict of fixed-shape arrays
(captions pre-tokenized to int32 ids), so device code never sees strings or
ragged shapes. Randomness is an explicit ``np.random.Generator`` seeded per
(seed, epoch, item) — the reference's `random`-module state + per-worker
seeding (dataloader.py:124-130) becomes reproducible by construction.

On-disk format is the reference's exactly (mul_dataset.py:73-99):
  new_joint_vecs/<name>.npy  — (2, T+1, 263) float32, last row = init token
  texts/<name>.txt           — 'caption1_caption2#tokens#f_tag#to_tag' lines
  <split>.txt                — clip names
  meta mean.npy/std.npy      — (267,) = 263 feature stats + 4 init stats
"""

from __future__ import annotations

import dataclasses
import json
import os
from os.path import join as pjoin

import numpy as np

from hig_tpu.config import ExperimentConfig
from hig_tpu.data.vocab import CAP2CLASSID, CAP2KEY
from hig_tpu.models.tokenizer import tokenize

WINDOW_FRAMES = 90  # fixed training window (ref: mul_dataset.py:186)


@dataclasses.dataclass
class Clip:
    name: str
    motion: np.ndarray  # (2, T, D) — T rows include the trailing init token
    length: int  # row count (== features+init, the reference's m_length)
    texts: list  # list of (caption1, caption2) pairs
    class_id: int


def parse_caption_file(path: str) -> list[tuple[str, str]]:
    """(ref: mul_dataset.py:85-99; f_tag/to_tag segmenting is HumanML3D-only)"""
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            captions = line.split("#")[0].split("_")
            if len(captions) == 1:
                captions = captions * 2
            out.append((captions[0], captions[1]))
    return out


def load_clips(
    cfg: ExperimentConfig,
    split_file: str,
    min_motion_len: int = 20,
    max_motion_len: int = 200,
    limit: int = -1,
) -> list[Clip]:
    """Load all clips of a split to RAM (the reference does the same,
    mul_dataset.py:73-135). Length filter: 20 ≤ rows < 200."""
    with open(pjoin(cfg.data_root, split_file)) as f:
        names = [line.strip() for line in f if line.strip()]
    clips = []
    for name in names:
        npy = pjoin(cfg.motion_dir, name + ".npy")
        txt = pjoin(cfg.text_dir, name + ".txt")
        if not (os.path.exists(npy) and os.path.exists(txt)):
            continue
        motion = np.load(npy).astype(np.float32)
        rows = len(motion) if motion.ndim == 2 else len(motion[1])
        if rows < min_motion_len or rows >= max_motion_len:
            continue
        texts = parse_caption_file(txt)
        if not texts:
            continue
        clips.append(
            Clip(
                name=name,
                motion=motion,
                length=rows,
                texts=texts,
                class_id=CAP2CLASSID.get(texts[0][0], 0),
            )
        )
    # sort by length like the reference (mul_dataset.py:127)
    clips.sort(key=lambda c: c.length)
    if limit != -1:
        rng = np.random.RandomState(0)
        idx = rng.permutation(len(clips))[:limit]
        clips = [clips[i] for i in sorted(idx)]
    return clips


# --------------------------------------------------------------------------
# statistics
# --------------------------------------------------------------------------


def compute_mean_std(clips: list[Clip]) -> tuple[np.ndarray, np.ndarray]:
    """(267,) mean/std: 263 feature stats over all frame rows of both actors
    + 4 init-token stats (reimplements the absent Preprocess3Dpose
    calc_mean_variance; consumed at mul_dataset.py:163-166)."""
    frames = np.concatenate([c.motion[:, :-1].reshape(-1, c.motion.shape[-1]) for c in clips])
    inits = np.concatenate([c.motion[:, -1, :4] for c in clips])
    mean = np.concatenate([frames.mean(0), inits.mean(0)])
    std = np.concatenate([frames.std(0), inits.std(0)])
    std[std < 1e-6] = 1.0
    return mean.astype(np.float32), std.astype(np.float32)


def rescale_std_train(std: np.ndarray, joints_num: int, feat_bias: float) -> np.ndarray:
    """Train-time std rescale persisted to meta/std.npy
    (ref: mul_dataset.py:137-161, ntu_mul branch)."""
    std = std.copy()
    std[0:4] = std[0:4] / feat_bias
    fc0 = 4 + (joints_num - 1) * 9 + joints_num * 3
    std[fc0 : fc0 + 4] = std[fc0 : fc0 + 4].mean() / feat_bias
    return std


# --------------------------------------------------------------------------
# windowing + normalization (pure functions)
# --------------------------------------------------------------------------


def window_indices(nframes: int, rng: np.random.Generator, num_frames: int = WINDOW_FRAMES):
    """Frame indices for one sample: init row (index nframes) rolled to the
    front + a random fixed-length window, padding short clips with their last
    frame. (ref: mul_dataset.py:186-201)"""
    if num_frames > nframes:
        ntoadd = num_frames - nframes
        padding = (nframes - 1) * np.ones(ntoadd, dtype=int)
        return np.concatenate(([nframes], np.arange(nframes), padding))
    shift_max = nframes - num_frames
    shift = int(rng.integers(0, shift_max if shift_max > 0 else 1))
    return np.concatenate(([nframes], shift + np.arange(num_frames)))


def normalize_pair(
    motion: np.ndarray, mean: np.ndarray, std: np.ndarray
) -> np.ndarray:
    """Z-normalize a windowed (2, W+1, D) sample: frames vs mean/std[:-4],
    init token channels 0:4 vs the trailing init stats.
    (ref: mul_dataset.py:204-208)"""
    out = motion.copy()
    out[:, 1:] = (out[:, 1:] - mean[:-4]) / std[:-4]
    out[:, 0, :4] = (out[:, 0, :4] - mean[-4:]) / std[-4:]
    return out


def denormalize_pair(motion: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    out = np.asarray(motion).copy()
    out[..., 1:, :] = out[..., 1:, :] * std[:-4] + mean[:-4]
    out[..., 0, :4] = out[..., 0, :4] * std[-4:] + mean[-4:]
    return out


# --------------------------------------------------------------------------
# datasets
# --------------------------------------------------------------------------


class PairDataset:
    """Training/eval dataset (ref: Text2MotionMulDataset, mul_dataset.py:35-253).

    ``__getitem__(item, epoch)`` is deterministic given (seed, epoch, item).
    Returns a dict; captions are raw class ids + flat caption ids, the batch
    iterator tokenizes.
    """

    def __init__(
        self,
        cfg: ExperimentConfig,
        mean: np.ndarray,
        std: np.ndarray,
        split_file: str,
        times: int = 1,
        eval_mode: bool = False,
        label_path: str | None = None,
        train_eval: bool = False,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.times = times
        self.eval_mode = eval_mode
        self.train_eval = train_eval
        self.seed = seed
        self.mean, self.std = mean, std
        self.clips = load_clips(cfg, split_file, limit=cfg.limit_data_num)
        self.labels = None
        if label_path:
            with open(label_path) as f:
                self.labels = json.load(f)

    def real_len(self) -> int:
        return len(self.clips)

    def __len__(self) -> int:
        return self.real_len() * self.times

    def inv_transform(self, data: np.ndarray) -> np.ndarray:
        return data * self.std[:-4] + self.mean[:-4]

    def __getitem__(self, item: int, epoch: int = 0) -> dict:
        idx = item % self.real_len()
        clip = self.clips[idx]
        rng = np.random.default_rng((self.seed, epoch, item))

        nframes = clip.motion.shape[1] - 1
        ix = window_indices(nframes, rng)
        sample = normalize_pair(clip.motion[:, ix], self.mean, self.std)

        caption1, caption2 = clip.texts[int(rng.integers(len(clip.texts)))]
        if self.cfg.cap_same:
            caption2 = caption1
        swapped = False
        if self.labels is not None and not (self.eval_mode or self.train_eval):
            if self.labels.get(clip.name, 0) == 1:
                sample = sample[::-1].copy()  # actor swap (ref :246-251)
                swapped = True
        return dict(
            motion=sample,  # (2, 91, D)
            length=min(sample.shape[1], clip.length),
            caption1=caption1,
            caption2=caption2,
            cap_key1=CAP2KEY[caption1],
            cap_key2=CAP2KEY[caption2],
            class_id=clip.class_id,
            name=clip.name,
            swapped=swapped,
        )


class PairMismatchDataset(PairDataset):
    """Consistency-evaluator dataset: with p=0.5 replace one actor with an
    actor from a different clip of the same class (dummy_label=1).
    (ref: Text2MotionPairDataset, mul_dataset.py:260-457)"""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.class2indices: dict[int, list[int]] = {}
        for i, c in enumerate(self.clips):
            self.class2indices.setdefault(c.class_id, []).append(i)

    def __getitem__(self, item: int, epoch: int = 0) -> dict:
        idx = item % self.real_len()
        clip = self.clips[idx]
        rng = np.random.default_rng((self.seed, 7, epoch, item))
        dummy_label = int(rng.random() > 0.5)

        motion = clip.motion
        length = clip.length
        if dummy_label == 1 and len(self.class2indices[clip.class_id]) > 1:
            while True:
                other_idx = int(rng.choice(self.class2indices[clip.class_id]))
                if self.clips[other_idx].name != clip.name:
                    break
            other = self.clips[other_idx]
            rows = min(length, other.length)

            def trim(m, rows):
                start = int(rng.integers(0, m.shape[0] - rows + 1))
                return m[start : start + rows]

            a = int(rng.integers(2))
            b = int(rng.integers(2))
            motion = np.stack([trim(clip.motion[a], rows), trim(other.motion[b], rows)])
            length = rows
        else:
            dummy_label = 0

        nframes = motion.shape[1] - 1
        ix = window_indices(nframes, rng)
        sample = normalize_pair(motion[:, ix], self.mean, self.std)
        caption1, _ = clip.texts[int(rng.integers(len(clip.texts)))]
        return dict(
            motion=sample,
            length=min(sample.shape[1], length),
            class_id=clip.class_id,
            dummy_label=dummy_label,
            name=clip.name,
        )


class SingleMotionDataset:
    """Single-person dataset (ref: Text2MotionDataset, dataset.py:11-196).

    Conventions differ from the pair dataset: 60-frame window, the init
    token rides at the END of the window, and the init stats are the 3
    trailing mean/std entries. Caption files carry one caption per line
    (no ``_`` pair separator). Consumes (T, D) npy clips with a trailing
    init row.
    """

    def __init__(self, cfg, mean, std, split_file, times=1, seed=0,
                 window: int = 60):
        self.cfg = cfg
        self.times = times
        self.seed = seed
        self.window = window
        self.mean, self.std = mean, std
        with open(pjoin(cfg.data_root, split_file)) as f:
            names = [l.strip() for l in f if l.strip()]
        # HumanML3D/KIT min lengths (ref dataset.py:21-27); fps 20
        min_len = {"t2m": 40, "kit": 24}.get(cfg.dataset_name, 24)
        self.clips = []
        for name in names:
            npy = pjoin(cfg.motion_dir, name + ".npy")
            txt = pjoin(cfg.text_dir, name + ".txt")
            if not (os.path.exists(npy) and os.path.exists(txt)):
                continue
            motion = np.load(npy).astype(np.float32)
            if motion.ndim != 2:
                continue
            rows = len(motion)
            if rows < min_len or rows >= 200:
                continue
            # caption#tokens#f_tag#to_tag lines: zero tags → caption of the
            # whole clip; nonzero tags → the caption describes only the
            # [f_tag*20, to_tag*20) segment, which becomes its own pseudo-clip
            # (ref dataset.py:46-73). The trailing init row rides along.
            captions = []
            for seg_i, line in enumerate(open(txt)):
                if not line.strip():
                    continue
                parts = line.strip().split("#")
                caption = parts[0]
                f_tag = float(parts[2]) if len(parts) > 2 and parts[2] else 0.0
                to_tag = float(parts[3]) if len(parts) > 3 and parts[3] else 0.0
                f_tag = 0.0 if np.isnan(f_tag) else f_tag
                to_tag = 0.0 if np.isnan(to_tag) else to_tag
                if f_tag == 0.0 and to_tag == 0.0:
                    captions.append(caption)
                else:
                    # Clamp to the frame region: rows-1 is the init row, and
                    # annotation to_tags routinely overshoot the clip end —
                    # an unclamped slice would absorb the init row as a
                    # regular frame and then duplicate it below.
                    seg = motion[int(f_tag * 20) : min(int(to_tag * 20), rows - 1)]
                    if len(seg) < min_len or len(seg) >= 200:
                        continue
                    seg = np.concatenate([seg, motion[-1:]], axis=0)  # keep init row
                    self.clips.append(
                        Clip(name=f"S{seg_i}_{name}", motion=seg, length=len(seg),
                             texts=[caption], class_id=0)
                    )
            if captions:
                self.clips.append(
                    Clip(name=name, motion=motion, length=rows, texts=captions,
                         class_id=0)
                )
        self.clips.sort(key=lambda c: c.length)

    def real_len(self):
        return len(self.clips)

    def __len__(self):
        return self.real_len() * self.times

    def __getitem__(self, item, epoch: int = 0) -> dict:
        clip = self.clips[item % self.real_len()]
        rng = np.random.default_rng((self.seed, epoch, item))
        nframes = clip.motion.shape[0] - 1
        if self.window > nframes:
            padding = (nframes - 1) * np.ones(self.window - nframes, dtype=int)
            ix = np.concatenate([np.arange(nframes), padding, [nframes]])
        else:
            shift_max = nframes - self.window
            shift = int(rng.integers(0, shift_max if shift_max > 0 else 1))
            ix = np.concatenate([shift + np.arange(self.window), [nframes]])
        sample = clip.motion[ix].copy()
        sample[:-1] = (sample[:-1] - self.mean[:-3]) / self.std[:-3]
        sample[-1, :3] = (sample[-1, :3] - self.mean[-3:]) / self.std[-3:]
        caption = clip.texts[int(rng.integers(len(clip.texts)))]
        return dict(
            motion=sample, length=min(sample.shape[0], clip.length),
            caption=caption, class_id=0, name=clip.name,
        )


# --------------------------------------------------------------------------
# batching
# --------------------------------------------------------------------------


_token_cache: dict[str, np.ndarray] = {}


def _tokens_for(caption: str) -> np.ndarray:
    t = _token_cache.get(caption)
    if t is None:
        t = tokenize(caption)[0]
        _token_cache[caption] = t
    return t


def collate(samples: list[dict]) -> dict:
    """Stack samples into fixed-shape arrays; tokenize captions (cached —
    NTU has only 43 distinct strings)."""
    batch = dict(
        motion=np.stack([s["motion"] for s in samples]).astype(np.float32),
        lengths=np.asarray([s["length"] for s in samples], np.int32),
        class_id=np.asarray([s["class_id"] for s in samples], np.int32),
    )
    if "caption1" in samples[0]:
        batch["tokens"] = np.stack(
            [
                np.stack([_tokens_for(s["caption1"]), _tokens_for(s["caption2"])])
                for s in samples
            ]
        ).astype(np.int32)  # (B, 2, 77)
        batch["cap_ids"] = np.asarray(
            [[s["cap_key1"], s["cap_key2"]] for s in samples], np.int32
        )
    if "caption" in samples[0]:  # single-person samples
        batch["tokens"] = np.stack(
            [_tokens_for(s["caption"]) for s in samples]
        ).astype(np.int32)  # (B, 77)
    if "dummy_label" in samples[0]:
        batch["dummy_label"] = np.asarray([s["dummy_label"] for s in samples], np.int32)
    batch["names"] = [s["name"] for s in samples]
    return batch


def epoch_batches(
    dataset,
    batch_size: int,
    epoch: int,
    shuffle: bool = True,
    drop_last: bool = True,
    seed: int = 0,
    process_index: int | None = None,
    process_count: int | None = None,
):
    """Deterministic epoch iterator with round-up padding, matching the
    reference's epoch-seeded DistributedSampler semantics
    (dataloader.py:16-53). ``batch_size`` is the GLOBAL batch; in
    multi-process runs every process builds the same global order
    (seed, epoch) but materializes only its contiguous ``batch_size/P``
    slice of each batch — the per-host sharded feeding that replaces the
    reference's per-rank DistributedSampler (dataloader.py:96-97). The
    contiguous-block convention matches the process-major device order of
    ``parallel.mesh.make_mesh``, so ``shard_batch`` assembles the global
    array with zero cross-host traffic."""
    import jax as _jax

    pid = process_index if process_index is not None else _jax.process_index()
    pcount = process_count if process_count is not None else _jax.process_count()
    if batch_size % pcount:
        raise ValueError(f"global batch {batch_size} not divisible by {pcount} processes")
    local_bs = batch_size // pcount
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng((seed, epoch)).shuffle(order)
    if drop_last:
        order = order[: (n // batch_size) * batch_size]
    elif n % batch_size:
        pad = batch_size - n % batch_size
        order = np.concatenate([order, order[:pad]])
    for i in range(0, len(order), batch_size):
        local = order[i + pid * local_bs : i + (pid + 1) * local_bs]
        samples = [dataset.__getitem__(int(j), epoch=epoch) for j in local]
        yield collate(samples)
