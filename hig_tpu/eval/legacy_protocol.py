"""Legacy Guo-et-al co-embedding evaluation protocol (HumanML3D / KIT).

The reference carries this protocol's model zoo and metric math but leaves
it dormant in the NTU path (SURVEY.md §2.7); this harness wires it up:
caption tokens → GloVe+POS vectors → TextEncoderBiGRUCo, motions →
MovementConvEncoder → MotionEncoderBiGRUCo, then R-precision / matching
score / FID over the co-embeddings (ref: EvaluatorModelWrapper.
get_co_embeddings, evaluator.py:461-479 + metrics.py:37-57).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hig_tpu.data.word_vectorizer import POS_DIM, WORD_DIM, WordVectorizer
from hig_tpu.eval import metrics as M
from hig_tpu.models.legacy_evaluators import (
    MotionEncoderBiGRUCo, MovementConvEncoder, TextEncoderBiGRUCo,
)


def vectorize_tokens(tokens: list[str], max_text_len: int, wv: WordVectorizer):
    """'word/POS' token list → padded (L, 300), (L, 15), sent_len.

    (ref: dataset sos/eos/unk padding, mul_dataset.py:224-233)
    """
    if len(tokens) < max_text_len:
        tokens = ["sos/OTHER"] + tokens + ["eos/OTHER"]
        sent_len = len(tokens)
        tokens = tokens + ["unk/OTHER"] * (max_text_len + 2 - sent_len)
    else:
        tokens = ["sos/OTHER"] + tokens[:max_text_len] + ["eos/OTHER"]
        sent_len = len(tokens)
    word_embs = np.stack([wv[t][0] for t in tokens]).astype(np.float32)
    pos_ohots = np.stack([wv[t][1] for t in tokens]).astype(np.float32)
    return word_embs, pos_ohots, sent_len


class CoEmbeddingEvaluator:
    """Text/motion co-embedding wrapper over the legacy BiGRU models."""

    def __init__(
        self,
        dim_pose: int,
        dim_movement_latent: int = 512,
        dim_coemb_hidden: int = 1024,
        dim_out: int = 512,
        unit_length: int = 4,
        rng=None,
    ):
        rng = rng if rng is not None else jax.random.key(0)
        self.unit_length = unit_length
        self.movement_enc = MovementConvEncoder(
            hidden_size=dim_movement_latent, output_size=dim_movement_latent
        )
        self.motion_enc = MotionEncoderBiGRUCo(
            input_size=dim_movement_latent, hidden_size=dim_coemb_hidden,
            output_size=dim_out,
        )
        self.text_enc = TextEncoderBiGRUCo(
            word_size=WORD_DIM, pos_size=POS_DIM, hidden_size=dim_coemb_hidden,
            output_size=dim_out,
        )
        r1, r2, r3 = jax.random.split(rng, 3)
        T = 16
        self.movement_params = self.movement_enc.init(
            r1, jnp.zeros((1, T, dim_pose - 4))
        )
        self.motion_params = self.motion_enc.init(
            r2, jnp.zeros((1, T // unit_length, dim_movement_latent)),
            jnp.asarray([T // unit_length]),
        )
        self.text_params = self.text_enc.init(
            r3, jnp.zeros((1, 8, WORD_DIM)), jnp.zeros((1, 8, POS_DIM)),
            jnp.asarray([8]),
        )
        self._embed = jax.jit(self._embed_impl)

    def load_params(self, movement, motion, text):
        """Install trained/converted parameter trees."""
        self.movement_params, self.motion_params, self.text_params = (
            movement, motion, text,
        )

    def _embed_impl(self, mv_p, mo_p, tx_p, motions, m_lens, word_embs, pos_ohots, cap_lens):
        movements = self.movement_enc.apply(mv_p, motions[..., :-4])
        motion_emb = self.motion_enc.apply(
            mo_p, movements, m_lens // self.unit_length
        )
        text_emb = self.text_enc.apply(tx_p, word_embs, pos_ohots, cap_lens)
        return text_emb, motion_emb

    def get_co_embeddings(self, motions, m_lens, word_embs, pos_ohots, cap_lens):
        """(ref: evaluator.py:461-479 — without its host-side resorting; the
        batched GRUs here handle ragged lengths directly)."""
        return self._embed(
            self.movement_params, self.motion_params, self.text_params,
            jnp.asarray(motions), jnp.asarray(m_lens),
            jnp.asarray(word_embs), jnp.asarray(pos_ohots), jnp.asarray(cap_lens),
        )


def evaluate_matching_and_r_precision(
    text_embs: np.ndarray, motion_embs: np.ndarray, top_k: int = 3
):
    """Batch-of-32 protocol: matching score + R-precision@1..k.

    (ref: tools/evaluation.py legacy path semantics + metrics.py:37-57)
    """
    n = (len(text_embs) // 32) * 32
    match_sum = 0.0
    top_k_count = np.zeros(top_k)
    for lo in range(0, n, 32):
        t = text_embs[lo : lo + 32]
        m = motion_embs[lo : lo + 32]
        match_sum += M.calculate_matching_score(t, m, sum_all=True)
        top_k_count += M.calculate_R_precision(t, m, top_k, sum_all=True)
    return match_sum / max(n, 1), top_k_count / max(n, 1)
