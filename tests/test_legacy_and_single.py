"""Tests for the legacy evaluator zoo, word vectorizer, and single-person path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hig_tpu.models import legacy_evaluators as L


class TestMaskedBiGRUVsTorch:
    def test_masked_gru_matches_torch_packed(self):
        """Our masked GRU == torch GRU with pack_padded_sequence."""
        B, T, D, H = 3, 7, 6, 8
        rng = np.random.RandomState(0)
        x = rng.randn(B, T, D).astype(np.float32)
        lengths = np.array([7, 4, 2])

        gru = L.MaskedGRU(hidden_size=H)
        h0 = jnp.zeros((B, H))
        params = gru.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(lengths), h0)

        # port our GRUCell weights into a torch GRU
        p = params["params"]["GRUCell_0"]
        tg = torch.nn.GRU(D, H, batch_first=True)
        # flax GRUCell: ir/iz/in dense (input), hr/hz/hn dense (hidden)
        w_ih = np.concatenate(
            [np.asarray(p[k]["kernel"]).T for k in ("ir", "iz", "in")], axis=0
        )
        w_hh = np.concatenate(
            [np.asarray(p[k]["kernel"]).T for k in ("hr", "hz", "hn")], axis=0
        )
        b_ih = np.concatenate(
            [np.asarray(p[k]["bias"]) if "bias" in p[k] else np.zeros(H)
             for k in ("ir", "iz", "in")]
        )
        b_hh = np.concatenate(
            [np.asarray(p[k]["bias"]) if "bias" in p[k] else np.zeros(H)
             for k in ("hr", "hz", "hn")]
        )
        with torch.no_grad():
            tg.weight_ih_l0.copy_(torch.from_numpy(w_ih))
            tg.weight_hh_l0.copy_(torch.from_numpy(w_hh))
            tg.bias_ih_l0.copy_(torch.from_numpy(b_ih.astype(np.float32)))
            tg.bias_hh_l0.copy_(torch.from_numpy(b_hh.astype(np.float32)))

        from torch.nn.utils.rnn import pack_padded_sequence

        packed = pack_padded_sequence(
            torch.from_numpy(x), lengths.tolist(), batch_first=True
        )
        _, h_last = tg(packed, torch.zeros(1, B, H))
        want = h_last[0].detach().numpy()

        _, got = gru.apply(params, jnp.asarray(x), jnp.asarray(lengths), h0)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TestLegacyModels:
    def test_text_encoder_bigru_co(self):
        m = L.TextEncoderBiGRUCo(word_size=300, pos_size=15, hidden_size=32, output_size=16)
        w = jnp.asarray(np.random.randn(2, 10, 300), jnp.float32)
        p = jnp.asarray(np.random.randn(2, 10, 15), jnp.float32)
        lens = jnp.asarray([10, 6])
        params = m.init(jax.random.key(0), w, p, lens)
        out = m.apply(params, w, p, lens)
        assert out.shape == (2, 16)

    def test_motion_encoder_bigru_co_mask_invariance(self):
        m = L.MotionEncoderBiGRUCo(input_size=12, hidden_size=16, output_size=8)
        x = jnp.asarray(np.random.randn(1, 10, 12), jnp.float32)
        params = m.init(jax.random.key(0), x, jnp.asarray([10]))
        a = m.apply(params, x, jnp.asarray([6]))
        x2 = x.at[:, 6:].set(99.0)  # garbage beyond the valid length
        b = m.apply(params, x2, jnp.asarray([6]))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_att_layer(self):
        m = L.AttLayer(value_dim=16)
        q = jnp.asarray(np.random.randn(2, 8), jnp.float32)
        k = jnp.asarray(np.random.randn(2, 5, 12), jnp.float32)
        params = m.init(jax.random.key(0), q, k)
        pred, co = m.apply(params, q, k)
        assert pred.shape == (2, 16) and co.shape == (2, 5, 1)
        np.testing.assert_allclose(np.asarray(co.sum(1)), 1.0, atol=1e-5)

    def test_movement_conv_roundtrip_shapes(self):
        enc = L.MovementConvEncoder(hidden_size=24, output_size=16)
        dec = L.MovementConvDecoder(hidden_size=24, output_size=12)
        x = jnp.asarray(np.random.randn(2, 16, 12), jnp.float32)
        pe = enc.init(jax.random.key(0), x)
        z = enc.apply(pe, x)
        assert z.shape == (2, 4, 16)
        pd = dec.init(jax.random.key(1), z)
        y = dec.apply(pd, z)
        assert y.shape == (2, 16, 12)

    def test_len_estimator(self):
        m = L.MotionLenEstimatorBiGRU(word_size=300, pos_size=15, hidden_size=32, output_size=50)
        w = jnp.asarray(np.random.randn(2, 10, 300), jnp.float32)
        p = jnp.asarray(np.random.randn(2, 10, 15), jnp.float32)
        params = m.init(jax.random.key(0), w, p, jnp.asarray([10, 3]))
        out = m.apply(params, w, p, jnp.asarray([10, 3]))
        assert out.shape == (2, 50)

    def test_text_vae_decoder_step(self):
        m = L.TextVAEDecoder(text_size=16, input_size=12, output_size=10,
                             hidden_size=24, n_layers=2)
        latent = jnp.asarray(np.random.randn(2, 16), jnp.float32)
        inputs = jnp.asarray(np.random.randn(2, 12), jnp.float32)
        full = lambda mdl, latent, inputs, p: mdl(inputs, mdl.get_init_hidden(latent), p)
        params = m.init(jax.random.key(0), latent, inputs, jnp.asarray([0, 0]), method=full)
        hidden = m.apply(params, latent, method=L.TextVAEDecoder.get_init_hidden)
        pose, hidden = m.apply(params, inputs, hidden, jnp.asarray([0, 0]))
        assert pose.shape == (2, 10) and len(hidden) == 2

    def test_contrastive_loss(self):
        a = jnp.zeros((4, 8))
        b = jnp.ones((4, 8))
        same = float(L.contrastive_loss(a, a, jnp.zeros(4)))
        assert same == 0.0
        # mismatched labels penalize closeness
        assert float(L.contrastive_loss(a, a, jnp.ones(4))) > 0


class TestWordVectorizer:
    def test_fallback_contract(self):
        from hig_tpu.data.word_vectorizer import POS_DIM, WORD_DIM, WordVectorizer

        wv = WordVectorizer()
        vec, pos = wv["walk/VERB"]
        assert vec.shape == (WORD_DIM,) and pos.shape == (POS_DIM,)
        # VIP override: 'walk' is an Act_VIP word
        from hig_tpu.data.word_vectorizer import POS_ENUMERATOR

        assert pos[POS_ENUMERATOR["Act_VIP"]] == 1.0
        vec2, _ = wv["walk/NOUN"]
        np.testing.assert_array_equal(vec, vec2)  # stable embedding
        _, pos_other = wv["zzzunknown/XYZ"]
        assert pos_other[POS_ENUMERATOR["OTHER"]] == 1.0


class TestSinglePersonPath:
    def test_single_model_and_train_step(self, tmp_path):
        from hig_tpu.models.interaction_model import SingleMotionModel
        from hig_tpu.models.text_encoder import ClipTextConfig
        from hig_tpu.diffusion import gaussian as g
        from hig_tpu.train.trainer import TrainState, make_single_train_step, make_single_sampler
        import optax

        model = SingleMotionModel(
            input_feats=263, num_frames=32, latent_dim=32, ff_size=64,
            num_layers=2, num_heads=4, text_latent_dim=16, text_ff_size=32,
            text_num_heads=2, num_text_layers=1,
            clip_config=ClipTextConfig(width=16, heads=2, layers=1),
        )
        B, T = 4, 13
        x = jnp.asarray(np.random.randn(B, T, 263), jnp.float32)
        tokens = jnp.zeros((B, 77), jnp.int32).at[:, 0].set(49406).at[:, 5].set(49407)
        lengths = jnp.asarray([13, 9, 13, 5])
        params = model.init(jax.random.key(0), x, jnp.zeros((B,), jnp.int32), lengths, tokens)

        tx = optax.adam(1e-4)
        sched = g.make_schedule(g.linear_betas(50))
        step = jax.jit(make_single_train_step(model, sched, tx))
        state = TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
        batch = {"motion": x, "lengths": lengths, "tokens": tokens}
        state, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss_mot_rec"]))

        sample = make_single_sampler(model, sched, T=13, dim_pose=263, sampler="ddim", ddim_steps=4)
        out = sample(state.params, tokens, lengths, jax.random.key(2))
        assert out.shape == (B, 13, 263)

    def test_single_dataset(self, tmp_path):
        from hig_tpu.config import ExperimentConfig, add_dataset_paths
        from hig_tpu.data.dataset import SingleMotionDataset, collate

        root = tmp_path / "t2m"
        (root / "new_joint_vecs").mkdir(parents=True)
        (root / "texts").mkdir()
        rng = np.random.RandomState(0)
        names = []
        for i in range(4):
            name = f"m{i:03d}"
            T = 40 + i * 10
            np.save(root / "new_joint_vecs" / f"{name}.npy",
                    rng.randn(T, 263).astype(np.float32))
            (root / "texts" / f"{name}.txt").write_text(
                "a person walks forward#walk/VERB#0.0#0.0\n"
            )
            names.append(name)
        (root / "train.txt").write_text("\n".join(names))
        mean = np.zeros(266, np.float32)
        std = np.ones(266, np.float32)
        cfg = add_dataset_paths(ExperimentConfig(dataset_name="t2m"))
        cfg.data_root = str(root)
        ds = SingleMotionDataset(cfg, mean, std, "train.txt")
        assert ds.real_len() == 4
        s = ds[0]
        assert s["motion"].shape == (61, 263)  # 60 frames + trailing init
        batch = collate([ds[i] for i in range(4)])
        assert batch["tokens"].shape == (4, 77)

    def test_segment_to_tag_overshoot_is_clamped(self, tmp_path):
        """An annotation whose to_tag extends past the clip end (common
        annotation noise) must not absorb the trailing init row as a regular
        motion frame (ADVICE r2, medium): the segment is clamped to the frame
        region and the init row appears exactly once, at the end."""
        from hig_tpu.config import ExperimentConfig, add_dataset_paths
        from hig_tpu.data.dataset import SingleMotionDataset

        root = tmp_path / "t2m"
        (root / "new_joint_vecs").mkdir(parents=True)
        (root / "texts").mkdir()
        rng = np.random.RandomState(0)
        T = 50  # frames; row T is the init row
        motion = rng.randn(T + 1, 263).astype(np.float32)
        motion[-1] = 99.0  # sentinel init row
        np.save(root / "new_joint_vecs" / "m000.npy", motion)
        # to_tag 5.0 → frame 100, far past the 50-frame clip
        (root / "texts" / "m000.txt").write_text(
            "a person walks forward#walk/VERB#0.0#0.0\n"
            "a person turns#turn/VERB#0.5#5.0\n"
        )
        (root / "train.txt").write_text("m000")
        cfg = add_dataset_paths(ExperimentConfig(dataset_name="t2m"))
        cfg.data_root = str(root)
        ds = SingleMotionDataset(cfg, np.zeros(266, np.float32),
                                 np.ones(266, np.float32), "train.txt")
        seg = next(c for c in ds.clips if c.name.startswith("S"))
        # clamped: frames [10, 50) + one appended init row
        assert seg.motion.shape[0] == 41
        is_init = np.all(seg.motion == 99.0, axis=1)
        assert is_init.sum() == 1 and is_init[-1]


class TestLegacyProtocol:
    def test_co_embedding_pipeline(self):
        from hig_tpu.data.word_vectorizer import WordVectorizer
        from hig_tpu.eval.legacy_protocol import (
            CoEmbeddingEvaluator, evaluate_matching_and_r_precision,
            vectorize_tokens,
        )

        wv = WordVectorizer()
        we, po, sl = vectorize_tokens(["a/DET", "person/NOUN", "walks/VERB"], 8, wv)
        assert we.shape == (10, 300) and po.shape == (10, 15) and sl == 5

        ev = CoEmbeddingEvaluator(dim_pose=263, dim_movement_latent=32,
                                  dim_coemb_hidden=32, dim_out=16)
        B, T = 4, 16
        motions = np.random.randn(B, T, 263).astype(np.float32)
        m_lens = np.asarray([16, 12, 16, 8])
        word_embs = np.random.randn(B, 10, 300).astype(np.float32)
        pos_ohots = np.random.randn(B, 10, 15).astype(np.float32)
        cap_lens = np.asarray([10, 5, 7, 9])
        t_emb, m_emb = ev.get_co_embeddings(motions, m_lens, word_embs, pos_ohots, cap_lens)
        assert t_emb.shape == (B, 16) and m_emb.shape == (B, 16)

        big_t = np.random.randn(64, 16).astype(np.float32)
        match, topk = evaluate_matching_and_r_precision(big_t, big_t.copy(), top_k=3)
        assert match < 1e-5  # identical embeddings → zero matching distance
        assert topk[0] == 1.0  # and perfect top-1 retrieval
