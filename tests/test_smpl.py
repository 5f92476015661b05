"""Tests for the SMPL LBS / GMM prior / SMPLify fitting stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hig_tpu.smpl.lbs import (
    NUM_JOINTS, SMPL_PARENTS, lbs, rodrigues, synthetic_smpl_model,
)
from hig_tpu.smpl.prior import synthetic_gmm_prior
from hig_tpu.smpl import smplify as S


class TestRodrigues:
    def test_identity(self):
        R = rodrigues(jnp.zeros((5, 3)))
        np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(5, 0), atol=1e-5)

    def test_known_rotation(self):
        R = rodrigues(jnp.asarray([[0.0, 0.0, np.pi / 2]]))
        want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(np.asarray(R[0]), want, atol=1e-5)

    def test_orthonormal(self):
        R = rodrigues(jax.random.normal(jax.random.key(0), (8, 3)))
        eye = jnp.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(np.asarray(eye), np.eye(3)[None].repeat(8, 0), atol=1e-5)


@pytest.fixture(scope="module")
def smpl():
    return synthetic_smpl_model(n_vertices=256)


class TestLBS:
    def test_rest_pose(self, smpl):
        verts, joints = lbs(smpl, jnp.zeros(10), jnp.zeros(72))
        assert verts.shape == (256, 3) and joints.shape == (24, 3)
        # rest pose with zero betas reproduces regressed template joints
        want = np.asarray(smpl.j_regressor @ smpl.v_template)
        np.testing.assert_allclose(np.asarray(joints), want, atol=1e-4)

    def test_global_rotation_rotates_everything(self, smpl):
        pose = jnp.zeros(72).at[2].set(np.pi / 2)  # yaw the root
        v0, j0 = lbs(smpl, jnp.zeros(10), jnp.zeros(72))
        v1, j1 = lbs(smpl, jnp.zeros(10), pose)
        R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        # root stays, all joints rotate about it
        root = np.asarray(j0[0])
        want = (np.asarray(j0) - root) @ R.T + root
        np.testing.assert_allclose(np.asarray(j1), want, atol=1e-3)

    def test_translation(self, smpl):
        t = jnp.asarray([1.0, 2.0, 3.0])
        v0, j0 = lbs(smpl, jnp.zeros(10), jnp.zeros(72))
        v1, j1 = lbs(smpl, jnp.zeros(10), jnp.zeros(72), t)
        np.testing.assert_allclose(np.asarray(j1 - j0), np.tile([1, 2, 3], (24, 1)), atol=1e-5)

    def test_vmap_and_grad(self, smpl):
        batched = jax.vmap(lambda p: lbs(smpl, jnp.zeros(10), p)[1])
        poses = 0.1 * jax.random.normal(jax.random.key(0), (4, 72))
        joints = batched(poses)
        assert joints.shape == (4, 24, 3)
        g = jax.grad(lambda p: jnp.sum(lbs(smpl, jnp.zeros(10), p)[1] ** 2))(poses[0])
        assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


class TestPrior:
    def test_mean_is_low_energy(self):
        prior = synthetic_gmm_prior()
        at_mean = float(prior(prior.means[0]))
        away = float(prior(prior.means[0] + 3.0))
        assert at_mean < away

    def test_batched(self):
        prior = synthetic_gmm_prior()
        out = prior(jnp.zeros((7, 69)))
        assert out.shape == (7,)


class TestSMPLify:
    def test_recovers_known_pose(self, smpl):
        """Fit to joints produced by a known pose: loss decreases and the
        fitted joints approach the targets."""
        prior = synthetic_gmm_prior()
        rng = jax.random.key(0)
        true_pose = 0.2 * jax.random.normal(rng, (3, 72))
        true_betas = jnp.zeros((3, 10))
        true_t = jnp.asarray([[0.3, 0.1, -0.2]] * 3)
        batched = jax.vmap(lambda b, p, t: lbs(smpl, b, p, t)[1])
        j3d = batched(true_betas, true_pose, true_t)[:, :22]

        fitter = S.SMPLify3D(model=smpl, prior=prior, num_iters=30, camera_outer=2)
        init_pose = jnp.zeros((3, 72))
        result = fitter(init_pose, jnp.zeros((3, 10)), j3d, jnp.ones(22))

        fitted = result.joints[:, :22]
        err_before = float(jnp.abs(batched(true_betas, init_pose, jnp.zeros((3, 3)))[:, :22] - j3d).mean())
        err_after = float(jnp.abs(fitted - j3d).mean())
        assert err_after < 0.5 * err_before
        assert np.isfinite(float(result.final_loss))

    def test_loss_functions(self):
        x = jnp.asarray([0.0, 100.0, 1e6])
        g = S.gmof(x, 100.0)
        # robust: saturates near sigma^2
        assert float(g[0]) == 0.0
        assert abs(float(g[1]) - 5000.0) < 1.0
        assert float(g[2]) < 100.0**2 + 1
        ap = S.angle_prior(jnp.zeros((2, 69)))
        assert ap.shape == (2, 4)


class TestCollisionTerm:
    """TPU-native self-interpenetration penalty (the reference's default-off
    BVH collision term, customloss.py:161-174)."""

    def test_separated_parts_zero_overlapping_positive(self):
        # two "parts": a cluster at origin and one offset well beyond margin
        v_far = jnp.asarray(
            [[0.0, 0, 0], [0.01, 0, 0], [1.0, 0, 0], [1.01, 0, 0]], jnp.float32
        )[None]
        parts = jnp.asarray([0, 0, 5, 5])
        assert float(S.collision_loss(v_far, parts, margin=0.02)) == 0.0
        # move part 5 on top of part 0 → penetration
        v_near = v_far.at[0, 2:].add(jnp.asarray([-1.0, 0.0, 0.0]))
        assert float(S.collision_loss(v_near, parts, margin=0.02)) > 0.0
        # same-part proximity is never penalized
        same = jnp.asarray([0, 0, 0, 0])
        assert float(S.collision_loss(v_near, same, margin=0.02)) == 0.0

    def test_gradient_pushes_apart(self):
        v = jnp.asarray([[0.0, 0, 0], [0.005, 0, 0]], jnp.float32)[None]
        parts = jnp.asarray([0, 1])
        g = jax.grad(lambda vv: S.collision_loss(vv, parts, margin=0.02))(v)
        # gradient on the x-axis separates the two vertices
        assert float(g[0, 0, 0]) > 0.0 and float(g[0, 1, 0]) < 0.0

    def test_smplify_with_collision_runs(self, smpl):
        prior = synthetic_gmm_prior()
        rng = jax.random.key(1)
        true_pose = 0.2 * jax.random.normal(rng, (2, 72))
        batched = jax.vmap(lambda b, p, t: lbs(smpl, b, p, t)[1])
        j3d = batched(jnp.zeros((2, 10)), true_pose, jnp.zeros((2, 3)))[:, :22]
        fitter = S.SMPLify3D(
            model=smpl, prior=prior, num_iters=10, camera_outer=1,
            use_collision=True, collision_stride=4,
        )
        result = fitter(jnp.zeros((2, 72)), jnp.zeros((2, 10)), j3d, jnp.ones(22))
        assert np.isfinite(float(result.final_loss))
        assert np.isfinite(np.asarray(result.joints)).all()
        parts = S.vertex_parts(smpl)
        assert parts.shape == (smpl.v_template.shape[0],)


class TestLBFGSConvergenceParityWithTorch:
    def test_optax_matches_torch_strong_wolfe(self, smpl):
        """optax.lbfgs (zoom line search) vs torch.optim.LBFGS (strong-Wolfe)
        driving the IDENTICAL stage-2 objective on identical synthetic
        joints: final joint errors must be in the same ballpark
        (VERDICT r1 next #8 — optimizer parity, LBS is golden-tested
        separately)."""
        import torch

        prior = synthetic_gmm_prior()
        key = jax.random.key(2)
        N = 3
        true_pose = 0.25 * jax.random.normal(key, (N, 72))
        batched = jax.vmap(lambda b, p, t: lbs(smpl, b, p, t)[1])
        j3d = batched(jnp.zeros((N, 10)), true_pose, jnp.zeros((N, 3)))[:, :22]
        init_body = jnp.zeros((N, 69))
        init_orient = jnp.zeros((N, 3))
        init_cam = jnp.zeros((N, 3))
        conf = jnp.ones(22)

        def body_loss(p):
            pose = jnp.concatenate([p["global_orient"], p["body_pose"]], axis=-1)
            mj = batched(jnp.zeros((N, 10)), pose, jnp.zeros((N, 3)))
            return S.body_fitting_loss_3d(
                p["body_pose"], init_body, jnp.zeros((N, 10)), mj[:, :22],
                p["cam_t"], j3d, prior, conf,
            )

        p0 = {"body_pose": init_body, "global_orient": init_orient, "cam_t": init_cam}

        # ours: optax.lbfgs scan
        ours, _ = S._lbfgs_run(body_loss, p0, 60)

        # torch: strong-Wolfe L-BFGS over the same objective via jax grads
        vg = jax.jit(jax.value_and_grad(body_loss))
        tp = {k: torch.from_numpy(np.asarray(v).copy()).requires_grad_(True)
              for k, v in p0.items()}
        opt = torch.optim.LBFGS(
            list(tp.values()), max_iter=60, line_search_fn="strong_wolfe"
        )

        def closure():
            opt.zero_grad()
            jp = {k: jnp.asarray(v.detach().numpy()) for k, v in tp.items()}
            val, grads = vg(jp)
            for k, v in tp.items():
                v.grad = torch.from_numpy(np.asarray(grads[k]).copy())
            return torch.tensor(float(val))

        opt.step(closure)

        def joint_err(p):
            pose = jnp.concatenate(
                [jnp.asarray(p["global_orient"]), jnp.asarray(p["body_pose"])], -1
            )
            mj = batched(jnp.zeros((N, 10)), pose, jnp.zeros((N, 3)))[:, :22]
            return float(jnp.abs(mj + jnp.asarray(p["cam_t"])[:, None] - j3d).mean())

        err0 = joint_err({k: np.asarray(v) for k, v in p0.items()})
        err_ours = joint_err({k: np.asarray(v) for k, v in ours.items()})
        err_torch = joint_err({k: v.detach().numpy() for k, v in tp.items()})
        # both converge far below the initial error…
        assert err_ours < 0.3 * err0, (err_ours, err0)
        assert err_torch < 0.3 * err0, (err_torch, err0)
        # …and ours is at least comparable to torch's strong-Wolfe result
        assert err_ours < max(1.5 * err_torch, err_torch + 0.01), (err_ours, err_torch)
