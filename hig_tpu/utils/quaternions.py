"""Quaternion / rotation math as pure jax.numpy functions.

Semantics match the QuaterNet-derived library the reference uses
(reference: codes/utils/quaternion.py) so that motion features produced by
either stack are bit-comparable, but everything here is a pure, vmappable,
jit-friendly function over arbitrary leading batch dims — no torch, no
``.view`` reshuffling, no ``_np`` twins (jnp consumes numpy arrays natively).

Conventions: quaternions are (..., 4) with the scalar part first (w, x, y, z).
``qmul`` reproduces the reference component formula verbatim (golden-tested),
including its convention choice, because every downstream feature (root
angular velocity, IK chain composition) depends on it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def qnormalize(q: jax.Array) -> jax.Array:
    """Normalize quaternions to unit length. (ref: quaternion.py:28-30)"""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qinv(q: jax.Array) -> jax.Array:
    """Conjugate of unit quaternion(s): negate the vector part.

    (ref: quaternion.py:16-20)
    """
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qmul(q: jax.Array, r: jax.Array) -> jax.Array:
    """Compose quaternions with the reference's component formula.

    (ref: quaternion.py:33-51). Broadcasts over leading dims.
    """
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0, r1, r2, r3 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    w = r0 * q0 - r1 * q1 - r2 * q2 - r3 * q3
    x = r0 * q1 + r1 * q0 - r2 * q3 + r3 * q2
    y = r0 * q2 + r1 * q3 + r2 * q0 - r3 * q1
    z = r0 * q3 - r1 * q2 + r2 * q1 + r3 * q0
    return jnp.stack([w, x, y, z], axis=-1)


def qrot(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors ``v`` (..., 3) by quaternions ``q`` (..., 4).

    v' = v + 2 (w (u × v) + u × (u × v)) with u the vector part.
    (ref: quaternion.py:54-73). Broadcasts over leading dims.
    """
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def qfix(q: jax.Array) -> jax.Array:
    """Antipodal continuity along the leading (time) axis.

    Flip the sign of q[t] whenever the cumulative parity of negative
    consecutive dot products is odd. (ref: quaternion.py:149-166)
    Input (L, ..., 4); returns same shape.
    """
    dots = jnp.sum(q[1:] * q[:-1], axis=-1)
    flip = jnp.cumsum((dots < 0).astype(jnp.int32), axis=0) % 2
    sign = jnp.where(flip.astype(bool), -1.0, 1.0)[..., None].astype(q.dtype)
    return jnp.concatenate([q[:1], q[1:] * sign], axis=0)


def qbetween(v0: jax.Array, v1: jax.Array) -> jax.Array:
    """Quaternion rotating ``v0`` onto ``v1``. (ref: quaternion.py:387-397)"""
    v = jnp.cross(v0, v1)
    w = jnp.sqrt(
        jnp.sum(v0 * v0, axis=-1, keepdims=True)
        * jnp.sum(v1 * v1, axis=-1, keepdims=True)
    ) + jnp.sum(v0 * v1, axis=-1, keepdims=True)
    return qnormalize(jnp.concatenate([w, v], axis=-1))


def qeuler(q: jax.Array, order: str, epsilon: float = 0.0, deg: bool = True) -> jax.Array:
    """Quaternion → Euler angles for the six axis orders.

    (ref: quaternion.py:76-123)
    """
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    lo, hi = -1.0 + epsilon, 1.0 - epsilon
    if order == "xyz":
        x = jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = jnp.arcsin(jnp.clip(2 * (q1 * q3 + q0 * q2), lo, hi))
        z = jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    elif order == "yzx":
        x = jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
        y = jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3))
        z = jnp.arcsin(jnp.clip(2 * (q1 * q2 + q0 * q3), lo, hi))
    elif order == "zxy":
        x = jnp.arcsin(jnp.clip(2 * (q0 * q1 + q2 * q3), lo, hi))
        y = jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        z = jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q1 * q1 + q3 * q3))
    elif order == "xzy":
        x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
        y = jnp.arctan2(2 * (q0 * q2 + q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3))
        z = jnp.arcsin(jnp.clip(2 * (q0 * q3 - q1 * q2), lo, hi))
    elif order == "yxz":
        x = jnp.arcsin(jnp.clip(2 * (q0 * q1 - q2 * q3), lo, hi))
        y = jnp.arctan2(2 * (q1 * q3 + q0 * q2), 1 - 2 * (q1 * q1 + q2 * q2))
        z = jnp.arctan2(2 * (q1 * q2 + q0 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
    elif order == "zyx":
        x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = jnp.arcsin(jnp.clip(2 * (q0 * q2 - q1 * q3), lo, hi))
        z = jnp.arctan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    else:
        raise ValueError(f"unknown euler order: {order}")
    out = jnp.stack([x, y, z], axis=-1)
    if deg:
        out = out * (180.0 / jnp.pi)
    return out


def euler_to_quaternion(e: jax.Array, order: str, deg: bool = False) -> jax.Array:
    """Euler angles → quaternion, composing per-axis rotations in ``order``.

    (ref: quaternion.py:233-271). The reference's antipodal flip for
    right-handed orders is preserved.
    """
    if deg:
        e = e * (jnp.pi / 180.0)
    x, y, z = e[..., 0], e[..., 1], e[..., 2]
    zeros = jnp.zeros_like(x)
    axis_quats = {
        "x": jnp.stack([jnp.cos(x / 2), jnp.sin(x / 2), zeros, zeros], axis=-1),
        "y": jnp.stack([jnp.cos(y / 2), zeros, jnp.sin(y / 2), zeros], axis=-1),
        "z": jnp.stack([jnp.cos(z / 2), zeros, zeros, jnp.sin(z / 2)], axis=-1),
    }
    result = None
    for axis in order:
        r = axis_quats[axis]
        result = r if result is None else qmul(result, r)
    if order in ("xyz", "yzx", "zxy"):
        result = -result
    return result


def expmap_to_quaternion(e: jax.Array) -> jax.Array:
    """Axis-angle (exponential map) → quaternion, stable near zero.

    (ref: quaternion.py:214-230)
    """
    theta = jnp.linalg.norm(e, axis=-1, keepdims=True)
    w = jnp.cos(0.5 * theta)
    xyz = 0.5 * jnp.sinc(0.5 * theta / jnp.pi) * e
    return jnp.concatenate([w, xyz], axis=-1)


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """Quaternion → 3×3 rotation matrix. (ref: quaternion.py:274-300)"""
    r, i, j, k = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def quaternion_to_cont6d(q: jax.Array) -> jax.Array:
    """Quaternion → continuous 6-d rotation (first two matrix columns).

    (ref: quaternion.py:308-317)
    """
    m = quaternion_to_matrix(q)
    return jnp.concatenate([m[..., 0], m[..., 1]], axis=-1)


def cont6d_to_matrix(c: jax.Array) -> jax.Array:
    """Continuous 6-d → rotation matrix via Gram-Schmidt.

    (ref: quaternion.py:320-336)
    """
    x_raw = c[..., 0:3]
    y_raw = c[..., 3:6]
    x = x_raw / jnp.linalg.norm(x_raw, axis=-1, keepdims=True)
    z = jnp.cross(x, y_raw)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def qpow(q0: jax.Array, t) -> jax.Array:
    """Raise unit quaternion(s) to power(s) ``t``. (ref: quaternion.py:344-366)

    When ``t`` is an array, the result has shape t.shape + q0.shape.
    """
    q0 = qnormalize(q0)
    theta0 = jnp.arccos(jnp.clip(q0[..., 0], -1.0, 1.0))
    theta0 = jnp.where(jnp.abs(theta0) <= 1e-9, 1e-9, theta0)
    v0 = q0[..., 1:] / jnp.sin(theta0)[..., None]
    t = jnp.asarray(t)
    theta = t.reshape(t.shape + (1,) * theta0.ndim) * theta0
    w = jnp.cos(theta)[..., None]
    xyz = v0 * jnp.sin(theta)[..., None]
    return jnp.concatenate([w, jnp.broadcast_to(xyz, theta.shape + (3,))], axis=-1)


def qslerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
    """Spherical interpolation at fractions ``t``. (ref: quaternion.py:369-384)"""
    q0 = qnormalize(q0)
    q1 = qnormalize(q1)
    q_ = qpow(qmul(q1, qinv(q0)), t)
    t = jnp.asarray(t)
    q0b = jnp.broadcast_to(q0, t.shape + q0.shape)
    return qmul(q_, q0b)


def lerp(p0: jax.Array, p1: jax.Array, t) -> jax.Array:
    """Linear interpolation with t-leading broadcast. (ref: quaternion.py:412-423)"""
    t = jnp.asarray(t)
    tb = t.reshape(t.shape + (1,) * p0.ndim)
    return p0 + tb * (p1 - p0)


@functools.partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian_filter1d_nearest(x: jax.Array, sigma: float, truncate: float = 4.0) -> jax.Array:
    """scipy.ndimage.gaussian_filter1d(mode='nearest') along axis 0.

    Used by the smoothed forward-direction estimate in IK
    (ref: skeleton.py:67-68). Implemented as an explicit correlation with the
    same truncated kernel scipy builds, with edge replication.
    """
    radius = int(truncate * sigma + 0.5)
    i = jnp.arange(-radius, radius + 1, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    kernel = jnp.exp(-0.5 * (i / sigma) ** 2)
    kernel = kernel / jnp.sum(kernel)
    pad_lo = jnp.repeat(x[:1], radius, axis=0)
    pad_hi = jnp.repeat(x[-1:], radius, axis=0)
    xp = jnp.concatenate([pad_lo, x, pad_hi], axis=0)
    # correlate: out[t] = sum_k kernel[k] * xp[t + k]
    def corr_1d(col):
        return jnp.convolve(col, kernel[::-1], mode="valid")
    flat = xp.reshape(xp.shape[0], -1)
    out = jax.vmap(corr_1d, in_axes=1, out_axes=1)(flat)
    return out.reshape((x.shape[0],) + x.shape[1:]).astype(x.dtype)
