"""Evaluation metric math.

Port-equivalent of the reference's codes/utils/metrics.py:1-146 (NumPy/SciPy
on host — these operate on ≤512-d pooled embeddings, so host math is free)
plus a jit-friendly FID variant via symmetric eigendecomposition for fully
on-device pipelines.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg


def euclidean_distance_matrix(matrix1: np.ndarray, matrix2: np.ndarray) -> np.ndarray:
    """(ref: metrics.py:6-20)"""
    d1 = -2 * np.dot(matrix1, matrix2.T)
    d2 = np.sum(np.square(matrix1), axis=1, keepdims=True)
    d3 = np.sum(np.square(matrix2), axis=1)
    return np.sqrt(np.maximum(d1 + d2 + d3, 0.0))


def calculate_top_k(mat: np.ndarray, top_k: int) -> np.ndarray:
    """(ref: metrics.py:22-34)"""
    size = mat.shape[0]
    gt = np.expand_dims(np.arange(size), 1).repeat(size, 1)
    bool_mat = mat == gt
    correct = np.zeros(size, dtype=bool)
    cols = []
    for i in range(top_k):
        correct = correct | bool_mat[:, i]
        cols.append(correct[:, None].copy())
    return np.concatenate(cols, axis=1)


def calculate_R_precision(
    embedding1: np.ndarray, embedding2: np.ndarray, top_k: int, sum_all: bool = False
):
    """(ref: metrics.py:37-44)"""
    dist = euclidean_distance_matrix(embedding1, embedding2)
    argsorted = np.argsort(dist, axis=1)
    top_k_mat = calculate_top_k(argsorted, top_k)
    return top_k_mat.sum(axis=0) if sum_all else top_k_mat


def calculate_matching_score(embedding1, embedding2, sum_all: bool = False):
    """(ref: metrics.py:47-56)"""
    dist = np.linalg.norm(embedding1 - embedding2, axis=1)
    return dist.sum(axis=0) if sum_all else dist


def calculate_activation_statistics(activations: np.ndarray):
    """(ref: metrics.py:60-70)"""
    mu = np.mean(activations, axis=0)
    cov = np.cov(activations, rowvar=False)
    return mu, cov


def calculate_diversity(activation: np.ndarray, diversity_times: int, rng=None) -> float:
    """(ref: metrics.py:73-81)"""
    assert activation.ndim == 2 and activation.shape[0] > diversity_times
    rng = rng or np.random
    n = activation.shape[0]
    first = rng.choice(n, diversity_times, replace=False)
    second = rng.choice(n, diversity_times, replace=False)
    return float(np.linalg.norm(activation[first] - activation[second], axis=1).mean())


def calculate_multimodality(activation: np.ndarray, multimodality_times: int, rng=None) -> float:
    """(ref: metrics.py:84-92)"""
    assert activation.ndim == 3 and activation.shape[1] > multimodality_times
    rng = rng or np.random
    n = activation.shape[1]
    first = rng.choice(n, multimodality_times, replace=False)
    second = rng.choice(n, multimodality_times, replace=False)
    return float(
        np.linalg.norm(activation[:, first] - activation[:, second], axis=2).mean()
    )


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Sutherland-stable FID (ref: metrics.py:95-146)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"Imaginary component {np.max(np.abs(covmean.imag))}"
            )
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fid_from_activations(gen: np.ndarray, gt: np.ndarray) -> float:
    mu1, cov1 = calculate_activation_statistics(gt)
    mu2, cov2 = calculate_activation_statistics(gen)
    return calculate_frechet_distance(mu1, cov1, mu2, cov2)


def frechet_distance_device(mu1, sigma1, mu2, sigma2, eps: float = 1e-6):
    """Jit-friendly FID via symmetric eigendecomposition (no scipy sqrtm).

    tr sqrt(Σ1 Σ2) = Σ sqrt(eig(Σ1 Σ2)); since Σ1 Σ2 is similar to the
    symmetric √Σ1 Σ2 √Σ1, compute eigenvalues of that PSD matrix instead.
    Use when embeddings stay on device (e.g. inside a jit eval loop); the
    host scipy path remains the reference.
    """
    import jax.numpy as jnp

    diff = mu1 - mu2
    # √Σ1 via eigh
    w1, v1 = jnp.linalg.eigh(sigma1)
    sqrt1 = (v1 * jnp.sqrt(jnp.clip(w1, 0.0, None))) @ v1.T
    inner = sqrt1 @ sigma2 @ sqrt1
    w = jnp.linalg.eigvalsh(inner)
    tr_covmean = jnp.sum(jnp.sqrt(jnp.clip(w, 0.0, None)))
    return diff @ diff + jnp.trace(sigma1) + jnp.trace(sigma2) - 2 * tr_covmean


def get_metric_statistics(values: np.ndarray, replication_times: int):
    """mean ± 1.96·σ/√n (ref: evaluation.py:172-176)"""
    mean = np.mean(values, axis=0)
    conf = 1.96 * np.std(values, axis=0) / np.sqrt(replication_times)
    return mean, conf
