"""Small host-side helpers (ref: codes/utils/utils.py).

The reference's stdout logging / image-grid helpers are replaced by the
structured metrics stream (trainer) and viz module; what remains useful is
the temporal smoothing filter applied to decoded joints before rendering.
"""

from __future__ import annotations

import numpy as np
import scipy.ndimage


def motion_temporal_filter(motion: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """Per-channel temporal gaussian smoothing of a (T, J, 3) motion.

    (ref: utils.py:125-131)
    """
    T = motion.shape[0]
    flat = motion.reshape(T, -1).copy()
    for i in range(flat.shape[1]):
        flat[:, i] = scipy.ndimage.gaussian_filter1d(flat[:, i], sigma=sigma, mode="nearest")
    return flat.reshape(T, -1, 3)


def list_cut_average(values, intervals: int):
    """Downsample a 1-d series by block averaging. (ref: utils.py:111-122)"""
    if intervals == 1:
        return list(values)
    import math

    bins = math.ceil(len(values) / intervals)
    return [
        float(np.mean(values[i * intervals : min((i + 1) * intervals, len(values))]))
        for i in range(bins)
    ]
