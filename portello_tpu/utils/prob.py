"""Probability utilities (reference lib/rust-vc-utils/src/prob_util.rs:9-51 parity)."""

from __future__ import annotations

import numpy as np


def log_sum_exp(vals: np.ndarray) -> float:
    """Numerically stable log(sum(exp(vals)))."""
    vals = np.asarray(vals, dtype=np.float64)
    if vals.size == 0:
        return float("-inf")
    m = vals.max()
    if not np.isfinite(m):
        return float(m)
    return float(m + np.log(np.exp(vals - m).sum()))


def normalize_ln_distro(vals: np.ndarray) -> np.ndarray:
    """Normalize a log-space distribution to sum to one in linear space."""
    vals = np.asarray(vals, dtype=np.float64)
    total = log_sum_exp(vals)
    return np.exp(vals - total)
