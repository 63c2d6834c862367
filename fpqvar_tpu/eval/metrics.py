"""Generation-quality metrics: FID, sFID, Inception Score, Precision/Recall.

Numpy/JAX re-implementation of the metric math in the reference's
`openai_evaluator.py` (OpenAI guided-diffusion evaluator):

- ``frechet_distance`` — `openai_evaluator.py:71-115` (TTUR formulation,
  scipy sqrtm with the same eps fallback),
- ``inception_score`` — `:178-191` (split-KL, split_size 5000),
- ``ManifoldEstimator`` precision/recall — `:204-359` (kNN hypersphere
  manifolds, nhood_size=3).

The evaluator is **feature-extractor agnostic**: it consumes (features,
spatial_features, probs) arrays.  The reference extracts them with a pinned
TF1 Inception graph in a separate process connected by npz files
(SURVEY.md §3.5); that process boundary is preserved — run any Inception
implementation externally and feed the npz here, or pass an ``extract_fn``.
Pairwise distance blocks run on the accelerator via jnp.
"""
from __future__ import annotations

import warnings
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from scipy import linalg


@dataclass
class FIDStatistics:
    mu: np.ndarray
    sigma: np.ndarray

    @staticmethod
    def from_features(feats: np.ndarray) -> "FIDStatistics":
        return FIDStatistics(
            feats.mean(axis=0), np.cov(feats, rowvar=False))

    def frechet_distance(self, other: "FIDStatistics", eps=1e-6) -> float:
        mu1, sigma1 = self.mu, np.atleast_2d(self.sigma)
        mu2, sigma2 = other.mu, np.atleast_2d(other.sigma)
        diff = mu1 - mu2
        covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
        if not np.isfinite(covmean).all():
            warnings.warn(
                f"fid: singular product; adding {eps} to cov diagonals")
            offset = np.eye(sigma1.shape[0]) * eps
            covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
        if np.iscomplexobj(covmean):
            if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
                raise ValueError(
                    f"imaginary component {np.max(np.abs(covmean.imag))}")
            covmean = covmean.real
        return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                     - 2 * np.trace(covmean))


def inception_score(probs: np.ndarray, split_size: int = 5000) -> float:
    """Split-KL inception score over class probabilities [N, classes]."""
    scores = []
    for i in range(0, len(probs), split_size):
        part = probs[i: i + split_size]
        kl = part * (np.log(part) - np.log(part.mean(axis=0, keepdims=True)))
        scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
    return float(np.mean(scores))


def _pairwise_dist2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Squared L2 distances [Na, Nb], accelerator-computed in f32."""
    aj = jnp.asarray(a, jnp.float32)
    bj = jnp.asarray(b, jnp.float32)
    d = (jnp.sum(aj ** 2, 1)[:, None] + jnp.sum(bj ** 2, 1)[None, :]
         - 2.0 * aj @ bj.T)
    return np.asarray(jnp.maximum(d, 0.0))


class ManifoldEstimator:
    """kNN-hypersphere manifold precision/recall
    (`openai_evaluator.py:204-359`)."""

    def __init__(self, nhood_size: int = 3, row_batch: int = 10000,
                 col_batch: int = 10000):
        self.k = nhood_size
        self.row_batch = row_batch
        self.col_batch = col_batch

    def manifold_radii(self, feats: np.ndarray) -> np.ndarray:
        n = len(feats)
        radii = np.zeros((n,), np.float32)
        for b1 in range(0, n, self.row_batch):
            e1 = min(b1 + self.row_batch, n)
            drow = np.zeros((e1 - b1, n), np.float32)
            for b2 in range(0, n, self.col_batch):
                e2 = min(b2 + self.col_batch, n)
                drow[:, b2:e2] = _pairwise_dist2(feats[b1:e1], feats[b2:e2])
            # distance to the k-th nearest neighbor excluding self
            part = np.partition(drow, self.k, axis=1)[:, self.k]
            radii[b1:e1] = part
        return radii

    def evaluate_pr(
        self, ref: np.ndarray, radii_ref: np.ndarray,
        sample: np.ndarray, radii_sample: np.ndarray,
    ) -> Tuple[float, float]:
        """Returns (precision, recall): precision = fraction of sample
        features inside any ref hypersphere; recall = vice versa."""
        in_ref = np.zeros((len(sample),), bool)     # sample in ref manifold
        in_sample = np.zeros((len(ref),), bool)     # ref in sample manifold
        for b1 in range(0, len(ref), self.row_batch):
            e1 = min(b1 + self.row_batch, len(ref))
            for b2 in range(0, len(sample), self.col_batch):
                e2 = min(b2 + self.col_batch, len(sample))
                d = _pairwise_dist2(ref[b1:e1], sample[b2:e2])
                in_sample[b1:e1] |= np.any(
                    d <= radii_sample[None, b2:e2], axis=1)
                in_ref[b2:e2] |= np.any(
                    d <= radii_ref[b1:e1, None], axis=0)
        return float(np.mean(in_ref)), float(np.mean(in_sample))


def evaluate_all(
    ref_features: np.ndarray,
    sample_features: np.ndarray,
    ref_spatial: Optional[np.ndarray] = None,
    sample_spatial: Optional[np.ndarray] = None,
    sample_probs: Optional[np.ndarray] = None,
    nhood_size: int = 3,
) -> Dict[str, float]:
    """Full metric suite (`openai_evaluator.py:26-59` main): IS, FID, sFID,
    Precision, Recall."""
    out: Dict[str, float] = {}
    if sample_probs is not None:
        out["inception_score"] = inception_score(sample_probs)
    out["fid"] = FIDStatistics.from_features(ref_features).frechet_distance(
        FIDStatistics.from_features(sample_features))
    if ref_spatial is not None and sample_spatial is not None:
        out["sfid"] = FIDStatistics.from_features(
            ref_spatial).frechet_distance(
            FIDStatistics.from_features(sample_spatial))
    est = ManifoldEstimator(nhood_size)
    radii_ref = est.manifold_radii(ref_features)
    radii_sample = est.manifold_radii(sample_features)
    prec, rec = est.evaluate_pr(
        ref_features, radii_ref, sample_features, radii_sample)
    out["precision"] = prec
    out["recall"] = rec
    return out
