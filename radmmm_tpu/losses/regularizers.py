"""Embedding-table regularizers for speaker/accent disentanglement.

Reference: loss.py:252-347 — VICReg-style variance + covariance penalties on
embedding tables, speaker<->accent cross-covariance minimization, and an MSE
invariance loss. Pure functions over embedding matrices.
"""
from __future__ import annotations

import jax.numpy as jnp


class VarianceCovarianceEmbeddingRegLoss:
    """Variance hinge + off-diagonal covariance penalty (loss.py:314-347)."""

    def __init__(self, name, loss_variance_weight, loss_covariance_weight,
                 gamma=1.0):
        self.name = name
        self.loss_variance_weight = float(loss_variance_weight)
        self.loss_covariance_weight = float(loss_covariance_weight)
        self.gamma = gamma

    def __call__(self, embs: jnp.ndarray):
        n, d = embs.shape
        # torch.var defaults to the unbiased (n-1) estimator (loss.py:334)
        std = jnp.sqrt(embs.var(axis=0, ddof=1) + 1e-4)
        std_loss = jnp.mean(jnp.maximum(self.gamma - std, 0.0))
        centered = embs - embs.mean(axis=0, keepdims=True)
        cov = centered.T @ centered / (n - 1)
        off = cov * (1.0 - jnp.eye(d))
        cov_loss = jnp.sum(off ** 2) / d
        return {
            f"loss_{self.name}_variance": (std_loss,
                                           self.loss_variance_weight),
            f"loss_{self.name}_covariance": (cov_loss,
                                             self.loss_covariance_weight),
        }


class AttributeMinCrossCovarianceRegLoss:
    """Minimize batch cross-covariance between two embedding spaces
    (loss.py:252-296)."""

    def __init__(self, attr_name1, attr_name2, loss_cross_covariance_weight,
                 gamma=1.0):
        self.attr_name1 = attr_name1
        self.attr_name2 = attr_name2
        self.weight = float(loss_cross_covariance_weight)

    def __call__(self, batch_attr1, batch_attr2, attr1_table=None,
                 attr2_table=None):
        t1 = attr1_table if attr1_table is not None else batch_attr1
        t2 = attr2_table if attr2_table is not None else batch_attr2
        d1, d2 = t1.shape[1], t2.shape[1]
        n = batch_attr1.shape[0]
        a1 = batch_attr1 - t1.mean(axis=0, keepdims=True)
        a2 = batch_attr2 - t2.mean(axis=0, keepdims=True)
        cross = a1.T @ a2 / (n - 1)
        loss = jnp.sum(cross ** 2) / (d1 * d2)
        key = f"loss_{self.attr_name1}-{self.attr_name2}_cross_covariance"
        return {key: (loss, self.weight)}


class AttributeInvariance:
    """MSE between embeddings and transformed embeddings (loss.py:299-311)."""

    def __init__(self, name, loss_invariance_weight):
        self.name = name
        self.weight = float(loss_invariance_weight)

    def __call__(self, embeddings, transformed_embeddings):
        loss = jnp.mean((embeddings - transformed_embeddings) ** 2)
        return {f"loss_{self.name}_invariance": (loss, self.weight)}
