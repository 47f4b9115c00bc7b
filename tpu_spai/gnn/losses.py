"""Self-supervised training losses (all 11 reference variants).

Parity with neural_cg/loss.py:119-461. Every loss takes
``(batch: GraphBatch, d, L_values)`` where ``d`` is the preconditioner
output ``M^{-1} r`` and ``L_values`` the predicted factor blocks, and
returns a scalar. Per-sample normalization — the reference's
``batch.ptr`` python loops (loss.py:131-141) — is segment reductions
here: one `segment_sum` per batch, fully jittable, padding dropped via the
extra segment.

Behavioral notes carried over intentionally:
  * ``rel_l2``'s eps is added to the *squared* norm (loss.py:23-26).
  * ``cg_alpha`` uses a +1e-6 guard on the denominator (loss.py:70-84).
  * PropLoss/RelPropLoss compute their proportional term but the reference
    returns ``F.mse_loss(Ad, r)`` instead (loss.py:341-402 — the
    accumulated ``loss`` is discarded); we reproduce the *returned*
    quantity and keep the proportional term available as
    ``prop_loss_term`` for users who want the documented behavior.
  * ``batch_less=True`` treats the whole batch as a single sample
    (loss.py:128-131).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..kernels.spmv_xla import spmv
from ..data.batching import GraphBatch

LossFn = Callable[[GraphBatch, jax.Array, jax.Array], jax.Array]


def _seg(batch: GraphBatch, batch_less: bool):
    """(segment ids, num real segments) for per-sample reductions."""
    if batch_less:
        seg = jnp.where(batch.node_valid > 0, 0, 1).astype(jnp.int32)
        return seg, 1
    return batch.node_seg, batch.n_graphs


def _seg_sq(v: jax.Array, seg: jax.Array, n: int) -> jax.Array:
    """Per-sample sum of squares of [N, b] -> [n]."""
    return jax.ops.segment_sum(jnp.sum(v * v, axis=-1), seg, num_segments=n + 1)[:n]


def _seg_dot(a: jax.Array, b: jax.Array, seg: jax.Array, n: int) -> jax.Array:
    return jax.ops.segment_sum(jnp.sum(a * b, axis=-1), seg, num_segments=n + 1)[:n]


def _rel_l2(pred, gt, seg, n, sqr_out=True, eps=1e-6):
    """mean_s ||pred-gt||^2 / (||gt||^2 + eps)   (loss.py:10-26)."""
    err2 = _seg_sq(pred - gt, seg, n)
    gt2 = _seg_sq(gt, seg, n)
    if sqr_out:
        per = err2 / (gt2 + eps)
    else:
        per = jnp.sqrt(err2) / (jnp.sqrt(gt2) + eps)
    return jnp.sum(per) / n


def _cosine(pred, gt, seg, n, eps=1e-6):
    """mean_s (1 - cos(pred_flat, gt_flat))  (loss.py:63-68)."""
    num = _seg_dot(pred, gt, seg, n)
    na = jnp.sqrt(_seg_sq(pred, seg, n))
    nb = jnp.sqrt(_seg_sq(gt, seg, n))
    cs = num / jnp.maximum(na * nb, eps)
    return jnp.sum(1.0 - cs) / n


def _cg_alpha(r, d, q, seg, n):
    """alpha_s = <r,d>_s / (<d,q>_s + 1e-6), broadcast back to nodes."""
    rd = _seg_dot(r, d, seg, n)
    dq = _seg_dot(d, q, seg, n)
    alpha = rd / (dq + 1e-6)
    alpha_full = jnp.concatenate([alpha, jnp.zeros(1, alpha.dtype)])
    return alpha_full[jnp.clip(seg, 0, n)][:, None]


def _mse(pred, gt, batch: GraphBatch):
    """Mean squared error over valid entries only (padding excluded)."""
    diff = (pred - gt) * batch.node_valid[:, None]
    count = jnp.sum(batch.node_valid) * pred.shape[-1]
    return jnp.sum(diff * diff) / count


def _mae(pred, gt, batch: GraphBatch):
    diff = jnp.abs(pred - gt) * batch.node_valid[:, None]
    count = jnp.sum(batch.node_valid) * pred.shape[-1]
    return jnp.sum(diff) / count


def _Ad(batch: GraphBatch, d: jax.Array) -> jax.Array:
    return spmv(batch.graph, d, mask=batch.mask)


# --- loss implementations (names mirror loss.py) ---------------------------


def nif_loss_norm(batch, d, L_values, *, batch_less=False, sqr_out=True, eps=1e-6):
    """rel_l2(d, A r) — NifLoss (loss.py:119-141; spmv without mask)."""
    seg, n = _seg(batch, batch_less)
    ar = spmv(batch.graph, batch.residual)
    return _rel_l2(d, ar, seg, n, sqr_out, eps)


def relative_l2_plain(batch, d, L_values, *, batch_less=False, sqr_out=True, eps=1e-6):
    seg, n = _seg(batch, batch_less)
    assert batch.gt is not None, "RelativeL2Loss_PlainNorm needs ground truth"
    return _rel_l2(d, batch.gt, seg, n, sqr_out, eps)


def relative_l2_anorm(batch, d, L_values, *, batch_less=False, sqr_out=True, eps=1e-6):
    """The default production loss (config/loss.yaml): rel_l2(A d, r)."""
    seg, n = _seg(batch, batch_less)
    return _rel_l2(_Ad(batch, d), batch.residual, seg, n, sqr_out, eps)


def l2_anorm(batch, d, L_values, *, batch_less=False, **_):
    return _mse(_Ad(batch, d), batch.residual, batch)


def cosine_plain(batch, d, L_values, *, batch_less=False, eps=1e-6):
    seg, n = _seg(batch, batch_less)
    assert batch.gt is not None
    return _cosine(d, batch.gt, seg, n, eps)


def cosine_anorm(batch, d, L_values, *, batch_less=False, eps=1e-6):
    seg, n = _seg(batch, batch_less)
    return _cosine(_Ad(batch, d), batch.residual, seg, n, eps)


def conjgrad_plain(batch, d, L_values, *, batch_less=False, sqr_out=True, eps=1e-6):
    seg, n = _seg(batch, batch_less)
    assert batch.gt is not None
    ad = _Ad(batch, d)
    alpha = _cg_alpha(batch.residual, d, ad, seg, n)
    return _rel_l2(alpha * d, batch.gt, seg, n, sqr_out, eps)


def conjgrad_anorm(batch, d, L_values, *, batch_less=False, sqr_out=True, eps=1e-6):
    seg, n = _seg(batch, batch_less)
    ad = _Ad(batch, d)
    alpha = _cg_alpha(batch.residual, d, ad, seg, n)
    return _rel_l2(alpha * ad, batch.residual, seg, n, sqr_out, eps)


def conjgrad_anorm_norelative(batch, d, L_values, *, batch_less=False, **_):
    """MSE(alpha*Ad, r) per sample, averaged (loss.py:310-339)."""
    seg, n = _seg(batch, batch_less)
    ad = _Ad(batch, d)
    alpha = _cg_alpha(batch.residual, d, ad, seg, n)
    err = (alpha * ad - batch.residual) * batch.node_valid[:, None]
    # per-sample mean then average over samples (F.mse_loss per slice)
    cnt = jax.ops.segment_sum(batch.node_valid, seg, num_segments=n + 1)[:n]
    err2 = _seg_sq(err, seg, n)
    per = err2 / jnp.maximum(cnt * err.shape[-1], 1.0)
    return jnp.sum(per) / n


def prop_loss_term(batch, d, *, batch_less=False):
    """The proportional term sum_s(||Ad||^2 - <Ad,r>^2/||r||^2) that
    PropLoss computes (loss.py:341-371) before discarding it."""
    seg, n = _seg(batch, batch_less)
    ad = _Ad(batch, d)
    n2ad = _seg_sq(ad, seg, n)
    adr = _seg_dot(ad, batch.residual, seg, n)
    n2r = _seg_sq(batch.residual, seg, n)
    return jnp.sum(n2ad - adr * adr / n2r)


def prop_loss(batch, d, L_values, *, batch_less=False, **_):
    """Reference PropLoss *returns* mse(Ad, r) (loss.py:370: the loop's
    accumulated value is dead); reproduced faithfully."""
    return _mse(_Ad(batch, d), batch.residual, batch)


def rel_prop_loss(batch, d, L_values, *, batch_less=False, **_):
    """Reference RelPropLoss likewise returns mse(Ad, r) (loss.py:402)."""
    return _mse(_Ad(batch, d), batch.residual, batch)


def l1_loss(batch, d, L_values, *, batch_less=False, **_):
    return _mae(_Ad(batch, d), batch.residual, batch)


_REGISTRY = {
    "relativel2loss_plainnorm": relative_l2_plain,
    "relativel2loss_anorm": relative_l2_anorm,
    "l2loss_anorm": l2_anorm,
    "proploss": prop_loss,
    "l1loss": l1_loss,
    "relproploss": rel_prop_loss,
    "cosinesimilarityloss_plainnorm": cosine_plain,
    "cosinesimilarityloss_anorm": cosine_anorm,
    "conjgradloss_plainnorm": conjgrad_plain,
    "conjgradloss_anorm": conjgrad_anorm,
    "conjgradloss_anorm_norelative": conjgrad_anorm_norelative,
    "nifloss_norm": nif_loss_norm,
}


def create_loss(name: str, batch_less: bool = False, block_size: int = 1, **params) -> LossFn:
    """Loss registry (~ loss.py:420-461 create_loss_item)."""
    key = name.lower()
    if key not in _REGISTRY:
        raise ValueError(f"Unknown loss {name}")
    fn = _REGISTRY[key]
    return partial(fn, batch_less=batch_less, **params)
