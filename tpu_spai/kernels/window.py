"""Banded-window SpMV scheme: gather-free formulation for TPU.

Why: XLA's dynamic gather on TPU runs at ~0.13 G elements/s (scalar-unit
bound, measured on v5e) — hopeless for SpMV. This module replaces the
gather entirely:

  1. RCM-reorder the matrix so every row's columns lie within ``bw`` of the
     diagonal (host, once per topology).
  2. Tile rows by ``T``; tile j's columns then fall in a window of
     ``Q = ceil((T + 2 bw)/128) + 1`` aligned 128-lane chunks of x starting
     at chunk ``chunk_base[j]``.
  3. Encode each ELL slot's column as a *relative* index
     ``rel = col - 128*chunk_base[j]`` and split it as
     ``q = rel >> 7`` (which chunk) and ``l = rel & 127`` (which lane).
  4. The "gather" becomes two dense selects, both TPU-native:
       * chunk select: one-hot over Q contracted on the MXU
         ``rows[k,t,:] = sum_q (q_sel==q) * xw[q,:]``,
       * lane select: one-hot over 128 lanes on the VPU
         ``xg[k,t] = sum_c (l==c) * rows[k,t,c]``.

Cost: ~(Q + 3*128) VPU/MXU ops per nonzero — independent of matrix size,
vs ~8 ns/element for the XLA gather. Requires bounded bandwidth (FEM
matrices after RCM; the random synthetic family falls back to the gather
path).

This file: host-side plane construction + a pure-XLA reference
implementation (lax.scan over row tiles) used for numerics tests and CPU;
the production Pallas kernel lives in `spmv_pallas.py`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowedEll:
    """Gather-free SpMV planes for one (possibly transposed) operator.

    vals:  [b, b, K, N]  masked values in ELL order (component planes)
    qsel:  int32 [K, N]  chunk index within the tile's window (rel >> 7)
    lsel:  int32 [K, N]  lane index (rel & 127)
    chunk_base: int32 [n_tiles]  first x-chunk of each tile's window
    """

    vals: jax.Array
    qsel: jax.Array
    lsel: jax.Array
    chunk_base: jax.Array
    tile: int = _static(default=128)  # rows per tile (T)
    q_chunks: int = _static(default=4)  # window chunks (Q)
    n_nodes: int = _static(default=0)  # valid rows (pre-padding)

    @property
    def width(self) -> int:
        return self.vals.shape[2]


def build_windowed(
    ell_col: np.ndarray,
    ell_mask: np.ndarray,
    vals: np.ndarray,
    tile: int = 128,
    max_q: int = 64,
) -> Optional[WindowedEll]:
    """Build windowed planes from transposed ELL ([K, N]) host arrays.

    Returns None when the bandwidth is too large for the window scheme
    (caller falls back to the gather path). ``vals`` is [b, b, K, N]
    (masked). N is padded up to a tile multiple; x must be padded to
    ``n_chunks*128`` accordingly by the caller at apply time.
    """
    k, n = ell_col.shape
    b = vals.shape[0]
    n_pad = -(-n // tile) * tile
    pad = n_pad - n
    if pad:
        ell_col = np.concatenate([ell_col, np.zeros((k, pad), ell_col.dtype)], 1)
        ell_mask = np.concatenate([ell_mask, np.zeros((k, pad), ell_mask.dtype)], 1)
        vals = np.concatenate([vals, np.zeros(vals.shape[:3] + (pad,), vals.dtype)], 3)
    n_tiles = n_pad // tile
    cols_t = ell_col.reshape(k, n_tiles, tile)
    mask_t = ell_mask.reshape(k, n_tiles, tile) > 0
    # per-tile column range over *valid* slots
    big = np.where(mask_t, cols_t, np.iinfo(np.int32).max)
    small = np.where(mask_t, cols_t, -1)
    cmin = np.min(big, axis=(0, 2))
    cmax = np.max(small, axis=(0, 2))
    empty = cmin > cmax
    cmin = np.where(empty, 0, cmin)
    cmax = np.where(empty, 0, cmax)
    # align window starts to 8 chunks (sublane granularity for the in-kernel
    # dynamic slice of the chunked x)
    base = (cmin // LANE) & ~7
    q_need = (cmax // LANE) - base + 1
    q = int(-(-int(q_need.max()) // 8) * 8)
    if q > max_q:
        return None
    rel = cols_t - (base[None, :, None] * LANE)
    rel = np.where(mask_t, rel, 0)
    assert (rel >= 0).all() and (rel < q * LANE).all()
    return WindowedEll(
        vals=jnp.asarray(vals),
        qsel=jnp.asarray((rel >> 7).reshape(k, n_pad).astype(np.int32)),
        lsel=jnp.asarray((rel & 127).reshape(k, n_pad).astype(np.int32)),
        chunk_base=jnp.asarray(base.astype(np.int32)),
        tile=tile,
        q_chunks=q,
        n_nodes=n,
    )


def windowed_spmv_xla(w: WindowedEll, x: jax.Array) -> jax.Array:
    """Reference implementation: lax.scan over row tiles (CPU/tests).

    x: [N, b] -> y: [N, b]. Same two-level select as the Pallas kernel.
    """
    b = w.vals.shape[0]
    k = w.width
    t = w.tile
    q = w.q_chunks
    n_pad = w.vals.shape[3]
    n_tiles = n_pad // t
    # pad x to whole chunks + q extra so dynamic_slice never clips
    n_chunks = -(-w.n_nodes // LANE) + q
    xt = jnp.zeros((b, n_chunks * LANE), w.vals.dtype)
    xt = xt.at[:, : w.n_nodes].set(x.T.astype(w.vals.dtype))
    xc = xt.reshape(b, n_chunks, LANE)

    vals = w.vals.reshape(b, b, k, n_tiles, t)
    qsel = w.qsel.reshape(k, n_tiles, t)
    lsel = w.lsel.reshape(k, n_tiles, t)

    iota_q = jnp.arange(q, dtype=jnp.int32)
    iota_l = jnp.arange(LANE, dtype=jnp.int32)

    def tile_body(carry, inputs):
        v_j, q_j, l_j, base_j = inputs  # [b,b,k,t], [k,t], [k,t], scalar
        zero = jnp.int32(0)
        xw = jax.lax.dynamic_slice(
            xc, (zero, base_j, zero), (b, q, LANE)
        )  # [b,q,128]
        oh_q = (q_j[..., None] == iota_q).astype(w.vals.dtype)  # [k,t,q]
        rows = jnp.einsum("ktq,bqc->bktc", oh_q, xw, precision=jax.lax.Precision.HIGHEST)  # MXU chunk select
        oh_l = (l_j[..., None] == iota_l).astype(w.vals.dtype)  # [k,t,128]
        xg = jnp.einsum("bktc,ktc->bkt", rows, oh_l, precision=jax.lax.Precision.HIGHEST)  # VPU lane select
        y_j = jnp.einsum("pqkt,qkt->tp", v_j, xg, precision=jax.lax.Precision.HIGHEST)  # [t, b]
        return carry, y_j

    _, ys = jax.lax.scan(
        tile_body,
        None,
        (
            vals.transpose(3, 0, 1, 2, 4),
            qsel.transpose(1, 0, 2),
            lsel.transpose(1, 0, 2),
            w.chunk_base,
        ),
    )
    y = ys.reshape(n_pad, b)[: w.n_nodes]
    return y.astype(x.dtype)
