"""Positional-embedding math for FiT: 2D sincos tables and 2D rotary (RoPE)
frequency tables with VisionNTK length extrapolation.

These are pure numpy functions evaluated host-side (the tables are small —
``(T, head_dim)`` — and data-dependent on image geometry, so they are built on
the host and fed to the jitted model as regular array inputs).

Numerical contract (parity with the reference implementation at
/root/reference/FiT/preprocess/pos_embed.py):

* sincos tables (``sincos_2d``): frequency vector computed in float64
  (reference ``pos_embed.py:96-98``), table returned float64 and cast by
  callers — we return float32 directly via an explicit cast at the end so
  values are bit-identical to ``reference.astype(np.float32)``.
* RoPE tables (``rope_freqs_2d``): frequencies and angles computed in
  float32 throughout (reference ``pos_embed.py:125-129``), so the emitted
  cos/sin values match the reference bit-for-bit.
* VisionNTK (reference ``pos_embed.py:120-123``): when ``max_length`` is
  given, the rotary base is rescaled ``theta' = theta * s**(d/(d-2))`` with
  ``s = max(max(pos)/sqrt(max_length), 1)`` — identity for token counts at or
  below the training budget, smooth extrapolation beyond it.

Layout of the returned RoPE table, for ``dim`` = head_dim (e.g. 64):
per token the vector is ``[w-axis: cos f0, sin f0, ..., cos f15, sin f15,
h-axis: cos f0, sin f0, ...]`` — i.e. the first half of the head dim rotates
by x/width-position angles, the second half by y/height-position angles
(reference ``pos_embed.py:111-113`` concatenates w first).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = [
    "sincos_1d",
    "sincos_2d",
    "rope_freqs_2d",
    "rope_freqs_1d_from_positions",
    "ntk_scaled_theta",
    "grid_positions_2d",
    # aliases matching the reference public API
    "get_1d_sincos_pos_embed",
    "get_2d_sincos_pos_embed",
    "precompute_freqs_cis_2d",
]


def grid_positions_2d(nh: int, nw: int) -> Tuple[np.ndarray, np.ndarray]:
    """Flattened (w, h) position grids for an nh x nw patch grid, row-major.

    Token ordering is row-major over (h, w) — token ``i`` sits at
    ``(h=i//nw, w=i%nw)`` — matching the reference meshgrid construction
    (``pos_embed.py:66-72``: ``np.meshgrid(grid_w, grid_h)`` with w first).
    """
    grid_h = np.arange(nh, dtype=np.float32)
    grid_w = np.arange(nw, dtype=np.float32)
    pos_w, pos_h = np.meshgrid(grid_w, grid_h)  # each (nh, nw)
    return pos_w.reshape(-1), pos_h.reshape(-1)


# ---------------------------------------------------------------------------
# Absolute 2D sincos embeddings (used when pos="absolute")
# ---------------------------------------------------------------------------


def _sincos_from_positions(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """(M,) positions -> (M, embed_dim) [sin | cos] table.

    Frequencies are computed in float64 for accuracy (reference
    ``pos_embed.py:96-98``).
    """
    assert embed_dim % 2 == 0, "sincos embed_dim must be even"
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    angles = np.outer(pos, omega)  # (M, D/2), float64
    return np.concatenate([np.sin(angles), np.cos(angles)], axis=1)


def sincos_1d(embed_dim: int, length: int) -> np.ndarray:
    """1D sincos table of shape (length, embed_dim), float32."""
    pos = np.arange(length).reshape(-1)
    return _sincos_from_positions(embed_dim, pos).astype(np.float32)


def sincos_2d(embed_dim: int, nh: int, nw: Optional[int] = None) -> np.ndarray:
    """2D sincos table of shape (nh*nw, embed_dim), float32.

    First half of the channel dim encodes the w-axis, second half the h-axis
    (reference ``pos_embed.py:78-86``: ``concat([emb_w, emb_h])``).
    """
    nw = nh if nw is None else nw
    pos_w, pos_h = grid_positions_2d(nh, nw)
    emb_w = _sincos_from_positions(embed_dim // 2, pos_w)
    emb_h = _sincos_from_positions(embed_dim // 2, pos_h)
    return np.concatenate([emb_w, emb_h], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# 2D rotary embeddings (RoPE) with VisionNTK extrapolation
# ---------------------------------------------------------------------------


def ntk_scaled_theta(theta: float, dim: int, pos: np.ndarray, max_length: int) -> float:
    """VisionNTK base rescaling (FiT paper eq.; reference ``pos_embed.py:120-123``).

    ``s = max(max(pos) / sqrt(max_length), 1)`` then ``theta * s**(dim/(dim-2))``.
    ``s == 1`` (identity) whenever the largest grid coordinate does not exceed
    ``sqrt(max_length)`` — i.e. square images within the training budget.
    """
    s = max(np.max(pos) / np.sqrt(max_length), 1.0)
    return theta * np.power(s, dim / (dim - 2))


def rope_freqs_1d_from_positions(
    dim: int,
    pos: np.ndarray,
    theta: float = 10000.0,
    max_length: Optional[int] = None,
) -> np.ndarray:
    """Per-position rotary cos/sin pairs: (M, dim//2, 2) float32.

    ``out[m, j] = [cos(pos[m] * f_j), sin(pos[m] * f_j)]`` with
    ``f_j = theta**(-2j/dim)``. All math in float32 to match the reference
    (``pos_embed.py:125-129``).
    """
    if max_length is not None:
        theta = ntk_scaled_theta(theta, dim, pos, max_length)
    exponents = np.arange(0, dim, 2, dtype=np.float32)[: dim // 2] / dim
    freqs = 1.0 / theta**exponents  # float32 (python-scalar base is weak-typed)
    angles = np.outer(pos, freqs)  # (M, dim//2) float32
    return np.stack([np.cos(angles), np.sin(angles)], axis=-1)


def rope_freqs_2d(
    dim: int,
    nh: int,
    nw: Optional[int] = None,
    theta: float = 10000.0,
    max_length: Optional[int] = None,
) -> np.ndarray:
    """2D RoPE table of shape (nh*nw, dim), float32.

    ``dim`` is the attention head dim. Each axis gets ``dim//2`` channels
    (= ``dim//4`` complex pairs): w-axis pairs first, then h-axis pairs
    (reference ``pos_embed.py:108-114``). The trailing dim interleaves
    (cos, sin) per pair, so consumers reshape to ``(T, dim//2, 2)``.

    Passing ``max_length`` activates VisionNTK rescaling — done only on the
    inference path in the reference (``FiT/train.py:142``), never for training
    tables (``FiT/preprocess/iterators.py:136``).

    Dtype note: without ``max_length`` all math is float32. With ``max_length``
    the NTK-scaled theta is a numpy float64 scalar, which (as in the reference)
    promotes the whole table to float64; callers cast to float32 at the
    boundary. We preserve this so emitted values are bit-identical.
    """
    nw = nh if nw is None else nw
    pos_w, pos_h = grid_positions_2d(nh, nw)
    pairs_w = rope_freqs_1d_from_positions(dim // 2, pos_w, theta, max_length)
    pairs_h = rope_freqs_1d_from_positions(dim // 2, pos_h, theta, max_length)
    pairs = np.concatenate([pairs_w, pairs_h], axis=1)  # (T, dim//2, 2)
    return pairs.reshape(pairs.shape[0], -1)


# Reference-named aliases so users migrating from the PyTorch repo find the
# same entry points (reference ``pos_embed.py:6-13``).
get_1d_sincos_pos_embed = sincos_1d
get_2d_sincos_pos_embed = sincos_2d
precompute_freqs_cis_2d = rope_freqs_2d
