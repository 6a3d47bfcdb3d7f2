"""Ragged posting-list expansion with static shapes (device-side).

The reference walks each window's posting list with a serial loop
(reference: epik/src/epik/place.cpp:358-367).  Under XLA everything must be
static-shaped, so the variable-length posting lists of a whole batch are
flattened into one fixed-size slot array:

Given per-window posting lengths ``lens[i]`` (W windows) and a static slot
budget P, produce for each slot j in [0, P):

* ``win[j]``  -- which window the slot belongs to (-1 if beyond the total)
* ``elem[j]`` -- the index within that window's posting list

via the classic scatter + cumulative-max trick (one scatter of W values and
one associative scan -- no per-window loops, no sorts):

    starts = exclusive_cumsum(lens)
    mark[starts[i]] = i + 1      for lens[i] > 0      (scatter-max)
    win = cummax(mark) - 1
    elem = iota - starts[win]

Total work O(W + P); everything vectorizes on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ragged_expand"]


def ragged_expand(lens: jnp.ndarray, budget: int):
    """Expand ragged rows into a flat slot array of static size ``budget``.

    Args:
      lens: int32[W] row lengths (>= 0).
      budget: static total slot count P.

    Returns:
      (win, elem, total): int32[P] window index per slot (-1 for slots past
      the total), int32[P] element index within the window, and the true
      total number of postings (int32 scalar; if total > budget the caller
      must retry with a larger budget -- see PlacerConfig.posting_budget).
    """
    lens = lens.astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(lens)[:-1]])
    total = jnp.sum(lens)

    w = lens.shape[0]
    win_ids = jnp.arange(1, w + 1, dtype=jnp.int32)
    # scatter window-id marks at row starts; rows with len==0 are parked at
    # slot `budget` (dropped).  Equal starts cannot collide otherwise.
    pos = jnp.where(lens > 0, starts, jnp.int32(budget))
    mark = jnp.zeros(budget, jnp.int32).at[pos].max(win_ids, mode="drop")
    win = jax.lax.cummax(mark) - 1

    slot = jnp.arange(budget, dtype=jnp.int32)
    in_range = slot < total
    win = jnp.where(in_range, win, -1)
    safe_win = jnp.maximum(win, 0)
    elem = jnp.where(in_range, slot - starts[safe_win], 0)
    return win, elem, total
