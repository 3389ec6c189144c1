"""Sliding-window hit-density scan over reference positions.

Reference semantics (bin/extract_ref.cpp slide_window :504-624):

* per position j: ``hit_coder_num`` = #coders whose count-table value
  equals least_depth (=3) — looking up hash 0 is always a miss
  (:861-866); ``single`` = ≥1 coder, ``trio`` = all 3 coders.
* windowed counts over 500 bp: growing prefix for j<window, then
  sliding (:548-559).  A window is "good" when
  ``one_coder_bases ≥ int(window·hit_ratio)`` AND
  ``three_coder_bases ≥ int(window·perfect_hit_ratio)`` — the
  thresholds truncate the *float32* product like the C++
  ``int = int·float`` (e.g. 0.7f·10 → 6, not 7) (:513-514).
* state machine emits intervals [j_enter − 2·window, j_leave + 2·window]
  clamped to [1, ref_len], merging intervals whose gap < window
  (:568-609); a run still open at the end closes at ref_len (:599).
* refs whose merged interval length exceeds 75 % of ``ref_len`` (and
  el>0) are reported: ``ref_index idx frag el len ratio`` (:611-617).

Only positions 0..ref_len−k hold real hashes; the trailing k−1
positions count as misses (the reference reads freshly-zeroed heap
there).

The per-base windowed-count part runs on device (cumsum difference);
the interval state machine runs on host over the ~per-transition
events (cheap).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bucket_len(n: int, minimum: int = 4096) -> int:
    """Round up to the next {2^k, 1.5·2^k} bucket so jitted scans see a
    bounded set of shapes (≤2 per octave) instead of one compile per
    distinct reference length; padding waste ≤ 50 %."""
    if n <= minimum:
        return minimum
    p = 1 << (int(n - 1).bit_length() - 1)  # largest power of two < n
    if n <= p + p // 2:
        return p + p // 2
    return 2 * p


def window_thresholds(window: int, hit_ratio: float, perfect_hit_ratio: float) -> Tuple[int, int]:
    """C++ ``int m = window * (float)ratio`` truncation semantics."""
    one_min = int(np.float32(window) * np.float32(hit_ratio))
    three_min = int(np.float32(window) * np.float32(perfect_hit_ratio))
    return one_min, three_min


@functools.partial(jax.jit, static_argnames=("window", "one_min", "three_min"))
def good_windows(
    counts: jnp.ndarray,
    hashes: jnp.ndarray,
    window: int,
    one_min: int,
    three_min: int,
    least_depth: int = 3,
) -> jnp.ndarray:
    """Per-position good-window booleans.

    counts: (L, 3) uint8 count-table values per (position, coder)
            (pad positions beyond ref_len-k with zeros)
    hashes: (L, 3) uint32 (hash==0 ⇒ permanent miss)
    Returns good: (L,) bool.
    """
    hit = (counts == least_depth) & (hashes != 0)
    hit_num = jnp.sum(hit.astype(jnp.int32), axis=1)  # (L,)
    single = (hit_num > 0).astype(jnp.int32)
    trio = (hit_num == 3).astype(jnp.int32)

    cs = jnp.cumsum(single)
    ct = jnp.cumsum(trio)
    L = counts.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)[:, 0]
    # j < window: prefix sums; else sliding window [j-window+1 .. j]
    one = jnp.where(pos < window, cs, cs - jnp.roll(cs, window))
    three = jnp.where(pos < window, ct, ct - jnp.roll(ct, window))
    return (one >= one_min) & (three >= three_min)


def good_windows_batch(
    counts: jnp.ndarray,
    hashes: jnp.ndarray,
    window: int,
    one_min: int,
    three_min: int,
    least_depth: int = 3,
) -> jnp.ndarray:
    """Batched (traceable) ``good_windows``: counts/hashes (NB, L, 3)
    → good (NB, L).  Row semantics identical to the single-ref form —
    the cumsum/roll window runs along axis 1 independently per row, so
    one dispatch scans a whole chunk of same-bucket references
    (extract_ref.cpp streams refs thread-split; here they stack)."""
    hit = (counts == least_depth) & (hashes != 0)
    hit_num = jnp.sum(hit.astype(jnp.int32), axis=2)      # (NB, L)
    single = (hit_num > 0).astype(jnp.int32)
    trio = (hit_num == 3).astype(jnp.int32)
    cs = jnp.cumsum(single, axis=1)
    ct = jnp.cumsum(trio, axis=1)
    NB, L = hit_num.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (NB, L), 1)
    one = jnp.where(pos < window, cs, cs - jnp.roll(cs, window, axis=1))
    three = jnp.where(pos < window, ct, ct - jnp.roll(ct, window, axis=1))
    return (one >= one_min) & (three >= three_min)


def intervals_from_good(good: np.ndarray, ref_len: int, window: int) -> List[Tuple[int, int]]:
    """Replay the reference interval state machine over transition
    events (extract_ref.cpp:568-609)."""
    good = np.asarray(good, dtype=bool)
    out: List[Tuple[int, int]] = []
    # transition indices: j where good changes vs j-1, plus j=0
    padded = np.concatenate([[False], good])
    enters = np.flatnonzero(~padded[:-1] & good)       # first good j of a run
    leaves = np.flatnonzero(padded[:-1] & ~good)       # first bad j after a run
    li = 0
    for e in enters:
        start = max(e - 2 * window, 1)
        # find the matching leave
        while li < len(leaves) and leaves[li] <= e:
            li += 1
        if li < len(leaves):
            end = min(leaves[li] + 2 * window, ref_len)
        else:
            end = ref_len  # run open at EOF (:599-609)
        if out and start - out[-1][1] < window:
            out[-1] = (out[-1][0], end)
        else:
            out.append((start, end))
    return out


@dataclass
class RefHit:
    ref_index: int
    frag_count: int
    covered: int
    ref_len: int
    ratio: float

    def line(self) -> str:
        """stdout line format of extract_ref.cpp:617.  The reference's
        ``el_ratio`` is a C ``float`` printed by cout at default
        precision (6 significant digits); round through float32 so the
        text is byte-identical."""
        return (
            f"ref_index\t{self.ref_index}\t{self.frag_count}\t{self.covered}"
            f"\t{self.ref_len}\t{float(np.float32(self.ratio)):g}"
        )


def scan_reference(
    counts: np.ndarray,
    hashes: np.ndarray,
    ref_index: int,
    ref_len: int,
    window: int = 500,
    hit_ratio: float = 0.9,
    perfect_hit_ratio: float = 0.85,
    min_cover_ratio: float = 0.75,
    least_depth: int = 3,
) -> RefHit | None:
    """Full per-reference scan; counts/hashes cover the first
    ref_len-k+1 positions (the caller may pass them zero-padded to
    ref_len).  Returns a RefHit when coverage > min_cover_ratio."""
    L = counts.shape[0]
    # pad to the length bucket (one jit shape per bucket, not per ref);
    # padded positions have hash 0 ⇒ permanent miss, and the good flags
    # are sliced back to ref_len before the interval machine.
    target = bucket_len(max(ref_len, L))
    counts = jnp.asarray(counts)
    hashes = jnp.asarray(hashes)
    if L < target:
        counts = jnp.pad(counts, ((0, target - L), (0, 0)))
        hashes = jnp.pad(hashes, ((0, target - L), (0, 0)))
    one_min, three_min = window_thresholds(window, hit_ratio, perfect_hit_ratio)
    from palace_tpu.ops.pallas_kernels import good_windows_pallas, use_pallas

    gw = good_windows_pallas if use_pallas() else good_windows
    good = np.asarray(
        gw(counts, hashes, window, one_min, three_min, least_depth)
    )[:ref_len]
    iv = intervals_from_good(good, ref_len, window)
    el = sum(e - s for s, e in iv)
    # float(el)/float(ref_len) in the reference — float32 arithmetic
    ratio = float(np.float32(el) / np.float32(ref_len)) if ref_len else 0.0
    if el > 0 and np.float32(ratio) > np.float32(min_cover_ratio):
        return RefHit(ref_index, len(iv), el, ref_len, ratio)
    return None
