"""Static-shape substrate: resolution buckets, landscape canonicalization and
micro-batching.

The reference handles arbitrary mixes of aspect ratios at runtime with lists
of tensors (`multi_ar`), a dynamic chunking combinator
(`batched_map`, /root/reference/src/panst3r/utils.py:90-196) and a
portrait/landscape splitter (`transpose_to_landscape`, utils.py:8-61).  None
of that maps to XLA's trace-once compilation model, so this module replaces it
with:

- **Resolution buckets**: every image is resized into one of a small, fixed
  set of landscape resolutions (the reference already trains on a fixed
  bucket list, configs/base.yaml:46).  One compiled executable per bucket.
- **Landscape canonical layout**: images are always stored landscape
  (W >= H); a per-view ``portrait`` flag records that the semantic image is
  the transpose.  Heads therefore compile for exactly one orientation
  (halving compile count — the reference's `landscape_only` trick), and the
  flag only influences position-embedding generation and final
  host-side de-transposition.
- **micro_batched**: a jit-compatible replacement for `batched_map`: flatten
  the two leading axes, pad to a multiple of the micro-batch size, and
  `lax.map` the function over fixed-size chunks.  Bounds activation memory
  the same way `max_bs` does in the reference.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True, order=True)
class Bucket:
    """A landscape resolution bucket (height <= width)."""

    height: int
    width: int

    def __post_init__(self):
        assert self.width >= self.height, "buckets are landscape-canonical"

    @property
    def shape(self) -> tuple[int, int]:
        return (self.height, self.width)

    def grid(self, patch_size: int) -> tuple[int, int]:
        assert self.height % patch_size == 0 and self.width % patch_size == 0
        return (self.height // patch_size, self.width // patch_size)

    def num_patches(self, patch_size: int) -> int:
        h, w = self.grid(patch_size)
        return h * w


# The reference training bucket list (configs/base.yaml:46), landscape form.
DEFAULT_BUCKETS: tuple[Bucket, ...] = (
    Bucket(384, 512),
    Bucket(336, 512),
    Bucket(288, 512),
    Bucket(256, 512),
    Bucket(160, 512),
)


def landscape_shape(h: int, w: int) -> tuple[int, int, bool]:
    """Canonicalize (h, w) to landscape; returns (h', w', was_portrait)."""
    if h > w:
        return w, h, True
    return h, w, False


def bucket_for_shape(h: int, w: int,
                     buckets: Sequence[Bucket] = DEFAULT_BUCKETS) -> Bucket:
    """Pick the bucket whose aspect ratio best matches a (landscape) shape."""
    h, w, _ = landscape_shape(h, w)
    ar = w / h
    return min(buckets, key=lambda b: abs(b.width / b.height - ar))


def true_shape_of(bucket: Bucket, portrait) -> jnp.ndarray:
    """Per-view (H, W) 'true shape' given the portrait flag (traced ok)."""
    hw = jnp.asarray(bucket.shape, jnp.int32)
    return jnp.where(portrait, hw[::-1], hw)


def _pad_leading(x: jnp.ndarray, target: int) -> jnp.ndarray:
    pad = target - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)


def micro_batched(fn: Callable, micro_bs: int | None, flatten: bool = True):
    """jit-compatible `batched_map` (reference utils.py:90-196).

    ``fn`` maps a tuple of arrays with leading axis ``micro_bs`` to an array
    or tuple of arrays with the same leading axis.  The wrapper flattens the
    two leading axes of each input (if ``flatten``), pads to a multiple of
    ``micro_bs``, runs ``fn`` over chunks with ``lax.map`` (sequential — this
    is a memory-bounding construct, the chunk itself is the parallel unit),
    then unpads and unflattens.

    With ``micro_bs=None`` the function is applied in a single chunk.
    """

    def wrapper(*arrays):
        lead = arrays[0].shape[:2] if flatten else arrays[0].shape[:1]
        flat = [a.reshape(-1, *a.shape[len(lead):]) for a in arrays]
        n = flat[0].shape[0]
        bs = micro_bs if micro_bs is not None else n
        bs = min(bs, n)
        n_pad = -(-n // bs) * bs
        flat = [_pad_leading(a, n_pad) for a in flat]
        chunked = [a.reshape(n_pad // bs, bs, *a.shape[1:]) for a in flat]

        if n_pad == n and n_pad // bs == 1:
            out = fn(*flat)
        else:
            out = jax.lax.map(lambda xs: fn(*xs), tuple(chunked))
            out = jax.tree_util.tree_map(
                lambda o: o.reshape(-1, *o.shape[2:]), out)

        def _restore(o):
            o = o[:n]
            return o.reshape(*lead, *o.shape[1:])

        return jax.tree_util.tree_map(_restore, out)

    return wrapper


def transpose_to_landscape(images: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side canonicalization: transpose portrait images to landscape.

    ``images``: (N, H, W, C) possibly mixed-orientation is NOT supported —
    static shapes mean one bucket per call; this helper takes a single image
    (H, W, C) and returns (canonical_image, portrait_flag).
    """
    h, w = images.shape[:2]
    if h > w:
        return np.swapaxes(images, 0, 1), np.True_
    return images, np.False_
