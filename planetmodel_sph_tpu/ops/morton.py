"""Morton (Z-order) codes for spatial sorting.

The reference gets spatial locality from Unity.Physics' 4-wide BVH built every
step over particle AABBs (``BoundingVolumeHierarchyBuilder.cs``). On TPU we
replace the pointer tree with a Morton order: 10 bits per axis interleaved
into a 30-bit code, so sorting particles by code linearizes an implicit octree
(level-ℓ cells are 3ℓ-bit code prefixes, each occupied cell a contiguous run
of the sorted array). See PAPERS.md (space-filling-curve neighbor search in
Gadget3 et al.) for the lineage of this layout.
"""

from __future__ import annotations

import jax.numpy as jnp

BITS_PER_AXIS = 10
MAX_LEVEL = BITS_PER_AXIS  # octree levels 0 (root) .. 10


def expand_bits(x):
    """Spread the low 10 bits of x so there are 2 zero bits between each.

    Classic magic-mask bit dilation (public-domain technique, e.g. Karras
    2012 LBVH). x: int32 array with values in [0, 1024).
    """
    x = x.astype(jnp.uint32) & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def encode(pos, lo, hi):
    """30-bit Morton codes for pos [N,3] within the AABB [lo, hi].

    Points are clamped into the box (the box is normally the exact bounds of
    the point set). Returns int32 in [0, 2^30).
    """
    span = jnp.maximum(hi - lo, 1e-30)
    u = (pos - lo) / span                     # [0,1]
    q = jnp.clip((u * 1024.0).astype(jnp.int32), 0, 1023)
    code = (
        expand_bits(q[:, 0])
        | (expand_bits(q[:, 1]) << 1)
        | (expand_bits(q[:, 2]) << 2)
    )
    return code.astype(jnp.int32)


def cell_of(code, level):
    """Level-ℓ cell id of a 30-bit code (its 3ℓ-bit prefix)."""
    return code >> (3 * (MAX_LEVEL - level))
