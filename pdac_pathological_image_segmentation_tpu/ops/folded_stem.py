"""Space-to-depth folding of the ResNet stem convolution.

The stem (7×7, stride 2, pad 3, 3→64 channels; reference
``models/resunet.py:25`` via torchvision) is the classic TPU-unfriendly
conv: a 3-channel input leaves the MXU contraction dimension nearly empty.
The standard exact rewrite regroups 2×2 input pixels into channels
(space-to-depth) so the same arithmetic runs as a stride-1 4×4 conv over 12
channels:

    y[i,j,o] = Σ_{u,v,c} w[u,v,c,o] · xp[2i+u, 2j+v, c]          (xp = pad 3)
             = Σ_{k,l,p,q,c} w[2k+p, 2l+q, c, o] · X2[i+k, j+l, (p,q,c)]

with ``X2[a,b,(p,q,c)] = xp[2a+p, 2b+q, c]`` — a pure re-indexing, so the
fold is bit-exact and differentiable (the weight regrouping is
pad+reshape+transpose, through which gradients flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fold_stem_weights(w: jax.Array) -> jax.Array:
    """(7,7,C,O) stem kernel → (4,4,4·C,O) space-to-depth kernel."""
    kh, kw, c, o = w.shape
    assert kh == 7 and kw == 7, "stem fold is specialized to 7×7 kernels"
    w = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (8,8,C,O)
    w = w.reshape(4, 2, 4, 2, c, o)  # (k,p,l,q,c,o)
    w = w.transpose(0, 2, 1, 3, 4, 5)  # (k,l,p,q,c,o)
    return w.reshape(4, 4, 4 * c, o)


def space_to_depth_input(x: jax.Array) -> jax.Array:
    """NHWC input → padded space-to-depth layout matching
    :func:`fold_stem_weights` (channel order (p, q, c))."""
    n, h, w, c = x.shape
    # stem pad 3 on both sides, +1 on the far side when needed so the
    # padded extent is even (h+6 is even for even h)
    x = jnp.pad(x, ((0, 0), (3, 3 + h % 2), (3, 3 + w % 2), (0, 0)))
    h2, w2 = (h + 6 + h % 2) // 2, (w + 6 + w % 2) // 2
    x = x.reshape(n, h2, 2, w2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (n, h2, w2, p, q, c)
    return x.reshape(n, h2, w2, 4 * c)


def folded_stem_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    """Exact replacement for conv(x, w, stride=2, pad=3): a stride-1 VALID
    4×4 conv over the space-to-depth input."""
    x2 = space_to_depth_input(x)
    w2 = fold_stem_weights(w.astype(x2.dtype))
    return jax.lax.conv_general_dilated(
        x2, w2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
