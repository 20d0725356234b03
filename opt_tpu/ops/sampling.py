"""Bilinear image sampling with user-supplied derivative images.

Equivalent of the reference's ``SampledImage`` (API/src/o.t:2486-2501
``ad.sampledimage`` + o.t:578-590 ``Image:sample``): a 2-D image is sampled at
real-valued positions; its partial derivatives w.r.t. the sample position are
*not* obtained by differentiating the interpolation (which is only piecewise
smooth) but by bilinearly sampling user-supplied derivative images dx, dy —
exactly the reference's ``op:getpartials``. This is what optical_flow relies
on (examples/optical_flow/optical_flow.t).

Boundary semantics match the reference: out-of-bounds taps read as zero
(``Image:get``, o.t:570-576), and the corner indices are floor/ceil so that
integer positions hit texels exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _get_zero_pad(img: jnp.ndarray, xi: jnp.ndarray, yi: jnp.ndarray) -> jnp.ndarray:
    """img[xi, yi] with zero padding out of bounds.

    img: [W, H, C]; xi/yi: integer index fields of identical shape [...]. The
    first spatial dim is indexed by x, the second by y (reference Index{x,y}).
    """
    W, H = img.shape[0], img.shape[1]
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    xc = jnp.clip(xi, 0, W - 1)
    yc = jnp.clip(yi, 0, H - 1)
    vals = img[xc, yc]  # advanced indexing -> gather; [..., C]
    return jnp.where(inb[..., None], vals, jnp.zeros((), img.dtype))


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Reference-faithful bilinear sample (floor/ceil corners, zero pad)."""
    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = jnp.ceil(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    y1 = jnp.ceil(y).astype(jnp.int32)
    xn = (x - x0.astype(x.dtype))[..., None]
    yn = (y - y0.astype(y.dtype))[..., None]
    v00 = _get_zero_pad(img, x0, y0)
    v10 = _get_zero_pad(img, x1, y0)
    v01 = _get_zero_pad(img, x0, y1)
    v11 = _get_zero_pad(img, x1, y1)
    top = (1.0 - xn) * v00 + xn * v10
    bot = (1.0 - xn) * v01 + xn * v11
    return (1.0 - yn) * top + yn * bot


@functools.partial(jax.custom_jvp, nondiff_argnums=())
def sample_with_derivs(img, dx_img, dy_img, x, y):
    """Bilinear sample of ``img`` at (x, y); d/dx, d/dy taken from dx/dy images.

    img, dx_img, dy_img: [W, H, C]. x, y: position fields of equal shape [...].
    Returns [..., C]. Gradients do not flow into the image arguments (they are
    constant data in the reference DSL as well).
    """
    return _bilinear(img, x, y)


@sample_with_derivs.defjvp
def _sample_jvp(primals, tangents):
    img, dx_img, dy_img, x, y = primals
    _, _, _, tx, ty = tangents
    out = _bilinear(img, x, y)
    dx = _bilinear(dx_img, x, y)
    dy = _bilinear(dy_img, x, y)
    tx = jnp.zeros_like(x) if isinstance(tx, jax.custom_derivatives.SymbolicZero) else tx
    ty = jnp.zeros_like(y) if isinstance(ty, jax.custom_derivatives.SymbolicZero) else ty
    dout = dx * tx[..., None] + dy * ty[..., None]
    return out, dout


def central_difference_images(img: jnp.ndarray):
    """Convenience: build dx/dy derivative images by central differences.

    The reference requires users to supply derivative images (optical_flow
    computes them on the CPU); we offer this helper for parity-plus.
    """
    zeros_x = jnp.zeros_like(img[:1])
    zeros_y = jnp.zeros_like(img[:, :1])
    xp = jnp.concatenate([img[1:], zeros_x], axis=0)
    xm = jnp.concatenate([zeros_x, img[:-1]], axis=0)
    yp = jnp.concatenate([img[:, 1:], zeros_y], axis=1)
    ym = jnp.concatenate([zeros_y, img[:, :-1]], axis=1)
    return 0.5 * (xp - xm), 0.5 * (yp - ym)
