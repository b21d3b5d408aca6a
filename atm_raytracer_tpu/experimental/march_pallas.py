"""Coarse-RK4 ray march as ONE Pallas kernel launch (experimental).

Moved out of physics/ray.py (see experimental/__init__.py for the
decision): interpret-mode parity-tested, but the remote AOT Mosaic
toolchain compiles the fori_loop body per-iteration (~1 s/step), so the
default march is the XLA scan in physics.ray.march_rays.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..physics.ray import eval_l_poly

def march_nodes_pallas(
    alt: jnp.ndarray,  # [B]
    v0: jnp.ndarray,  # [B]
    dx: float,
    n_coarse: int,
    poly: Tuple,
    radius: Optional[float],
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RK4 node integration as ONE Pallas kernel: [Nc+1, B] (h, v) nodes.

    The XLA scan pays heavy per-iteration dispatch overhead regardless of
    work (the state is a few [B] vectors), so hundreds of coarse steps cost
    tens of ms. In-kernel, the whole march is one launch, and l(h) is the
    compiled piecewise-Chebyshev form — pure VPU math, no gathers (Mosaic's
    dynamic_gather cannot span more than one vreg, so a VMEM lookup table
    is not an option).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lanes = 128
    rb = 8  # sublane rows per grid block → 1024 rays/block
    b = alt.shape[0]
    block = rb * lanes
    bp = -(-b // block) * block
    h2 = jnp.pad(alt, (0, bp - b)).reshape(-1, lanes)  # [SB, 128]
    v2 = jnp.pad(v0, (0, bp - b)).reshape(-1, lanes)
    dxf = float(dx)

    def kernel(h_ref, v_ref, oh_ref, ov_ref):
        def accel(h, v, l):
            if radius is None:
                return l * (1.0 + v * v)
            inv_r = 1.0 / radius
            u = 1.0 + h * inv_r
            return l * (u * u + v * v) + (u * u + 2.0 * v * v) / u * inv_r

        oh_ref[0] = h_ref[:]
        ov_ref[0] = v_ref[:]

        def body(k, carry):
            h, v = carry
            # stage altitudes predicted from the carried slope (see the XLA
            # scan path for the error analysis); one fused 3-row eval
            hq = jnp.concatenate([h, h + (0.5 * dxf) * v, h + dxf * v], axis=0)
            ls = eval_l_poly(poly, hq)
            l1, l2, l4 = ls[:rb], ls[rb : 2 * rb], ls[2 * rb :]
            k1v = accel(h, v, l1)
            k1h = v
            k2h = v + 0.5 * dxf * k1v
            k2v = accel(h + 0.5 * dxf * k1h, k2h, l2)
            k3h = v + 0.5 * dxf * k2v
            k3v = accel(h + 0.5 * dxf * k2h, k3h, l2)
            k4h = v + dxf * k3v
            k4v = accel(h + dxf * k3h, k4h, l4)
            h_new = h + dxf / 6.0 * (k1h + 2.0 * k2h + 2.0 * k3h + k4h)
            v_new = v + dxf / 6.0 * (k1v + 2.0 * k2v + 2.0 * k3v + k4v)
            oh_ref[k + 1] = h_new
            ov_ref[k + 1] = v_new
            return h_new, v_new

        jax.lax.fori_loop(0, n_coarse, body, (h_ref[:], v_ref[:]))

    sb_total = bp // lanes
    oh, ov = pl.pallas_call(
        kernel,
        grid=(sb_total // rb,),
        in_specs=[
            pl.BlockSpec((rb, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_coarse + 1, rb, lanes), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_coarse + 1, rb, lanes), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_coarse + 1, sb_total, lanes), jnp.float32),
            jax.ShapeDtypeStruct((n_coarse + 1, sb_total, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(h2, v2)
    h_nodes = oh.reshape(n_coarse + 1, bp)[:, :b]
    v_nodes = ov.reshape(n_coarse + 1, bp)[:, :b]
    return h_nodes, v_nodes
