"""Pallas TPU kernel: part-constrained masked nearest-neighbor argmin.

The XLA path in correspond.py streams [N, chunk] distance tiles through HBM
(~0.9 GB of traffic per query at production sizes, ~1.4-3.5 ms); this kernel
keeps everything in VMEM — the entire model cloud (~100 KB) plus one
[TN, CHUNK] distance tile — so the only HBM traffic is reading the two
clouds once (~0.2 MB).  This is the blockwise "flash-attention-style
min-distance" kernel sketched in SURVEY.md section 5.7.

Layout notes: the data tile rides the sublane axis (TN rows), the model
rides the lane axis (P columns, padded to the 128-lane multiple on the
host side in correspond.find_nn_stats).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38    # python literals: traced module constants cannot be
_BIG_IDX = 2 ** 30  # captured inside a pallas kernel


def _kernel(dpts_ref, dpart_ref, mpts_ref, mpart_ref, mvalid_ref,
            best_d_ref, best_i_ref, *, chunk: int, wild: int = -1000):
    """Grid over data tiles; the full model lives in VMEM.

    dpts_ref  [TN, 3]   data tile positions
    dpart_ref [TN, 1]   data tile part labels (int32; < 0 = padding)
    mpts_ref  [3, Pp]   model positions (transposed)
    mpart_ref [1, Pp]   model part labels
    mvalid_ref[1, Pp]   model visibility (int32 0/1)
    best_d_ref[TN, 1]   output min squared distance
    best_i_ref[TN, 1]   output argmin (int32, -1 if no valid candidate)
    """
    TN = dpts_ref.shape[0]
    Pp = mpts_ref.shape[1]
    n_chunks = Pp // chunk

    dx = dpts_ref[:, 0:1]                      # [TN, 1]
    dy = dpts_ref[:, 1:2]
    dz = dpts_ref[:, 2:3]
    dpart = dpart_ref[:, 0:1]                  # [TN, 1]

    def body(c, carry):
        best_d, best_i = carry                 # [TN, 1] each
        mx = mpts_ref[0:1, pl.ds(c * chunk, chunk)]     # [1, chunk]
        my = mpts_ref[1:2, pl.ds(c * chunk, chunk)]
        mz = mpts_ref[2:3, pl.ds(c * chunk, chunk)]
        mp = mpart_ref[0:1, pl.ds(c * chunk, chunk)]
        mv = mvalid_ref[0:1, pl.ds(c * chunk, chunk)]
        d2 = ((dx - mx) ** 2 + (dy - my) ** 2 + (dz - mz) ** 2)  # [TN, chunk]
        # wildcard rows (dpart == wild) match ANY real-part column: the
        # label-free correspondence channel for confidence-gated foreground
        # (pad columns carry part >= _BIG_IDX and are excluded)
        ok = ((dpart == mp) | ((dpart == wild) & (mp < _BIG_IDX))) & (mv > 0)
        d2 = jnp.where(ok, d2, _INF)
        cmin = jnp.min(d2, axis=1, keepdims=True)                # [TN, 1]
        idx = jax.lax.broadcasted_iota(jnp.int32, (TN, chunk), 1) + c * chunk
        cidx = jnp.min(jnp.where(d2 == cmin, idx, _BIG_IDX), axis=1,
                       keepdims=True)
        take = cmin < best_d
        return (jnp.where(take, cmin, best_d),
                jnp.where(take, cidx, best_i))

    init = (jnp.full((TN, 1), _INF, jnp.float32),
            jnp.full((TN, 1), -1, jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
    best_i = jnp.where(best_d < _INF, best_i, -1)
    best_d_ref[:, :] = best_d
    best_i_ref[:, :] = best_i


def _kernel_ranges(cstart_ref, cend_ref, dpts_ref, dpart_ref, mpts_ref,
                   mpart_ref, mvalid_ref, best_d_ref, best_i_ref, *,
                   chunk: int, wild: int = -1000):
    """Like _kernel, but each data tile scans only the model chunks
    [cstart[i], cend[i]) covering its part labels (both clouds sorted by
    part on the host side) — at 24 parts this cuts the scanned columns
    ~4-6x versus walking the whole model axis."""
    TN = dpts_ref.shape[0]
    i = pl.program_id(0)
    c0 = cstart_ref[i]
    c1 = cend_ref[i]

    dx = dpts_ref[:, 0:1]
    dy = dpts_ref[:, 1:2]
    dz = dpts_ref[:, 2:3]
    dpart = dpart_ref[:, 0:1]

    def body(c, carry):
        best_d, best_i = carry
        mx = mpts_ref[0:1, pl.ds(c * chunk, chunk)]
        my = mpts_ref[1:2, pl.ds(c * chunk, chunk)]
        mz = mpts_ref[2:3, pl.ds(c * chunk, chunk)]
        mp = mpart_ref[0:1, pl.ds(c * chunk, chunk)]
        mv = mvalid_ref[0:1, pl.ds(c * chunk, chunk)]
        d2 = ((dx - mx) ** 2 + (dy - my) ** 2 + (dz - mz) ** 2)
        ok = ((dpart == mp) | ((dpart == wild) & (mp < _BIG_IDX))) & (mv > 0)
        d2 = jnp.where(ok, d2, _INF)
        cmin = jnp.min(d2, axis=1, keepdims=True)
        idx = jax.lax.broadcasted_iota(jnp.int32, (TN, chunk), 1) + c * chunk
        cidx = jnp.min(jnp.where(d2 == cmin, idx, _BIG_IDX), axis=1,
                       keepdims=True)
        take = cmin < best_d
        return (jnp.where(take, cmin, best_d),
                jnp.where(take, cidx, best_i))

    init = (jnp.full((TN, 1), _INF, jnp.float32),
            jnp.full((TN, 1), -1, jnp.int32))
    best_d, best_i = jax.lax.fori_loop(c0, c1, body, init)
    best_i = jnp.where(best_d < _INF, best_i, -1)
    best_d_ref[:, :] = best_d
    best_i_ref[:, :] = best_i


@functools.partial(jax.jit, static_argnames=("tile_n", "chunk", "interpret",
                                              "wild"))
def nn_argmin_ranges(data_pts, data_part, model_pts, model_part, model_valid,
                     cstart, cend, tile_n: int = 256, chunk: int = 512,
                     interpret: bool = False, wild: int = -1000):
    """Part-sorted masked NN: data_pts/data_part sorted by part label,
    model_* sorted by part label; cstart/cend [N/tile_n] give the model
    chunk range covering each data tile's labels (int32, scalar-prefetched).

    interpret=True runs the kernel in the Pallas interpreter (CPU test path).
    """
    N = data_pts.shape[0]
    Pp = model_pts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, 3), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Pp), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    out_d, out_i = pl.pallas_call(
        functools.partial(_kernel_ranges, chunk=chunk, wild=wild),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
        ),
        interpret=interpret,
    )(cstart, cend, data_pts, data_part[:, None], model_pts.T,
      model_part[None, :], model_valid[None, :].astype(jnp.int32))
    return out_d[:, 0], out_i[:, 0]


@functools.partial(jax.jit, static_argnames=("tile_n", "chunk", "wild"))
def nn_argmin(data_pts, data_part, model_pts, model_part, model_valid,
              tile_n: int = 256, chunk: int = 1024, wild: int = -1000):
    """(best_d [N], best_i [N]) masked nearest model point per data point.

    Shapes: data_pts [N, 3] (N multiple of tile_n), model_pts [Pp, 3]
    (Pp multiple of chunk; invalid padding marked by model_valid == 0).
    """
    N = data_pts.shape[0]
    Pp = model_pts.shape[0]
    grid = (N // tile_n,)
    out_d, out_i = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, wild=wild),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
        ),
    )(data_pts, data_part[:, None], model_pts.T,
      model_part[None, :], model_valid[None, :].astype(jnp.int32))
    return out_d[:, 0], out_i[:, 0]
