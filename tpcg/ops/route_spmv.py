"""Pallas TPU kernel for the routing-network SpMV (see tpcg.ops.routing).

``y = sum_l vals_l * benes_l(x)`` -- each layer routes the VMEM-resident
x grid through 2*log2(m)-1 masked XOR-butterfly stages (cyclic rolls +
three-way selects; pure VPU, no gathers), multiplies by that layer's
values (already in output order) and accumulates into y.  Masks and
values stream from HBM via the grid pipeline (double-buffered); x and y
stay resident.

Key property used: XOR partners never cross the lane<->sublane boundary,
so stage stride s < 128 is a pure cyclic lane roll and s >= 128 a pure
cyclic sublane roll -- each stage is two ``pltpu.roll`` + one select.
Multi-RHS blocks ride the SAME kernel as (b, rows, 128) batches: the
mask stream and per-stage unpack amortize across the block (1.62x per
RHS at b=4 on the m_t1 class, benchmarks/exp_route2.py -- the kernel is
VPU-data-movement-bound, so batching is the lever, not fewer selects).

Masks are bit-packed 32 stages x 1 bit per int32 word (int8 arrays
crash this image's Mosaic compiler -- benchmarks/exp_bisect.py -- and
unpacked int32 masks would blow up the HBM stream).  Each bit says
"exchange with the XOR partner i^s"; the +s/-s roll choice is static
per position (bit s of the index), so no direction code is stored.

Replaces the gather SpMV for genuinely unstructured matrices (the
reference's vector-CSR ``kernel/real/spmv.cl:5-50``); banded or
RCM-bandable matrices take the DiaMatrix shift-multiply path instead.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .routing import RoutedSpmv, benes_strides

C = 128          # lane width


STAGES_PER_WORD = 32     # 1 bit per stage in an int32

RHS_BATCH = 4    # RHS columns carried per kernel pass (exp_route2: the
                 # mask stream amortizes ~1.62x per RHS at b=4; larger
                 # batches grow the resident t/y planes past the sweet
                 # spot on the m_t1-class grid)


def pack_masks(masks: np.ndarray) -> np.ndarray:
    """(L, S, m) int8 {-1,0,1} -> (L, ceil(S/32), m) int32 exchange bits.

    The exchange DIRECTION never needs storing: stage stride s pairs XOR
    partners i and i^s, and which of the +s/-s rolls holds the partner
    follows from bit s of the position (static at compile time).  Only
    the exchange FLAG is data -- 1 bit per stage -- which halves the
    packed mask words vs the former 2-bit direction codes (3 -> 2 int32
    per position at m = 2^17: the m_t1-class device operand drops from
    ~517 MB to ~388 MB)."""
    L, S, m = masks.shape
    W = -(-S // STAGES_PER_WORD)
    ex = (masks != 0).astype(np.uint32)
    out = np.zeros((L, W, m), dtype=np.uint32)
    for k in range(S):
        out[:, k // STAGES_PER_WORD] |= ex[:, k] << (k % STAGES_PER_WORD)
    return out.astype(np.int32)


def unpack_masks(packed: np.ndarray, strides) -> np.ndarray:
    """Inverse of :func:`pack_masks`: exchange bits -> signed int8 masks
    (+1 take the +s roll at the low partner, -1 at the high one)."""
    packed = np.asarray(packed).astype(np.uint32)
    L, W, m = packed.shape
    S = len(strides)
    pos = np.arange(m)
    masks = np.zeros((L, S, m), dtype=np.int8)
    for k, s in enumerate(strides):
        bit = (packed[:, k // STAGES_PER_WORD]
               >> (k % STAGES_PER_WORD)) & 1
        sign = np.where((pos & s) == 0, 1, -1).astype(np.int8)
        masks[:, k] = bit.astype(np.int8) * sign
    return masks


def _stage(t, ex, s, rows, side):
    """One butterfly stage on the (rows, 128) grid (or a (b, rows, 128)
    RHS batch); ex = 1 where the position exchanges with its XOR partner
    i^s.  ``side`` is the static up/dn select mask for this stride,
    hoisted out of the stage loop (computed once per DISTINCT stride --
    exp_route2's ``smask`` variant, bit-exact and no slower than
    recomputing per stage)."""
    ax0 = t.ndim - 2
    if s < C:
        up = pltpu.roll(t, C - s, ax0 + 1)   # up[j] = t[(j + s) mod 128]
        dn = pltpu.roll(t, s, ax0 + 1)       # dn[j] = t[j - s]
    else:
        up = pltpu.roll(t, rows - s // C, ax0)
        dn = pltpu.roll(t, s // C, ax0)
    if t.ndim == 3:
        side, ex = side[None], ex[None]
    partner = jnp.where(side, up, dn)
    return jnp.where(ex == 1, partner, t)


def _routed_kernel_call(masks, vals, xg, interpret):
    """Route an (rows, C) grid -- or a (b, rows, C) RHS batch in ONE
    kernel pass -- through all L layers.  Batching amortizes the mask
    stream and the per-stage mask unpack across the block: the packed
    exchange words and the static side masks are read/derived once per
    stage and broadcast over the batch (measured 1.62x per RHS at b=4,
    benchmarks/exp_route2.py)."""
    from jax import lax
    L, W, rows, _ = masks.shape
    strides = benes_strides(rows * C)

    def kernel(x_ref, m_ref, v_ref, y_ref):
        l = pl.program_id(0)

        @pl.when(l == 0)
        def _():
            y_ref[...] = jnp.zeros(y_ref.shape, jnp.float32)

        t = x_ref[...]
        lane = lax.broadcasted_iota(jnp.int32, (rows, C), 1)
        row = lax.broadcasted_iota(jnp.int32, (rows, C), 0)
        side = {s: ((lane & s) == 0 if s < C else (row & (s // C)) == 0)
                for s in set(strides)}
        for k, s in enumerate(strides):
            word = m_ref[0, k // STAGES_PER_WORD]
            ex = jax.lax.shift_right_logical(
                word, jnp.int32(k % STAGES_PER_WORD)) & 1
            t = _stage(t, ex, s, rows, side[s])
        v = v_ref[0] if t.ndim == 2 else v_ref[0][None]
        y_ref[...] = y_ref[...] + v * t

    zeros = (0,) * xg.ndim
    xspec = pl.BlockSpec(xg.shape, lambda l: zeros,
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[
            xspec,
            pl.BlockSpec((1, W, rows, C), lambda l: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, C), lambda l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(xg.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xg, masks, vals)


def routed_matvec(routed: "DeviceRouted", x: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """y = A @ x via the routing network.  x: (m,) float32 (padded)."""
    masks, vals = routed.masks, routed.vals   # packed int32 / f32
    rows = masks.shape[2]
    y = _routed_kernel_call(masks, vals, x.reshape(rows, C), interpret)
    return y.reshape(-1)


def routed_matvec_block(routed: "DeviceRouted", xb: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """yb = A @ xb for a (b, m) RHS block in one kernel pass."""
    masks, vals = routed.masks, routed.vals
    rows = masks.shape[2]
    b = xb.shape[0]
    yb = _routed_kernel_call(masks, vals, xb.reshape(b, rows, C),
                             interpret)
    return yb.reshape(b, -1)


class DeviceRouted:
    """Device-resident routed operand (jax arrays) + matvec interface.

    Acts like the other device containers (`DiaMatrix`, `EllMatrix`):
    ``matvec`` on flat (n,) or (n, nrhs) float32 vectors, so ``block_cg``
    runs unchanged on top.  Registered as a pytree so it can be a jit
    ARGUMENT -- closing over the (hundreds of MB) mask arrays bakes them
    into the HLO as constants and blows the remote-compile request
    limit on this backend (HTTP 413).
    """

    def __init__(self, routed: RoutedSpmv, interpret: bool = False):
        L, S, m = routed.masks.shape
        rows = m // C
        self.n = routed.n
        self.m = m
        self.interpret = interpret
        packed = pack_masks(routed.masks)
        W = packed.shape[1]
        self.masks = jnp.asarray(packed.reshape(L, W, rows, C))
        self.vals = jnp.asarray(routed.vals.reshape(L, rows, C))

    def tree_flatten(self):
        return (self.masks, self.vals), (self.n, self.m, self.interpret)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.masks, obj.vals = children
        obj.n, obj.m, obj.interpret = aux
        return obj

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.vals.dtype

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        squeeze = x.ndim == 1
        xm = x.reshape(self.n, -1)
        nrhs = xm.shape[1]
        if nrhs == 1:
            xp = jnp.zeros(self.m, jnp.float32).at[: self.n].set(xm[:, 0])
            y = routed_matvec(self, xp,
                              interpret=self.interpret)[: self.n, None]
            return y[:, 0] if squeeze else y
        # Multi-RHS: carry blocks of <= RHS_BATCH columns through one
        # kernel pass each (masks amortized across the batch).
        cols = []
        for r0 in range(0, nrhs, RHS_BATCH):
            blk = xm[:, r0:r0 + RHS_BATCH].T            # (b, n)
            b = blk.shape[0]
            xp = jnp.zeros((b, self.m), jnp.float32).at[:, : self.n].set(blk)
            cols.append(routed_matvec_block(
                self, xp, interpret=self.interpret)[:, : self.n])
        y = jnp.concatenate(cols, axis=0).T
        return y[:, 0] if squeeze else y

    def __matmul__(self, x):
        return self.matvec(x)


jax.tree_util.register_pytree_node(
    DeviceRouted, DeviceRouted.tree_flatten, DeviceRouted.tree_unflatten)


def _from_parts(masks, vals_np, n, m, interpret):
    obj = DeviceRouted.__new__(DeviceRouted)
    obj.masks = masks
    obj.vals = jnp.asarray(vals_np.reshape(masks.shape[0], m // C, C))
    obj.n, obj.m, obj.interpret = n, m, interpret
    return obj


def routed_pair(routed: RoutedSpmv, interpret: bool = False):
    """Complex routed operand: one shared routing (the sparsity pattern),
    three value planes [Re, Im, Re+Im] feeding the Karatsuba
    ``PairOperator`` -- complex-as-planes SpMV with zero extra kernels
    (mirrors ``make_pair_operator`` for the stencil/DIA containers)."""
    from .cplx import PairOperator

    v = routed.vals
    if not np.iscomplexobj(v):
        base = DeviceRouted(routed, interpret=interpret)
        return PairOperator(ar=base, ai=None, ars=None, real_only=True)
    packed = pack_masks(routed.masks)
    L, W, m = packed.shape[0], packed.shape[1], routed.m
    masks = jnp.asarray(packed.reshape(L, W, m // C, C))
    re = np.ascontiguousarray(v.real.astype(np.float32))
    im = np.ascontiguousarray(v.imag.astype(np.float32))
    return PairOperator(
        ar=_from_parts(masks, re, routed.n, m, interpret),
        ai=_from_parts(masks, im, routed.n, m, interpret),
        ars=_from_parts(masks, re + im, routed.n, m, interpret))
