"""Static routing networks: data-dependent data movement as masked
butterfly stages -- the TPU-native answer to SpMV gathers.

The TPU has no fast data-dependent addressing (XLA gathers scalarize,
Mosaic's ``dynamic_gather`` is lane-serial: measured ~0.05-0.09 Gelem/s,
``benchmarks/exp_gather.py``).  What the VPU *does* do at full rate is
static shifts + elementwise selects.  Any permutation of ``m = 2^b``
elements is routable on a Benes network: ``2b - 1`` stages of
XOR-butterflies, where stage ``k`` (stride ``s``) swaps element pairs
``(i, i XOR s)`` according to a precomputed 0/1 switch setting.  At
runtime each stage is two cyclic rolls + a three-way select against an
int8 mask -- pure VPU work, no gathers.

This module builds the routing tables on the host (numpy, one-time per
matrix):

* :func:`benes_masks` -- switch masks for an arbitrary permutation.
  Routing uses the classic recursive 2-coloring, vectorized: the
  conflict graph (input-pair edges union output-pair edges) is 2-colored
  by finding orbits of the two-hop permutation ``T(i) = pi(sigma(i ^ h)
  ^ h)`` with pointer doubling -- colors are constant on T-orbits and
  complementary orbits pair via ``i ^ h``.
* :func:`assign_layers` -- decomposes a sparse matrix's nonzeros into
  "layers": each layer holds at most one nonzero per row AND at most one
  per column (a bipartite matching), so layer ``l`` induces a (partial)
  permutation ``target row i <- source col c_l(i)`` completed to a
  bijection with zero-valued padding.  Greedy maximal matching with
  in-layer repair rounds; layer count ~1.2-1.6x the max degree.
* :func:`build_routing_spmv` -- the full preprocessing: per-layer Benes
  masks (int8) + values in target order.  ``y = sum_l vals_l *
  route_l(x)`` -- gather-free, scatter-free SpMV.

The runtime kernel lives in :mod:`tpcg.ops.route_spmv`.

Replaces: the reference's vector-CSR gather kernel
(``kernel/real/spmv.cl:5-50``) for matrices that neither are banded nor
become banded under RCM (``tpcg.sparse.to_device_matrix`` handles those).
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Benes routing
# ---------------------------------------------------------------------------

def _orbit_min(T: np.ndarray) -> np.ndarray:
    """leader[i] = min element index on i's orbit under permutation T."""
    leader = np.arange(len(T))
    nxt = T
    steps = max(1, int(np.ceil(np.log2(len(T)))) + 1)
    for _ in range(steps):
        leader = np.minimum(leader, leader[nxt])
        nxt = nxt[nxt]
    return leader


def benes_masks(perm: np.ndarray) -> np.ndarray:
    """Switch masks routing ``out[j] = in[perm[j]]`` on an XOR-Benes net.

    perm : (m,) permutation, m a power of two >= 2.
    Returns masks (2*b - 1, m) int8 in {-1, 0, +1}; runtime semantics for
    stage k with stride ``s = strides[k]``::

        up = roll(t, m - s)     # up[j] = t[(j + s) % m]
        dn = roll(t, s)         # dn[j] = t[(j - s) % m]
        t  = where(mask > 0, up, where(mask < 0, dn, t))

    (XOR partners sit at +s for the low element and -s for the high one,
    so cyclic rolls reproduce the butterfly exactly.)
    """
    perm = np.asarray(perm, dtype=np.int64)
    m = len(perm)
    b = int(np.log2(m))
    assert 1 << b == m, "m must be a power of two"
    n_stages = 2 * b - 1
    masks = np.zeros((n_stages, m), dtype=np.int8)

    # sigma: scatter map *within the current block* -- element at current
    # position i must exit its block at local position sig[i].
    # pi (gather) -> sigma = argsort(pi) globally.
    sig = np.argsort(perm)
    pos_id = np.arange(m)

    for d in range(b - 1):
        mblk = m >> d            # current block size
        h = mblk >> 1
        blk = pos_id & ~(mblk - 1)          # block base of each position
        loc = pos_id - blk                   # local position in block

        # two-hop permutation on positions (within blocks):
        # T(i) = sig^{-1}( (sig[i ^ h] ^ h) )  ... all in local coords.
        xor_h = blk + (loc ^ h)
        # inverse of sig within blocks: inv[ blk + sig[i] ] = i
        inv = np.empty(m, dtype=np.int64)
        inv[blk + sig] = pos_id
        T = inv[blk + (sig[xor_h] ^ h)]
        leader = _orbit_min(T)
        # color U (upper half) iff our orbit leader < partner orbit leader
        upper = leader < leader[xor_h]

        # input-stage masks at this level: element at low position i
        # (loc < h) swaps with i+h iff it is NOT upper.
        # runtime: mask>0 takes up[j] = t[j+h], mask<0 takes t[j-h]; a
        # swapped pair exchanges values: i gets t[i+h], i+h gets t[i].
        low = loc < h
        swap_low = low & ~upper              # low element leaves to lower
        masks[d][swap_low] = 1
        masks[d][pos_id[swap_low] + h] = -1

        # apply the input stage to sig: swapped pairs exchange their
        # sigma entries; then sigma reduces to local-half coordinates.
        sw = np.where(swap_low)[0]
        sig2 = sig.copy()
        sig2[sw], sig2[sw + h] = sig[sw + h], sig[sw]
        # element now at position i (loc<h -> upper sub-block, loc>=h ->
        # lower) must exit at local position sig2[i] mod h within its
        # half -- but only if its target half matches; by construction
        # the 2-coloring guarantees one element of each input pair goes
        # upper and one lower AND one of each *output* pair lands in
        # each half, so sig2 mod h is a permutation within each half.
        out_stage = n_stages - 1 - d
        # output-stage masks: element exiting the upper half at local o
        # belongs at block-local position o (if sig2 target < h) or
        # o + h (if target >= h); swap pairs whose upper-exit target is
        # the lower half.
        # After the recursion the element with target o or o+h that went
        # UPPER sits at local o; it needs a final swap iff its target is
        # o + h.
        up_pos = blk + (sig2 & (h - 1))      # local exit slot o (global)
        tgt_low = sig2 & h                   # 0 if target in upper half
        # for each pair slot o: the upper-network element at o has
        # tgt_low != 0 -> swap.  Build per-slot swap flags:
        swap_out = np.zeros(m, dtype=bool)
        # element currently at position i resides in the upper sub-net
        # iff loc(i) < h after the input stage.
        in_upper = loc < h
        sel = in_upper & (tgt_low != 0)
        swap_out[up_pos[sel]] = True
        o_idx = np.where(swap_out)[0]
        masks[out_stage][o_idx] = 1
        masks[out_stage][o_idx + h] = -1

        sig = sig2 & (h - 1)

    # middle stages: blocks of size 2, single stage at index b-1,
    # stride 1: swap iff sig says cross.
    blk2 = pos_id & ~1
    swap_mid = (pos_id & 1 == 0) & (sig == 1)
    masks[b - 1][swap_mid] = 1
    masks[b - 1][pos_id[swap_mid] + 1] = -1
    return masks


def benes_strides(m: int) -> List[int]:
    b = int(np.log2(m))
    down = [m >> (d + 1) for d in range(b - 1)]          # m/2 ... 2
    return down + [1] + down[::-1]


def apply_benes_numpy(masks: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Reference simulation of the runtime network (for tests)."""
    m = x.shape[0]
    t = x.copy()
    for k, s in enumerate(benes_strides(m)):
        up = np.roll(t, -(s))     # up[j] = t[j + s]
        dn = np.roll(t, s)        # dn[j] = t[j - s]
        mk = masks[k]
        t = np.where(mk > 0, up, np.where(mk < 0, dn, t))
    return t


# ---------------------------------------------------------------------------
# Layer decomposition
# ---------------------------------------------------------------------------

def assign_layers(rows: np.ndarray, cols: np.ndarray, n: int,
                  repair_rounds: int = 6, seed: int = 0
                  ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Split nonzeros into matchings (<=1 per row and per column).

    Returns a list of (row_idx, nnz_idx) pairs per layer.  Greedy: each
    round selects, among remaining nonzeros, at most one per row, then
    resolves column conflicts keeping one winner (a few repair rounds let
    losing rows try their next edge inside the same layer).
    """
    rng = np.random.default_rng(seed)
    m = len(rows)
    order = rng.permutation(m)
    # row-sorted working arrays (stable sort keeps the shuffle within
    # rows); compacted after every layer so the cost is O(sum remaining)
    sort_r = np.argsort(rows[order], kind="stable")
    idx_w = order[sort_r]
    rows_w = rows[idx_w]
    cols_w = cols[idx_w]
    layers = []

    while len(idx_w):
        matched = np.zeros(len(idx_w), dtype=bool)
        sel_rows, sel_idx = [], []
        used_col = np.zeros(n, dtype=bool)
        used_row = np.zeros(n, dtype=bool)
        for _ in range(repair_rounds):
            # a row blocked by a column conflict advances to its next
            # eligible edge on the following repair round
            cand_mask = (~matched & ~used_row[rows_w]
                         & ~used_col[cols_w])
            if not cand_mask.any():
                break
            cand_pos = np.where(cand_mask)[0]
            cand_rows = rows_w[cand_pos]
            # first candidate per row
            first = np.ones(len(cand_pos), dtype=bool)
            first[1:] = cand_rows[1:] != cand_rows[:-1]
            cand_pos = cand_pos[first]
            cand_rows = cand_rows[first]
            cand_cols = cols_w[cand_pos]
            # column-conflict resolution: keep first per column
            csort = np.argsort(cand_cols, kind="stable")
            cc = cand_cols[csort]
            keep = np.ones(len(cc), dtype=bool)
            keep[1:] = cc[1:] != cc[:-1]
            win = cand_pos[csort[keep]]
            used_col[cols_w[win]] = True
            used_row[rows_w[win]] = True
            matched[win] = True
            sel_rows.append(rows_w[win])
            sel_idx.append(idx_w[win])
        layers.append((np.concatenate(sel_rows), np.concatenate(sel_idx)))
        idx_w = idx_w[~matched]
        rows_w = rows_w[~matched]
        cols_w = cols_w[~matched]
    return layers


# ---------------------------------------------------------------------------
# Full SpMV preprocessing
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class RoutedSpmv:
    """Preprocessed routing-network SpMV operand.

    masks : (L, S, m) int8 Benes switch masks
    vals  : (L, m) float32 values in target (output-row) order
    n     : logical size (m = next power of two)
    """
    masks: np.ndarray
    vals: np.ndarray
    n: int

    @property
    def m(self):
        return self.vals.shape[1]

    @property
    def n_layers(self):
        return self.vals.shape[0]

    def save(self, path: str) -> None:
        """Persist the preprocessed tables (production workflow: build
        once offline -- ``python -m tpcg.cli route`` -- and load at
        serving time; the build is minutes for ~10M nnz, the load is a
        file read).  Masks are stored in the 1-bit packed device layout
        (~8x smaller on disk than the int8 switch array)."""
        from .route_spmv import pack_masks
        np.savez_compressed(path, packed=pack_masks(self.masks),
                            vals=self.vals, n=self.n)

    @classmethod
    def load(cls, path: str) -> "RoutedSpmv":
        z = np.load(path)
        if "masks" in z:                     # legacy int8 format
            return cls(masks=z["masks"], vals=z["vals"], n=int(z["n"]))
        from .route_spmv import unpack_masks
        vals = z["vals"]
        masks = unpack_masks(z["packed"], benes_strides(vals.shape[1]))
        return cls(masks=masks, vals=vals, n=int(z["n"]))

    def matvec_numpy(self, x: np.ndarray) -> np.ndarray:
        """Host simulation (tests)."""
        dt = np.result_type(self.vals.dtype, np.asarray(x).dtype)
        xp = np.zeros(self.m, dtype=dt)
        xp[: self.n] = x
        y = np.zeros(self.m, dtype=dt)
        for l in range(self.n_layers):
            y += self.vals[l] * apply_benes_numpy(self.masks[l], xp)
        return y[: self.n]


def build_routing_spmv(A, seed: int = 0, native: bool = None) -> RoutedSpmv:
    """Preprocess a scipy sparse matrix into routed-layer form.

    Complex matrices keep complex64 values (one routing of the shared
    sparsity pattern; the runtime splits Karatsuba planes --
    ``tpcg.ops.route_spmv.routed_pair``).

    native : use the C++ preprocessor (``tpcg/native/routing_builder.cpp``,
    ~10x faster layer+mask construction) when available; the default
    tries native and falls back to this module's numpy implementation.
    Either path yields a valid routing (the decompositions differ in
    layer assignment, the resulting matvec is identical)."""
    import scipy.sparse as sp
    A = sp.coo_matrix(A)
    n = A.shape[0]
    if native is None or native:
        from ..native import routing_native
        nat = (routing_native.build(A.row, A.col, n, seed=seed)
               if routing_native.available() else None)
        if nat is not None:
            masks, layer, m = nat
            vdt = (np.complex64 if np.iscomplexobj(A.data)
                   else np.float32)
            vals = np.zeros((masks.shape[0], m), dtype=vdt)
            vals[layer, A.row] = A.data.astype(vdt)
            return RoutedSpmv(masks=masks, vals=vals, n=n)
        if native:
            raise RuntimeError("native routing builder unavailable")
    # pad to >= 128: the device kernel tiles the routed vector as
    # (m/128, 128) lanes (tpcg/ops/route_spmv.py), so m below one lane
    # row is unusable; tiny matrices just route a mostly-empty network
    m = 1 << int(np.ceil(np.log2(max(n, 128))))
    layers = assign_layers(A.row.astype(np.int64), A.col.astype(np.int64),
                           n, seed=seed)
    L = len(layers)
    vdt = np.complex64 if np.iscomplexobj(A.data) else np.float32
    masks = np.zeros((L, 2 * int(np.log2(m)) - 1, m), dtype=np.int8)
    vals = np.zeros((L, m), dtype=vdt)
    for l, (lrows, lidx) in enumerate(layers):
        lcols = A.col[lidx]
        perm = np.full(m, -1, dtype=np.int64)
        perm[lrows] = lcols                      # out[i] = x[col]
        # complete to a bijection with the unused sources
        free_tgt = np.where(perm < 0)[0]
        used = np.zeros(m, dtype=bool)
        used[lcols] = True
        free_src = np.where(~used)[0]
        perm[free_tgt] = free_src
        masks[l] = benes_masks(perm)
        vals[l, lrows] = A.data[lidx].astype(vdt)
    return RoutedSpmv(masks=masks, vals=vals, n=n)
