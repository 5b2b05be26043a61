"""Stream-SpMV: the flagship general-matrix TPU kernel.

y = A @ x for arbitrary CSR on TPU, built from the only primitives
that run at streaming speed on this hardware (docs/DESIGN_stream.md):
lane gathers, (128,128) transposes, plan-driven block DMA. The
pipeline (all orders precomputed at plan time, cached per matrix):

1. **Gather pass** (Pallas): nnz ordered by column; each (128,128)
   tile reads one 128x128 TRANSPOSED window of x (prepared once per
   call in XLA), fetched via a scalar-prefetched block index. Within
   the tile, slot (s,l) holds a nnz with column ≡ s (mod 128); its x
   value is a NATIVE lane gather xg[s,l] = xt[s, q[s,l]] — no
   in-kernel transposes (the transposed-slot layout measured 5x
   faster than transposing inside the kernel, scratch/probe_gather).
   Hot columns (count ≥ threshold) are replicated into broadcast
   lanes of an augmented x table so heavy columns fill whole tiles
   instead of a single sublane. Emits products (semiring `combine`)
   in gather order.
2. **Shuffle** (kernels/shuffle.py): routes products from gather order
   to row-sorted final tiles (2 split passes).
3. **Scan pass** (Pallas): per final tile, a piecewise segmented scan
   by local row id (the shuffle leaves rank-sorted runs separated by
   junk), semiring `reduce`; chunk-end values are extracted with one
   in-register 3-stage routing into per-tile y-candidate windows,
   written to a flat array on a single-level grid (so block fetches
   pipeline against compute).
4. **Window merge** (XLA): tile windows sit at per-tile 128-aligned
   row bases (tiles stay ~full instead of being cut at fixed bin
   boundaries); overlapping windows combine by a planned reduction
   tree + a depth-2 layered semiring reduce — the decoupled-lookback
   replacement (ref: merge_based/agent_segment_fixup.cuh). No XLA
   scatter anywhere.

Reference analog: the merge-path SpMV (ref: include/spmv/merge_based/*,
merge_genl/*) — same contract (load-balanced CSR SpMV, semiring
generalized into every reduction site) with the GPU's fine-grained
memory system replaced by plan-time routing.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu import config
from spmv_tpu.formats import CSR
from spmv_tpu.kernels.pallas_utils import (
    LANES,
    flat_iota,
    lane_iota,
    segmented_scan_lanes,
    segmented_scan_tile,
    sublane_iota,
)
from spmv_tpu.kernels.shuffle import (
    TILE,
    ShufflePlan,
    apply_shuffle,
    plan_shuffle_auto,
    shuffle_device_arrays,
)
from spmv_tpu.ops.registry import (
    register,
    plan_cache,
    PlanCapacityError,
    resolve_val_dtype,
)
from spmv_tpu.ops.routing import route_tiles
from spmv_tpu.ops.semiring import Semiring, PLUS_TIMES, _or_and_combine

# or_and rides the plus_times machinery as a COUNTING ring: combine
# yields {0,1}, reduce is +, and the caller thresholds the counts at
# the end (or = sum > 0 over non-negatives). The name is "plus_times"
# so every inverse-gated fast path (MXU prefix differences) engages.
_OR_AND_COUNTING = Semiring(
    name="plus_times",
    initialize=lambda: 0.0,
    combine=_or_and_combine,
    reduce=lambda acc, v: acc + v,
)

BIN_ROWS = 16384  # max row span of one final tile = rel positions of
# one full (128,128) route tile. Round 3 used 8192 (the two halves of
# one fused C/P route tile); for short-row matrices the row-span cap —
# not kappa — set the final tile count (1M rows / 8192 = 128+ tiles at
# ~30% fill), so v4 widens the span to a full tile and always plans
# separate C and P routes (VERDICT r3 items 1-2: O(nnz) scan).
SBT_SCAN_MAX = 16  # plan-time scan-tile padding granule: any scan_sbt
# dividing this runs on the same plan (the knob re-batches the grid,
# it does not reshape the plan). v4: 16, not 32 — the padding is pure
# junk traffic for the scan (final tiles rarely land on a 32 multiple)
# and the v4 scan's VMEM footprint caps scan_sbt at ~16 anyway

# When the whole transposed x table fits under this budget it is passed
# to the gather/reduce kernels as ONE resident VMEM block (constant
# index map -> fetched from HBM once) and each tile slices its 128-row
# window in-register, instead of DMA-ing a separate 65 KB window per
# tile. On the 3.3M-nnz bench matrix that cuts x traffic from
# n_tiles*65KB (~17 MB) to len(x2d) (~4 MB). Budget leaves room for the
# double-buffered per-step streams (~2.5 MB) inside the ~16 MB VMEM.
X_VMEM_MAX_BYTES = 6 << 20


@dataclasses.dataclass(frozen=True)
class StreamPolicy:
    kappa: int = 14336       # live nnz per final tile (scan EN)
    hot_threshold: int = 2048  # column count to qualify for replication
    gather_sbt: int = 8      # gather tiles per grid step
    scan_sbt: int = 8        # final tiles per outer scan grid step
    # (per-outer-step fixed cost ~5-7 us amortizes over scan_sbt
    # tiles; VMEM block sizes scale with it — autotune sweepable)
    # scan reduction strategy: "auto" takes the MXU prefix-difference
    # kernel when the ring has an inverse (plus_times/f32); "roll"
    # forces the log-step roll/segmented-scan kernel (the sequential/
    # tree in-register reduction analog, ref: cusp.cuh:82-136)
    scan_strategy: str = "auto"
    # early reduction: collapse same-row products into one partial per
    # (gather tile, sublane, row) run DURING the gather pass, so the
    # shuffle/scan stream shrinks by the row-duplication factor (the
    # within-thread accumulate of the GPU merge walk,
    # ref: merge_based/agent_spmv_orig.cuh:340-384, done at plan time).
    # "auto": on when the ring has an inverse AND the plan-time run
    # count shows >= REDUCE_MIN_FACTOR duplication; "on" forces (raises
    # if infeasible); "off" disables.
    reduce: str = "auto"
    # Column->sublane lane remap (round 5, VERDICT r4 item 1): instead
    # of the fixed slot sublane = col mod 128 — whose per-residue
    # bucket imbalance capped slot fill at ~79% on the bench matrix —
    # the planner deals each window's columns onto sublanes balanced
    # by nnz count, and the x table is built through a planned
    # per-window route (one extra in-kernel 3-stage route per x
    # window, no extra HBM pass: the route subsumes the transpose the
    # old x-prep already paid). Off for shard-uniform multichip plans
    # (their x prep happens inside shard_map).
    remap: bool = True

    def structural_fields(self) -> dict:
        """Fields that shape the plan (= the plan-cache key).
        scan_sbt / scan_strategy only re-batch the same plan at
        dispatch time (tiles are padded to SBT_SCAN_MAX granules)."""
        return {"kappa": self.kappa, "hot_threshold": self.hot_threshold,
                "gather_sbt": self.gather_sbt, "reduce": self.reduce,
                "remap": self.remap}


@dataclasses.dataclass
class StreamPlan:
    n_gather_tiles: int
    n_final_tiles: int
    layers: int
    x_rows_pad: int          # rows of padded x2d before augmentation
    hot_cols: jax.Array      # (n_aug,) column index replicated per aug row
    # device arrays
    gather: dict             # Ax, q, xb
    shuffle: ShufflePlan
    shuffle_dev: list
    scan: dict               # cid/rel2 streams, routes, merge_idx
    n_y_blocks: int          # 128-row blocks of the merged y
    # early-reduction pass arrays (None = plain gather): c1/c2/c3 route
    # stages, fm first-run mask, Qp partial quota rows per tile,
    # out_rows of the (junk-padded) partial stream
    reduce: Optional[dict] = None


# ---------------------------------------------------------------------------
# Plan construction
# ---------------------------------------------------------------------------

def _plan_gather(Aj: np.ndarray, policy: StreamPolicy, x_blocks_pad: int):
    """Assign each nnz to a gather slot.

    Returns (slot_src, slot_q, xb, hot_cols):
      slot_src: (T*16384,) int64 CSR rank per slot, -1 junk
      slot_q:   (T*16384,) int8 lane of the slot's x value within the
                tile's transposed x window, -1 junk (slot (s,l) holds
                a nnz with column ≡ s mod 128; q = (col // 128) % 128)
      xb:       (T,) int32 x window base per tile, in 128-row BLOCK units
                (cold: 16K-column window index; hot: an aug page past
                x_blocks_pad)
      hot_cols: (n_pages*128,) int64 column replicated into each aug lane
    """
    nnz = Aj.shape[0]
    counts = np.bincount(Aj, minlength=0)
    hot_mask_col = counts >= policy.hot_threshold
    is_hot = hot_mask_col[Aj]
    W = 128 * LANES  # columns per x window

    tiles_src, tiles_q, xb_list = [], [], []
    hot_cols: list = []

    # --- cold nnz: per 16K-column window, balanced lane fill ---
    cold_idx = np.nonzero(~is_hot)[0]
    cold_cols = Aj[cold_idx]
    order = np.argsort(cold_cols, kind="stable")
    cold_idx = cold_idx[order]
    cold_cols = cold_cols[order]
    win = cold_cols // W
    w_bounds = np.searchsorted(win, np.arange(0, (win[-1] + 2) if win.size else 1))
    for w in range(w_bounds.shape[0] - 1):
        b, e = int(w_bounds[w]), int(w_bounds[w + 1])
        if e <= b:
            continue
        idx = cold_idx[b:e]
        cols = cold_cols[b:e]
        subs = cols % LANES            # slot SUBLANE (fixed by column)
        qlanes = (cols // LANES) - w * LANES  # in [0, 128): window lane
        sub_cnt = np.bincount(subs, minlength=LANES)
        t_w = int(-(-sub_cnt.max() // LANES))
        # round-robin within each sublane across t_w tiles (vectorized):
        # the i-th entry of sublane s goes to tile i%t_w, lane i//t_w
        srcs = np.full((t_w, TILE), -1, dtype=np.int64)
        qs = np.full((t_w, TILE), -1, dtype=np.int8)
        sub_order = np.argsort(subs, kind="stable")
        ssorted = subs[sub_order]
        lb = np.searchsorted(ssorted, np.arange(LANES + 1))
        within = np.arange(ssorted.shape[0]) - lb[ssorted]
        ti = within % t_w
        lpos = within // t_w
        srcs[ti, ssorted * LANES + lpos] = idx[sub_order]
        qs[ti, ssorted * LANES + lpos] = qlanes[sub_order]
        for t_i in range(t_w):
            tiles_src.append(srcs[t_i])
            tiles_q.append(qs[t_i])
            xb_list.append(w)

    # --- hot nnz: packed tiles over augmented broadcast pages; each
    # hot tile owns one 128-row aug page (one row per distinct column,
    # the value broadcast across lanes) ---
    hot_idx = np.nonzero(is_hot)[0]
    if hot_idx.size:
        hcols = Aj[hot_idx]
        horder = np.argsort(hcols, kind="stable")
        hot_idx = hot_idx[horder]
        hcols = hcols[horder]
        p = 0
        n = hot_idx.shape[0]
        while p < n:
            src = np.full(TILE, -1, dtype=np.int64)
            qv = np.full(TILE, -1, dtype=np.int8)
            page = np.zeros(LANES, dtype=np.int64)
            nrows = 0
            filled = 0
            while p < n and filled < TILE and nrows < LANES:
                c = hcols[p]
                e = int(np.searchsorted(hcols, c, side="right"))
                take = min(e - p, TILE - filled)
                page[nrows] = c
                src[filled:filled + take] = hot_idx[p:p + take]
                qv[filled:filled + take] = nrows
                nrows += 1
                filled += take
                p += take
            tiles_src.append(src)
            tiles_q.append(qv)
            xb_list.append(x_blocks_pad + len(hot_cols) // LANES)
            hot_cols.extend(page.tolist())

    T = len(tiles_src)
    slot_src = (np.concatenate(tiles_src) if T else
                np.empty(0, np.int64))
    slot_q = (np.concatenate(tiles_q) if T else np.empty(0, np.int8))
    xb = np.asarray(xb_list, dtype=np.int32)
    assert slot_src[slot_src >= 0].size == nnz
    return slot_src, slot_q, xb, np.asarray(hot_cols, dtype=np.int64)


WINDOW_ALIGN = 8    # window starts align to 8 natural col groups (the
# (8,128) f32 sublane tile: dynamic slices of the resident natural x
# stay tile-aligned)
WINDOW_MARGIN = 256  # close-window slack for the snake deal's max-load
# overshoot over the window mean


def _plan_windows(gl: np.ndarray) -> np.ndarray:
    """Variable-span x windows over natural 128-column groups.

    Fixed 16K-column windows quantize slot fill at ceil(load/16384)
    tiles per window (~79% fill on the bench matrix — the real cause
    of the round-4 'col-mod-128 imbalance' headroom, measured round
    5). Greedy variable spans close each window where its load is
    about to cross a whole-tile multiple (or at the 128-group column
    capacity), so nearly every tile runs full. Returns the window
    start-group array g0 (n_w+1,), starts aligned to WINDOW_ALIGN.
    """
    G = gl.shape[0]
    bounds = [0]
    load = 0
    groups = 0
    for g in range(0, G, WINDOW_ALIGN):
        gload = int(gl[g:g + WINDOW_ALIGN].sum())
        if groups >= LANES or (
                load >= 2 * TILE - WINDOW_MARGIN
                and load + gload > -(-load // TILE) * TILE):
            bounds.append(g)
            load = 0
            groups = 0
        load += gload
        groups += WINDOW_ALIGN
    bounds.append(G)
    return np.asarray(bounds, dtype=np.int64)


def _assign_cols_balanced(uc: np.ndarray, cnt: np.ndarray,
                          win_of_col: np.ndarray, g0: np.ndarray,
                          n_w: int):
    """Balanced column->sublane assignment per x window.

    Columns of each window are sorted by descending nnz count and
    snake-dealt across the 128 sublanes (round k runs forward for even
    k, backward for odd), so per-sublane loads stay near the window
    mean instead of inheriting the col-mod-128 residue skew. Each
    sublane receives at most 128 columns (= its lane capacity in the
    remapped x row). Returns (sub_of_col, lane_of_col, xroute) where
    xroute[w, s, q] is the source position of the column assigned to
    slot (s, q) within the window's 128-group slice of the natural x
    layout (rows [g0[w], g0[w]+128) of x.reshape(-1, 128)), -1 for
    empty slots — the per-window 3-stage route that builds the
    remapped-transposed x table.
    """
    order = np.lexsort((-cnt, win_of_col))
    w_o = win_of_col[order]
    wstart = np.searchsorted(w_o, np.arange(n_w + 1))
    iwin = np.arange(uc.shape[0], dtype=np.int64) - wstart[w_o]
    k = iwin // LANES
    pos = iwin % LANES
    sub_o = np.where(k % 2 == 0, pos, LANES - 1 - pos)
    sub_of = np.empty(uc.shape[0], np.int64)
    lane_of = np.empty(uc.shape[0], np.int64)
    sub_of[order] = sub_o
    lane_of[order] = k
    src_local = ((uc // LANES - g0[win_of_col]) * LANES
                 + uc % LANES).astype(np.int32)
    assert (src_local >= 0).all() and (src_local < TILE).all()
    xr = np.full((n_w, LANES, LANES), -1, np.int32)
    xr[win_of_col, sub_of, lane_of] = src_local
    return sub_of, lane_of, xr


REDUCE_MIN_FACTOR = 1.5  # nnz per partial below which pass-0 reduction
# does not pay for its extra per-tile compute (one lane-prefix matmul +
# one route, ~0.45 us/tile measured-class costs)
REDUCE_MAX_RUNS = 8192   # partials per tile: C/P occupy the two 64-row
# halves of one routed (128,128) tile


def _plan_gather_reduce(Aj: np.ndarray, row_ids: np.ndarray,
                        policy: StreamPolicy, x_blocks_pad: int):
    """Gather plan with early row-reduction.

    Same slot constraints as `_plan_gather` (cold slot sublane fixed by
    col mod 128 within its 16K-column x window; hot pages free-form)
    but each (tile, sublane) is filled CONTIGUOUSLY BY ROW instead of
    round-robin, so same-row products form lane RUNS. Pass 0 collapses
    each run to one partial: lane-prefix cumsum (one MXU matmul) +
    one 3-stage route of the run-end prefixes to compact positions;
    the predecessor value is a flat shift of the routed stream (runs
    are emitted in sublane-major order, so run p's predecessor-end IS
    the value at p-1, with sublane-first runs masked to zero) — no
    second route, and the C route is injective (dedupe-free) with
    per-source-row degree <= 128 always.

    This is the TPU analog of the merge walk's within-thread
    accumulation (ref: merge_based/agent_spmv_orig.cuh:340-384): the
    GPU reduces consecutive same-row items in registers; here the
    planner MAKES items lane-consecutive and one matmul reduces them.

    Returns None when reduction cannot fit (> REDUCE_MAX_RUNS runs in
    a tile) or would not pay (duplication < REDUCE_MIN_FACTOR).
    Otherwise returns (slot_src, slot_q, xb, hot_cols, red) with red =
    dict(src_route, firstmask, part_rows, tile_of_part, Qp).
    """
    nnz = Aj.shape[0]
    counts = np.bincount(Aj, minlength=0)
    hot_mask_col = counts >= policy.hot_threshold
    is_hot = hot_mask_col[Aj]
    W = 128 * LANES

    tiles_src: list = []
    tiles_q: list = []
    xb_list: list = []
    hot_cols: list = []

    # --- cold: per (window, sublane) bucket, sorted by row, cut into
    # contiguous 128-lane chunks across the window's tiles ---
    cold_idx = np.nonzero(~is_hot)[0]
    xroute = None
    g0_w = None
    x_nat_rows = 0
    if cold_idx.size:
        ccols = Aj[cold_idx]
        crows = row_ids[cold_idx]
        G = int(ccols.max() // LANES) + 1
        # remap needs the natural x resident in VMEM for the window
        # slices; huge tables keep the plain col-mod-128 layout
        remap = (policy.remap
                 and (G + LANES) * LANES * 4 <= X_VMEM_MAX_BYTES)
        if remap:
            # Variable-span windows + balanced column->sublane deal.
            # Score fixed 16K-column windows against the greedy
            # load-quantized spans: variable spans win on sparse
            # column regions and sub-integer loads (bench matrix:
            # 256 -> ~204 gather tiles); fixed wins when its table is
            # VMEM-resident and variable's would not be.
            gl = np.bincount(ccols // LANES, minlength=G)
            cs = np.concatenate([[0], np.cumsum(gl)])

            def _layout(bounds):
                loads = cs[bounds[1:]] - cs[bounds[:-1]]
                tiles = int((-(-loads // TILE)).sum())
                n_wl = int((loads > 0).sum())
                xbytes = -(-n_wl // 8) * 8 * TILE * 4
                if xbytes > X_VMEM_MAX_BYTES:
                    xbytes = tiles * TILE * 4
                return tiles * 530e-9 + xbytes / 636e9, loads

            bounds_f = np.unique(np.concatenate(
                [np.arange(0, G, LANES, dtype=np.int64), [G]]))
            bounds_v = _plan_windows(gl)
            sf, loads_f = _layout(bounds_f)
            sv, loads_v = _layout(bounds_v)
            bounds, loads = ((bounds_v, loads_v) if sv <= sf
                             else (bounds_f, loads_f))
            live_w = loads > 0
            n_w = int(live_w.sum())
            wid = np.where(live_w, np.cumsum(live_w) - 1, -1)
            win_of_group = np.repeat(wid, np.diff(bounds))
            g0_w = bounds[:-1][live_w].astype(np.int64)
            x_nat_rows = -(-(G + LANES) // 8) * 8
            uc, cnt = np.unique(ccols, return_counts=True)
            sub_of_col, lane_of_col, xroute = _assign_cols_balanced(
                uc, cnt, win_of_group[uc // LANES], g0_w, n_w)
            # dense col->assignment lookup (a searchsorted map here
            # measured ~20x slower than the direct table)
            sub_lut = np.empty(int(uc[-1]) + 1, np.int64)
            lane_lut = np.empty(int(uc[-1]) + 1, np.int64)
            sub_lut[uc] = sub_of_col
            lane_lut[uc] = lane_of_col
            win_all = win_of_group[ccols // LANES]
            sub_all = sub_lut[ccols]
            qlan_all = lane_lut[ccols].astype(np.int8)
        else:
            win_all = ccols // W
            sub_all = ccols % LANES
            qlan_all = ((ccols // LANES) % LANES).astype(np.int8)
        # single composite-key argsort ~2x a 4-key lexsort when the
        # ranges fit 64 bits: bucket (win*128+sub) | row | col. The
        # remap gate bounds cols (< 1.5M < 2^21) and buckets (< 2^20);
        # rows must fit 22 bits, else fall back to lexsort.
        bkey0 = win_all * LANES + sub_all
        if remap and int(crows.max(initial=0)) < (1 << 22):
            comp = (bkey0.astype(np.uint64) << np.uint64(43)) \
                | (crows.astype(np.uint64) << np.uint64(21)) \
                | ccols.astype(np.uint64)
            order = np.argsort(comp, kind="stable")
        else:
            order = np.lexsort((ccols, crows, sub_all, win_all))
        cold_idx = cold_idx[order]
        ccols = ccols[order]
        win = win_all[order]
        sub = sub_all[order]
        qlan = qlan_all[order]
        bkey = win * LANES + sub
        # bkey is already sorted (it occupies the top bits of both
        # sort branches' keys), so unique = boundary diff; np.unique
        # would re-sort the 3.3M-element array (~2 s at bench scale)
        chg = np.empty(bkey.shape[0], dtype=bool)
        chg[0] = True
        np.not_equal(bkey[1:], bkey[:-1], out=chg[1:])
        ustart = np.nonzero(chg)[0]
        ub = bkey[ustart]
        bidx = np.searchsorted(ub, bkey)
        pos = np.arange(bkey.shape[0]) - ustart[bidx]
        blen = np.diff(np.concatenate([ustart, [bkey.shape[0]]]))
        n_w = int(win[-1]) + 1
        maxlen = np.zeros(n_w, dtype=np.int64)
        np.maximum.at(maxlen, ub // LANES, blen)
        t_w = -(-maxlen // LANES)
        tile_base = np.concatenate([[0], np.cumsum(t_w)])
        # Per-bucket chunk->tile ROTATION: chunk i of bucket (w, s)
        # lands in tile (i + s*phi) % t_w[w] instead of tile i.
        # Sequential assignment piles every bucket's first chunk into
        # tile 0 of its window, so the per-tile RUN counts skew ~1.75x
        # over the mean — which alone forces the partial-stream quota
        # (Qp) up a whole padding class. The rotation decorrelates the
        # bucket phases; runs stay lane-contiguous per (tile, sublane).
        t_w_of = t_w[win]
        # The rotation phase is constant per (window, sublane) bucket:
        # compute it on the ~|buckets| array and gather, and fold the
        # second mod into one compare-subtract (chunk < t_w and
        # phi < t_w, so their sum needs at most one wrap). Vectorized
        # int64 `%` costs ~500 ns/element on this host — keeping both
        # mods off the nnz-length arrays is ~2.5 s at bench scale.
        phi_b = ((ub % LANES) * 2654435761) % np.maximum(
            t_w[ub // LANES], 1)
        s_rot = (pos >> 7) + phi_b[bidx]
        s_rot -= np.where(s_rot >= t_w_of, t_w_of, 0)
        tile_of = tile_base[win] + s_rot
        lane_of = pos & (LANES - 1)
        T_cold = int(tile_base[-1])
        src = np.full(T_cold * TILE, -1, dtype=np.int64)
        qv = np.full(T_cold * TILE, -1, dtype=np.int8)
        slot = tile_of * TILE + sub * LANES + lane_of
        src[slot] = cold_idx
        qv[slot] = qlan
        for t in range(T_cold):
            tiles_src.append(src[t * TILE:(t + 1) * TILE])
            tiles_q.append(qv[t * TILE:(t + 1) * TILE])
        xb_list.extend(np.repeat(np.arange(n_w), t_w).tolist())

    # --- hot: page packing as in _plan_gather, then each tile's
    # entries re-sorted by row and refilled sublane-major (hot slots
    # have no sublane constraint: q is the aug-page row per slot).
    # Aug pages sit after the cold table: with the remap layout the
    # cold table has one 128-row block per LIVE window. ---
    if xroute is not None:
        x_blocks_pad = -(-xroute.shape[0] // 8) * 8
    hot_idx = np.nonzero(is_hot)[0]
    if hot_idx.size:
        hcols = Aj[hot_idx]
        horder = np.argsort(hcols, kind="stable")
        hot_idx = hot_idx[horder]
        hcols = hcols[horder]
        p = 0
        n = hot_idx.shape[0]
        while p < n:
            ent_src: list = []
            ent_q: list = []
            page = np.zeros(LANES, dtype=np.int64)
            nrows = 0
            while p < n and len(ent_src) < TILE and nrows < LANES:
                c = hcols[p]
                e = int(np.searchsorted(hcols, c, side="right"))
                take = min(e - p, TILE - len(ent_src))
                page[nrows] = c
                ent_src.extend(hot_idx[p:p + take].tolist())
                ent_q.extend([nrows] * take)
                nrows += 1
                p += take
            es = np.asarray(ent_src, dtype=np.int64)
            eq = np.asarray(ent_q, dtype=np.int8)
            ro = np.argsort(row_ids[es], kind="stable")
            src = np.full(TILE, -1, dtype=np.int64)
            qv = np.full(TILE, -1, dtype=np.int8)
            src[:es.shape[0]] = es[ro]
            qv[:es.shape[0]] = eq[ro]
            tiles_src.append(src)
            tiles_q.append(qv)
            xb_list.append(x_blocks_pad + len(hot_cols) // LANES)
            hot_cols.extend(page.tolist())

    T = len(tiles_src)
    slot_src = (np.concatenate(tiles_src) if T else
                np.empty(0, np.int64))
    slot_q = (np.concatenate(tiles_q) if T else np.empty(0, np.int8))
    xb = np.asarray(xb_list, dtype=np.int32)
    assert slot_src[slot_src >= 0].size == nnz

    # --- run structure over (tile, sublane) lanes ---
    rows3 = np.where(slot_src >= 0,
                     row_ids[np.clip(slot_src, 0, None)],
                     -1).reshape(T, LANES, LANES)
    live = rows3 >= 0
    prev_row = np.full_like(rows3, -2)
    prev_row[:, :, 1:] = rows3[:, :, :-1]
    is_start = live & (rows3 != prev_row)
    t_i, s_i, l_i = np.nonzero(is_start)  # C order = emission order
    n_runs = t_i.shape[0]
    if n_runs == 0 or nnz / n_runs < REDUCE_MIN_FACTOR:
        return None
    R_t = np.bincount(t_i, minlength=T)
    if int(R_t.max()) > REDUCE_MAX_RUNS:
        return None

    # run end lane: next start's lane - 1 within the same (t, s),
    # else the sublane's last live lane (entries fill lanes from 0)
    live_len = live.sum(axis=2)  # (T, LANES)
    same_bucket = np.zeros(n_runs, dtype=bool)
    if n_runs > 1:
        same_bucket[:-1] = (t_i[1:] == t_i[:-1]) & (s_i[1:] == s_i[:-1])
    end_lane = np.where(
        same_bucket,
        np.concatenate([l_i[1:], [0]]) - 1,
        live_len[t_i, s_i] - 1)

    # compact dest position p = run index within its tile
    tile_start = np.concatenate([[0], np.cumsum(R_t)])
    p_of = np.arange(n_runs) - tile_start[t_i]
    src_route = np.full((T, LANES, LANES), -1, dtype=np.int32)
    src_route[t_i, p_of // LANES, p_of % LANES] = \
        (s_i * LANES + end_lane).astype(np.int32)
    firstmask = np.zeros((T, REDUCE_MAX_RUNS // LANES, LANES),
                         dtype=np.int8)
    fr = l_i == 0  # first run of its sublane
    firstmask[t_i[fr], p_of[fr] // LANES, p_of[fr] % LANES] = 1

    part_rows = rows3[t_i, s_i, l_i]  # row per partial, emission order
    red = {
        "src_route": src_route,
        "firstmask": firstmask,
        "runstart": is_start.astype(np.int8),  # generic-ring reduce
        "part_rows": part_rows,
        "tile_of_part": t_i,
        "p_of_part": p_of,
        "n_runs": n_runs,
        # x remap layout (None/absent when remap off): per-live-window
        # route tiles, window start groups, natural-x input rows
        "xroute": xroute,
        "g0": g0_w,
        "x_nat_rows": x_nat_rows,
    }
    return slot_src, slot_q, xb, np.asarray(hot_cols, dtype=np.int64), red


def _final_tile_walk(Ap: np.ndarray, row_ids: np.ndarray, kappa: int):
    """Cut the row-sorted nnz stream into final tiles: each takes up
    to `kappa` nnz and spans fewer than BIN_ROWS rows from its own
    128-aligned row base (its y window is a (BIN_ROWS/128, 128) block
    at that base). Tiles do NOT align to fixed bins — overlapping
    windows are merged outside the scan kernel — so tiles stay ~full
    instead of being cut at every 8192-row boundary (the round-2
    bin-aligned walk left tiles ~52% live on the bench matrix, which
    taxed every downstream pass by the same factor). Returns k_starts
    (F+1,), base (F,) int64, r_start (F,), lrow (F,)."""
    nnz = row_ids.shape[0]
    if nnz == 0:
        return (np.zeros(1, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.int32), np.zeros(0, np.int32))
    starts, bases = [], []
    s = 0
    while s < nnz:
        base = int(row_ids[s]) & ~(LANES - 1)
        lim = int(np.searchsorted(row_ids, base + BIN_ROWS, side="left"))
        starts.append(s)
        bases.append(base)
        s = min(s + kappa, lim)
    k_starts = np.asarray(starts + [nnz], dtype=np.int64)
    bases = np.asarray(bases, dtype=np.int64)
    r_starts = row_ids[k_starts[:-1]].astype(np.int32)
    lrows = row_ids[k_starts[1:] - 1].astype(np.int32)
    return k_starts, bases, r_starts, lrows


def _plan_scan(plan_sh: ShufflePlan, k_starts, bases, r_starts, lrows,
               row_ids):
    """Build per-final-tile scan streams (v3 exact-rank layout; mirror
    of native spmv_plan_scan3).

    The kernel first routes the tile's slots into EXACT RANK order
    (positions 1..m; position 0 is a reserved zero-prefix slot), which
    makes rel ids MONOTONE in position: every row is one contiguous
    run, so its total is S[e_r] - S[e_{r-1}] for a single tile-wide
    MXU cumsum S, where e_r is the row's last position. Streams:

    - perm_src: exact-perm route source (slot of rank p-1 at position
      p); the junk mask is simply position in [1, m+1) with m the
      per-tile `counts` scalar — no per-slot mask stream.
    - src2e / src2p: END and PREV position per present rel, routed
      into the (BIN_ROWS-rel) y window; y = ends - prevs, masked by
      valid2 (absent rels). The generic roll path uses src2e only
      (its segmented scan restarts per rel).
    - relid (roll path only): rel id per exact position, junk-flagged
      (+16384) at position 0 and the tail.
    """
    F = k_starts.shape[0] - 1
    P = BIN_ROWS // LANES

    try:
        from spmv_tpu import native

        if native.available():
            (perm_src, relid, src2e, src2p, valid2, counts) = \
                native.plan_scan(
                    np.asarray(k_starts, np.int64),
                    np.asarray(bases, np.int64),
                    plan_sh.slot_of_dst, np.asarray(row_ids, np.int64),
                    BIN_ROWS)
            return _scan_route_streams(perm_src, relid, src2e, src2p,
                                       valid2, counts)
    except NotImplementedError:
        pass
    perm_src = np.full((F, LANES, LANES), -1, dtype=np.int32)
    relid = np.zeros((F, TILE), dtype=np.int16)
    src2e = np.full((F, LANES, LANES), -1, dtype=np.int32)
    src2p = np.full((F, LANES, LANES), -1, dtype=np.int32)
    valid2 = np.zeros((F, P, LANES), dtype=np.int8)
    counts = np.zeros(F, dtype=np.int32)
    for f in range(F):
        a, b = int(k_starts[f]), int(k_starts[f + 1])
        m = b - a
        if m > TILE - 1:
            raise ValueError(f"scan capacity: {m} ranks in tile {f}")
        d = np.arange(a, b) - a + f * TILE
        slots = plan_sh.slot_of_dst[d]
        assert (slots >= 0).all()
        local = (slots - f * TILE).astype(np.int64)
        assert (local >= 0).all() and (local < TILE).all(), \
            "shuffle placed a rank outside its tile"
        rels = (row_ids[a:b] - bases[f]).astype(np.int64)
        assert (rels >= 0).all() and (rels < BIN_ROWS).all()
        assert (np.diff(rels) >= 0).all(), \
            "ranks not row-sorted within tile"
        counts[f] = m
        pos = 1 + np.arange(m)
        perm_src[f].reshape(-1)[pos] = local
        rl = relid[f]
        rl[0] = rels[0] + TILE
        rl[pos] = rels
        rl[m + 1:] = rels[-1] + TILE
        new_run = np.ones(m, dtype=bool)
        new_run[1:] = rels[1:] != rels[:-1]
        starts_i = np.nonzero(new_run)[0]
        run_rels = rels[starts_i]
        ends_pos = np.append(starts_i[1:], m)  # e_r = 1 + last idx
        s2e = src2e[f].reshape(-1)
        s2p = src2p[f].reshape(-1)
        s2e[run_rels] = ends_pos
        s2p[run_rels] = np.concatenate([[0], ends_pos[:-1]])
        valid2[f].reshape(-1)[run_rels] = 1
    return _scan_route_streams(perm_src, relid, src2e, src2p, valid2,
                               counts)


def _scan_route_streams(perm_src, relid, src2e, src2p, valid2, counts):
    """Shared tail of _plan_scan: 3-stage-route the stream sources.

    (A forward-filled END route that would let the kernel derive PREV
    by a flat shift was tried in round 5 and rejected: fill fan-out
    concentrates a sparse tile's run-end sources into S row 0 and
    blows the 128-edge-per-source-row route capacity. Two injective
    routes are the degree-safe form.)"""
    F = counts.shape[0]
    pm = route_tiles(perm_src.reshape(F, LANES, LANES), dedupe=False)
    r2e = route_tiles(src2e.reshape(F, LANES, LANES), dedupe=False)
    r2p = route_tiles(src2p.reshape(F, LANES, LANES), dedupe=False)
    return {
        "relid": relid,
        "pm1": pm[0], "pm2": pm[1], "pm3": pm[2],
        "r2s1": r2e[0], "r2s2": r2e[1], "r2s3": r2e[2],
        "q2s1": r2p[0], "q2s2": r2p[1], "q2s3": r2p[2],
        "valid2": valid2, "counts": counts,
    }


def build_stream_plan(A: CSR, policy: StreamPolicy) -> StreamPlan:
    Ap = np.asarray(A.Ap, dtype=np.int64)
    Aj = np.asarray(A.Aj, dtype=np.int64)
    Ax = np.asarray(A.Ax)
    nnz = int(Ap[-1])
    row_ids = np.repeat(np.arange(A.n_rows, dtype=np.int64),
                        Ap[1:] - Ap[:-1])
    # x2d is padded to whole 16K-column windows (128-row blocks);
    # with the lane remap the window count also rounds to the xprep
    # kernel's 8-window grid granule
    x_blocks_pad = -(-A.n_cols // (LANES * LANES))
    if policy.remap:
        x_blocks_pad = -(-x_blocks_pad // 8) * 8
    x_rows_pad = x_blocks_pad * LANES

    red = None
    if policy.reduce != "off":
        res = _plan_gather_reduce(Aj, row_ids, policy, x_blocks_pad)
        if res is None:
            if policy.reduce == "on":
                raise PlanCapacityError(
                    "reduce='on' but early reduction is infeasible or "
                    "unprofitable for this matrix (runs/tile > "
                    f"{REDUCE_MAX_RUNS} or duplication < "
                    f"{REDUCE_MIN_FACTOR})")
        else:
            slot_src, slot_q, xb, hot_cols, red = res
            if red.get("xroute") is not None:
                # remap layout: the x table holds one 128-row block
                # per LIVE window (+ aug pages), not per natural window
                x_blocks_pad = -(-red["xroute"].shape[0] // 8) * 8
                x_rows_pad = x_blocks_pad * LANES
    if red is None:
        slot_src, slot_q, xb, hot_cols = _plan_gather(
            Aj, policy, x_blocks_pad)
    n_gather_tiles = xb.shape[0]

    if n_gather_tiles > 16384:
        raise PlanCapacityError(
            f"matrix too large for the shuffle planner: {n_gather_tiles} "
            f"gather tiles > 16384 (~240M nnz); use kind "
            f"'merge_tiled'/'xla'")
    # pad gather tiles: with reduction, pass-0 tiles only need the
    # sbt=8 grid granule (x16 so tiles*Qp stays 128-row aligned); the
    # SHUFFLE input is then the (smaller) partial stream, padded to
    # the shuffle's own 128-tile granule below. Without reduction the
    # gather output IS the shuffle input.
    pad_tiles = (max(16, -(-n_gather_tiles // 16) * 16) if red is not None
                 else max(128, -(-n_gather_tiles // 128) * 128))
    padn = pad_tiles - n_gather_tiles
    if padn:
        slot_src = np.concatenate(
            [slot_src, np.full(padn * TILE, -1, np.int64)])
        slot_q = np.concatenate([slot_q, np.full(padn * TILE, -1, np.int8)])
        xb = np.concatenate([xb, np.zeros(padn, np.int32)])
        if red is not None:
            red["src_route"] = np.concatenate(
                [red["src_route"],
                 np.full((padn, LANES, LANES), -1, np.int32)])
            red["firstmask"] = np.concatenate(
                [red["firstmask"],
                 np.zeros((padn, REDUCE_MAX_RUNS // LANES, LANES),
                          np.int8)])
            red["runstart"] = np.concatenate(
                [red["runstart"],
                 np.zeros((padn, LANES, LANES), np.int8)])

    # Final-tile capacity, region geometry and pass-1 quota are chosen
    # together: smaller matrices need emptier final tiles (smaller
    # kappa) so pass-2 quota windows can hold each (mid tile, final
    # tile) share. A cheap exact count check prunes infeasible
    # combinations before the expensive full plan (which still
    # validates pass 2 exactly and raises on overflow).
    if red is not None:
        # Deal pass-0 tiles round-robin by descending partial count
        # across the grid steps: the partial stream is junk-padded and
        # per-tile counts vary, and the downstream pass-1 regions fill
        # by SOURCE STEP — without this, live partials cluster in the
        # early region content tiles and the final pass's per-flow
        # quota cap fails at any useful kappa (measured: shrink->1024).
        R_t = np.bincount(red["tile_of_part"], minlength=pad_tiles)
        order_t = np.argsort(-R_t, kind="stable")
        n_steps0 = pad_tiles // 8
        perm = np.empty(pad_tiles, np.int64)  # perm[new tile] = old
        new_pos = ((np.arange(pad_tiles) % n_steps0) * 8
                   + np.arange(pad_tiles) // n_steps0)
        perm[new_pos] = order_t
        slot_src = slot_src.reshape(pad_tiles, TILE)[perm].reshape(-1)
        slot_q = slot_q.reshape(pad_tiles, TILE)[perm].reshape(-1)
        xb = xb[perm]
        red["src_route"] = red["src_route"][perm]
        red["firstmask"] = red["firstmask"][perm]
        red["runstart"] = red["runstart"][perm]
        inv = np.empty_like(perm)
        inv[perm] = np.arange(pad_tiles)
        red["tile_of_part"] = inv[red["tile_of_part"]]

        # the shuffled stream is the PARTIAL stream: one value per
        # (tile, sublane, row) run, at out slot tile*Qp*128 + p.
        # Qp grows past the needed quota so the stream FILLS its
        # padded tile space uniformly — packed-low quota blocks would
        # concentrate all live data in the first ~60% of the stream
        # and overload the downstream regions' early content tiles by
        # the same factor (measured: the per-flow quota cap then fails
        # at any kappa above ~6144).
        n_runs = red["n_runs"]
        Qp_need = max(8, -(-(int(red["p_of_part"].max()) + 1) // LANES
                           // 8) * 8)
        # v4: the smallest padded stream size the shuffle geometry
        # accepts is 64 tiles (2-pass q1=16 needs region_tiles to
        # divide 128); sizes double from there. Pick the smallest that
        # fits Qp_need, then RE-SPREAD the quota so live data fills
        # the padded space uniformly (a junk tail concentrates the
        # downstream per-flow quotas and collapses kappa — measured
        # both in round 3 and again with the v4 compact attempt).
        s_pad = 64
        while (s_pad * LANES // pad_tiles // 8) * 8 < Qp_need \
                and s_pad < pad_tiles * (REDUCE_MAX_RUNS // LANES) // LANES:
            s_pad *= 2
        Qp = min(REDUCE_MAX_RUNS // LANES,
                 max(Qp_need, (s_pad * LANES // pad_tiles // 8) * 8))
        stream_tiles = pad_tiles * Qp // LANES
        s_pad = max(s_pad, -(-stream_tiles // 8) * 8)
        # Rank ties within a row are PSEUDO-RANDOM over (tile, p):
        # tile-order ties would hand each final tile a few consecutive
        # source tiles' chunks (a heavy row's ~70-128 partials per
        # tile stay rank-consecutive), skewing the per-flow quota
        # counts ~1.9x over the mean. Hashed ties make every rank
        # range draw Poisson-uniformly from the whole stream.
        t_of = red["tile_of_part"]
        tie = ((t_of.astype(np.uint64) * np.uint64(2654435761)
                + red["p_of_part"].astype(np.uint64) * np.uint64(40503))
               & np.uint64(0xFFFFFFFF))
        order = np.lexsort((tie, red["part_rows"]))
        rows_ranked = red["part_rows"][order]
        rank_of_part = np.empty(n_runs, np.int64)
        rank_of_part[order] = np.arange(n_runs)
        outslot = red["tile_of_part"] * (Qp * LANES) + red["p_of_part"]
        rank_of_slot = np.full(s_pad * TILE, -1, np.int64)
        rank_of_slot[outslot] = rank_of_part
        n_items = n_runs
        red["Qp"] = Qp
        red["out_rows"] = s_pad * LANES
    else:
        rank_of_slot = slot_src  # CSR order IS row-sorted rank order
        rows_ranked = row_ids
        n_items = nnz
    live = rank_of_slot >= 0

    import os
    import sys
    import time as _time
    verbose = bool(os.environ.get("SPMV_TPU_PLAN_VERBOSE"))

    def _log(msg):
        if verbose:
            print(f"[stream-plan +{_time.perf_counter()-_t0:.1f}s] {msg}",
                  file=sys.stderr, flush=True)

    _t0 = _time.perf_counter()
    last_err: Optional[Exception] = None
    plan_sh = None
    walk = None
    # With early reduction the final tiles fill from a 5-20x smaller
    # partial stream packed into FEW source tiles; the final split
    # pass's per-flow quota cap (~(q_last-1)*128 through 8 region
    # content tiles, 15368/tile total) cannot feed 14336-deep tiles,
    # so cap kappa at 12288 (80% of the 8-flow cap; the step-
    # interleaved rank ties above keep flows near the mean).
    kap0 = policy.kappa if red is None else min(policy.kappa, 12288)
    kappas = [k for k in (kap0, 12288, 10240, 8192, 6144, 4096,
                          3072, 2048, 1024, 512, 256)
              if k <= kap0]
    ki = 0
    while ki < len(kappas):
        kappa = kappas[ki]
        ki += 1
        k_starts, bases, r_starts, lrows = _final_tile_walk(
            Ap, rows_ranked, kappa)
        F = k_starts.shape[0] - 1
        if F == 0:
            raise ValueError("empty matrix; handled by caller")
        sizes = np.diff(k_starts)
        ftile_of_rank = np.repeat(
            np.arange(F, dtype=np.int64), sizes)
        dst_of_rank = (ftile_of_rank * TILE + np.arange(n_items)
                       - np.repeat(k_starts[:-1], sizes))
        dst_pos = np.full(rank_of_slot.shape[0], -1, dtype=np.int64)
        dst_pos[live] = dst_of_rank[rank_of_slot[live]]

        try:
            plan_sh = plan_shuffle_auto(
                dst_pos, F, sbt=8,
                log=(lambda m: _log(f"kappa={kappa} {m}")))
        except ValueError as e:
            last_err = e
            plan_sh = None
            # Failed constraints that scale with tile fill report the
            # violation ratio; jump straight to a kappa that can pass
            # instead of stepping through ones that provably cannot.
            shrink = getattr(e, "shrink", None)
            if shrink and shrink > 1:
                target = kappa / shrink
                while ki < len(kappas) - 1 and kappas[ki] > target:
                    _log(f"kappa={kappas[ki]} skipped "
                         f"(needs <= {target:.0f})")
                    ki += 1

        if plan_sh is not None:
            _log(f"kappa={kappa} shuffle planned; scan planning")
            try:
                scan = _plan_scan(plan_sh, k_starts, bases, r_starts,
                                  lrows, rows_ranked)
            except ValueError as e:  # scan capacity: too many chunks
                last_err = e
                _log(f"kappa={kappa} scan plan failed: {e}")
                plan_sh = None
                continue
            walk = (k_starts, bases, r_starts, lrows)
            break
    if plan_sh is None:
        raise PlanCapacityError(f"shuffle planning failed: {last_err}")
    k_starts, bases, r_starts, lrows = walk
    F = k_starts.shape[0] - 1


    # pad scan tiles to a multiple of SBT_SCAN_MAX: padded tiles carry
    # junk cid (masked to identity); merge_idx never references them.
    # Padding to the max granule (not policy.scan_sbt) makes one plan
    # serve every divisor scan_sbt — autotune sweeps without re-planning
    F_pad = -(-F // SBT_SCAN_MAX) * SBT_SCAN_MAX
    pf = F_pad - F

    def padt(a, fill):
        if pf == 0:
            return a
        pad_shape = (pf,) + a.shape[1:]
        return np.concatenate([a, np.full(pad_shape, fill, a.dtype)])

    scan = {
        "relid": padt(scan["relid"], 16384),
        "pm1": padt(scan["pm1"], 0), "pm2": padt(scan["pm2"], 0),
        "pm3": padt(scan["pm3"], 0),
        "r2s1": padt(scan["r2s1"], 0), "r2s2": padt(scan["r2s2"], 0),
        "r2s3": padt(scan["r2s3"], 0),
        "q2s1": padt(scan["q2s1"], 0), "q2s2": padt(scan["q2s2"], 0),
        "q2s3": padt(scan["q2s3"], 0),
        "valid2": padt(scan["valid2"], 0),
        "counts": padt(scan["counts"], 0),
    }

    # merge plan (v3): ragged-concat pieces + per-depth fixups.
    # Each final tile's y window covers y2d blocks [lo_f, hi_f]; a
    # block's FIRST contributor row joins a contiguous slice piece of
    # the flat ycand array (copies at streaming speed instead of an
    # 8192-row XLA gather, which measured 136 GB/s), uncovered blocks
    # become identity-fill pieces, and the rare extra contributors
    # (window overlaps at tile boundaries / hub rows; 26/8192 blocks
    # on the bench matrix) are applied afterwards as per-depth
    # distinct-row semiring fixups (the decoupled-lookback analog,
    # ref: merge_based/agent_segment_fixup.cuh).
    P = BIN_ROWS // LANES
    NBY = -(-A.n_rows // LANES)
    fb = (bases // LANES).astype(np.int64)
    lo = (r_starts.astype(np.int64) // LANES)
    hi = (lrows.astype(np.int64) // LANES)
    primary = np.full(NBY, -1, dtype=np.int64)  # ycand row per block
    extras: list = [[] for _ in range(NBY)]
    for f in range(F):
        for b2 in range(int(lo[f]), int(hi[f]) + 1):
            r = f * P + int(b2 - fb[f])
            if primary[b2] < 0:
                primary[b2] = r
            else:
                extras[b2].append(r)
    # uniform row-gather source (used instead of the ragged concat
    # when the piece count would degenerate into per-tile slivers)
    merge_src = np.where(primary >= 0, primary,
                         F_pad * P).astype(np.int32)
    # maximal pieces: consecutive blocks with consecutive primary rows
    m_kind: list = []  # 0 = ycand slice, 1 = identity fill
    m_a: list = []     # slice start row (kind 0) or 0
    m_len: list = []
    b2 = 0
    while b2 < NBY:
        if primary[b2] < 0:
            j = b2
            while j < NBY and primary[j] < 0:
                j += 1
            m_kind.append(1); m_a.append(0); m_len.append(j - b2)
        else:
            j = b2
            while (j + 1 < NBY and primary[j + 1] == primary[j] + 1):
                j += 1
            m_kind.append(0); m_a.append(int(primary[b2]))
            m_len.append(j - b2 + 1)
            j += 1
        b2 = j if m_kind[-1] == 1 else j
    depth = max((len(e) for e in extras), default=0)
    fix_levels = []
    for d in range(depth):
        outs = [b3 for b3 in range(NBY) if len(extras[b3]) > d]
        srcs = [extras[b3][d] for b3 in outs]
        fix_levels.append((np.asarray(outs, np.int32),
                           np.asarray(srcs, np.int32)))
    Ax_slots = np.where(slot_src >= 0, Ax[np.clip(slot_src, 0, nnz - 1)], 0)

    _log("host planning done; uploading device arrays")
    from spmv_tpu.utils.transfer import device_put_chunked as dput

    gather_dev = {
        "Ax": dput(Ax_slots.astype(Ax.dtype).reshape(-1, LANES)),
        "q": dput(slot_q.reshape(-1, LANES)),
        "xb": jnp.asarray(xb),
    }
    if red is not None and red.get("xroute") is not None:
        xr = red["xroute"]
        n_w_live = xr.shape[0]
        pad_w = x_blocks_pad - n_w_live
        if pad_w:
            xr = np.concatenate(
                [xr, np.full((pad_w, LANES, LANES), -1, np.int32)])
        xr1, xr2, xr3 = route_tiles(xr, dedupe=False)
        g0p = np.zeros(x_blocks_pad, np.int32)
        g0p[:n_w_live] = red["g0"].astype(np.int32)
        gather_dev["xr1"] = dput(xr1.reshape(-1, LANES))
        gather_dev["xr2"] = dput(xr2.reshape(-1, LANES))
        gather_dev["xr3"] = dput(xr3.reshape(-1, LANES))
        gather_dev["g0"] = jnp.asarray(g0p)
        gather_dev["x_nat_rows"] = int(red["x_nat_rows"])
    reduce_dev = None
    if red is not None:
        c1, c2, c3 = route_tiles(red["src_route"], dedupe=False)
        # the sublane-first-run mask rides the high bit of the final
        # route stage (lane indexes use 7 bits): one fewer stream to
        # read per slot in the reduce kernel
        HR = REDUCE_MAX_RUNS // LANES
        c3 = c3.copy()
        c3[:, :HR, :] |= (red["firstmask"].astype(np.uint8) << 7)
        reduce_dev = {
            "c1": dput(c1.reshape(-1, LANES)),
            "c2": dput(c2.reshape(-1, LANES)),
            "c3": dput(c3.reshape(-1, LANES)),
            "rs": dput(red["runstart"].reshape(-1, LANES)),
            "Qp": int(red["Qp"]),
            "out_rows": int(red["out_rows"]),
        }
    scan_dev = {
        k: dput(scan[k].reshape(-1, LANES))
        for k in ("relid", "pm1", "pm2", "pm3",
                  "r2s1", "r2s2", "r2s3",
                  "q2s1", "q2s2", "q2s3", "valid2")
    }
    scan_dev.update({
        "counts": jnp.asarray(scan["counts"]),
        "m_kind": np.asarray(m_kind, np.int32),
        "m_a": np.asarray(m_a, np.int32),
        "m_len": np.asarray(m_len, np.int32),
        "merge_src": jnp.asarray(merge_src),
        **{f"fx{d}_{h}": jnp.asarray(arr)
           for d, pair in enumerate(fix_levels)
           for h, arr in zip(("out", "src"), pair)},
    })
    return StreamPlan(
        n_gather_tiles=pad_tiles, n_final_tiles=F, layers=1,
        x_rows_pad=x_rows_pad,
        hot_cols=jnp.asarray(hot_cols.astype(np.int32)),
        gather=gather_dev, shuffle=plan_sh,
        shuffle_dev=shuffle_device_arrays(plan_sh),
        scan=scan_dev, n_y_blocks=NBY, reduce=reduce_dev)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _xwin(xb_ref, xwins, x_vmem: bool, t, j: int, sbt: int):
    """The j-th tile's (128,128) transposed x window for this grid
    step: either the j-th per-tile DMA'd block, or an in-register slice
    of the VMEM-resident full table (x_vmem mode)."""
    if not x_vmem:
        return xwins[j][...]
    start = pl.multiple_of(xb_ref[t * sbt + j] * LANES, LANES)
    return xwins[0][pl.ds(start, LANES), :]


def _gather_kernel(sbt: int, sr: Semiring, identity: float,
                   x_vmem: bool):
    def kernel(xb_ref, ax_ref, q_ref, *rest):
        xwins, out_ref = rest[:-1], rest[-1]
        t = pl.program_id(0)
        for j in range(sbt):
            q = q_ref[j * LANES:(j + 1) * LANES, :].astype(jnp.int32)
            ax = ax_ref[j * LANES:(j + 1) * LANES, :]
            qc = jnp.where(q >= 0, q, 0)
            # xg[s,l] = xt[s, q[s,l]]: native lane gather, no transposes
            xg = jnp.take_along_axis(
                _xwin(xb_ref, xwins, x_vmem, t, j, sbt), qc, axis=1)
            prod = sr.combine(ax, xg)
            out_ref[j * LANES:(j + 1) * LANES, :] = jnp.where(
                q >= 0, prod, identity)

    return kernel


def _gather_split_kernel(sbt: int, sr: Semiring, identity: float,
                         K: int, Q: int, x_vmem: bool):
    """Fused gather + shuffle-pass-1: products are computed in
    registers, routed, and DMA'd straight into the pass-1 quota
    windows — the product array never round-trips HBM between the
    gather and the first split (the fusion DESIGN_stream.md names)."""
    from spmv_tpu.kernels.pallas_utils import route3_batched

    def kernel(xb_ref, pos_ref, starts_ref, ax_ref, q_ref,
               s1_ref, s2_ref, s3_ref, *refs):
        del pos_ref  # consumed by the index maps
        t = pl.program_id(0)
        n_x = 1 if x_vmem else sbt
        xwins = refs[:n_x]
        out_ref, scratch = refs[n_x], refs[-1]
        prods = []
        for j in range(sbt):
            q = q_ref[j * LANES:(j + 1) * LANES, :].astype(jnp.int32)
            ax = ax_ref[j * LANES:(j + 1) * LANES, :]
            qc = jnp.where(q >= 0, q, 0)
            xg = jnp.take_along_axis(
                _xwin(xb_ref, xwins, x_vmem, t, j, sbt), qc, axis=1)
            prods.append(jnp.where(q >= 0, sr.combine(ax, xg), identity))
        scratch[...] = route3_batched(
            jnp.concatenate(prods, axis=0), s1_ref[...], s2_ref[...],
            s3_ref[...])
        r = pl.program_id(0) % 8
        srow = starts_ref[pl.ds(r, 1), :]
        for k in range(K):
            for j in range(sbt):
                st = srow[0, j * K + k]
                out_ref[k, j * Q:(j + 1) * Q, :] = \
                    scratch[pl.ds(j * LANES + st, Q), :]

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "sr", "sbt", "n_tiles", "K", "Q", "rows_per_g", "interpret"))
def _gather_split_pass(x2d, ax, q, xb, s1, s2, s3, starts, pos, *,
                       sr: Semiring, sbt, n_tiles, K, Q, rows_per_g,
                       interpret):
    identity = float(sr.identity_for(ax.dtype))
    n_steps = n_tiles // sbt
    sw = starts.shape[1]
    x_vmem, x_specs, x_args = _x_specs(x2d, sbt)

    def blk(rows):
        return pl.BlockSpec((rows, LANES), lambda t, xb, pos: (t, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=(
            [pl.BlockSpec((8, sw), lambda t, xb, pos: (t // 8, 0))]
            + [blk(sbt * LANES)] * 5
            + x_specs
        ),
        out_specs=pl.BlockSpec((K, sbt * Q, LANES),
                               lambda t, xb, pos: (0, pos[t], 0)),
        scratch_shapes=[pltpu.VMEM((sbt * LANES, LANES), ax.dtype)],
    )
    return pl.pallas_call(
        _gather_split_kernel(sbt, sr, identity, K, Q, x_vmem),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, rows_per_g, LANES), ax.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xb, pos, starts, ax, q, s1, s2, s3, *x_args)


def _reduce_kernel(sbt: int, sr: Semiring, identity: float, Qp: int,
                   x_vmem: bool, generic: bool):
    """Fused gather + early row-reduction (pass 0 of the reduced
    pipeline). Products are formed in registers; one MXU lane-prefix
    matmul gives per-sublane running sums; the planned C route drops
    each run-end prefix at its compact partial position; the
    predecessor prefix is a flat shift-by-1 of the routed stream
    (emission order makes run p-1 the predecessor of run p within a
    sublane; sublane-first runs are masked to zero by `fm`). Partials
    = C - P leave in Qp-row quota blocks per tile."""
    from spmv_tpu.kernels.pallas_utils import route3_batched

    HROWS = REDUCE_MAX_RUNS // LANES  # 64: the C half of a routed tile

    def kernel(xb_ref, ax_ref, q_ref, c1_ref, c2_ref, c3_ref, *rest):
        t = pl.program_id(0)
        if generic:
            rs_ref = rest[0]
            rest = rest[1:]
        n_x = 1 if x_vmem else sbt
        xwins = rest[:n_x]
        out_ref = rest[n_x]
        prods = []
        for j in range(sbt):
            q = q_ref[j * LANES:(j + 1) * LANES, :].astype(jnp.int32)
            ax = ax_ref[j * LANES:(j + 1) * LANES, :]
            qc = jnp.where(q >= 0, q, 0)
            xg = jnp.take_along_axis(
                _xwin(xb_ref, xwins, x_vmem, t, j, sbt), qc, axis=1)
            prods.append(jnp.where(q >= 0, sr.combine(ax, xg), identity))
        v = jnp.concatenate(prods, axis=0)
        c3v = c3_ref[...].astype(jnp.int32)
        if generic:
            # generic semiring (no ring inverse): run totals by a
            # flag-based SEGMENTED roll-scan over the lane-contiguous
            # runs, then the same C route delivers each run-END value —
            # which IS the run total, since the scan restarts per run.
            # Runs never cross sublanes (every sublane's first live
            # lane is a run start), so the scan is lanes-only: 7 roll
            # steps, no id materialization, no cross-sublane carry —
            # this pass was 2.2-2.7x the plus_times kernel in round 4
            # (a (S,S) MXU id cumsum + a full 2-phase segmented scan).
            scan = segmented_scan_lanes(
                v, rs_ref[...].astype(jnp.int32), sr.reduce)
            routed = route3_batched(scan, c1_ref[...], c2_ref[...],
                                    c3v & 127)
            part = jnp.concatenate(
                [routed[j * LANES:j * LANES + HROWS]
                 for j in range(sbt)], axis=0)
        else:
            li = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
            lj = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
            triu = (li <= lj).astype(v.dtype)
            S = jax.lax.dot_general(
                v, triu, (((1,), (0,)), ((), ())),
                precision=_MM_PRECISION, preferred_element_type=v.dtype)
            routed = route3_batched(S, c1_ref[...], c2_ref[...],
                                    c3v & 127)
            C = jnp.concatenate(
                [routed[j * LANES:j * LANES + HROWS] for j in range(sbt)],
                axis=0)
            rl = pltpu.roll(C, 1, 1)
            # lane 0 takes the previous sublane's lane 127; the roll
            # wrapping across tile blocks (and around row 0) only ever
            # lands on p=0 slots, which are sublane-first runs -> masked
            prev = jnp.where(lane_iota(C.shape) == 0,
                             pltpu.roll(rl, 1, 0), rl)
            # the sublane-first mask rides c3's high bit
            fm = jnp.concatenate(
                [(c3v >> 7)[j * LANES:j * LANES + HROWS]
                 for j in range(sbt)], axis=0)
            P = jnp.where(fm > 0, jnp.zeros_like(prev), prev)
            part = C - P
        out_ref[...] = jnp.concatenate(
            [part[j * HROWS:j * HROWS + Qp] for j in range(sbt)], axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "sr", "sbt", "n_tiles", "Qp", "out_rows", "interpret"))
def _reduce_pass(x2d, ax, q, xb, c1, c2, c3, rs=None, *,
                 sr: Semiring, sbt, n_tiles, Qp, out_rows, interpret):
    """Pass 0 of the reduced pipeline: (n_tiles) gather tiles in, a
    junk-padded (out_rows, 128) partial stream out (rows past
    n_tiles*Qp are never written; the downstream shuffle plans around
    them as junk)."""
    identity = float(sr.identity_for(ax.dtype))
    n_steps = n_tiles // sbt
    x_vmem, x_specs, x_args = _x_specs(x2d, sbt)
    generic = not (sr.name == "plus_times" and ax.dtype == jnp.float32)

    def blk(rows):
        return pl.BlockSpec((rows, LANES), lambda t, xb: (t, 0))

    aux = [xb, ax, q, c1, c2, c3]
    n_aux = 5
    if generic:
        aux.append(rs)
        n_aux += 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=(
            [blk(sbt * LANES)] * n_aux
            + x_specs
        ),
        out_specs=pl.BlockSpec((sbt * Qp, LANES), lambda t, xb: (t, 0)),
    )
    return pl.pallas_call(
        _reduce_kernel(sbt, sr, identity, Qp, x_vmem, generic),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, LANES), ax.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*aux, *x_args)


@functools.partial(jax.jit, static_argnames=("n_w", "interpret"))
def _xprep_pass(xnat, g0, xr1, xr2, xr3, *, n_w, interpret):
    """Remapped-transposed x table in ONE Pallas pass: per variable-
    span window, slice the VMEM-resident natural x at the window's
    (8-aligned) start group and run the planned 3-stage route to the
    balanced slot layout — the route subsumes the transpose the old
    XLA x-prep paid, so the remap costs route compute (+3 B/element
    of route streams), not an extra HBM round trip."""
    sbt = 8
    n_steps = n_w // sbt
    g_in = xnat.shape[0]

    def kernel(g0_ref, r1_ref, r2_ref, r3_ref, x_ref, out_ref):
        t = pl.program_id(0)
        wins = []
        for j in range(sbt):
            start = pl.multiple_of(g0_ref[t * sbt + j], WINDOW_ALIGN)
            wins.append(x_ref[pl.ds(start, LANES), :])
        v = jnp.concatenate(wins, axis=0)
        out_ref[...] = _route3_batched(
            v, r1_ref[...], r2_ref[...], r3_ref[...])

    blk = pl.BlockSpec((sbt * LANES, LANES), lambda t, g0: (t, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[blk] * 3
        + [pl.BlockSpec((g_in, LANES), lambda t, g0: (0, 0))],
        out_specs=blk,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_w * LANES, LANES), xnat.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(g0, xr1, xr2, xr3, xnat)


def _route3(v, s1_ref, s2_ref, s3_ref):
    a = jnp.take_along_axis(v, s1_ref[...].astype(jnp.int32), axis=1).T
    a = jnp.take_along_axis(a, s2_ref[...].astype(jnp.int32), axis=1).T
    return jnp.take_along_axis(a, s3_ref[...].astype(jnp.int32), axis=1)


from spmv_tpu.kernels.pallas_utils import route3_batched as _route3_batched


SBT_SCAN = 8  # final tiles per outer scan grid step


# Mosaic supports only DEFAULT (bf16, 8 mantissa bits — too coarse for
# prefix sums) and HIGHEST (fp32-exact) dot precisions; use HIGHEST.
_MM_PRECISION = jax.lax.Precision.HIGHEST


def _flat_cumsum(v):
    """Inclusive cumsum of a (S, 128) tile in row-major flat order,
    built from two MXU matmuls (lane prefix + sublane offsets) instead
    of ~40 VPU roll passes."""
    S, L = v.shape
    li = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    triu = (li <= lj).astype(v.dtype)  # upper-tri incl diag
    lane_scan = jax.lax.dot_general(
        v, triu, (((1,), (0,)), ((), ())),
        precision=_MM_PRECISION,
        preferred_element_type=v.dtype)
    row_tot = jnp.broadcast_to(lane_scan[:, L - 1:L], (S, L))
    si = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    sj = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    strict = (si > sj).astype(v.dtype)
    off = jax.lax.dot_general(
        strict, row_tot, (((1,), (0,)), ((), ())),
        precision=_MM_PRECISION,
        preferred_element_type=v.dtype)
    return lane_scan + off


def _flat_cumsum_batched(v, R: int):
    """Per-R-row-block inclusive flat cumsum of a (T*R, 128) stack.

    One (T*R,128)@(128,128) MXU lane-prefix for ALL blocks plus one
    small (R,R)@(R,T) matmul for the per-block sublane offsets —
    ~2x fewer MXU units and ~T x fewer op dispatches than T separate
    `_flat_cumsum` calls (the scan pass is compute-bound; measured
    round 2, scripts/profile_stream.py)."""
    N, L = v.shape
    T = N // R
    if T == 1:
        return _flat_cumsum(v)
    li = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    triu = (li <= lj).astype(v.dtype)
    lane_scan = jax.lax.dot_general(
        v, triu, (((1,), (0,)), ((), ())),
        precision=_MM_PRECISION,
        preferred_element_type=v.dtype)
    # Per-block exclusive prefix of row totals: one strict lower-tri
    # (R,R)@(R,L) matmul per block on the lane-broadcast row totals.
    # (A single (R,T)-shaped offset matrix would be cheaper arithmetic,
    # but relayouting it to an (N,1) column is an unsupported Mosaic
    # shape cast — lane values cannot become sublanes; the per-block
    # broadcast form keeps every op in a supported layout.)
    si = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    sj = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    strict = (si > sj).astype(v.dtype)
    outs = []
    for t in range(T):
        blk = lane_scan[t * R:(t + 1) * R]
        rt = jnp.broadcast_to(blk[:, L - 1:L], (R, L))
        off = jax.lax.dot_general(
            strict, rt, (((1,), (0,)), ((), ())),
            precision=_MM_PRECISION,
            preferred_element_type=v.dtype)
        outs.append(blk + off)
    return jnp.concatenate(outs, axis=0)


def _scan_kernel_diff(sbt: int):
    """plus_times scan v3: exact-rank perm + ONE MXU flat cumsum +
    END/PREV prefix routes.

    The perm route puts the tile's slots in exact rank order
    (positions 1..m; 0 is a zero prefix), so rel ids are monotone and
    every row is one contiguous run: its total is S[e_r] - S[e_{r-1}],
    both prefixes routed straight into the rel-addressed y window.
    Replaces v2's chunk machinery (4 routes + 2 cumsums + 2 mask
    streams -> 3 routes + 1 cumsum + a per-tile count scalar).
    """

    def kernel(counts_ref, *refs):
        (prod_ref, pm1_ref, pm2_ref, pm3_ref,
         r2s1_ref, r2s2_ref, r2s3_ref,
         q2s1_ref, q2s2_ref, q2s3_ref, valid2_ref, out_ref) = refs
        t = pl.program_id(0)

        v = _route3_batched(prod_ref[...], pm1_ref[...], pm2_ref[...],
                            pm3_ref[...])
        pos = flat_iota((sbt * LANES, LANES)) % TILE
        m = jnp.concatenate(
            [jnp.full((LANES, LANES), counts_ref[t * sbt + i],
                      jnp.int32) for i in range(sbt)], axis=0)
        ve = jnp.where((pos >= 1) & (pos <= m), v, 0.0)
        S = _flat_cumsum_batched(ve, LANES)
        ends = _route3_batched(S, r2s1_ref[...], r2s2_ref[...],
                               r2s3_ref[...])
        prevs = _route3_batched(S, q2s1_ref[...], q2s2_ref[...],
                                q2s3_ref[...])
        vm = valid2_ref[...].astype(jnp.int32) > 0
        out_ref[...] = jnp.where(vm, ends - prevs, jnp.zeros_like(ends))

    return kernel


def _scan_kernel_roll(sr: Semiring, identity: float, sbt: int):
    """Generic-semiring scan v3: exact-rank perm + ONE segmented
    roll-scan keyed by rel (monotone after the perm; junk at position
    0 and the tail is flagged +16384 and masked to the identity), then
    the END route delivers each row's inclusive total to the rel
    window. No inverse assumed (ref: the functor_t generic reduction,
    merge_genl/agent_spmv_orig.cuh:98-124).

    All sbt tiles process BATCHED: one 3-stage route over the stacked
    (sbt*128, 128) block costs ~3.5x less per tile than sbt separate
    routes, and one segmented scan (segment ids offset per tile so the
    carry phase cannot link across tile boundaries) replaces sbt
    scans — the round-4 per-tile loop was the main reason generic
    rings ran 2.2x the plus_times envelope."""
    P = BIN_ROWS // LANES  # == LANES

    def kernel(counts_ref, prod_ref, pm1_ref, pm2_ref, pm3_ref,
               relid_ref, r2s1_ref, r2s2_ref, r2s3_ref, valid2_ref,
               out_ref):
        del counts_ref

        v = _route3_batched(prod_ref[...], pm1_ref[...], pm2_ref[...],
                            pm3_ref[...])
        relid = relid_ref[...].astype(jnp.int32)
        v = jnp.where(relid < 16384, v,
                      jnp.full(v.shape, identity, dtype=prod_ref.dtype))
        # per-tile rel ids offset by the tile's index in the block so
        # the cross-sublane carry never links two tiles
        seg = (relid & 16383) + (sublane_iota(v.shape) // LANES) * TILE
        scan = segmented_scan_tile(v, seg, sr.reduce, identity)
        y_full = _route3_batched(scan, r2s1_ref[...], r2s2_ref[...],
                                 r2s3_ref[...])
        vm = valid2_ref[...].astype(jnp.int32) > 0
        out_ref[...] = jnp.where(
            vm, y_full,
            jnp.full(y_full.shape, identity, dtype=y_full.dtype))

    return kernel


# ---------------------------------------------------------------------------
# Device dispatch
# ---------------------------------------------------------------------------

# `sr` is a static argument: Semiring is a frozen dataclass, so any
# user-defined semiring object (reused across calls) keys the jit cache
# and its callables are traced straight into the kernel — the TPU
# analog of the reference's functor_t template parameter
# (ref: merge_genl/agent_spmv_orig.cuh:98-124).
def _x_specs(x2d, sbt: int):
    """(x_vmem, in_specs, args) for the x table: one resident
    full-table block when it fits the VMEM budget, else sbt per-tile
    window blocks indexed by the prefetched xb."""
    x_vmem = x2d.shape[0] * LANES * x2d.dtype.itemsize <= X_VMEM_MAX_BYTES

    def xwin_map(j):
        return lambda t, xb, *_: (xb[t * sbt + j], 0)

    if x_vmem:
        specs = [pl.BlockSpec((x2d.shape[0], LANES),
                              lambda t, *_: (0, 0))]
        return True, specs, (x2d,)
    specs = [pl.BlockSpec((LANES, LANES), xwin_map(j))
             for j in range(sbt)]
    return False, specs, (x2d,) * sbt


@functools.partial(jax.jit, static_argnames=(
    "sr", "sbt", "n_tiles", "interpret"))
def _gather_pass(x2d, ax, q, xb, *, sr: Semiring, sbt, n_tiles, interpret):
    identity = float(sr.identity_for(ax.dtype))
    n_steps = n_tiles // sbt
    x_vmem, x_specs, x_args = _x_specs(x2d, sbt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=(
            [pl.BlockSpec((sbt * LANES, LANES), lambda t, xb: (t, 0))] * 2
            + x_specs
        ),
        out_specs=pl.BlockSpec((sbt * LANES, LANES), lambda t, xb: (t, 0)),
    )
    return pl.pallas_call(
        _gather_kernel(sbt, sr, identity, x_vmem),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * LANES, LANES), ax.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xb, ax, q, *x_args)


@functools.partial(jax.jit, static_argnames=(
    "sr", "F_pad", "interpret", "strategy", "sbt"))
def _scan_pass(prod_fin, relid, pm1, pm2, pm3,
               r2s1, r2s2, r2s3, q2s1, q2s2, q2s3,
               valid2, counts,
               *, sr: Semiring, F_pad, interpret,
               strategy: str = "auto", sbt: int = SBT_SCAN):
    """Scan over final tiles, `sbt` per grid step, writing each tile's
    y-candidate window to a FLAT (F_pad*P, 128) array (windows merge
    outside the kernel by ragged concat + fixups). A single-level grid
    lets the pipeline prefetch step t+1's blocks during compute."""
    identity = float(sr.identity_for(prod_fin.dtype))
    P = BIN_ROWS // LANES
    T = F_pad // sbt
    diff = (strategy == "auto" and sr.name == "plus_times"
            and prod_fin.dtype == jnp.float32)

    def tile_spec(rows):
        return pl.BlockSpec((rows * sbt, LANES), lambda t, *_: (t, 0))

    if diff:
        kernel = _scan_kernel_diff(sbt)
        in_specs = [tile_spec(LANES)] * 10 + [tile_spec(P)]
        args = (prod_fin, pm1, pm2, pm3, r2s1, r2s2, r2s3,
                q2s1, q2s2, q2s3, valid2)
    else:
        kernel = _scan_kernel_roll(sr, identity, sbt)
        in_specs = [tile_spec(LANES)] * 8 + [tile_spec(P)]
        args = (prod_fin, pm1, pm2, pm3, relid, r2s1, r2s2, r2s3,
                valid2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((sbt * P, LANES), lambda t, *_: (t, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F_pad * P, LANES),
                                       prod_fin.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(counts, *args)


@functools.partial(jax.jit, static_argnames=("sr", "n_fix"))
def _merge_gather(ycand, merge_src, *fix, sr: Semiring, n_fix: int):
    """Row-gather merge for plans whose ragged concat would shatter
    into per-tile slivers (short tiles: F comparable to the y block
    count — XLA runs ~10 us per tiny dynamic-slice piece, which
    measured 10x the whole pipeline at F=1280). One 128-lane row
    gather (~136 GB/s) + the same distinct-row fixups."""
    ident = sr.identity_for(ycand.dtype)
    ycp = jnp.concatenate(
        [ycand, jnp.full((1, LANES), ident, ycand.dtype)], axis=0)
    y2d = jnp.take(ycp, merge_src, axis=0)
    for d in range(n_fix):
        out_i, src_i = fix[2 * d], fix[2 * d + 1]
        upd = sr.reduce(jnp.take(y2d, out_i, axis=0),
                        jnp.take(ycp, src_i, axis=0))
        y2d = y2d.at[out_i].set(upd)
    return y2d.reshape(-1)


MERGE_PIECES_MAX = 256  # above this, _merge_gather wins


@functools.partial(jax.jit, static_argnames=("sr", "pieces", "n_fix"))
def _merge_pieces(ycand, *fix, sr: Semiring, pieces, n_fix: int):
    """Assemble y2d from per-tile y-candidate windows (v3).

    `pieces` is a static tuple of (kind, a, l): kind 0 copies l
    consecutive ycand rows starting at a (a maximal run of y blocks
    whose first contributor rows are consecutive — XLA emits plain
    streaming copies), kind 1 emits l identity rows (blocks no tile
    touches). The rare extra contributors (window overlap at tile
    boundaries / hub rows) arrive as per-depth (out_rows, src_rows)
    fixups applied with `sr.reduce` on distinct rows — the cross-tile
    fixup analog (ref: merge_based/agent_segment_fixup.cuh) at a cost
    proportional to the overlaps, not the matrix.
    """
    ident = sr.identity_for(ycand.dtype)
    parts = []
    for kind, a, l in pieces:
        if kind == 0:
            parts.append(jax.lax.dynamic_slice_in_dim(ycand, a, l))
        else:
            parts.append(jnp.full((l, LANES), ident, ycand.dtype))
    y2d = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    for d in range(n_fix):
        out_i, src_i = fix[2 * d], fix[2 * d + 1]
        upd = sr.reduce(jnp.take(y2d, out_i, axis=0),
                        jnp.take(ycand, src_i, axis=0))
        y2d = y2d.at[out_i].set(upd)
    return y2d.reshape(-1)


def plan_cache_key(policy: StreamPolicy) -> tuple:
    """In-memory plan-cache key: structural policy fields only."""
    return ("stream",) + tuple(sorted(policy.structural_fields().items()))


# Row-band execution past the shuffle planner's reach (VERDICT r3
# item 9): one plan's gather stream caps at 16384 tiles (~240M nnz);
# beyond that the round-3 behavior was a ~100x cliff onto the direct
# ELL/tiled fallback. Banding cuts the matrix into row-aligned slices
# of at most BAND_NNZ nonzeros, runs the full stream pipeline per band
# (each with its own cached plan), and concatenates y — row-aligned
# cuts need no cross-band fixup. Sequential bands cost one x-table
# prep each, so the per-band rate carries an O(bands * n_cols) tax the
# audit reports honestly.
BAND_NNZ = 180_000_000


def _cut_bands(A: CSR, band_nnz: int) -> list:
    """Row-aligned band CSRs of at most ~band_nnz nonzeros each."""
    Ap = np.asarray(A.Ap, dtype=np.int64)
    nnz = int(Ap[-1])
    n_bands = max(2, -(-nnz // band_nnz))
    targets = (np.arange(1, n_bands, dtype=np.int64) * nnz) // n_bands
    cuts = np.searchsorted(Ap, targets, side="left")
    bounds = np.concatenate([[0], cuts, [A.n_rows]]).astype(np.int64)
    bounds = np.maximum.accumulate(bounds)
    Aj = np.asarray(A.Aj)
    Ax = np.asarray(A.Ax)
    bands = []
    for b in range(n_bands):
        r0, r1 = int(bounds[b]), int(bounds[b + 1])
        if r1 <= r0:
            bands.append(None)
            continue
        k0, k1 = int(Ap[r0]), int(Ap[r1])
        bands.append(CSR(r1 - r0, A.n_cols,
                         (Ap[r0:r1 + 1] - k0),
                         Aj[k0:k1], Ax[k0:k1]))
    return bands


def _stream_spmv_banded(A: CSR, x, semiring: Semiring,
                        policy: StreamPolicy, band_nnz: int):
    # Band CSR objects are cached ON THE PARENT matrix: plan_cache is
    # keyed by CSR object identity, so rebuilding bands per call would
    # re-run the O(nnz) host planner for every band on every matvec
    # (ADVICE r4 medium). Cached bands reuse their plans across calls.
    bands = plan_cache(A, ("stream", "bands", band_nnz),
                       lambda: _cut_bands(A, band_nnz))
    ident = float(semiring.identity_for(np.asarray(A.Ax).dtype))
    ys = []
    for band in bands:
        if band is None:
            ys.append(jnp.zeros((0,), jnp.asarray(x).dtype) + ident)
            continue
        # band=False: a single hub row larger than the band budget is
        # row-aligned-unsplittable; run it through the planner anyway
        # (its own capacity error falls back to the tiled kind)
        ys.append(_stream_spmv(band, x, semiring, policy, band=False))
    return jnp.concatenate(ys)


def _stream_spmv(A: CSR, x, semiring: Semiring, policy: StreamPolicy,
                 band: bool = True):
    x = jnp.asarray(x)
    val_dtype = resolve_val_dtype(A, x)
    ident = float(semiring.identity_for(np.dtype(val_dtype)))
    if A.nnz == 0 or A.n_cols == 0:
        return jnp.full((A.n_rows,), ident, dtype=val_dtype)
    if band and A.nnz > BAND_NNZ:
        return _stream_spmv_banded(A, x, semiring, policy, BAND_NNZ)
    if semiring.name == "or_and" and np.dtype(val_dtype) == np.float32:
        # Boolean ring at plus_times speed (VERDICT r4 item 3): the
        # combine yields {0,1} products, and or over non-negative
        # counts is (sum > 0) — so the whole MXU prefix-difference
        # pipeline runs unchanged on a counting ring and one final
        # threshold recovers the boolean result. Exact while every
        # row's count < 2^24 (f32 integer range; a 16M-nnz single row
        # exceeds the planner's reach long before that).
        y_cnt = _stream_spmv(A, x, _OR_AND_COUNTING, policy, band=band)
        return jnp.where(y_cnt > 0, jnp.ones((), y_cnt.dtype),
                         jnp.zeros((), y_cnt.dtype))
    # Early reduction applies to EVERY semiring since round 4: the
    # plus_times/f32 kernel uses MXU prefix differences; any other
    # ring (or width) runs the segmented roll-scan variant over the
    # same plan (the run-start bits ship alongside the C route).

    # plan structure is independent of the scan strategy: key on the
    # structural fields only so roll/auto variants share one plan.
    # With a configured plan dir, misses fall through to the disk
    # cache before paying the O(nnz) host planner.
    def _build():
        pdir = config.plan_dir()
        if pdir:
            from spmv_tpu.utils.plancache import stream_plan_cached

            return stream_plan_cached(A, policy, pdir)
        return build_stream_plan(A, policy)

    if SBT_SCAN_MAX % policy.scan_sbt != 0:
        raise ValueError(
            f"scan_sbt must divide {SBT_SCAN_MAX}; got {policy.scan_sbt}")
    plan: StreamPlan = plan_cache(A, plan_cache_key(policy), _build)
    interp = config.use_interpret()

    # --- x table: per-window TRANSPOSED x blocks + hot-column
    # broadcast pages (value replicated down each sublane of its lane).
    # One pass over x buys native lane gathers in the kernel: with the
    # lane remap the pass is the planned per-window route (the route
    # includes the transpose); otherwise a plain XLA transpose.
    if "xr1" in plan.gather:
        xnat = jnp.pad(
            x.astype(val_dtype),
            (0, plan.gather["x_nat_rows"] * LANES - A.n_cols))
        x2d = _xprep_pass(
            xnat.reshape(-1, LANES), plan.gather["g0"],
            plan.gather["xr1"], plan.gather["xr2"], plan.gather["xr3"],
            n_w=plan.x_rows_pad // LANES, interpret=interp)
    else:
        xp = jnp.pad(x.astype(val_dtype),
                     (0, plan.x_rows_pad * LANES - A.n_cols))
        x2d = jnp.swapaxes(
            xp.reshape(-1, LANES, LANES), 1, 2).reshape(-1, LANES)
    n_aug = int(np.asarray(plan.hot_cols).shape[0])
    if n_aug:
        hot_x = jnp.take(x.astype(val_dtype), jnp.asarray(plan.hot_cols))
        aug = jnp.broadcast_to(
            hot_x.reshape(-1, 1, LANES),
            (n_aug // LANES, LANES, LANES)).reshape(-1, LANES)
        x2d = jnp.concatenate([x2d, aug], axis=0)

    p0 = plan.shuffle.passes[0]
    if plan.reduce is not None:
        rd = plan.reduce
        part = _reduce_pass(
            x2d, plan.gather["Ax"].astype(val_dtype), plan.gather["q"],
            plan.gather["xb"], rd["c1"], rd["c2"], rd["c3"],
            rd.get("rs"),
            sr=semiring, sbt=8, n_tiles=plan.n_gather_tiles,
            Qp=rd["Qp"], out_rows=rd["out_rows"], interpret=interp)
        prod_fin = apply_shuffle(part, plan.shuffle, plan.shuffle_dev)
    elif p0.sbt == 8 and p0.n_steps * 8 == plan.n_gather_tiles:
        # fused gather + split-1: products never round-trip HBM
        d0 = plan.shuffle_dev[0]
        prod_fin = _gather_split_pass(
            x2d, plan.gather["Ax"].astype(val_dtype), plan.gather["q"],
            plan.gather["xb"], d0["s1"], d0["s2"], d0["s3"],
            d0["starts"], d0["pos"], sr=semiring, sbt=8,
            n_tiles=plan.n_gather_tiles, K=p0.K, Q=p0.Q,
            rows_per_g=p0.out_rows // p0.K, interpret=interp
        ).reshape(p0.out_rows, LANES)
        from spmv_tpu.kernels.shuffle import _run_split

        for p, d in zip(plan.shuffle.passes[1:], plan.shuffle_dev[1:]):
            prod_fin = _run_split(
                prod_fin, d["s1"], d["s2"], d["s3"], d["starts"],
                d["pos"], n_steps=p.n_steps, sbt=p.sbt, K=p.K, Q=p.Q,
                rows_per_g=p.out_rows // p.K, interpret=interp,
            ).reshape(p.out_rows, LANES)
    else:
        prod = _gather_pass(
            x2d, plan.gather["Ax"].astype(val_dtype), plan.gather["q"],
            plan.gather["xb"], sr=semiring, sbt=8,
            n_tiles=plan.n_gather_tiles, interpret=interp)
        prod_fin = apply_shuffle(prod, plan.shuffle, plan.shuffle_dev)
    F_pad = plan.scan["relid"].shape[0] // LANES
    if prod_fin.shape[0] < F_pad * LANES:
        prod_fin = jnp.pad(
            prod_fin, ((0, F_pad * LANES - prod_fin.shape[0]), (0, 0)))

    ycand = _scan_pass(
        prod_fin, plan.scan["relid"],
        plan.scan["pm1"], plan.scan["pm2"], plan.scan["pm3"],
        plan.scan["r2s1"], plan.scan["r2s2"], plan.scan["r2s3"],
        plan.scan["q2s1"], plan.scan["q2s2"], plan.scan["q2s3"],
        plan.scan["valid2"], plan.scan["counts"],
        sr=semiring, F_pad=F_pad, interpret=interp,
        strategy=policy.scan_strategy, sbt=policy.scan_sbt)

    pieces = tuple(zip(
        (int(v) for v in np.asarray(plan.scan["m_kind"])),
        (int(v) for v in np.asarray(plan.scan["m_a"])),
        (int(v) for v in np.asarray(plan.scan["m_len"]))))
    n_fix = 0
    fx = []
    while f"fx{n_fix}_out" in plan.scan:
        fx += [plan.scan[f"fx{n_fix}_out"], plan.scan[f"fx{n_fix}_src"]]
        n_fix += 1
    if len(pieces) > MERGE_PIECES_MAX:
        y_flat = _merge_gather(ycand, plan.scan["merge_src"], *fx,
                               sr=semiring, n_fix=n_fix)
    else:
        y_flat = _merge_pieces(ycand, *fx, sr=semiring, pieces=pieces,
                               n_fix=n_fix)
    y = y_flat[: A.n_rows]
    # the oracle's acc = initialize() participates in EVERY row
    # (ref: cpu_navie.hpp:20-35): fold it in — it matters for rings
    # whose identity is not absorbing under reduce over the actual
    # data range (max_times with negative products, say)
    return semiring.reduce(y, jnp.full_like(y, ident))


def audit_plan(plan: StreamPlan, nnz: int, val_bytes: int = 4) -> dict:
    """Bytes-moved audit per pass (the roofline bookkeeping the design
    doc promises): every stream the pipeline reads or writes, reduced
    to bytes/nnz. 'total' divided by the measured streaming bandwidth
    is the bandwidth-bound time floor."""
    LB = LANES
    gt = plan.n_gather_tiles
    F_pad = plan.scan["relid"].shape[0] // LB
    p0 = plan.shuffle.passes[0]
    fused01 = p0.sbt == 8 and p0.n_steps * 8 == gt
    # x traffic: one 65 KB window per tile, or — when the whole table
    # fits the VMEM budget — the table itself, fetched once
    x_rows = plan.x_rows_pad + int(np.asarray(plan.hot_cols).shape[0])
    x_bytes = x_rows * LB * val_bytes
    if x_bytes > X_VMEM_MAX_BYTES:
        x_bytes = gt * TILE * val_bytes
    passes = {}
    if "xr1" in plan.gather:
        # lane-remap x prep: read natural x + 3 route streams, write
        # the remapped table (replaces the old XLA transpose pass,
        # which moved 2*table and was previously uncounted)
        passes["xprep"] = plan.x_rows_pad * LB * (2 * val_bytes + 3)
    if plan.reduce is not None:
        # reduce pass: Ax + q + x + 3 route stages (firstmask rides
        # c3's high bit), writing only Qp partial rows per tile
        passes["reduce"] = int(
            gt * TILE * (val_bytes + 1 + 3) + x_bytes
            + gt * plan.reduce["Qp"] * LANES * val_bytes)
    else:
        # gather: Ax (val) + q (1B) + x
        # (+ the product write only when NOT fused into split-1)
        passes["gather"] = gt * TILE * (val_bytes + 1) + x_bytes \
            + (0 if fused01 else gt * TILE * val_bytes)
    for i, p in enumerate(plan.shuffle.passes):
        rows = p.n_steps * p.sbt * LB
        rw = val_bytes if (i == 0 and fused01) else 2 * val_bytes
        passes[f"split{i}"] = (rows * LB * (rw + 3)
                               + p.starts.size * 4)
    # diff path v3: perm (3) + r2e/r2p (3+3) + valid2 (1)
    scan_aux = 3 + 3 + 3 + 1
    passes["scan"] = int(F_pad * TILE * (val_bytes + scan_aux)
                         + F_pad * BIN_ROWS * val_bytes)
    # ragged concat: one read + one write of the y rows, plus fixups
    n_fix_rows = sum(np.asarray(plan.scan[k]).shape[0]
                     for k in plan.scan if str(k).startswith("fx")) // 2
    passes["merge"] = int((2 * plan.n_y_blocks + 3 * n_fix_rows)
                          * LB * val_bytes)
    total = sum(passes.values())
    return {
        "per_pass_bytes": passes,
        "per_pass_bytes_per_nnz": {k: v / max(nnz, 1)
                                   for k, v in passes.items()},
        "total_bytes": total,
        "bytes_per_nnz": total / max(nnz, 1),
    }


DEFAULT_POLICY = StreamPolicy()


@register("stream", supports_semiring=True,
          reference_analog="merge_based/* rebuilt via plan-time routing "
                           "(see docs/DESIGN_stream.md)")
def _stream(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """Stream-SpMV: gather pass + planned shuffle + MXU scan. Tile
    policy comes from the tuning layer (per-chip tables / autotune
    override, ops/tuning.py — the per-arch policy selection analog,
    ref: dispatch_spmv_orig.cuh:266-427)."""
    from spmv_tpu.ops.tuning import policy_for

    width = np.dtype(np.asarray(A.Ax).dtype).itemsize
    return _stream_spmv(A, x, semiring, policy_for(width))
