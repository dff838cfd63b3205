"""Host-side preparation of HEVC TU streams for the JAX recon scan.

Turns HevcGopTensors (decode-order TU entries from the native entropy
decoder) into per-plane SoA arrays consumed by recon_jax.decode_planes.
The decode-order-dependent parts of intra prediction — reference
availability and the 8.4.4.2.2 substitution chain — are resolved HERE,
on the host, into a per-TU index permutation `subst`: on device,
obtaining the canonical reference vector is then a single
take_along_axis, with no data-dependent control flow left in the
compiled program.

Per-component independence: luma TUs only reference the luma plane and
chroma TUs their own chroma plane, so the three planes decode as
independent scans (chroma planes batch together as extra "frames").

Scope gate: TU sizes 4/8/16 (see tables.py).  Larger TUs raise
UnsupportedStream, which the TPU backend turns into SOFTWARE fallback.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import tables

MARGIN_TL = 1    # left/top plane margin (refs at x0-1 / y0-1)
MARGIN_BR = 32   # right/bottom margin (top refs reach x0 + 2*16 - 1)

# raw window layout on device (length 66):
#   0..31  plane[y0 + i, x0-1]      (left column)
#   32     plane[y0-1, x0-1]        (corner)
#   33..64 plane[y0-1, x0 + i]      (top row)
#   65     the constant 128         (nothing-available fallback)
RAW_CONST = 65


class UnsupportedStream(ValueError):
    pass


@dataclasses.dataclass
class PlanePrep:
    """SoA TU arrays for one plane scan; all leading dims [T, F]."""

    h: int              # unpadded plane height
    w: int
    n_steps: int        # T
    n_seq: int          # F (luma: frames; chroma: 2*frames)
    x0: np.ndarray      # [T, F] int32 PADDED plane coords
    y0: np.ndarray
    subst: np.ndarray   # [T, F, 65] int32 into the raw window
    widx: np.ndarray    # [T, F] int32 into tables.w_table()
    si: np.ndarray      # [T, F] int32 size index (0=4,1=8,2=16)
    filt: np.ndarray    # [T, F] int32 use-filtered-refs flag
    mi: np.ndarray      # [T, F] int32 transform index (tables.m_index)
    qmul: np.ndarray    # [T, F] int32 dequant multiplier (16*levScale)
    qsh: np.ndarray     # [T, F] int32 net dequant shift, SIGNED:
    #   d = (c*qmul + rnd) >> qsh  (qsh >= 0, rnd = 1<<(qsh-1) or 0)
    #   d = (c*qmul) << -qsh       (qsh < 0)
    # This is the 8.6.3 (coeff*scale + 1<<(bd-1)) >> bd with the qp//6
    # power pulled out of `scale`, keeping every intermediate in int32
    # (the naive form needs int64 at high qp).
    dcadd: np.ndarray   # [T, F] int32 (n)
    dcshift: np.ndarray  # [T, F] int32 (log2 + 1)
    mask: np.ndarray    # [T, F] int32 slot validity
    coeff: np.ndarray   # [T, F, 256] int16, n x n raster at stride 16


def _natural_raw(kind: str, i: int) -> int:
    if kind == "L":
        return i
    if kind == "C":
        return 32
    return 33 + i  # "T"


def _subst_for_tu(done, w4, h, w, x0, y0, n):
    """Canonical-slot -> raw-window index vector [65] (8.4.4.2.2)."""
    idx = np.full(tables.N_REF, RAW_CONST, np.int32)

    def avail(x, y):
        if x < 0 or y < 0 or x >= w or y >= h:
            return False
        return bool(done[(y >> 2) * w4 + (x >> 2)])

    # spec search order: left[2n-1] .. left[0], corner, top[0..2n-1]
    order = [("L", i, x0 - 1, y0 + i) for i in range(2 * n - 1, -1, -1)]
    order.append(("C", 0, x0 - 1, y0 - 1))
    order += [("T", i, x0 + i, y0 - 1) for i in range(2 * n)]

    ok = [avail(x, y) for (_, _, x, y) in order]
    raw = [_natural_raw(k, i) for (k, i, _, _) in order]
    res = np.full(len(order), RAW_CONST, np.int32)
    if any(ok):
        first = ok.index(True)
        res[0] = raw[0] if ok[0] else raw[first]
        for j in range(1, len(order)):
            res[j] = raw[j] if ok[j] else res[j - 1]
    for j, (k, i, _, _) in enumerate(order):
        if k == "L":
            idx[i] = res[j]
        elif k == "C":
            idx[32] = res[j]
        else:
            idx[33 + i] = res[j]
    return idx


def _filter_flag(mode: int, n: int, luma: bool) -> bool:
    if not luma or mode == 1 or n == 4:
        return False
    thres = {8: 7, 16: 1, 32: 0}[n]
    return min(abs(mode - 26), abs(mode - 10)) > thres


# ---------------------------------------------------------------------------
# Level-batched prep (v2).  Instead of one TU per frame per scan step,
# TUs are grouped into DEPENDENCY LEVELS: level(TU) = 1 + max level of
# any already-decoded TU whose pixels intersect this TU's reference
# border (left column incl. below-left extension, corner, top row incl.
# top-right extension).  TUs within a level are mutually independent, so
# a scan step processes a whole level — step count drops from O(TUs) to
# O(levels), and the intra weight table streams once per LEVEL instead
# of once per TU.  Two size classes per step: "small" (4/8/16, the
# existing 16x16-window machinery) and "big" (32x32, luma only — its own
# window/table so the hot small class doesn't pay 32-sized shapes).
# ---------------------------------------------------------------------------

MARGIN_TL4 = 4    # v2 margins: 4-aligned so plane rows of 4px stay aligned
MARGIN_BR4 = 68   # top refs reach x0 + 2*32 - 1

RAW32_CONST = 129  # big-class raw window: 64 left, corner(64), 64 top, const


@dataclasses.dataclass
class PlanePrepLv:
    """Level-batched SoA TU arrays for one plane scan."""

    h: int
    w: int
    n_levels: int       # T (padded)
    n_seq: int          # F
    # small class [T, F, S]:
    x0: np.ndarray
    y0: np.ndarray
    subst: np.ndarray   # [T, F, S, 65]
    widx: np.ndarray
    si: np.ndarray
    filt: np.ndarray
    mi: np.ndarray
    qmul: np.ndarray
    qsh: np.ndarray
    dcadd: np.ndarray
    dcshift: np.ndarray
    mask: np.ndarray
    coeff: np.ndarray   # [T, F, S, 256] int16
    # big class [T, F, B] (B == 0 when the stream has no 32x32 TUs):
    x0b: np.ndarray
    y0b: np.ndarray
    substb: np.ndarray  # [T, F, B, 129]
    modeb: np.ndarray
    filtb: np.ndarray   # 0 = none, 1 = 3-tap, 2 = strong-select on device
    qmulb: np.ndarray
    qshb: np.ndarray
    maskb: np.ndarray
    coeffb: np.ndarray  # [T, F, B, 1024] int16


def _subst_for_tu32(done, w4, h, w, x0, y0):
    """Canonical-slot -> raw-window index vector [129] for a 32x32 TU."""
    n = 32
    idx = np.full(129, RAW32_CONST, np.int32)

    def avail(x, y):
        if x < 0 or y < 0 or x >= w or y >= h:
            return False
        return bool(done[(y >> 2) * w4 + (x >> 2)])

    order = [("L", i, x0 - 1, y0 + i) for i in range(2 * n - 1, -1, -1)]
    order.append(("C", 0, x0 - 1, y0 - 1))
    order += [("T", i, x0 + i, y0 - 1) for i in range(2 * n)]
    ok = [avail(x, y) for (_, _, x, y) in order]

    def nat(k, i):
        return i if k == "L" else (64 if k == "C" else 65 + i)

    raw = [nat(k, i) for (k, i, _, _) in order]
    res = np.full(len(order), RAW32_CONST, np.int32)
    if any(ok):
        first = ok.index(True)
        res[0] = raw[0] if ok[0] else raw[first]
        for j in range(1, len(order)):
            res[j] = raw[j] if ok[j] else res[j - 1]
    for j, (k, i, _, _) in enumerate(order):
        if k == "L":
            idx[i] = res[j]
        elif k == "C":
            idx[64] = res[j]
        else:
            idx[65 + i] = res[j]
    return idx


def _tu_level(lvl4, w4, h4, x0, y0, n):
    """Dependency level of a TU: 1 + max level over its reference-border
    4x4 cells (left column + below-left, corner, top row + top-right)."""
    m = 0
    cx = x0 >> 2
    cy = y0 >> 2
    if cx > 0:
        col = lvl4[max(cy - 1, 0):min((y0 + 2 * n - 1) >> 2, h4 - 1) + 1,
                   cx - 1]
        if col.size:
            m = int(col.max())
    if cy > 0:
        row = lvl4[cy - 1,
                   max(cx - 1, 0):min((x0 + 2 * n - 1) >> 2, w4 - 1) + 1]
        if row.size:
            m = max(m, int(row.max()))
    return m + 1


def _round_up(v, m):
    return -(-v // m) * m


def prep_plane_sequences_lv(t, strong: bool, skip_inter: bool = False):
    """Level-batched (luma, chroma) PlanePrepLv for all frames.

    skip_inter: inter TUs (mode 255) are excluded from the slot arrays
    (their prediction+residual is applied by the inter pre-pass) but
    still mark decode-order availability and hold dependency level 0,
    so intra TUs read them correctly.
    """
    seqs_l = [[] for _ in range(t.n_frames)]
    seqs_c = [[] for _ in range(2 * t.n_frames)]
    for f in range(t.n_frames):
        lo = int(t.tu_off[f])
        for i in range(lo, lo + int(t.n_tu[f])):
            c = int(t.tu_cidx[i])
            (seqs_l[f] if c == 0 else seqs_c[2 * f + c - 1]).append(i)
    W, H = t.width, t.height
    luma = _prep_sequences_lv(t, seqs_l, H, W, True, strong, skip_inter)
    chroma = _prep_sequences_lv(t, seqs_c, H // 2, W // 2, False, strong,
                                skip_inter)
    return luma, chroma


def _prep_sequences_lv(t, seqs, h, w, is_luma, strong,
                       skip_inter=False) -> PlanePrepLv:
    F = len(seqs)
    w4 = (w + 3) >> 2
    h4 = (h + 3) >> 2

    # pass 1: levels and per-level class counts
    per_seq = []  # [(levels, classes)] aligned with seqs
    max_lv = 0
    max_s = 0
    max_b = 0
    for seq in seqs:
        lvl4 = np.zeros((h4, w4), np.int32)
        levels = []
        s_cnt = {}
        b_cnt = {}
        for i in seq:
            n = 1 << int(t.tu_log2[i])
            x0, y0 = int(t.tu_x[i]), int(t.tu_y[i])
            if skip_inter and int(t.tu_mode[i]) == 255:
                levels.append(0)  # inter: level 0, not a slot
                continue
            lv = _tu_level(lvl4, w4, h4, x0, y0, n)
            ny = min(n, h - y0)
            nx = min(n, w - x0)
            lvl4[y0 >> 2:(y0 + ny + 3) >> 2, x0 >> 2:(x0 + nx + 3) >> 2] = lv
            levels.append(lv)
            d = b_cnt if n == 32 else s_cnt
            d[lv] = d.get(lv, 0) + 1
        per_seq.append(levels)
        if levels:
            max_lv = max(max_lv, max(levels))
        if s_cnt:
            max_s = max(max_s, max(s_cnt.values()))
        if b_cnt:
            max_b = max(max_b, max(b_cnt.values()))

    T = _round_up(max(max_lv, 1), 8)
    S = _round_up(max(max_s, 1), 8)
    B = _round_up(max_b, 2)  # 0 when the stream has no 32x32 TUs

    p = PlanePrepLv(
        h=h, w=w, n_levels=T, n_seq=F,
        x0=np.full((T, F, S), MARGIN_TL4, np.int32),
        y0=np.full((T, F, S), MARGIN_TL4, np.int32),
        subst=np.full((T, F, S, tables.N_REF), RAW_CONST, np.int32),
        widx=np.zeros((T, F, S), np.int32),
        si=np.zeros((T, F, S), np.int32),
        filt=np.zeros((T, F, S), np.int32),
        mi=np.zeros((T, F, S), np.int32),
        qmul=np.zeros((T, F, S), np.int32),
        qsh=np.zeros((T, F, S), np.int32),
        dcadd=np.zeros((T, F, S), np.int32),
        dcshift=np.full((T, F, S), 1, np.int32),
        mask=np.zeros((T, F, S), np.int32),
        coeff=np.zeros((T, F, S, 256), np.int16),
        x0b=np.full((T, F, B), MARGIN_TL4, np.int32),
        y0b=np.full((T, F, B), MARGIN_TL4, np.int32),
        substb=np.full((T, F, B, tables.N_REF32), RAW32_CONST, np.int32),
        modeb=np.zeros((T, F, B), np.int32),
        filtb=np.zeros((T, F, B), np.int32),
        qmulb=np.zeros((T, F, B), np.int32),
        qshb=np.zeros((T, F, B), np.int32),
        maskb=np.zeros((T, F, B), np.int32),
        coeffb=np.zeros((T, F, B, 1024), np.int16),
    )

    # pass 2: fill slots (decode order; `done` is identical to the
    # level-ordered state for every reference-border query — a border
    # cell of a level-L TU is written only by TUs of levels < L)
    for f, seq in enumerate(seqs):
        done = np.zeros(h4 * w4, np.uint8)
        slot_s = {}
        slot_b = {}
        for k, i in enumerate(seq):
            lg = int(t.tu_log2[i])
            n = 1 << lg
            x0, y0 = int(t.tu_x[i]), int(t.tu_y[i])
            mode = int(t.tu_mode[i])
            cidx = int(t.tu_cidx[i])
            qp = int(t.tu_qp[i])
            if skip_inter and mode == 255:
                ny = min(n, h - y0)
                nx = min(n, w - x0)
                done.reshape(h4, w4)[
                    y0 >> 2:(y0 + ny + 3) >> 2, x0 >> 2:(x0 + nx + 3) >> 2
                ] = 1
                continue
            lv = per_seq[f][k] - 1
            if n == 32:
                s = slot_b.get(lv, 0)
                slot_b[lv] = s + 1
                p.x0b[lv, f, s] = x0 + MARGIN_TL4
                p.y0b[lv, f, s] = y0 + MARGIN_TL4
                p.substb[lv, f, s] = _subst_for_tu32(done, w4, h, w, x0, y0)
                p.modeb[lv, f, s] = mode
                if _filter_flag(mode, n, is_luma):
                    p.filtb[lv, f, s] = 2 if strong else 1
                p.qmulb[lv, f, s] = 16 * int(tables.LEVEL_SCALE[qp % 6])
                p.qshb[lv, f, s] = (lg + 3) - (qp // 6)
                p.maskb[lv, f, s] = 1
                if t.tu_cbf[i]:
                    off = int(t.tu_coef_off[i])
                    p.coeffb[lv, f, s] = t.coeff[off:off + 1024]
            else:
                s = slot_s.get(lv, 0)
                slot_s[lv] = s + 1
                p.x0[lv, f, s] = x0 + MARGIN_TL4
                p.y0[lv, f, s] = y0 + MARGIN_TL4
                p.subst[lv, f, s] = _subst_for_tu(done, w4, h, w, x0, y0, n)
                p.widx[lv, f, s] = tables.widx(mode, n, is_luma)
                p.si[lv, f, s] = tables.SIZES.index(n)
                p.filt[lv, f, s] = int(_filter_flag(mode, n, is_luma))
                p.mi[lv, f, s] = tables.m_index(n, cidx)
                p.qmul[lv, f, s] = 16 * int(tables.LEVEL_SCALE[qp % 6])
                p.qsh[lv, f, s] = (lg + 3) - (qp // 6)
                p.dcadd[lv, f, s] = n
                p.dcshift[lv, f, s] = lg + 1
                p.mask[lv, f, s] = 1
                if t.tu_cbf[i]:
                    off = int(t.tu_coef_off[i])
                    co = t.coeff[off:off + n * n].reshape(n, n)
                    p.coeff[lv, f, s].reshape(16, 16)[:n, :n] = co
            ny = min(n, h - y0)
            nx = min(n, w - x0)
            done.reshape(h4, w4)[
                y0 >> 2:(y0 + ny + 3) >> 2, x0 >> 2:(x0 + nx + 3) >> 2
            ] = 1
    return p


# ---------------------------------------------------------------------------
# Inter-GOP prep: everything the frame-sequential device decode needs
# beyond the intra level arrays — per-4x4-block motion maps, batched
# inter-residual classes, and the reference-ring schedule.
# ---------------------------------------------------------------------------

MC_MARGIN = 8  # edge-replicated pad on ring planes (8-tap reach is 4)


@dataclasses.dataclass
class GopInterPrep:
    F: int
    H: int
    W: int
    R: int                   # reference ring slots (+1 write-off slot)
    luma: PlanePrepLv        # intra TUs only (skip_inter)
    chroma: PlanePrepLv
    # inter residual classes: list of dicts with keys
    #   n, mi, x0 [F,N], y0 [F,N], qmul [F,N], qsh [F,N],
    #   coeff [F,N,n*n] int16, mask [F,N]  (chroma adds comp [F,N])
    res_l: list
    res_c: list
    # per-4x4 motion maps [F, h4, w4]
    pf: np.ndarray           # uint8: bit0 L0, bit1 L1 (0 = intra/none)
    slot0: np.ndarray        # int32 ring slot
    slot1: np.ndarray
    mv: np.ndarray           # [F, h4, w4, 4] int16: mv0x mv0y mv1x mv1y
    wp0: np.ndarray          # int32 row into wp (list*16+ref), 255 = none
    wp1: np.ndarray
    wp: np.ndarray           # [F, 32, 8] int16
    write_slot: np.ndarray   # [F] int32 (R = discard)
    any_inter: bool


def _res_classes(t, entries, h, w, sizes, chroma):
    """Batched residual classes from inter TU entries (cbf=1 only)."""
    out = []
    F = t.n_frames
    for n in sizes:
        per_f = [[] for _ in range(F)]
        for (f, i) in entries:
            if (1 << int(t.tu_log2[i])) == n:
                per_f[f].append(i)
        N = max((len(v) for v in per_f), default=0)
        if N == 0:
            continue
        N = _round_up(N, 2)
        cls = {
            "n": n,
            "mi": (tables.m_index(n, 1) if n != 32 else -1),  # DCT always
            "x0": np.zeros((F, N), np.int32),
            "y0": np.zeros((F, N), np.int32),
            "qmul": np.zeros((F, N), np.int32),
            "qsh": np.zeros((F, N), np.int32),
            "coeff": np.zeros((F, N, n * n), np.int16),
            "mask": np.zeros((F, N), np.int32),
        }
        if chroma:
            cls["comp"] = np.zeros((F, N), np.int32)
        for f in range(F):
            for s, i in enumerate(per_f[f]):
                lg = int(t.tu_log2[i])
                qp = int(t.tu_qp[i])
                cls["x0"][f, s] = int(t.tu_x[i])
                cls["y0"][f, s] = int(t.tu_y[i])
                cls["qmul"][f, s] = 16 * int(tables.LEVEL_SCALE[qp % 6])
                cls["qsh"][f, s] = (lg + 3) - (qp // 6)
                off = int(t.tu_coef_off[i])
                cls["coeff"][f, s] = t.coeff[off:off + n * n]
                cls["mask"][f, s] = 1
                if chroma:
                    cls["comp"][f, s] = int(t.tu_cidx[i]) - 1
        out.append(cls)
    return out


def prep_gop_inter(t, strong: bool) -> GopInterPrep:
    F = t.n_frames
    H, W = t.height, t.width
    h4, w4 = (H + 3) >> 2, (W + 3) >> 2
    luma, chroma = prep_plane_sequences_lv(t, strong, skip_inter=True)

    # inter residual entries (cbf == 1, mode == 255)
    ent_l, ent_c = [], []
    for f in range(F):
        lo = int(t.tu_off[f])
        for i in range(lo, lo + int(t.n_tu[f])):
            if int(t.tu_mode[i]) != 255 or not t.tu_cbf[i]:
                continue
            (ent_l if int(t.tu_cidx[i]) == 0 else ent_c).append((f, i))
    res_l = _res_classes(t, ent_l, H, W, (4, 8, 16, 32), False)
    res_c = _res_classes(t, ent_c, H // 2, W // 2, (4, 8, 16), True)

    # per-4x4 motion maps
    pf = np.zeros((F, h4, w4), np.uint8)
    slot0 = np.zeros((F, h4, w4), np.int32)
    slot1 = np.zeros((F, h4, w4), np.int32)
    mv = np.zeros((F, h4, w4, 4), np.int16)
    wp0 = np.full((F, h4, w4), 255, np.int32)
    wp1 = np.full((F, h4, w4), 255, np.int32)

    # ring schedule: a frame is live from its decode until its last use
    last_use = {}
    for f in range(F):
        lo = int(t.pu_off[f])
        for i in range(lo, lo + int(t.n_pu[f])):
            fl = int(t.pu_flags[i])
            if fl & 1:
                last_use[int(t.pu_ref0[i])] = f
            if fl & 2:
                last_use[int(t.pu_ref1[i])] = f
    slot_of = {}
    free = []
    next_slot = 0
    write_slot = np.zeros(F, np.int32)
    for f in range(F):
        for r, lu in list(last_use.items()):
            if lu < f and r in slot_of:
                free.append(slot_of.pop(r))
        if f in last_use:
            if free:
                s = free.pop()
            else:
                s = next_slot
                next_slot += 1
            slot_of[f] = s
            write_slot[f] = s
        else:
            write_slot[f] = -1  # resolved to the write-off slot below
        lo = int(t.pu_off[f])
        for i in range(lo, lo + int(t.n_pu[f])):
            x4a = int(t.pu_x[i]) >> 2
            y4a = int(t.pu_y[i]) >> 2
            x4b = x4a + (int(t.pu_w[i]) >> 2)
            y4b = y4a + (int(t.pu_h[i]) >> 2)
            fl = int(t.pu_flags[i])
            pf[f, y4a:y4b, x4a:x4b] = fl
            if fl & 1:
                slot0[f, y4a:y4b, x4a:x4b] = slot_of[int(t.pu_ref0[i])]
                mv[f, y4a:y4b, x4a:x4b, 0] = t.pu_mv[i, 0]
                mv[f, y4a:y4b, x4a:x4b, 1] = t.pu_mv[i, 1]
                wp0[f, y4a:y4b, x4a:x4b] = int(t.pu_wp0[i])
            if fl & 2:
                slot1[f, y4a:y4b, x4a:x4b] = slot_of[int(t.pu_ref1[i])]
                mv[f, y4a:y4b, x4a:x4b, 2] = t.pu_mv[i, 2]
                mv[f, y4a:y4b, x4a:x4b, 3] = t.pu_mv[i, 3]
                wp1[f, y4a:y4b, x4a:x4b] = int(t.pu_wp1[i])
    R = max(next_slot, 1)
    write_slot[write_slot < 0] = R  # write-off slot

    return GopInterPrep(
        F=F, H=H, W=W, R=R, luma=luma, chroma=chroma,
        res_l=res_l, res_c=res_c,
        pf=pf, slot0=slot0, slot1=slot1, mv=mv, wp0=wp0, wp1=wp1,
        wp=np.asarray(t.wp_rows, np.int16),
        write_slot=write_slot,
        any_inter=bool(pf.any()),
    )


def prep_plane_sequences(t, round_steps: int = 32):
    """Returns (luma: PlanePrep, chroma: PlanePrep) for all frames of a
    HevcGopTensors.  Chroma packs Cb and Cr of every frame as separate
    scan sequences (sequence index = frame*2 + (cidx-1))."""
    seqs_l = [[] for _ in range(t.n_frames)]
    seqs_c = [[] for _ in range(2 * t.n_frames)]
    for f in range(t.n_frames):
        lo = int(t.tu_off[f])
        for i in range(lo, lo + int(t.n_tu[f])):
            c = int(t.tu_cidx[i])
            (seqs_l[f] if c == 0 else seqs_c[2 * f + c - 1]).append(i)

    W, H = t.width, t.height
    luma = _prep_sequences(t, seqs_l, H, W, True, round_steps)
    chroma = _prep_sequences(t, seqs_c, H // 2, W // 2, False, round_steps)
    return luma, chroma


def _prep_sequences(t, seqs, h, w, is_luma, round_steps) -> PlanePrep:
    F = len(seqs)
    T = max((len(s) for s in seqs), default=0)
    T = max(round_steps, -(-T // round_steps) * round_steps)
    w4 = (w + 3) >> 2
    h4 = (h + 3) >> 2

    p = PlanePrep(
        h=h, w=w, n_steps=T, n_seq=F,
        x0=np.full((T, F), MARGIN_TL, np.int32),
        y0=np.full((T, F), MARGIN_TL, np.int32),
        subst=np.full((T, F, tables.N_REF), RAW_CONST, np.int32),
        widx=np.zeros((T, F), np.int32),
        si=np.zeros((T, F), np.int32),
        filt=np.zeros((T, F), np.int32),
        mi=np.zeros((T, F), np.int32),
        qmul=np.zeros((T, F), np.int32),
        qsh=np.zeros((T, F), np.int32),
        dcadd=np.zeros((T, F), np.int32),
        dcshift=np.full((T, F), 1, np.int32),
        mask=np.zeros((T, F), np.int32),
        coeff=np.zeros((T, F, 256), np.int16),
    )

    for f, seq in enumerate(seqs):
        done = np.zeros(h4 * w4, np.uint8)
        for step, i in enumerate(seq):
            lg = int(t.tu_log2[i])
            n = 1 << lg
            if n not in tables.SIZES:
                raise UnsupportedStream(
                    f"TU size {n} outside the supported 4/8/16 set"
                )
            x0, y0 = int(t.tu_x[i]), int(t.tu_y[i])
            mode = int(t.tu_mode[i])
            cidx = int(t.tu_cidx[i])
            p.x0[step, f] = x0 + MARGIN_TL
            p.y0[step, f] = y0 + MARGIN_TL
            p.subst[step, f] = _subst_for_tu(done, w4, h, w, x0, y0, n)
            p.widx[step, f] = tables.widx(mode, n, is_luma)
            p.si[step, f] = tables.SIZES.index(n)
            p.filt[step, f] = int(_filter_flag(mode, n, is_luma))
            p.mi[step, f] = tables.m_index(n, cidx)
            qp = int(t.tu_qp[i])
            p.qmul[step, f] = 16 * int(tables.LEVEL_SCALE[qp % 6])
            p.qsh[step, f] = (lg + 3) - (qp // 6)
            p.dcadd[step, f] = n
            p.dcshift[step, f] = lg + 1
            p.mask[step, f] = 1
            if t.tu_cbf[i]:
                off = int(t.tu_coef_off[i])
                co = t.coeff[off:off + n * n].reshape(n, n)
                p.coeff[step, f].reshape(16, 16)[:n, :n] = co
            ny = min(n, h - y0)
            nx = min(n, w - x0)
            done.reshape(h4, w4)[
                y0 >> 2 : (y0 + ny + 3) >> 2, x0 >> 2 : (x0 + nx + 3) >> 2
            ] = 1
    return p
