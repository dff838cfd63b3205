"""Batched multi-clip decode pipeline: the ML-dataloader front door.

Config-4 workload (BASELINE.md): decode N clips x K frames each to
model-ready RGB tensors in HBM, with the fused YUV->RGB (+resize)
epilogue on-device and the clip batch sharded across chips.

Stages:
  1. span planning per clip (slice_into_video_intervals)
  2. host entropy decode of every (clip, span) — thread pool; the C
     entropy decoder runs GIL-free under ctypes
  3. bucketed batched device decode (native clip batch; for multi-chip
     use parallel.sharding.decode_gop_batch_sharded — shard_map over a
     clips mesh, no collectives)
  4. frame selection + fused epilogue; output stays device-resident
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import os
from typing import Optional, Sequence

import numpy as np

from .backends.tpu import TpuSpanDecoder, _bucket
from .common import HwangError
from .intervals import slice_into_video_intervals
from .mp4_index import index_video
from .video_index import VideoIndex


def plan_chunk_sizes(n: int, max_b: int, n_dev: int = 1,
                     ramp: bool = True) -> list[int]:
    """Chunk-size plan for a bucket of `n` spans: returns slot counts
    per chunk (sum >= n; slots beyond n are padding, decoded and thrown
    away).  Sizes are powers of two rounded to mesh multiples so each
    size compiles once.

    With `ramp`, the first chunks are small — chunk 0's entropy decode
    and H2D upload are fully exposed (nothing earlier to overlap them),
    so the device should get working quickly — growing 4x toward the
    steady-state size.  Every size is drawn from a small LADDER
    {low, 4*low, 16*low, ..., bpad}: the tail splits into ladder sizes
    instead of rounding up (padding is real device work — the old
    round-up rule padded the bench's 44-span tail to 64, 24% of all
    device slots wasted on pad decode), and restricting to the ladder
    bounds the number of DISTINCT sizes — each distinct size is a
    separate executable, 30-150 s per remote compile on this host.
    """
    def rnd(x):
        return -(-x // n_dev) * n_dev

    n_chunks = -(-n // max_b)
    per = -(-n // n_chunks)
    bpad = rnd(1 << (per - 1).bit_length())
    if not (ramp and n > 4 and bpad > 4):
        return [bpad] * (-(-n // bpad))  # never emit an empty chunk
    low = rnd(4)
    ladder = []
    s = low
    while s < bpad:
        ladder.append(s)
        s *= 4
    ladder.append(bpad)
    sizes = []
    k, pos = 0, 0
    while pos < n:
        rem = n - pos
        sz = ladder[min(k, len(ladder) - 1)]
        if rem < sz:
            # largest ladder size <= rem (clamped up to the minimum
            # chunk; the final sub-minimum remainder pads)
            sz = max([t for t in ladder if t <= rem] or [low])
        sizes.append(sz)
        pos += min(sz, rem)
        k += 1
    return sizes


@dataclasses.dataclass
class _SpanJob:
    clip: int
    start: int                 # absolute first sample of span
    data: bytes
    offsets: np.ndarray
    sizes: np.ndarray
    valid: list[int]           # absolute requested frames in this span


class ClipBatchDecoder:
    """Decodes sparse frame sets from many same-geometry H.264 clips.

    All clips must share coded geometry (equal SPS dims) — the normal case
    for dataset pipelines.  Output: uint8 RGB [total_frames, H, W, 3] (or
    resized), device-resident jax arrays unless to_host=True.
    """

    def __init__(self, paths: Sequence[str], n_refs: int | None = None,
                 io_threads: int = 8, profiler=None, mesh=None):
        """`mesh`: optional 1-D jax.sharding.Mesh ("clips" axis) — batches
        are then packed per-device and decoded under shard_map (see
        parallel/sharding.py); decode output is identical to the
        single-device path.  mesh="auto" builds one over all local
        devices when more than one is visible."""
        import os

        from .utils.profiler import PROFILER

        if mesh == "auto":
            import jax

            from .parallel.sharding import clip_mesh

            devs = jax.devices()
            mesh = clip_mesh(devices=devs) if len(devs) > 1 else None
        self.mesh = mesh if (mesh is not None
                             and mesh.devices.size > 1) else None

        # more worker threads than cores is pure contention for the
        # GIL-free native passes (this host often has ONE core)
        io_threads = max(1, min(io_threads, os.cpu_count() or 1))

        self.profiler = profiler or PROFILER
        self.paths = list(paths)
        self.indexes: list[VideoIndex] = [index_video(p) for p in paths]
        ex0 = self.indexes[0].metadata_bytes
        self.span_decoder = TpuSpanDecoder(ex0, n_refs=n_refs)
        # clips may differ in encoder settings (PPS chroma-QP offset, ref
        # count, entropy mode) as long as coded geometry AND crop match —
        # each clip keeps its own parameters
        self.clip_cqo = [self.span_decoder.entropy.chroma_qp_offset]
        max_refs = self.span_decoder.n_refs
        for i, idx in enumerate(self.indexes[1:], 1):
            d = TpuSpanDecoder(idx.metadata_bytes, n_refs=n_refs)
            if (d.mb_width, d.mb_height, d.crop) != (
                self.span_decoder.mb_width, self.span_decoder.mb_height,
                self.span_decoder.crop,
            ):
                raise HwangError(
                    f"clip {i} geometry differs; batch clips of equal size"
                )
            self.clip_cqo.append(d.entropy.chroma_qp_offset)
            max_refs = max(max_refs, d.n_refs)
        self.n_refs = n_refs or max_refs
        self._pool = concurrent.futures.ThreadPoolExecutor(io_threads)
        # transfers are network/DMA-bound, not CPU-bound: a dedicated
        # pool so an in-flight upload never queues behind entropy work
        # (io_threads is clamped to core count, often 1 on this host)
        self._xfer_pool = concurrent.futures.ThreadPoolExecutor(2)
        self._host_decs: dict[int, object] = {}  # latency-route decoders

    # ------------------------------------------------------------------
    def _plan(self, rows_per_clip) -> list[_SpanJob]:
        jobs = []
        for c, (path, vi, rows) in enumerate(
            zip(self.paths, self.indexes, rows_per_clip)
        ):
            rows = sorted(set(int(r) for r in rows))
            intervals = slice_into_video_intervals(vi, rows)
            with open(path, "rb") as f:
                for (start, end), valid in intervals:
                    if vi.has_reorder is False:
                        # trim unused tail (only valid when decode order
                        # == display order, i.e. no B reordering)
                        end = min(end, max(valid) + 1)
                    off0 = int(vi.sample_offsets[start])
                    last = end - 1
                    off1 = int(vi.sample_offsets[last]) + int(
                        vi.sample_sizes[last]
                    )
                    f.seek(off0)
                    data = f.read(off1 - off0)
                    offs = (
                        vi.sample_offsets[start:end].astype(np.uint64)
                        - np.uint64(off0)
                    )
                    jobs.append(
                        _SpanJob(
                            clip=c, start=start, data=data, offsets=offs,
                            sizes=vi.sample_sizes[start:end].astype(np.uint64),
                            valid=list(valid),
                        )
                    )
        return jobs

    def decode(
        self,
        rows_per_clip: Sequence[Sequence[int]],
        out_size: Optional[tuple[int, int]] = None,  # (height, width)
        output: str = "rgb",
        to_host: bool = False,
    ):
        """Decode the requested frames of every clip.

        Returns (frames, index) where frames is [N, H, W, 3] uint8 (N =
        total requested frames across clips, clip-major order) and index
        is a list of (clip, frame_number) describing each row.
        """
        import jax
        import jax.numpy as jnp

        from .models.h264.packed import fuse_packed, pack_gop_batch
        from .models.h264.recon_batched import decode_gop_fused
        from .ops.yuv import resize_bilinear_rgb, yuv420_to_rgb
        prof = self.profiler
        with prof.span("plan_spans"):
            jobs = self._plan(rows_per_clip)

        # Latency route: seek-class requests (a few spans, <= a GOP or
        # two of decode work) are dominated by device dispatch/transfer
        # round trips, not decode throughput — serve them from the host
        # decoder with a bit-identical output contract (exact-integer
        # RGB + fixed-point resize, device-resident unless to_host).
        # Batch-scale requests always take the device pipeline.
        route_max = int(os.environ.get("HWANG_ROUTE_HOST_MAX", "96"))
        if (
            self.mesh is None
            and jobs
            and os.environ.get("HWANG_ROUTER", "auto") != "off"
            and sum(len(j.offsets) for j in jobs) <= route_max
        ):
            return self._decode_host(jobs, out_size, output, to_host)

        # The native entropy context is stateful (per-picture MB state,
        # DPB) — one context per worker thread.
        import threading

        from .models.h264.entropy import H264EntropyDecoder

        tls = threading.local()

        def host_decode(job: _SpanJob):
            # contexts are per-thread AND per-avcC: clips share geometry
            # but may carry different SPS/PPS (same parameter-set ids)
            decs = getattr(tls, "decs", None)
            if decs is None:
                decs = tls.decs = {}
            ex = self.indexes[job.clip].metadata_bytes
            dec = decs.get(ex)
            if dec is None:
                dec = decs[ex] = H264EntropyDecoder(ex)
                dec.set_ring_slots(self.n_refs)
            import time as _time

            # Entropy-level skip: frames that are neither referenced nor
            # requested decode no slice data (reference behavior analog:
            # the automata still FEEDS every packet but the backend's
            # output for unrequested frames is discarded — here the
            # discard moves before the expensive work).
            wanted = None
            if os.environ.get("HWANG_SKIP_NONREF", "1") == "1":
                wanted = np.zeros(len(job.offsets), np.uint8)
                for r in job.valid:
                    wanted[r - job.start] = 1
            t0 = _time.perf_counter()
            t = dec.decode_gop(job.data, job.offsets, job.sizes,
                               wanted_disp=wanted)
            prof.add_interval("entropy_decode", _time.perf_counter() - t0)
            return t

        # bucket spans by (padded frame count, chroma-QP offset) straight
        # from the PLAN — a span's frame count is its sample count, known
        # before entropy decode — so entropy can stream per chunk on the
        # pool thread(s) while the main thread packs/dispatches earlier
        # chunks and the device decodes them (the host entropy pass was
        # previously a fully serial prefix of every decode call)
        buckets: dict[tuple[int, int], list[int]] = {}
        for i, job in enumerate(jobs):
            key = (_bucket(len(job.offsets)), self.clip_cqo[job.clip])
            buckets.setdefault(key, []).append(i)

        mb_w = self.span_decoder.mb_width
        mb_h = self.span_decoder.mb_height
        left, top, right, bottom = self.span_decoder.crop
        W = mb_w * 16 - left - right
        H = mb_h * 16 - top - bottom

        # Chunk large batches: (a) bounds device memory (the unpacked
        # coefficient tensor is B*F*M*26*16 int16, kept under ~0.8 GB)
        # and (b) pipelines the host side — chunk i+1's pack and H2D
        # transfer overlap chunk i's device compute (dispatch is async),
        # measurably faster than one monolithic launch.  Chunks are
        # equal-sized powers of two (padded by repeating the last span)
        # so a straggler chunk doesn't trigger a recompile.
        M = mb_w * mb_h
        out_frames = []
        index = []
        chunked: list[tuple[int, int, list[int], int]] = []
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        ramp = os.environ.get("HWANG_CHUNK_RAMP", "1") == "1"
        for (fpad, cqo), idxs in buckets.items():
            # Per-bucket (frame window, batch) choice.  Hard limits:
            #  - physical HBM: per (clip, frame) coeff_all int16 [M*416]
            #    (~1.23x tiling pad) + side tensors + YUV ~= 1700 B/MB;
            #    per clip the (R+1)-slot paired-word reference ring
            #    ~= 49 kB/MB-col (HWANG_HBM_BUDGET, default 6.5 GB)
            #  - remote-compile size: the relay's compile helper is
            #    OOM-killed past ~1.1-2M MB-frames of M*fw*B working set
            #    (1080p F=64 B=4 dies; F=32 B=4 / F=8 B=16 compile)
            # Within those, PREFER small windows with a large clip batch:
            # the wavefront kernels' sequential in-kernel steps cost
            # near-fixed overhead per step, so total device time tracks
            # (decoded frames / B) x steps-per-frame — at 1080p F=8 B=16
            # runs the same frames in a quarter of the scan steps of
            # F=32 B=4 (measured: deblock+intra dominate 1080p decode).
            # The sharded path never windows, so it evaluates fpad only.
            fcap = int(os.environ.get("HWANG_FWIN_CAP_MBF", 300_000))
            ccap = int(os.environ.get("HWANG_COMPILE_CAP_MBF", 1_100_000))
            budget = float(os.environ.get("HWANG_HBM_BUDGET", 6.5e9))
            fw0 = fpad
            if self.mesh is None:
                while fw0 > 8 and M * fw0 > fcap:
                    fw0 //= 2

            def caps_for(fw):
                b = max(1, min(64, int(budget // (M * (fw * 1700
                                                       + 66000)))))
                b = 1 << (b.bit_length() - 1)
                while b > 1 and M * fw * b > ccap:
                    b //= 2
                return b

            n = len(idxs)
            cands = {fw0}
            if self.mesh is None:
                f = fw0
                while f > 8:
                    f //= 2
                    cands.add(f)

            def cost(fw):
                b = caps_for(fw)
                chunks = -(-n // b)
                windows = -(-fpad // fw)
                # scan steps dominate; tie-break: fewer windows (each
                # window is a pack + upload + dispatch).  >2 windows is
                # forbidden outright: it would compile the win_mid
                # executable variant — every distinct 1080p-class
                # executable costs 15-25 min of relay compile AND
                # minutes of worker-session load on every fresh bench
                # process, which round 4 measured as the bench-deadline
                # hazard.
                penalty = 1_000_000 if windows > 2 else 0
                return (chunks * windows * fw + penalty, windows, -b)

            fw = min(cands, key=cost)
            max_b = caps_for(fw)
            # sharded decode needs every chunk to divide the mesh
            pos = 0
            for sz in plan_chunk_sizes(len(idxs), max_b, n_dev, ramp):
                part = idxs[pos : pos + sz]
                chunked.append((fpad, cqo, part, sz - len(part), fw))
                pos += sz

        # entropy decode streams through the pool in chunk order with a
        # bounded lookahead: submitting every span up front lets the
        # worker run arbitrarily far ahead of pack, holding all spans'
        # SoA tensors live at once — at 1080p that working set (~200 MB
        # per span) turns into a kernel page-fault/zeroing storm that
        # slows the entropy thread itself 4-12x (timeline-measured: the
        # same spans decode in 1.6 s standalone vs 13 s in-pipeline).
        # Two chunks of lookahead keeps the pipe full and the arena
        # reusable.
        futures = {}
        _submitted: set[int] = set()
        _ahead = max(2, int(os.environ.get("HWANG_ENTROPY_AHEAD", "2")))

        def submit_through(ci):
            for _, _, aidx, _, _ in chunked[: ci + 1]:
                for i in aidx:
                    if i not in _submitted:
                        _submitted.add(i)
                        futures[i] = self._pool.submit(host_decode, jobs[i])

        submit_through(_ahead - 1)

        # H2D uploads also run on the pool: the relay transfer is
        # network-bound while pack is CPU-bound, so uploading chunk i
        # from a worker thread overlaps it with the main thread packing
        # chunk i+1 (this host often has ONE core — thread-level overlap
        # only helps when one side blocks off-CPU, which a relay
        # device_put does)
        def upload(buf):
            import time as _time

            t0 = _time.perf_counter()
            d = jax.device_put(buf)
            prof.add_interval("h2d_upload", _time.perf_counter() - t0)
            return d

        tensors: dict[int, object] = {}
        staged = []  # (fut_dev_buf, layout, cqo) awaiting dispatch
        results = []  # per-chunk (Ys, Us, Vs)
        # Streamed output fetch (HWANG_STREAM_OUT=1): fetch each chunk's
        # final frames as soon as its decode is dispatched, overlapping
        # D2H with the remaining chunks' device compute, instead of one
        # monolithic np.asarray after everything finishes.  Only
        # meaningful when the caller wants host output.
        stream_fetches = (
            [] if (to_host
                   and os.environ.get("HWANG_STREAM_OUT", "0") == "1")
            else None
        )

        def chunk_epilogue(chunk, res):
            """Fused selection for one chunk: one gather for all requested
            frames, then the RGB/resize (or YUV flatten) epilogue over the
            stack.  Returns (device frames, [(clip, row)] index)."""
            fpad, cqo, idxs, pad_b, _fw = chunk
            Ys, Us, Vs = res
            sel_b, sel_f, idxl = [], [], []
            for k, i in enumerate(idxs):
                # display -> decode mapping within the span (B reordering)
                perm = poc_perm[i]
                for row in jobs[i].valid:
                    sel_b.append(k)
                    sel_f.append(int(perm[row - jobs[i].start]))
                    idxl.append((jobs[i].clip, row))
            # one combined transfer (the relay charges fixed latency
            # per transfer, so two tiny uploads cost two round trips)
            with prof.span("epilogue_sel_upload"):
                sel = jnp.asarray(
                    np.stack([sel_b, sel_f]).astype(np.int32)
                )
            sb, sf = sel[0], sel[1]
            y = Ys[sb, sf, top : top + H, left : left + W]
            u = Us[sb, sf, top // 2 : (top + H + 1) // 2,
                   left // 2 : (left + W + 1) // 2]
            v = Vs[sb, sf, top // 2 : (top + H + 1) // 2,
                   left // 2 : (left + W + 1) // 2]
            if output == "rgb":
                frames = yuv420_to_rgb(y, u, v)
                if out_size is not None:
                    frames = jax.vmap(
                        lambda fr: resize_bilinear_rgb(fr, out_size[0],
                                                       out_size[1])
                    )(frames)
            else:
                N = y.shape[0]
                frames = jnp.concatenate(
                    [y.reshape(N, -1), u.reshape(N, -1),
                     v.reshape(N, -1)], axis=1
                )
            return frames, idxl

        def flush_staged(wait: bool):
            # dispatch staged chunks in order; without `wait`, stop at the
            # first still-uploading chunk instead of stalling pack
            from .models.h264.recon_batched import (
                decode_gop_fused_win_first,
                decode_gop_fused_win_last,
                decode_gop_fused_win_mid,
            )

            while staged and (wait or staged[0][0][0][0].done()):
                wins, c_cqo = staged.pop(0)
                parts = []
                carry = None
                for wi, (fut, layout) in enumerate(wins):
                    with prof.span("h2d_wait"):
                        dbuf = fut.result()
                    if os.environ.get("HWANG_DEBUG_CHUNKS"):
                        import sys

                        sh = next(s for (_, _, s, _) in layout if s)
                        print(f"[chunk] dispatch BxF={sh[:2]} "
                              f"win {wi + 1}/{len(wins)} buf={dbuf.size}",
                              file=sys.stderr, flush=True)
                    with prof.span("device_decode_dispatch"):
                        if len(wins) == 1:
                            part = decode_gop_fused(
                                dbuf, layout, mb_w, mb_h, c_cqo,
                                self.n_refs)
                        elif wi == 0:
                            part, carry = decode_gop_fused_win_first(
                                dbuf, layout, mb_w, mb_h, c_cqo,
                                self.n_refs)
                        elif wi < len(wins) - 1:
                            part, carry = decode_gop_fused_win_mid(
                                dbuf, layout, mb_w, mb_h, c_cqo,
                                self.n_refs, carry)
                        else:
                            part = decode_gop_fused_win_last(
                                dbuf, layout, mb_w, mb_h, c_cqo,
                                self.n_refs, carry)
                    parts.append(part)
                if len(parts) == 1:
                    results.append(parts[0])
                else:
                    results.append(tuple(
                        jnp.concatenate([p[i] for p in parts], axis=1)
                        for i in range(3)))
                if stream_fetches is not None:
                    # streamed output: dispatch this chunk's epilogue now
                    # (async) and queue its D2H on the transfer pool, so
                    # the fetch rides under the NEXT chunks' device compute
                    # instead of serializing after all of them
                    ci = len(results) - 1
                    frames, idxl = chunk_epilogue(chunked[ci], results[ci])
                    results[ci] = None  # free the device YUV planes
                    stream_fetches.append(
                        (self._xfer_pool.submit(np.asarray, frames), idxl))

        poc_perm: dict[int, np.ndarray] = {}
        for ci, (fpad, cqo, idxs, pad_b, fw) in enumerate(chunked):
            submit_through(ci + _ahead)
            with prof.span("entropy_wait"):
                for i in idxs:
                    if i not in tensors:
                        # poll rather than block: dispatch any staged
                        # chunk whose upload completed while entropy of
                        # this chunk still runs (a blocking result() left
                        # chunk 0 staged for seconds — timeline-measured)
                        while True:
                            flush_staged(wait=False)
                            try:
                                tensors[i] = futures[i].result(timeout=0.05)
                                del futures[i]
                                break
                            except concurrent.futures.TimeoutError:
                                continue
            prof.increment("spans_decoded", len(idxs))
            prof.increment(
                "frames_decoded", sum(tensors[i].n_frames for i in idxs)
            )
            span_tensors = (
                [tensors[i] for i in idxs] + [tensors[idxs[-1]]] * pad_b
            )
            for i in idxs:
                t = tensors.pop(i)
                poc_perm[i] = np.argsort(t.poc[: t.n_frames], kind="stable")
            if self.mesh is not None:
                from .parallel.sharding import (
                    decode_gop_packed_sharded,
                    pack_gop_batch_sharded,
                )

                with prof.span("pack"):
                    batch = pack_gop_batch_sharded(span_tensors, fpad,
                                                   n_dev)
                with prof.span("device_decode_dispatch"):
                    results.append(decode_gop_packed_sharded(
                        batch, self.mesh, mb_w, mb_h, cqo, self.n_refs
                    ))
            else:
                # frame-window the chunk per the bucket's (fw, B) choice
                # above — windows chain the reference ring across jit
                # calls
                with prof.span("pack"):
                    if fw >= fpad:
                        batch = pack_gop_batch(span_tensors, fpad,
                                               to_device=False)
                        buf, layout = fuse_packed(batch)
                        wins = [(self._xfer_pool.submit(upload, buf),
                                 layout)]
                    else:
                        from .models.h264.packed import (
                            pack_flags,
                            slice_tensors_frames,
                        )

                        flags = pack_flags(span_tensors)
                        wins = []
                        for w0 in range(0, fpad, fw):
                            wt = [slice_tensors_frames(t, w0, w0 + fw)
                                  for t in span_tensors]
                            batch = pack_gop_batch(wt, fw, force=flags,
                                                   to_device=False)
                            batch = batch._replace(
                                f_offset=np.array([w0], np.int32))
                            buf, layout = fuse_packed(batch)
                            wins.append(
                                (self._xfer_pool.submit(upload, buf),
                                 layout))
                staged.append((wins, cqo))
                flush_staged(wait=len(staged) > 2)
        flush_staged(wait=True)

        if stream_fetches is not None:
            # streamed mode: epilogues were dispatched and their D2H
            # fetches submitted per chunk as each decode was dispatched
            # (see flush_staged) — collect in chunk order
            outs, index = [], []
            for fut, idxl in stream_fetches:
                with prof.span("d2h_fetch"):
                    outs.append(fut.result())
                index.extend(idxl)
            stacked = np.concatenate(outs) if len(outs) > 1 else outs[0]
            return stacked, index

        with prof.span("epilogue"):
            for chunk, res in zip(chunked, results):
                frames, idxl = chunk_epilogue(chunk, res)
                out_frames.append(frames)
                index.extend(idxl)
            stacked = (jnp.concatenate(out_frames) if len(out_frames) > 1
                       else out_frames[0])
        if to_host:
            with prof.span("d2h_fetch"):
                stacked = np.asarray(stacked)
        return stacked, index

    def _decode_host(self, jobs, out_size, output, to_host):
        """Host (latency) route of :meth:`decode` — libavcodec decode +
        numpy epilogue mirrors, bit-identical to the device pipeline's
        output (tests/test_pipeline.py asserts equality).  libavcodec
        emits display order, so a span's requested display positions map
         1:1 to its emit order."""
        from .backends.interface import FrameInfo
        from .backends.software import SoftwareVideoDecoder
        from .ops.yuv import resize_bilinear_rgb_np, yuv420_to_rgb_np

        prof = self.profiler
        out_frames, index = [], []
        with prof.span("host_route"):
            for job in jobs:
                vi = self.indexes[job.clip]
                # kept-warm decoder per clip: seek-class requests arrive
                # one at a time, and codec open + context setup was a
                # measurable slice of p50 seek latency; spans start at
                # keyframes so a flush()ed decoder is equivalent to a
                # fresh one (the reference reused its decoder across
                # spans the same way, decoder_automata.cpp:192-226)
                dec = self._host_decs.get(job.clip)
                if dec is None:
                    dec = SoftwareVideoDecoder(output_format="yuv420")
                    dec.configure(
                        FrameInfo(vi.frame_width, vi.frame_height,
                                  vi.format),
                        vi.metadata_bytes,
                    )
                    self._host_decs[job.clip] = dec
                want = {r - job.start for r in job.valid}
                got: dict[int, np.ndarray] = {}
                emitted = 0

                def drain():
                    nonlocal emitted
                    while dec.decoded_frames_buffered() > 0:
                        if emitted in want:
                            got[emitted] = dec.get_frame()
                        else:
                            dec.discard_frame()
                        emitted += 1

                for i in range(len(job.offsets)):
                    o, s = int(job.offsets[i]), int(job.sizes[i])
                    dec.feed(job.data[o : o + s], i == 0)
                    drain()
                dec.flush()
                drain()
                prof.increment("spans_decoded", 1)
                prof.increment("frames_decoded", emitted)
                H, W = vi.frame_height, vi.frame_width
                cw, ch = (W + 1) // 2, (H + 1) // 2
                for r in job.valid:
                    buf = got[r - job.start]
                    if output == "rgb":
                        y = buf[: H * W].reshape(H, W)
                        u = buf[H * W : H * W + cw * ch].reshape(ch, cw)
                        v = buf[H * W + cw * ch :].reshape(ch, cw)
                        fr = yuv420_to_rgb_np(y, u, v)
                        if out_size is not None:
                            fr = resize_bilinear_rgb_np(
                                fr, out_size[0], out_size[1])
                        out_frames.append(fr)
                    else:
                        out_frames.append(buf)
                    index.append((job.clip, r))
        stacked = np.stack(out_frames)
        if not to_host:
            import jax.numpy as jnp

            stacked = jnp.asarray(stacked)
        return stacked, index

    def close(self):
        self._pool.shutdown(wait=False)
        self._xfer_pool.shutdown(wait=False)
        for d in self._host_decs.values():
            try:
                d.close()
            except Exception:
                pass
        self._host_decs.clear()
