"""Analytic roofline / speed-of-light accounting for the bench suite.

The reference's whole methodology is self-timed measurement
(/root/reference/main.cpp:60-74, GaussDePyramid-pThread.h:310-326); it
never models WHERE the time should go. This module is the TPU-grade
version SURVEY.md section 5 commits to: per-workload analytic cost models
(algorithmic flops, minimal HBM traffic, scalar-gather elements) against
one table of device peaks, so every bench record can carry

    sol_pct = 100 * floor_ms / measured_ms

and "is it fast?" becomes a number instead of an A/B vibe.

Conventions:

* Flops are ALGORITHMIC (e.g. a blur counts 2*(2r+1) flops per output
  pixel — the taps the math needs), not what our blocked-band
  implementation issues. %SOL therefore measures distance from the
  problem's floor, not from our own schedule.
* HBM bytes are the MINIMAL traffic of a perfectly fused schedule: each
  input read once from HBM, each live output written once. Intermediates
  a fused kernel could keep in VMEM count zero.
* The floor is max(compute, memory, gather) — perfect overlap, i.e. a
  true speed of light. A kernel at 100% is unimprovable without changing
  the algorithm.

Peaks for TPU v5e (one chip) from the public spec sheet; the f32 matmul
rate reflects precision=HIGHEST's 6-pass bf16 emulation. The scalar
gather rate is a MEASURED device characteristic (flat 19-offset candidate
gathers, round 3: ~0.054 ms / (512*19) elems ~ 5.5 ns/elem) — element
gathers have no spec-sheet peak.
"""

from __future__ import annotations

import dataclasses
import math

from sift_parallel_optimization_tpu.config import PyramidConfig, num_octaves


@dataclasses.dataclass(frozen=True)
class Peaks:
    name: str
    hbm_gbps: float            # HBM bandwidth, GB/s
    bf16_tflops: float         # MXU bf16 peak, TFLOP/s
    f32_matmul_tflops: float   # MXU f32 (HIGHEST = 6-pass bf16) peak
    vpu_f32_tflops: float      # vector unit f32 peak
    gather_ns_per_elem: float  # measured scalar-gather cost


TPU_V5E = Peaks(
    name="tpu_v5e",
    hbm_gbps=819.0,
    bf16_tflops=197.0,
    f32_matmul_tflops=197.0 / 6.0,
    vpu_f32_tflops=4.0,
    gather_ns_per_elem=5.5,
)


@dataclasses.dataclass(frozen=True)
class CostModel:
    """Analytic cost of one workload (see module conventions)."""

    hbm_bytes: float = 0.0
    mxu_f32_flops: float = 0.0   # matmul flops executed at HIGHEST
    mxu_bf16_flops: float = 0.0  # matmul flops executed at DEFAULT
    vpu_flops: float = 0.0       # elementwise/stencil flops
    gather_elems: float = 0.0
    note: str = ""

    def floor_ms(self, peaks: Peaks = TPU_V5E) -> float:
        t_mem = self.hbm_bytes / (peaks.hbm_gbps * 1e9)
        t_mxu = (
            self.mxu_f32_flops / (peaks.f32_matmul_tflops * 1e12)
            + self.mxu_bf16_flops / (peaks.bf16_tflops * 1e12)
        )
        t_vpu = self.vpu_flops / (peaks.vpu_f32_tflops * 1e12)
        t_gather = self.gather_elems * peaks.gather_ns_per_elem * 1e-9
        return 1e3 * max(t_mem, t_mxu, t_vpu, t_gather)

    def bound(self, peaks: Peaks = TPU_V5E) -> str:
        t_mem = self.hbm_bytes / (peaks.hbm_gbps * 1e9)
        t_mxu = (
            self.mxu_f32_flops / (peaks.f32_matmul_tflops * 1e12)
            + self.mxu_bf16_flops / (peaks.bf16_tflops * 1e12)
        )
        t_vpu = self.vpu_flops / (peaks.vpu_f32_tflops * 1e12)
        t_gather = self.gather_elems * peaks.gather_ns_per_elem * 1e-9
        best = max(
            ("hbm", t_mem), ("mxu", t_mxu), ("vpu", t_vpu),
            ("gather", t_gather),
            key=lambda kv: kv[1],
        )
        return best[0]

    def sol_pct(self, measured_ms: float, peaks: Peaks = TPU_V5E) -> float:
        if measured_ms <= 0:
            return 0.0
        return round(100.0 * self.floor_ms(peaks) / measured_ms, 1)

    def __add__(self, other: "CostModel") -> "CostModel":
        return CostModel(
            hbm_bytes=self.hbm_bytes + other.hbm_bytes,
            mxu_f32_flops=self.mxu_f32_flops + other.mxu_f32_flops,
            mxu_bf16_flops=self.mxu_bf16_flops + other.mxu_bf16_flops,
            vpu_flops=self.vpu_flops + other.vpu_flops,
            gather_elems=self.gather_elems + other.gather_elems,
            note=self.note,
        )


def _octave_sizes(length: int, n_octaves: int | None = None) -> list[int]:
    total = num_octaves(length)
    n = total if n_octaves is None else min(n_octaves, total)
    return [length // (2**o) for o in range(n)]


def _taps(sigma: float) -> int:
    return 2 * max(1, int(math.ceil(3.0 * sigma))) + 1


def reference_pyramid_model(size: int, S: int) -> CostModel:
    """REFERENCE-mode window+DoG (the headline): pure elementwise.

    Per octave: read the base once, write S+3 output planes; one
    multiply (+ one subtract, folded into the window bank) per output
    element. The strided subsamples re-read the shrinking bases
    (negligible vs the planes).
    """
    bytes_ = 0.0
    flops = 0.0
    for n in _octave_sizes(size):
        bytes_ += 4.0 * n * n * (1 + (S + 3))
        flops += 1.0 * (S + 3) * n * n
    return CostModel(
        hbm_bytes=bytes_, vpu_flops=flops,
        note=f"reference pyramid {size}^2 S={S}",
    )


def sift_pyramid_model(cfg: PyramidConfig) -> CostModel:
    """True Gaussian pyramid: separable blurs of every octave base.

    Algorithmic flops: 2 passes x 2*(2r+1) flops per pixel per scale
    (the taps); minimal bytes: read each octave base once, write the
    S+3 planes once. They are charged at the MXU f32 rate because a
    sub-MXU tap contraction cannot run anywhere faster.
    """
    from sift_parallel_optimization_tpu.core.pyramid_ref import (
        _octave_scale_sigmas,
    )

    rel = _octave_scale_sigmas(cfg)
    base_sigma = math.sqrt(
        max(cfg.sigma0**2 - cfg.assumed_blur**2, 1e-12)
    )
    bytes_ = 0.0
    flops = 0.0
    for o, n in enumerate(_octave_sizes(cfg.length, cfg.n_octaves)):
        per_px = sum(2 * 2 * _taps(s) for s in rel)
        if o == 0:
            per_px += 2 * 2 * _taps(base_sigma)
        flops += per_px * n * n
        bytes_ += 4.0 * n * n * (1 + (cfg.S + 3))
    return CostModel(
        hbm_bytes=bytes_, mxu_f32_flops=flops,
        note=f"sift pyramid {cfg.length}^2 S={cfg.S}",
    )


def dense_score_model(cfg: PyramidConfig) -> CostModel:
    """Detection dense stage: DoG + 26-neighbor extrema + quadratic-fit
    ranking score + block-reduce tables.

    Minimal bytes: read the S+3 Gaussian planes once per octave (DoG,
    stencils, and the block tables all fuse); the tables are ~V/64
    floats (negligible). Stencil flops: ~60/voxel (min/max pools,
    gradients, Hessian, adjugate solve) on the (S, N-2, N-2) interior.
    """
    bytes_ = 0.0
    flops = 0.0
    for n in _octave_sizes(cfg.length, cfg.n_octaves):
        bytes_ += 4.0 * n * n * (cfg.S + 3)
        flops += 60.0 * cfg.S * max(n - 2, 0) ** 2
    return CostModel(
        hbm_bytes=bytes_, vpu_flops=flops,
        note=f"dense score {cfg.length}^2",
    )


def refit_model(capacity: int, rounds: int = 2) -> CostModel:
    """Sparse candidate re-fit: 19-offset flat gathers per round."""
    return CostModel(
        gather_elems=float(capacity * 19 * rounds),
        note=f"sparse refit K={capacity} x{rounds}",
    )


def descriptor_model(cfg: PyramidConfig, capacity: int) -> CostModel:
    """Orientation + descriptor stage.

    Dominant: the per-keypoint patch DMA (PATCH_ROWS x PATCH_COLS, read
    + write) and the atlas build (read pyramid, write padded atlas).
    Resample/histogram einsums run at DEFAULT (bf16) precision.
    """
    import numpy as np

    from sift_parallel_optimization_tpu.models import descriptor as D

    item = float(np.dtype(D.ATLAS_DTYPE).itemsize)
    # Copy-like traffic (DMA patch gather, atlas pad) overlaps its reads
    # and writes — the measured gather sustains ~819 GB/s in EACH
    # direction — so copies are charged one-way (max of read, write).
    # Round-3 calibration: modeling the patch DMA as read+write put the
    # measured stage at "131% of SOL", i.e. the floor was wrong.
    rows = D.patch_rows_for(D.max_patch_radius(cfg.S, cfg.sigma0))
    patch_bytes = capacity * rows * D.PATCH_COLS * item
    atlas_rows = 0.0
    pyr_bytes = 0.0
    for n in _octave_sizes(cfg.length, cfg.n_octaves):
        atlas_rows += (cfg.S + 3) * (2 * D.ROW_PAD + n)
        pyr_bytes += 4.0 * n * n * (cfg.S + 3)
    atlas_bytes = atlas_rows * (D.COL_PAD + cfg.length + 128) * item
    atlas_bytes = max(atlas_bytes, pyr_bytes)
    pyr_bytes = 0.0  # read side of the atlas copy, already charged
    # Resample: two hat einsums per grid (ori 18, desc 26).
    resample = 0.0
    for g in (D.ORI_GRID, D.DESC_GRID):
        resample += 2 * g * rows * D.PATCH_COLS
        resample += 2 * g * g * D.PATCH_COLS
    hist = 2 * (D.DESC_GRID - 2) ** 2 * (16 + 16 * 8)  # trilinear votes
    return CostModel(
        hbm_bytes=patch_bytes + atlas_bytes + pyr_bytes,
        mxu_bf16_flops=capacity * (resample + hist),
        note=f"descriptors K={capacity}",
    )


def frontend_model(cfg: PyramidConfig, capacity: int) -> CostModel:
    """Full frontend floor: sum of the stage models (stages share no
    work, so floors add)."""
    m = (
        sift_pyramid_model(cfg)
        + dense_score_model(cfg)
        + refit_model(capacity)
        + descriptor_model(cfg, capacity)
    )
    return dataclasses.replace(
        m, note=f"frontend {cfg.length}^2 K={capacity}"
    )


def matching_model(k: int, dim: int = 128) -> CostModel:
    """Descriptor matching: one (K, D) x (D, K) similarity matmul plus
    ratio/mutual reductions."""
    return CostModel(
        hbm_bytes=2.0 * k * dim * 4 + 4.0 * k * k,
        mxu_bf16_flops=2.0 * k * k * dim,
        note=f"match {k}x{k}",
    )


def stage_models(
    cfg: PyramidConfig, capacity: int
) -> dict[str, CostModel]:
    """The frontend stage decomposition used by `cli bench -w stages`."""
    return {
        "pyramid": sift_pyramid_model(cfg),
        "dense_score": dense_score_model(cfg),
        "refit": refit_model(capacity),
        "descriptors": descriptor_model(cfg, capacity),
        "frontend": frontend_model(cfg, capacity),
    }


# ---------------------------------------------------------------------------
# ICI cost model: per-device interconnect bytes of each sharded op, so the
# >= 80% multi-chip scaling target is an AUDITABLE calculation the day real
# multi-chip hardware appears (real runs are impossible in this
# environment; the CPU-mesh sweep validates correctness, not bandwidth).
# ---------------------------------------------------------------------------

# Effective per-chip ICI bandwidth assumption for v5e (1600 Gbps aggregate
# per chip on the spec sheet; ~90 GB/s effective per collective direction
# after protocol overheads — the standard planning number, stated here so
# every projection is reproducible from the recorded bytes).
ICI_EFFECTIVE_GBPS = 90.0


def ring_all_reduce_bytes(array_bytes: float, n: int) -> float:
    """Per-device ICI bytes of a ring psum (reduce-scatter + all-gather)."""
    return 2.0 * array_bytes * (n - 1) / n if n > 1 else 0.0


def ring_reduce_scatter_bytes(array_bytes: float, n: int) -> float:
    return array_bytes * (n - 1) / n if n > 1 else 0.0


def ring_all_gather_bytes(array_bytes: float, n: int) -> float:
    return array_bytes * (n - 1) / n if n > 1 else 0.0


def sharded_pyramid_ici_bytes(cfg: PyramidConfig, n_spatial: int) -> float:
    """Per-device ICI bytes per frame of the row-sharded SIFT pyramid.

    One ppermute halo exchange per sharded blur-bank call (max blur
    radius covers every scale — parallel/scale_space.sharded_blur_bank):
    each device sends/receives r rows in each direction. Octaves stop
    sharding when the local height cannot hold the halo (the can_shard
    rule in sharded_sift_gaussian_pyramid).
    """
    from sift_parallel_optimization_tpu.core.pyramid_ref import (
        _band_radius,
        _octave_scale_sigmas,
    )

    if n_spatial <= 1:
        return 0.0
    rel = _octave_scale_sigmas(cfg)
    base_sigma = math.sqrt(
        max(cfg.sigma0**2 - cfg.assumed_blur**2, 1e-12)
    )
    max_r = max(_band_radius(s) for s in [base_sigma, *rel])
    total = 0.0
    first = True
    for n in _octave_sizes(cfg.length, cfg.n_octaves):
        if n % (2 * n_spatial) or n // n_spatial < max(2 * max_r, 8):
            break  # tail octaves run unsharded
        if first:  # base blur exchange at octave-0 size
            total += 2 * 2 * _band_radius(base_sigma) * n * 4.0
            first = False
        total += 2 * 2 * max_r * n * 4.0  # send+recv, up+down
    return total


def dp_frontend_ici_bytes() -> float:
    """Batch-sharded frontend: zero collectives inside the step (pure
    data parallelism; outputs stay sharded)."""
    return 0.0


def ba_cg_ici_bytes(
    n_cams: int, n_pts: int, n_dev: int,
    gn_iters: int = 10, cg_iters: int = 25,
) -> float:
    """Per-device ICI bytes of the observation-sharded implicit-Schur CG
    BA (parallel/ba.distributed_ba_step_cg), per bundle_adjust call.

    Per GN step: one psum of (C,6,6)+(C,6), one psum_scatter of
    (P,3,3)+(P,3); per CG matvec: one psum_scatter + one all_gather of
    (P,3) and one psum of (C,6).
    """
    c_blocks = (n_cams * 36 + n_cams * 6) * 4.0
    p_blocks = (n_pts * 9 + n_pts * 3) * 4.0
    per_gn = (
        ring_all_reduce_bytes(c_blocks, n_dev)
        + ring_reduce_scatter_bytes(p_blocks, n_dev)
    )
    per_matvec = (
        ring_reduce_scatter_bytes(n_pts * 3 * 4.0, n_dev)
        + ring_all_gather_bytes(n_pts * 3 * 4.0, n_dev)
        + ring_all_reduce_bytes(n_cams * 6 * 4.0, n_dev)
    )
    return gn_iters * (per_gn + cg_iters * per_matvec)


def tracking_step_cost(
    window: int = 6,
    pts_per_frame: int = 128,
    desc_capacity: int = 256,
    ba_iters: int = 4,
    n_hyp: int = 128,
) -> CostModel:
    """Analytic cost of one odometry TRACKING step (the per-frame device
    work of run_odometry once the window is full: shift eviction +
    PnP/triangulation registration + amortized window BA).

    Every term is the ALGORITHM's requirement, not the schedule's:

    * shift — one read+write of the window map (cams, points,
      descriptors, observations).
    * register — the (2B, 128) x (P, 128) descriptor matmul, n_hyp
      minimal DLT solves + their hypothesis scoring over P points, the
      5-iteration best-pose refinement, and B two-view triangulations.
    * window BA x ba_iters — residuals/Jacobians over M = 3*B*W
      observations, the (C, P) Schur reduction, and the 6C x 6C solve.

    The resulting floor is tens of MICROseconds against a measured cost
    of ~10 ms (round-4 profile: register 7.7 ms of 10.4, of which
    128 vmapped 12x12 SVDs were 4.4) — the step is structurally
    LATENCY/small-op-bound, not resource-bound, which is exactly what
    this record is meant to expose (VERDICT round 3: the tracking rate
    had no floor, so nobody knew 3x was on the table).
    """
    W, B = window, pts_per_frame
    C, P = W, W * B
    M = 3 * P
    # shift: map read+write (pt_desc dominates).
    map_bytes = (
        C * (3 + 3) * 4 + C
        + P * 3 * 4 + P + P * 128 * 4
        + M * (4 + 4 + 8 + 1)
    )
    hbm = 2.0 * map_bytes
    # register: descriptor match on the MXU (bf16-grade)
    mxu_bf16 = 2.0 * (2 * B) * P * 128
    hbm += (2 * B + P) * 128 * 4
    # PnP: hypothesis solves (12x12 normal build + LU solves + polar +
    # 3-iter 6-point refine ~ 3e4 flops each), scoring n_hyp x P
    # projections (~30 flops), best refine 5 x P (~60 flops/pt/iter),
    # B triangulations (~600 flops each).
    vpu = n_hyp * 3.0e4 + n_hyp * P * 30.0 + 5 * P * 60.0 + B * 600.0
    # window BA: per iter, residual+Jacobian (~570 flops/obs on the VPU),
    # block outer products M x (36+9+18) MACs, Schur (6C)^2 x 3P matmul,
    # and the obs stream from HBM.
    vpu += ba_iters * M * 570.0
    mxu_f32 = ba_iters * (
        2.0 * M * (36 + 9 + 18)
        + 2.0 * (6 * C) * (6 * C) * (3 * P)
        + 2.0 * (6 * C) ** 3 / 3.0
    )
    hbm += ba_iters * M * (4 + 4 + 8 + 1)
    return CostModel(
        hbm_bytes=hbm, mxu_f32_flops=mxu_f32, mxu_bf16_flops=mxu_bf16,
        vpu_flops=vpu,
        note="tracking step: shift + register + amortized window BA",
    )


def loop_stage_cost(
    desc_capacity: int = 256,
    archive_slots: int = 8192,
    n_hyp: int = 128,
) -> CostModel:
    """Analytic cost of the per-frame LOOP stage of loop-closed odometry
    (models/odometry.make_steady_step: archive write + archive-PnP
    propose + device-side accept). Add to :func:`tracking_step_cost`'s
    model for the complete product path.

    * archive write — one descriptor block (B, 128) + positions to HBM;
    * propose — the (K, 128) x (A, 128) similarity matmul (bf16-grade
      MXU) + its HBM stream, the top-2/mutual lane reductions (VPU, one
      pass over the K x A matrix), n_hyp DLT hypotheses + scoring over
      K points (same algebra as registration's PnP);
    * accept — O(cap) elementwise, negligible.
    """
    K, A = desc_capacity, archive_slots
    hbm = (K + A) * 128.0 * 4 + A * 3 * 4        # desc + positions reads
    hbm += 128 * (128 + 3 + 4 + 1) * 4.0          # evicted block write
    mxu_bf16 = 2.0 * K * A * 128
    vpu = 3.0 * K * A                             # top-2 + mutual passes
    vpu += n_hyp * 3.0e4 + n_hyp * K * 30.0       # DLT + scoring
    return CostModel(
        hbm_bytes=hbm, mxu_f32_flops=0.0, mxu_bf16_flops=mxu_bf16,
        vpu_flops=vpu,
        note="loop stage: archive write + archive-PnP propose + accept",
    )


def ring_matching_ici_bytes(
    n_frames: int, kp_per_frame: int, n_dev: int,
    desc_dtype_bytes: int = 4,
) -> float:
    """Per-device ICI bytes of one ring pairwise-matching sweep
    (parallel/matching.ring_pairwise_match_counts).

    Each device forwards its traveling descriptor block + valid mask to
    its ring neighbor on every one of the n_dev ring steps (the final
    hop returns each block home; the useful hops are n_dev - 1 — same
    per-link bytes as a ring all-gather of the descriptor set). Compute
    per step is (F/D)^2 * K^2 * 128 MACs, so the schedule goes compute
    -bound as K grows: at F=64, K=512, D=8 the sweep moves ~33 MB/device
    against ~17 GFLOP/device of MXU work.
    """
    f_loc = -(-n_frames // n_dev)
    block = f_loc * kp_per_frame * (128.0 * desc_dtype_bytes + 1.0)
    return n_dev * block


def projected_efficiency(
    single_chip_ms: float, n: int, ici_bytes_per_dev: float,
    peaks: Peaks = TPU_V5E,
) -> float:
    """Projected strong-scaling efficiency at n chips: perfect compute
    split + the analytic ICI time (no overlap assumed — pessimistic)."""
    if n <= 1:
        return 1.0
    t_comp = single_chip_ms / n
    t_ici = 1e3 * ici_bytes_per_dev / (ICI_EFFECTIVE_GBPS * 1e9)
    return round(single_chip_ms / (n * (t_comp + t_ici)), 3)


# Per-collective launch latency charged by the overlap model (us). A
# neighbor ppermute's software+ICI-hop latency is ~1 us on v5e; the
# model bills it per EXCHANGE (up+down fly concurrently).
ICI_EXCHANGE_LATENCY_US = 1.0


def projected_efficiency_overlap(
    single_chip_ms: float,
    n: int,
    ici_bytes_per_dev: float,
    dep_fraction: float,
    n_exchanges: int = 1,
    peaks: Peaks = TPU_V5E,
) -> float:
    """Strong-scaling projection WITH communication/compute overlap.

    Round 5: the sharded stencil issues its halo ppermutes FIRST and
    runs the halo-independent bulk — a (1 - dep_fraction) share of the
    per-device compute — while they fly
    (parallel/scale_space.sharded_blur_bank; the structural analogue of
    the reference's row streaming during compute,
    /root/reference/mpitest.cpp:47-64). Only ICI time not hidden under
    that bulk is exposed:

        t_step = max(t_indep, t_ici) + t_dep,
        t_ici  = bytes / BW + n_exchanges * latency.

    ``dep_fraction`` is the halo-DEPENDENT compute share (the boundary
    rows; ~2r/h for a radius-r band over h local rows).
    """
    if n <= 1:
        return 1.0
    t_comp = single_chip_ms / n
    t_ici = (
        1e3 * ici_bytes_per_dev / (ICI_EFFECTIVE_GBPS * 1e9)
        + n_exchanges * ICI_EXCHANGE_LATENCY_US * 1e-3
    )
    t_dep = t_comp * dep_fraction
    t_indep = t_comp - t_dep
    return round(t_comp / (max(t_indep, t_ici) + t_dep), 3)


def sharded_pyramid_overlap_model(
    cfg: PyramidConfig, n_spatial: int
) -> tuple[float, int]:
    """(dep_fraction, n_exchanges) of the row-sharded SIFT pyramid.

    dep_fraction is flops-weighted over the sharded octaves: each
    blur-bank call's halo-dependent share is the boundary band matmuls
    plus the 2r halo rows' column pass, ~2r/(h + 2r) of the call.
    """
    from sift_parallel_optimization_tpu.core.pyramid_ref import (
        _band_radius,
        _octave_scale_sigmas,
    )

    if n_spatial <= 1:
        return 0.0, 0
    rel = _octave_scale_sigmas(cfg)
    base_sigma = math.sqrt(
        max(cfg.sigma0**2 - cfg.assumed_blur**2, 1e-12)
    )
    max_r = max(_band_radius(s) for s in [base_sigma, *rel])
    flops_dep = 0.0
    flops_tot = 0.0
    n_ex = 0
    first = True
    for size in _octave_sizes(cfg.length, cfg.n_octaves):
        sharded = not (
            size % (2 * n_spatial)
            or size // n_spatial < max(2 * max_r, 8)
        )
        h = size // n_spatial if sharded else size
        calls = []
        if first:
            calls.append(_band_radius(base_sigma))
            first = False
        calls.append(max_r)
        for r in calls:
            # col pass (h+2r rows x size) + row pass (h x (h+2r) band).
            f = (h + 2 * r) * size + h * (2 * r + 1) * size
            flops_tot += f
            if sharded:
                n_ex += 1
                flops_dep += f * (2.0 * r) / (h + 2 * r)
        if not sharded:
            # Remaining tail octaves all run unsharded; their flops
            # still count toward the total (they dilute dep_fraction).
            continue
    return (
        (flops_dep / flops_tot) if flops_tot else 0.0,
        n_ex,
    )
