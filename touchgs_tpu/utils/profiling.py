"""Profiling + per-kernel roofline accounting (SURVEY.md §5: the reference has
none; BASELINE.json requires "forward+backward kernel roofline per chip").

Two tools:

- ``trace(path)`` — context manager around `jax.profiler` for full XLA traces
  (view with TensorBoard / xprof).
- ``Roofline`` — analytic FLOP/byte models of the rasterization stages and a
  `measure()` helper that times a jitted fn and reports achieved vs. peak
  (peak numbers configurable per chip; defaults = TPU v5e).
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/touchgs_trace"):
    """jax.profiler trace context (TensorBoard-compatible)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str = "v5e"
    peak_flops_f32: float = 49e12      # MXU f32 (bf16 ≈ 197e12)
    peak_flops_bf16: float = 197e12
    peak_flops_vpu: float = 3.9e12     # vector unit f32 (8x128 lanes,
                                       # ~4 ALUs, ~0.94 GHz) — the DATASHEET
                                       # peak for elementwise work
    # measured sustainable VPU rate for the compositing op mix on THIS chip
    # (tools/exp_kernel_anatomy.py, round 4): the bare α quad-form — 16
    # ops/(entry,pixel), no prefix, no MXU, no exp2 sensitivity — runs 327.5M
    # entry-pixels in 3.15 ms ⇒ ~1.7 T op/s sustained.  The datasheet 3.9T
    # assumes an issue mix this kernel's dependent multiply-add chains don't
    # reach, so 'practical efficiency' is reported against this calibrated
    # rate; the datasheet-peak number stays alongside it.
    vpu_sustained: float = 1.7e12
    hbm_bw: float = 819e9              # bytes/s


V5E = ChipSpec()
V5P = ChipSpec(name="v5p", peak_flops_f32=114e12, peak_flops_bf16=459e12,
               peak_flops_vpu=7.9e12, vpu_sustained=3.4e12, hbm_bw=2765e9)


@dataclasses.dataclass
class StageCost:
    """Analytic cost of one pipeline stage."""

    name: str
    flops: float
    bytes_accessed: float
    unit: str = "mxu"   # which compute peak bounds this stage: mxu | vpu

    def arithmetic_intensity(self) -> float:
        return self.flops / max(self.bytes_accessed, 1.0)

    def roofline_time(self, chip: ChipSpec) -> float:
        """Min achievable seconds under the roofline model (datasheet peak)."""
        peak = (chip.peak_flops_vpu if self.unit == "vpu"
                else chip.peak_flops_f32)
        return max(self.flops / peak, self.bytes_accessed / chip.hbm_bw)

    def practical_time(self, chip: ChipSpec) -> float:
        """Min achievable seconds against the CALIBRATED sustained rate
        (ChipSpec.vpu_sustained, measured by tools/exp_kernel_anatomy.py)."""
        peak = (chip.vpu_sustained if self.unit == "vpu"
                else chip.peak_flops_f32)
        return max(self.flops / peak, self.bytes_accessed / chip.hbm_bw)


def composite_cost(scanned_pairs: float, tile_pixels: int, n_tiles: int,
                   name: str = "composite_fwd", flops_per_pair: int = 34,
                   attr_lanes: int = 16) -> StageCost:
    """Compositing kernel cost from the ACTUALLY SCANNED (entry, tile) pairs
    (chunks_done × k_chunk per tile, read back from the forward's stacked
    output) — not the k_tile capacity.  ``flops_per_pair`` is the per-(entry,
    pixel) VPU op estimate: ~34 forward (α chain 12, exp2 as 1, mask 4,
    prefix-product 14, weights 3), ~76 backward (forward recompute + prefix
    SUM + gradient chain + six cross-lane moment reductions).  HBM traffic =
    gathered attr rows + the stacked tile outputs."""
    return StageCost(
        name=name,
        flops=float(scanned_pairs) * tile_pixels * flops_per_pair,
        bytes_accessed=float(scanned_pairs) * attr_lanes * 4
        + n_tiles * tile_pixels * 8 * 4,
        unit="vpu",  # per-(entry, pixel) elementwise math — VPU-bound
    )


def binning_cost(num_gaussians: int, tiles_per_gaussian_cap: int) -> StageCost:
    """Key build + sort of the (gaussian, tile) pairs.

    The sort model is a bitonic MERGE-pass traffic estimate (what XLA's TPU
    `lax.sort` actually does): log2(M) merge passes, each streaming the
    (key, value) pair array through HBM once — not the single-pass radix
    fiction the r4 model used (which put the measured sort at a meaningless
    3% "efficiency").  Chained-dispatch measurement on v5e (r5,
    tools/exp_tail3 methodology): the 2^21 pair sort alone is ~1.7 ms, vs
    ~1.5 ms modeled here; the rest of the measured binning stage is key
    build + searchsorted + slot lists."""
    import math

    pairs = num_gaussians * tiles_per_gaussian_cap
    passes = max(math.ceil(math.log2(max(pairs, 2))), 1)
    return StageCost(
        name="binning",
        flops=float(pairs) * 10,
        bytes_accessed=float(pairs) * 8 * (2 + passes),
    )


def measure(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median-free simple timing: mean seconds per call after warmup."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def report(stages: list[StageCost], measured_s: dict[str, float],
           chip: ChipSpec = V5E) -> str:
    """Human-readable roofline table."""
    lines = [
        f"roofline report — chip {chip.name} "
        f"(peak {chip.peak_flops_f32/1e12:.0f} Tf32, "
        f"{chip.hbm_bw/1e9:.0f} GB/s; VPU datasheet "
        f"{chip.peak_flops_vpu/1e12:.1f}T / sustained "
        f"{chip.vpu_sustained/1e12:.1f}T calibrated)",
        f"{'stage':<12} {'GFLOP':>8} {'MB':>8} {'AI':>6} "
        f"{'roof_ms':>8} {'meas_ms':>8} {'eff':>6} {'prac':>6}",
    ]
    for s in stages:
        roof = s.roofline_time(chip)
        prac = s.practical_time(chip)
        meas = measured_s.get(s.name)
        eff = f"{roof / meas:6.1%}" if meas else "   n/a"
        peff = f"{prac / meas:6.1%}" if meas else "   n/a"
        meas_ms = f"{meas*1e3:8.2f}" if meas else "     n/a"
        lines.append(
            f"{s.name:<12} {s.flops/1e9:8.2f} {s.bytes_accessed/1e6:8.1f} "
            f"{s.arithmetic_intensity():6.1f} {roof*1e3:8.2f} {meas_ms} {eff} "
            f"{peff}"
        )
    return "\n".join(lines)
