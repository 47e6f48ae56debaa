"""Closed-form matmul-FLOP accounting for the fused train step → MFU.

Counts the MXU work one training batch performs (per SURVEY'd reference
semantics: per-position lazy GRU, diffusion towers, affinity head, commit
cell) and divides by measured throughput to give achieved FLOP/s vs the
v5e's peak — the denominator for the roofline paragraph in RESULTS.md.

    python scripts/mfu_estimate.py [events_per_s]

All counts are MACs×2; backward counts 2× per differentiated matmul (dX and
dW) plus 1× remat recompute as the upper band (XLA's remat re-runs parts of
the forward under the backward — measured in the r2 profile).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

V5E_BF16_PEAK = 197e12
V5E_F32_PEAK = 49e12


def batch_flops(b=200, m=2, k=20, d=100, d_t=100, d_e=172):
    s = m * 3 * b * k                   # selected positions
    h = d * (m + 1)                     # ensemble concat width
    msg_in = 2 * d + d_e + d_t          # compact message + re-attached self
    gru = msg_in * 3 * d + d * 3 * d    # input + hidden projections

    fwd_diff = {                        # differentiated matmuls
        "lazy cell (S positions)": s * gru,
        "lazy cell (3b queries)": 3 * b * gru,
        "nbr tower fc1": s * (d + d_e + d_t) * d,
        "nbr tower fc2": s * d * d,
        "src tower": 3 * b * 2 * d * d,
        "affinity fc1": 2 * b * 2 * h * (h // 2) * 0 + 2 * b * 2 * h * h,
        "affinity fc2": 2 * b * h,
    }
    # reference MergeLayer: fc1 is [2h -> h]
    fwd_diff["affinity fc1"] = 2 * b * (2 * h) * h
    fwd_nograd = {"commit cell (2b)": 2 * b * gru}

    macs_diff = sum(fwd_diff.values())
    macs_ng = sum(fwd_nograd.values())
    fwd = 2 * (macs_diff + macs_ng)
    bwd = 2 * 2 * macs_diff
    remat = 2 * macs_diff
    return fwd, bwd, remat, fwd_diff, fwd_nograd


def main():
    ev_s = float(sys.argv[1]) if len(sys.argv) > 1 else 104_000.0
    b = 200
    fwd, bwd, remat, fd, fn = batch_flops(b=b)
    for name, macs in {**fd, **fn}.items():
        print(f"  {name:28s} {2 * macs / 1e9:7.3f} GF/batch")
    lo, hi = fwd + bwd, fwd + bwd + remat
    print(f"\nper batch of {b} events: fwd {fwd / 1e9:.1f} GF, "
          f"bwd {bwd / 1e9:.1f} GF, remat ≤ {remat / 1e9:.1f} GF "
          f"→ {lo / 1e9:.1f}-{hi / 1e9:.1f} GF")
    per_ev = (lo / b, hi / b)
    print(f"per event: {per_ev[0] / 1e6:.0f}-{per_ev[1] / 1e6:.0f} MF")
    ach = (ev_s * per_ev[0], ev_s * per_ev[1])
    print(f"\nat {ev_s:.0f} ev/s: achieved {ach[0] / 1e12:.1f}-"
          f"{ach[1] / 1e12:.1f} TFLOP/s "
          f"= {100 * ach[0] / V5E_BF16_PEAK:.1f}-"
          f"{100 * ach[1] / V5E_BF16_PEAK:.1f}% of v5e bf16 peak "
          f"({100 * ach[0] / V5E_F32_PEAK:.1f}-"
          f"{100 * ach[1] / V5E_F32_PEAK:.1f}% of f32 peak)")


if __name__ == "__main__":
    main()
