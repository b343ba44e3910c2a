"""Reduced-budget regression guard for the recipe-scale proxy-vs-physics A/B.

tools/ab_proxy_vs_physics.py is the PNNP core-claim harness (reference
trainer_SID.py:449-472: Raw_Dataset physics synth vs Proxy_Dataset proxy
synth, identical recipes otherwise). The full-scale run (patch 512, batch 8,
4000 steps on TPU) is recorded in STATUS.md; this test pins the machinery at
a CPU-sized budget so wiring regressions (synth routed wrong, NaN proxy
samples, ratio/scale bugs, eval contract drift) fail loudly.

At this budget the nets sit in the smooth-prior regime (output nearly
input-independent), so the delta bar is a sanity band, not the scientific
~0.1 dB claim — that lives in the STATUS table from the recipe-scale run.
"""

import math

import pytest

from tools.ab_proxy_vs_physics import main as ab_main


@pytest.mark.slow
def test_ab_harness_reduced_budget():
    rows = ab_main([
        "--proxy-steps", "600", "--unet-steps", "150", "--patch", "64",
        "--batch", "2", "--chunk", "75", "--pool", "16",
        "--eval-frames", "4", "--nf", "8", "--d", "64", "--cpu",
    ])

    assert len(rows) == 8  # 4 ISOs x 2 ratios
    assert any(r["heldout_iso"] for r in rows)
    for r in rows:
        for k in ("input_psnr", "physics_psnr", "proxy_psnr", "delta"):
            assert math.isfinite(r[k]), r

    deltas = [r["delta"] for r in rows]
    mean_d = sum(deltas) / len(deltas)
    assert abs(mean_d) <= 0.3, rows
    assert min(deltas) >= -0.6, rows

    # Both arms must actually denoise (in the PSNR sense) at the noisy end
    # of the sweep — guards against the synth silently degenerating to an
    # identity/NaN path (calibration: +12 dB over input at ISO 12800 x300).
    noisy = [r for r in rows if r["ratio"] == 300 and r["iso"] >= 6400]
    assert noisy
    for r in noisy:
        assert r["physics_psnr"] >= r["input_psnr"] + 4.0, r
        assert r["proxy_psnr"] >= r["input_psnr"] + 4.0, r
