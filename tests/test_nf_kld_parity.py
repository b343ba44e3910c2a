"""NoiseFlow convergence + KLD parity regression (VERDICT r3 #3).

The full production arch string trained on physics-engine noise residuals
must drive sampled-vs-real KLD toward the reference's 0.1 bar, with the
min-KLD checkpoint at the end (the NF trainer's best==min-KLD contract).
Full-budget table (10k steps: every trained ISO <= 0.0131, 10x under the
bar) lives in tools/validate_nf.py / STATUS.md; this is the reduced-budget
guard (4k steps, patch 16, ~90 s CPU, deterministic keys).

Known property pinned here: the held-out ISO does NOT interpolate (KLD ~1.5)
because NoiseFlow's ISO conditioning is per-ISO learned tables (reference
gain.py:65-110 / signal_dependant.py:37-51) — unseen ladder entries stay at
init. That is the measured contrast motivating pw_iso_2stage's smooth ISO2K
conditioning (which interpolates the same ISO at KLD 0.0118).
"""

import pytest

pytestmark = pytest.mark.slow


def test_nf_kld_parity_reduced_budget():
    from tools.validate_nf import main

    rows = main(["--cpu", "--steps", "4000", "--patch", "16",
                 "--batch", "4", "--eval-frames", "8"])
    by_iso = {r["iso"]: r for r in rows}
    assert set(by_iso) == {800, 1600, 3200, 12800, 6400}
    # measured at this budget: 0.0367 / 0.0258 / 0.0679 / 0.5549 (12800 is
    # the hardest law and still descending; the 10k run reaches 0.0131)
    bars = {800: 0.08, 1600: 0.06, 3200: 0.14, 12800: 0.9}
    for iso, bar in bars.items():
        assert by_iso[iso]["kld"] <= bar, (iso, by_iso[iso])
    # the held-out ISO's non-interpolation is a pinned property, not a bug:
    # if this ever drops under the bar, the flow layers stopped being
    # reference-faithful per-ISO tables — investigate before "fixing"
    assert by_iso[6400]["heldout"] and by_iso[6400]["kld"] > 0.3
