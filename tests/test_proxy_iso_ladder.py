"""Proxy acceptance across the ISO ladder (VERDICT r2 #3).

One pw_iso_2stage proxy trained jointly over 4 ISOs of physics-engine dark
frames must reproduce each ISO's noise distribution (sampled-vs-real
symmetric KLD <= ~0.1, the reference's noise-model bar) AND interpolate to a
held-out ISO — the '+iso' conditioning is the namesake feature
(runfiles/SonyA7S2/PNNP.yml:47-59). Fully deterministic (fixed PRNG keys on
the CPU backend), so the asserted bars are tight.

The full table lives in tools/validate_proxy.py / STATUS.md; this is the
regression guard at a reduced budget.
"""

import pytest

pytestmark = pytest.mark.slow


def test_proxy_iso_ladder_acceptance():
    from tools.validate_proxy import main

    # 4000 steps: where the deconvolved row loss (see models/proxy.py _loss
    # docstring) is converged enough for tight bars — measured 4k-step
    # values: kld <= 0.020 / row_kld <= 0.034 on trained ISOs, held-out
    # 0.043 / 0.174 (the row stage interpolates slowest; the 20k table in
    # STATUS.md has it at 0.042).
    rows = main(["--cpu", "--steps", "4000", "--eval-frames", "16"])
    by_iso = {r["iso"]: r for r in rows}
    assert set(by_iso) == {800, 1600, 3200, 12800, 6400}
    for iso, r in by_iso.items():
        kld_bar, row_bar = (0.06, 0.08) if not r["heldout"] else (0.08, 0.30)
        assert r["kld"] <= kld_bar, (iso, r)
        assert r["row_kld"] <= row_bar, (iso, r)
    # interpolation probe: held-out ISO present and scored
    assert by_iso[6400]["heldout"]
