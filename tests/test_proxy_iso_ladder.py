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

    rows = main(["--cpu", "--steps", "1500", "--eval-frames", "16"])
    by_iso = {r["iso"]: r for r in rows}
    assert set(by_iso) == {800, 1600, 3200, 12800, 6400}
    for iso, r in by_iso.items():
        bar = 0.12 if not r["heldout"] else 0.05
        assert r["kld"] <= bar, (iso, r)
        # the row-marginal score must at least be a valid, finite measurement
        # clearly distinguishable from a broken stage (KLD ~ O(1))
        assert r["row_kld"] <= 0.6, (iso, r)
    # interpolation probe: held-out ISO present and scored
    assert by_iso[6400]["heldout"]
