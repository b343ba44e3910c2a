"""Pin the intentional d-default divergence (VERDICT r3 weak #4).

The reference flagship runfile sets the proxy's distribution size d=1024
(reference runfiles/SonyA7S2/PNNP.yml:57); the repo mirrors that surface and
the Trainer honors YAML's d (pnnp_tpu/trainer.py:272, defaulting to 1024
when the key is absent — the reference default). The validation tools
default to d=256 instead, a MEASURED redesign: the d=1024 control reproduced
identical trained-ISO KLD but interpolated the held-out ISO worse
(0.045/0.168 vs 0.0118 — STATUS.md round-3 "d=1024 proxy control").

This test pins all three facts so the two defaults can't drift silently:
runfile surface, trainer consumption, and the tools' validated default.
"""

import re

from pnnp_tpu.config import load_runfile
from pnnp_tpu.trainer import Trainer

REPO = __file__.rsplit("/tests/", 1)[0]


def test_runfile_surface_keeps_reference_d():
    args = load_runfile(f"{REPO}/runfiles/SonyA7S2/PNNP.yml")
    assert int(args["arch_proxy"]["d"]) == 1024


def test_trainer_honors_yaml_d_and_defaults_to_reference():
    # a Trainer shim: _init_proxy only touches self.dst / self.args
    t = Trainer.__new__(Trainer)
    t.dst = {"wp": 16383, "bl": 512}
    t.args = {}

    args = load_runfile(f"{REPO}/runfiles/SonyA7S2/PNNP.yml")
    Trainer._init_proxy(t, args["arch_proxy"])
    assert t.proxy.d == 1024

    ap_no_d = {k: v for k, v in args["arch_proxy"].items() if k != "d"}
    Trainer._init_proxy(t, ap_no_d)
    assert t.proxy.d == 1024  # absent key falls back to the REFERENCE value


def test_tools_default_is_the_validated_256():
    # The tools' parsers live inline in main() (which trains on parse), so
    # pin the source text. If this fails, either re-run the d-control
    # (STATUS round-3) at the new default or revert.
    for rel in ("tools/validate_proxy.py", "tools/ab_proxy_vs_physics.py"):
        src = open(f"{REPO}/{rel}").read()
        m = re.search(r"\"--d\",\s*type=int,\s*default=(\d+)", src)
        assert m, rel
        assert int(m.group(1)) == 256, rel
