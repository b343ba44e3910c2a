"""LED identity-eval harness (reference: trainer_LED.py).

Scores raw noisy inputs (or externally-denoised results) under the same
metric pipeline with NO denoiser: ``imgs_dn = imgs_lr``
(reference: trainer_LED.py:111). Useful for input-PSNR reference points and
for evaluating third-party outputs.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from pnnp_tpu.trainer import Trainer, eval_sweep


class LEDTrainer(Trainer):
    def __init__(self, runfile: str, mode: Optional[str] = "eval", **kw):
        super().__init__(runfile, mode=mode, **kw)
        # identity "network": bypass the model entirely — including the
        # fused eval step, which would run the real forward
        self.eval_step = lambda state, lr_img: jnp.asarray(lr_img)
        self._fused_eval = None
        # unlike trainer_LRID, trainer_LED DOES illuminance-correct on phone
        # data (trainer_LED.py:122)
        self._phone_eval_corrects = True


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--runfile", "-f", required=True)
    p.add_argument("--mode", "-m", default="eval")
    p.add_argument("--nofig", action="store_true")
    a = p.parse_args(argv)
    t = LEDTrainer(a.runfile, mode=a.mode, nofig=a.nofig)
    # same dispatch as the main trainer (change_eval_ratio first — phone
    # datasets read self.dgain; a raw ratio_list assignment silently keeps
    # the default ratio)
    eval_sweep(t, t.dataset_eval, list(t.dst_eval.get("ratio_list", [])))


if __name__ == "__main__":
    main()
