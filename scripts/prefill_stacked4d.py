"""Prefill the --stacked4d cache with the CPU-feasible families.

The 4D LOO-stacked run (scripts/experiments.py --stacked4d) needs
5 families x 7 positions of cached predictions; the warp fits need the
TPU, but the classical families (linear, cubic, pairwise + group
registration) are host/CPU work. Running this while the TPU tunnel is
down leaves only the 14 warp fits for the chip.

Cache keys (fold{k}_{name} / deploy_{name}) are family-set independent
(train/stacking.py:231-270), so these entries are reused verbatim by the
full run.
"""
import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)

# sitecustomize pre-imports jax with the tunnel platform pinned; env vars are
# too late here — pin the platform the way tests/conftest.py does.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from mri_interpolation_tpu.io import load_volume  # noqa: E402
from mri_interpolation_tpu.train import TrainConfig  # noqa: E402
from mri_interpolation_tpu.train.stacking import stacked_interp_eval  # noqa: E402

SAMPLE = "/root/reference/sample_ankle_dyn_mri.nii.gz"

if __name__ == "__main__":
    img = load_volume(SAMPLE).image()
    ep = 60
    cfg = TrainConfig(batch_size=50000, epochs=ep, lr=1e-2, optimizer="adam_tcnn",
                      lr_schedule="cosine", cosine_t_max=ep, weight_decay=1e-5)
    _, q = stacked_interp_eval(
        img, cfg, seeds=(1337,),
        include=("registration", "registration_group", "cubic", "linear"),
        cache_dir=f"runs/stacked4d_cache_ep{ep}")
    print("classical-only fusion (no warp):",
          {k: round(v, 3) for k, v in q["odd"].items()},
          flush=True)
