"""Generate docs/tutorial.ipynb — the interactive counterpart of
examples/tutorial.py / docs/TUTORIAL.md.

The reference's de-facto documentation is a 62-cell runnable notebook
(/root/reference/ReprésentationsImplicites.ipynb) walking
MLP -> RFF -> SIREN -> modulated SIREN -> hash encodings. This script
emits the same progression as a clean-output .ipynb (no committed outputs
— the artifact policy), built from the cell list below; the code cells are
exactly what tests/test_tutorial_notebook.py executes top-to-bottom on
CPU, so the committed notebook is always runnable.

Usage: python scripts/make_tutorial_notebook.py [out.ipynb]
"""

from __future__ import annotations

import json
import sys

MD = "markdown"
PY = "code"

CELLS = [
    (MD, """\
# mri_interpolation_tpu — tutorial

The model-family progression from the reference notebook
(`ReprésentationsImplicites.ipynb`), on the TPU-native JAX framework:
**ReLU MLP → random Fourier features → SIREN → modulated SIREN →
multiresolution hash grid**, ending with dense-grid interpolation and the
even-frame evaluation protocol.

Runs on CPU in a few minutes on a small synthetic volume; point
`IMAGE_PATH` at a NIfTI file (e.g. the reference's
`sample_ankle_dyn_mri.nii.gz`) to use real data."""),
    (PY, """\
import jax
try:  # CPU is fine for the demo volume; comment out to use an accelerator
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass  # backend already initialized
import numpy as np

from mri_interpolation_tpu.infer import evaluate_grid
from mri_interpolation_tpu.io import (dataset_from_array, load_volume,
                                      synthetic_volume)
from mri_interpolation_tpu.metrics import evaluate_reconstruction
from mri_interpolation_tpu.models import (make_hash_mlp, make_mlp,
                                          make_modulated_siren, make_rff_net,
                                          make_siren)
from mri_interpolation_tpu.train import TrainConfig, Trainer

IMAGE_PATH = None  # e.g. "/root/reference/sample_ankle_dyn_mri.nii.gz"
EPOCHS = 40"""),
    (MD, """\
## Data

A volume becomes a flat regression dataset: coordinates in `[0,1]^d` (or
`[-1,1]^d` for SIREN) against min-max-normalized intensities — the INR fits
`f(x, y, t) -> intensity`."""),
    (PY, """\
if IMAGE_PATH:
    ds01 = load_volume(IMAGE_PATH,
                       slice_axes=(slice(None), slice(None), 3, slice(None)))
    ds11 = load_volume(IMAGE_PATH, zero_centered=True,
                       slice_axes=(slice(None), slice(None), 3, slice(None)))
else:
    vol = synthetic_volume((24, 24, 12), seed=0)
    ds01 = dataset_from_array(vol)
    ds11 = dataset_from_array(vol, zero_centered=True)
shape = ds01.shape
print(f"{len(ds01):,} voxels of shape {shape}, coords in "
      f"[{ds01.coords.min():.0f}, {ds01.coords.max():.0f}]")"""),
    (PY, """\
def demo(name, model, ds, cfg, lo=0.0, data_range=1.0):
    result = Trainer(cfg).fit(model, ds.coords, ds.values)
    recon = evaluate_grid(model, result.params, result.state, ds.shape, lo=lo)
    q = evaluate_reconstruction(jax.numpy.asarray(recon),
                                jax.numpy.asarray(ds.image()),
                                data_range=data_range)
    print(f"{name:>20}: loss {result.final_loss:.5f}  "
          f"PSNR {q['psnr']:.1f} dB")
    return q["psnr"], recon

cfg = TrainConfig(batch_size=2048, epochs=EPOCHS, lr=1e-3)"""),
    (MD, """\
## 1. Plain ReLU MLP

A coordinate MLP without any encoding struggles with high frequencies —
the *spectral bias* the rest of the progression addresses.
(Reference: `models.py` `BaseMLP`, `test_script.py`.)"""),
    (PY, """\
p_mlp, _ = demo("ReLU MLP", make_mlp(dim_in=3, dim_hidden=64, n_layers=4),
                ds01, cfg)"""),
    (MD, """\
## 2. Random Fourier features

Projecting coordinates through fixed Gaussian frequencies
(`γ(x) = [sin 2πBx, cos 2πBx]`) lifts the spectral bias.
(Reference: `RffNet`, the external `rff` package.)"""),
    (PY, """\
p_rff, _ = demo("RFF + MLP",
                make_rff_net(dim_in=3, dim_hidden=64, n_layers=3,
                             n_frequencies=64), ds01, cfg)"""),
    (MD, """\
## 3. SIREN

Periodic activations `sin(w0·x)` with the Sitzmann init; trained on
`[-1,1]` coordinates. (Reference: `SirenNet`, `models.py:160-233`.)"""),
    (PY, """\
p_siren, _ = demo("SIREN", make_siren(dim_in=3, dim_hidden=64, n_layers=4),
                  ds11, TrainConfig(batch_size=2048, epochs=EPOCHS, lr=1e-3),
                  lo=-1.0, data_range=2.0)"""),
    (MD, """\
## 4. Modulated SIREN

A ReLU modulator network (fed the raw coordinates) gates each SIREN
layer's output elementwise — per-layer amplitude control.
(Reference: `ModulatedSirenNet`, Mehta et al. 2021.)"""),
    (PY, """\
p_mod, _ = demo("modulated SIREN",
                make_modulated_siren(dim_in=3, dim_hidden=64, n_layers=3),
                ds11, TrainConfig(batch_size=2048, epochs=EPOCHS, lr=1e-3),
                lo=-1.0, data_range=2.0)"""),
    (MD, """\
## 5. Multiresolution hash grid

Instant-NGP-style: learned feature tables at geometrically growing
resolutions, multilinearly interpolated and decoded by a small MLP — the
fastest convergence per step of the family, and the framework's flagship.
(Reference: `HashMLP` / `encoding.py`; TPU-native fused-table design in
`encodings/hashgrid.py`.)"""),
    (PY, """\
p_hash, recon = demo("hash MLP", make_hash_mlp(
    dim_in=3, n_levels=4, n_features_per_level=2, log2_hashmap_size=15,
    base_resolution=tuple(max(2, s // 5) for s in shape),
    finest_resolution=shape, dim_hidden=32, n_layers=2,
    decoder="relu_plain"),
    ds01, TrainConfig(batch_size=2048, epochs=2 * EPOCHS, lr=1e-2))
assert p_siren > 20 and p_hash > 20, "tutorial models should fit the volume"
"""),
    (MD, """\
## 6. Arbitrary-resolution interpolation

The fitted INR is continuous: evaluating it on a denser grid IS the
interpolation — here 2x along the last (time) axis.
(Reference: `launcher.py:191-222` `interp_shapes`.)"""),
    (PY, """\
up_shape = shape[:-1] + (2 * shape[-1],)
model = make_hash_mlp(
    dim_in=3, n_levels=4, n_features_per_level=2, log2_hashmap_size=15,
    base_resolution=tuple(max(2, s // 5) for s in shape),
    finest_resolution=shape, dim_hidden=32, n_layers=2,
    decoder="relu_plain")
res = Trainer(TrainConfig(batch_size=2048, epochs=2 * EPOCHS,
                          lr=1e-2)).fit(model, ds01.coords, ds01.values)
upsampled = evaluate_grid(model, res.params, res.state, up_shape)
print("interpolated volume:", upsampled.shape)"""),
    (MD, """\
## 7. The honest evaluation protocol

Train on the EVEN frames only, score on the held-out odd frames — the
reference's actual interpolation-quality protocol
(`hash_experimentation.py:313-317`), available as one call."""),
    (PY, """\
from mri_interpolation_tpu.train.protocols import even_frame_fit_eval

proto_model = make_hash_mlp(
    dim_in=3, n_levels=3, n_features_per_level=2, log2_hashmap_size=14,
    base_resolution=tuple(max(2, s // 5) for s in shape),
    finest_resolution=shape, dim_hidden=32, n_layers=2,
    decoder="relu_plain")
_, q = even_frame_fit_eval(proto_model, ds01.image(),
                           TrainConfig(batch_size=2048, epochs=2 * EPOCHS,
                                       lr=1e-2))
print(f"held-out odd-frame PSNR: {q['odd']['psnr']:.2f} dB "
      f"(full volume {q['full']['psnr']:.2f} dB)")"""),
    (MD, """\
## Where to go next

- `docs/TUTORIAL.md` — this walkthrough with the full flag surface
- `python -m mri_interpolation_tpu.launcher --help` — the training CLI
  (reference `launcher.py` parity + TPU-native extensions)
- `train/stacking.py` — the LOO-stacked temporal-interpolation estimator
  (the framework's held-out headline)
- `RESULTS.md` — every measured number, with reproduction commands"""),
]


def build() -> dict:
    cells = []
    for kind, src in CELLS:
        lines = src.splitlines(keepends=True)
        cell = {"cell_type": kind, "metadata": {}, "source": lines}
        if kind == PY:
            cell.update({"execution_count": None, "outputs": []})
        cells.append(cell)
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "docs/tutorial.ipynb"
    with open(out, "w") as f:
        json.dump(build(), f, indent=1)
    n_code = sum(1 for k, _ in CELLS if k == PY)
    print(f"{out}: {len(CELLS)} cells ({n_code} code)")


if __name__ == "__main__":
    main()
