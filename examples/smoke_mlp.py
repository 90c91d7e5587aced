"""End-to-end smoke run: ReLU-MLP fit of the sample ankle volume's 2D+t slice.

Parity target: reference test_script.py (8-layer ReLU MLP, dim_hidden 352,
batch 20000, (x, y, t) slice at z=3, prediction saved as NIfTI), with the
assertions the reference never had.

Run: python examples/smoke_mlp.py [--epochs 5]
"""

import argparse
import sys

sys.path.insert(0, ".")

from mri_interpolation_tpu.utils import setup_compilation_cache

setup_compilation_cache()

import jax
import numpy as np

from mri_interpolation_tpu.infer import evaluate_grid
from mri_interpolation_tpu.io import load_volume, nifti
from mri_interpolation_tpu.metrics import evaluate_reconstruction
from mri_interpolation_tpu.models import make_mlp
from mri_interpolation_tpu.train import TrainConfig, Trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_path", default="/root/reference/sample_ankle_dyn_mri.nii.gz")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--out", default="pred_MLP.nii.gz")
    args = ap.parse_args()

    ds = load_volume(args.image_path, slice_axes=(slice(None), slice(None), 3, slice(None)))
    model = make_mlp(dim_in=3, dim_hidden=352, n_layers=8)
    result = Trainer(TrainConfig(batch_size=20000, epochs=args.epochs, lr=1e-4)).fit(
        model, ds.coords, ds.values
    )
    recon = evaluate_grid(model, result.params, result.state, ds.shape)
    q = evaluate_reconstruction(jax.numpy.asarray(recon), jax.numpy.asarray(ds.image()))
    nifti.save(recon.astype(np.float32), args.out, pixdim=ds.pixdim)
    print(f"final loss {result.final_loss:.5f}, PSNR {q['psnr']:.2f} dB, saved {args.out}")
    assert np.isfinite(result.final_loss) and result.final_loss < 0.1


if __name__ == "__main__":
    main()
