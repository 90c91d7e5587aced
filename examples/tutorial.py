"""Tutorial: the model-family progression from the reference notebook.

The reference's de-facto documentation is a French-language notebook walking
MLP -> RFF -> SIREN -> modulated SIREN -> hash encodings
(ReprésentationsImplicites.ipynb). This script is the same progression as a
runnable, asserted demo on a small synthetic volume (runs on CPU in ~a
minute; pass --image_path to use real data).

Run: python examples/tutorial.py
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

import numpy as np

from mri_interpolation_tpu.infer import evaluate_grid
from mri_interpolation_tpu.io import dataset_from_array, load_volume, synthetic_volume
from mri_interpolation_tpu.metrics import evaluate_reconstruction
from mri_interpolation_tpu.models import (
    make_hash_mlp,
    make_mlp,
    make_modulated_siren,
    make_rff_net,
    make_siren,
)
from mri_interpolation_tpu.train import TrainConfig, Trainer


def demo(name, model, ds, cfg, lo=0.0, data_range=1.0):
    result = Trainer(cfg).fit(model, ds.coords, ds.values)
    recon = evaluate_grid(model, result.params, result.state, ds.shape, lo=lo)
    q = evaluate_reconstruction(jax.numpy.asarray(recon), jax.numpy.asarray(ds.image()), data_range=data_range)
    print(f"{name:>20}: loss {result.final_loss:.5f}  PSNR {q['psnr']:.1f} dB")
    return q["psnr"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_path", default=None, help="optional NIfTI volume")
    ap.add_argument("--epochs", type=int, default=60)
    args = ap.parse_args()

    if args.image_path:
        ds01 = load_volume(args.image_path, slice_axes=(slice(None), slice(None), 3, slice(None)))
        ds11 = load_volume(args.image_path, zero_centered=True,
                           slice_axes=(slice(None), slice(None), 3, slice(None)))
    else:
        vol = synthetic_volume((24, 24, 12), seed=0)
        ds01 = dataset_from_array(vol)
        ds11 = dataset_from_array(vol, zero_centered=True)

    cfg = TrainConfig(batch_size=2048, epochs=args.epochs, lr=1e-3)
    shape = ds01.shape

    # 1. Plain ReLU MLP: struggles with high frequencies (spectral bias)
    demo("ReLU MLP", make_mlp(dim_in=3, dim_hidden=64, n_layers=4), ds01, cfg)

    # 2. Random Fourier features lift the spectral bias
    demo("RFF + MLP", make_rff_net(dim_in=3, dim_hidden=64, n_layers=3, n_frequencies=64), ds01, cfg)

    # 3. SIREN: periodic activations, trained on [-1,1] coords
    p_siren = demo("SIREN", make_siren(dim_in=3, dim_hidden=64, n_layers=4),
                   ds11, TrainConfig(batch_size=2048, epochs=args.epochs, lr=1e-3),
                   lo=-1.0, data_range=2.0)

    # 4. Modulated SIREN
    demo("modulated SIREN", make_modulated_siren(dim_in=3, dim_hidden=64, n_layers=3),
         ds11, TrainConfig(batch_size=2048, epochs=args.epochs, lr=1e-3), lo=-1.0, data_range=2.0)

    # 5. Multiresolution hash grid: fastest convergence per step
    p_hash = demo("hash MLP", make_hash_mlp(
        dim_in=3, n_levels=4, n_features_per_level=2, log2_hashmap_size=15,
        base_resolution=tuple(max(2, s // 5) for s in shape), finest_resolution=shape,
        dim_hidden=32, n_layers=2, decoder="relu_plain"),
        ds01, TrainConfig(batch_size=2048, epochs=2 * args.epochs, lr=1e-2))

    assert p_siren > 20 and p_hash > 20, "tutorial models should fit the demo volume"


if __name__ == "__main__":
    main()
