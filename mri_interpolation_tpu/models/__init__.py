"""Functional model zoo.

Every factory returns a ``Model`` (init/apply over explicit pytrees) — the
uniform surface the trainer, evaluators and parallel layers consume. The
registry maps reference class names AND our snake_case names to factories,
serving the launcher's ``--model_class`` flag (reference launcher.py:50-52).
"""

from .core import Model
from .freq_mlp import make_freq_mlp
from .gabor import make_gabor_net
from .hash_mlp import make_hash_mlp
from .mlp import make_mlp, make_rff_net
from .multi import make_multi_hash_mlp, make_multi_siren
from .siren import (
    make_hash_siren,
    make_modulated_siren,
    make_psf_siren,
    make_siren,
)
from .warp import make_warp_inr

# name -> factory. Reference class names included for CLI compatibility.
REGISTRY = {
    "mlp": make_mlp,
    "BaseMLP": make_mlp,
    "siren": make_siren,
    "SirenNet": make_siren,
    "modulated_siren": make_modulated_siren,
    "ModulatedSirenNet": make_modulated_siren,
    "hash_siren": make_hash_siren,
    "HashSirenNet": make_hash_siren,
    "psf_siren": make_psf_siren,
    "PsfSirenNet": make_psf_siren,
    "rff_net": make_rff_net,
    "RffNet": make_rff_net,
    "hash_mlp": make_hash_mlp,
    "HashMLP": make_hash_mlp,
    "TcnnHashMLP": make_hash_mlp,  # tcnn-style config via per_level_scale + decoder="relu_plain"
    "gabor": make_gabor_net,
    "GaborNet": make_gabor_net,
    "freq_mlp": make_freq_mlp,
    "FreqMLP": make_freq_mlp,
    "multi_siren": make_multi_siren,
    "MultiSiren": make_multi_siren,
    "multi_hash_mlp": make_multi_hash_mlp,
    "MultiHashMLP": make_multi_hash_mlp,
    "warp_inr": make_warp_inr,  # new capability: motion-compensated INR
}


def get_model_factory(name: str):
    if name not in REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {sorted(set(REGISTRY))}")
    return REGISTRY[name]


__all__ = [
    "Model",
    "REGISTRY",
    "get_model_factory",
    "make_mlp",
    "make_siren",
    "make_modulated_siren",
    "make_hash_siren",
    "make_psf_siren",
    "make_rff_net",
    "make_hash_mlp",
    "make_gabor_net",
    "make_freq_mlp",
    "make_multi_siren",
    "make_multi_hash_mlp",
    "make_warp_inr",
]
