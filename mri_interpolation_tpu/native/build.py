"""Build entry point: ``python -m mri_interpolation_tpu.native.build``."""

from . import build

if __name__ == "__main__":
    path = build(force=True)
    print(f"built {path}")
