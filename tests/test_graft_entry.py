"""Driver entry-point contract: entry() compiles; dryrun_multichip runs both
inline (enough devices) and via the self-provisioned child process (too few)."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
import __graft_entry__ as ge

pytestmark = pytest.mark.slow  # full-pipeline/protocol layer (run with -m slow; excluded from the fast unit run)


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_inline_on_virtual_mesh():
    # conftest provisions 8 CPU devices, so this exercises the inline path.
    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_self_provisions_child():
    # More devices than this process has -> must re-exec into a child with a
    # wider virtual CPU mesh (the driver machine has ONE real chip).
    ge.dryrun_multichip(len(jax.devices()) + 2)
