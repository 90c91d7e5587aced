"""docs/tutorial.ipynb must stay runnable: execute its code cells
top-to-bottom (the notebook generator and this test share the cell source,
scripts/make_tutorial_notebook.py)."""

import json

import pytest


def test_notebook_is_valid_and_matches_generator():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "mknb", "scripts/make_tutorial_notebook.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with open("docs/tutorial.ipynb") as f:
        nb = json.load(f)
    assert nb == mod.build(), (
        "docs/tutorial.ipynb is stale — rerun scripts/make_tutorial_notebook.py")
    assert nb["nbformat"] == 4
    kinds = [c["cell_type"] for c in nb["cells"]]
    assert kinds.count("code") >= 8 and kinds.count("markdown") >= 8
    # artifact policy: no committed outputs
    for c in nb["cells"]:
        if c["cell_type"] == "code":
            assert c["outputs"] == [] and c["execution_count"] is None


@pytest.mark.slow
def test_notebook_runs_top_to_bottom():
    # "run all" without jupyter: exec each code cell in one shared namespace
    with open("docs/tutorial.ipynb") as f:
        nb = json.load(f)
    ns = {}
    for i, cell in enumerate(nb["cells"]):
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"]).replace("EPOCHS = 40", "EPOCHS = 12")
        exec(compile(src, f"<cell {i}>", "exec"), ns)  # noqa: S102
    assert ns["p_hash"] > 0 and ns["upsampled"].shape[-1] == 2 * ns["shape"][-1]
