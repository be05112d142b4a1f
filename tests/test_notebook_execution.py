"""Execute examples/zeroshot.ipynb end-to-end (VERDICT round-2 item 5).

The reference's de-facto integration test is an executable notebook
(ref:notebooks/zeroshot.ipynb cells 13-18); ours must stay runnable too
— a stale-API notebook is silent rot. Runs the tiny offline config
(tiny-clip + synthetic dataset + random SPD Hessian fixtures) on CPU
via nbconvert's ExecutePreprocessor.
"""

from pathlib import Path

import pytest

nbformat = pytest.importorskip("nbformat")
pytest.importorskip("nbconvert")
pytest.importorskip("ipykernel")

REPO_ROOT = Path(__file__).resolve().parent.parent
NOTEBOOK = REPO_ROOT / "examples" / "zeroshot.ipynb"


def test_zeroshot_notebook_executes(tmp_path):
    from nbconvert.preprocessors import ExecutePreprocessor

    nb = nbformat.read(NOTEBOOK, as_version=4)
    # prepend a cell forcing the CPU platform: the kernel subprocess
    # would otherwise target the axon tunnel (conftest's env vars don't
    # reach it through the jupyter kernel spec)
    guard = nbformat.v4.new_code_cell(
        source=(
            "import sys; sys.path.insert(0, r'%s')\n"
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "jax.config.update('jax_compilation_cache_dir',"
            " '/root/.cache/jax_comp_cache')\n"
            "jax.config.update('jax_persistent_cache_min_compile_time_secs',"
            " 0.5)\n" % REPO_ROOT
        ),
    )
    guard.pop("id", None)
    nb.cells.insert(0, guard)

    ep = ExecutePreprocessor(timeout=600, kernel_name="python3")
    # cwd=examples/ so the notebook's own `sys.path.insert(0, "..")` works
    ep.preprocess(nb, {"metadata": {"path": str(NOTEBOOK.parent)}})

    # every code cell ran without an error output
    stream = []
    for cell in nb.cells:
        if cell.cell_type != "code":
            continue
        for out in cell.get("outputs", []):
            assert out.get("output_type") != "error", out
            if out.get("output_type") == "stream":
                stream.append(out.get("text", ""))
    text = "".join(stream)
    # the comparison table printed both rows (the notebook's whole point)
    assert "BayesVLM" in text and "MAP" in text
    assert "most uncertain test samples" in text
