"""The walkthrough notebooks must execute end-to-end offline (VERDICT r4 #8)."""

import pytest

nbformat = pytest.importorskip("nbformat")
nbclient = pytest.importorskip("nbclient")


@pytest.mark.parametrize(
    "path", ["examples/quickstart_mf.ipynb", "examples/experiment_matrix.ipynb"]
)
def test_notebook_executes(path):
    nb = nbformat.read(path, as_version=4)
    nbclient.NotebookClient(nb, timeout=600, kernel_name="python3").execute()
