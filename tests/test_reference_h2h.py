"""Head-to-head harness smoke: the reference torch engines stay drivable.

Guards examples/reference_head2head.py (the source of PARITY_RESULTS.md's
reference column) against rot: stubs install, the reference imports under
torch CPU, and a 2-epoch MF run produces finite metrics on the shared
synthetic split. Skipped when /root/reference is absent.
"""

import os
import sys

import pytest

pytestmark = pytest.mark.slow

REFERENCE_ROOT = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT), reason="no reference checkout")
def test_reference_mf_two_epochs(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples import reference_head2head as h2h

    h2h._install_reference(REFERENCE_ROOT)
    from beta_recsys_tpu.datasets.data_load import DATASET_REGISTRY

    ds = DATASET_REGISTRY["synthetic_structured"](root_dir=str(tmp_path))
    split = ds.load_leave_one_out(n_test=1, n_negative=20)
    r = h2h.run_reference_mf(split, seed=0, run_dir=str(tmp_path), max_epoch=2,
                             patience=2)
    assert 0.0 < r["test"]["ndcg@10"] < 1.0
    assert len(r["curve"]) == 2
