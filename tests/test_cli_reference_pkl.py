"""CLI accepts the reference's pickled datasets directly in the
``use_generated_*`` slots (auto-detected by extension)."""

import os

import pytest

from tss_dprnn_tpu.cli.common import dataset_for

REF = "/root/reference/datasets"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference artifacts not mounted")
def test_dataset_for_accepts_reference_pickle():
    config = {"data": {"use_generated_test": f"{REF}/tss/test_set.pkl",
                       "path_prefix": "/data", "sample_rate": 8000}}
    ds = dataset_for(config, "test", spe=True)
    assert len(ds) == 3000
    e = ds.entries[0]
    assert e["reference_path"].startswith("/data/Libri2Mix")
