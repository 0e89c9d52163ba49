"""Unpickling the reference's actual shipped dataset artifacts
(/root/reference/datasets/*.pkl) into our manifest schema."""

import os

import pytest

from tss_dprnn_tpu.data.librimix import Librimix, LibrimixSpe
from tss_dprnn_tpu.data.reference_compat import load_reference_pickle

REF = "/root/reference/datasets"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference artifacts not mounted")
def test_load_reference_tss_test_pickle():
    m = load_reference_pickle(f"{REF}/tss/test_set.pkl", path_prefix="/data")
    assert m["kind"] == "librimix_spe"
    assert m["n_src"] == 2
    assert len(m["entries"]) == 3000  # Libri2Mix test split
    e = m["entries"][0]
    assert e["reference_path"].startswith("/data/Libri2Mix")
    assert e["stop"] is None  # test split: full length
    assert isinstance(e["speaker_idx"], int)
    assert len(m["speakers"]) > 0
    # dataset object constructs over the manifest (no file reads here)
    ds = LibrimixSpe(manifest=m)
    assert len(ds) == 3000


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference artifacts not mounted")
def test_load_reference_bss_train_pickle():
    m = load_reference_pickle(f"{REF}/bss/train_set.pkl")
    assert m["kind"] == "librimix"
    e = m["entries"][0]
    assert e["stop"] == e["start"] + 3 * 8000  # frozen 3-s crops
    ds = Librimix(manifest=m)
    assert len(ds) == len(m["entries"])
