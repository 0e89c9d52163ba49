"""Native C++ WAV decoder vs the numpy reference reader."""

import numpy as np
import pytest

from tss_dprnn_tpu.data import native, wav


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native wavio not built (no g++?)")
    return True


def test_native_matches_numpy(tmp_path, rng, lib_ok):
    x = rng.uniform(-0.9, 0.9, 5000).astype(np.float32)
    p = str(tmp_path / "a.wav")
    wav.write(p, x, 8000)
    ref, rate = wav.read(p, prefer_native=False)
    got = native.read(p)
    np.testing.assert_array_equal(got, ref)
    got_part = native.read(p, 100, 1300)
    np.testing.assert_array_equal(got_part, ref[100:1300])
    # and through the public facade
    via, rate2 = wav.read(p)
    np.testing.assert_array_equal(via, ref)
    assert rate == rate2 == 8000


def test_native_batch(tmp_path, rng, lib_ok):
    paths, starts, counts = [], [], []
    refs = []
    seg = 800
    for i in range(6):
        T = 1000 + 100 * i
        x = rng.uniform(-0.9, 0.9, T).astype(np.float32)
        p = str(tmp_path / f"b{i}.wav")
        wav.write(p, x, 8000)
        start = i * 10
        paths.append(p)
        starts.append(start)
        counts.append(seg)
        full, _ = wav.read(p, prefer_native=False)
        refs.append(full[start : start + seg])
    out = native.read_batch(paths, starts, counts, seg, n_threads=3)
    assert out.shape == (6, seg)
    for i in range(6):
        np.testing.assert_array_equal(out[i], refs[i])


def test_native_float32_wav(tmp_path, rng, lib_ok):
    x = rng.uniform(-0.9, 0.9, 1000).astype(np.float32)
    p = str(tmp_path / "f.wav")
    wav.write(p, x, 16000, bits=32)
    np.testing.assert_allclose(native.read(p), x, atol=0)
