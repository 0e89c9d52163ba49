"""Host metrics (SI-SDR/STOI) sanity + end-to-end bucketed inference
producing the reference's all_metrics.csv / final_metrics.json schema."""

import json

import numpy as np
import pytest

import jax

from tests.fixtures import SR, make_mini_librimix
from tss_dprnn_tpu.data.librimix import Librimix, LibrimixSpe
from tss_dprnn_tpu.inference import Inferencer, InferencerSpe
from tss_dprnn_tpu.models import DPRNNSpeTasNet, DPRNNTasNet
from tss_dprnn_tpu.ops import metrics as M
from tss_dprnn_tpu.utils.checkpoint import CheckpointManager

TINY = dict(input_size=8, feature_size=12, hidden_size=10, chunk_length=40,
            kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln")


def _speech_like(T, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(T) / SR
    env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
    x = env * np.sin(2 * np.pi * 220 * t) + 0.3 * env * np.sin(2 * np.pi * 440 * t)
    return (x + 0.02 * rng.standard_normal(T)).astype(np.float32)


def test_si_sdr_host():
    x = _speech_like(SR * 2, 0)
    assert M.si_sdr(x, x) > 60
    noisy = x + 0.1 * np.random.default_rng(1).standard_normal(len(x)).astype(np.float32)
    v = M.si_sdr(noisy, x)
    assert 5 < v < 40


def test_stoi_behaves():
    x = _speech_like(SR * 3, 0)
    clean_score = M.stoi(x, x, SR)
    assert clean_score > 0.98
    rng = np.random.default_rng(2)
    light = M.stoi(x, x + 0.05 * rng.standard_normal(len(x)).astype(np.float32), SR)
    heavy = M.stoi(x, x + 1.0 * rng.standard_normal(len(x)).astype(np.float32), SR)
    assert clean_score >= light > heavy
    assert heavy < 0.75


def test_get_metrics_schema():
    x = _speech_like(SR * 2, 3)
    est = x + 0.05 * np.random.default_rng(3).standard_normal(len(x)).astype(np.float32)
    mix = x + 0.3 * np.random.default_rng(4).standard_normal(len(x)).astype(np.float32)
    md = M.get_metrics(mix, x, est, SR, ["si_sdr", "stoi", "pesq"])
    for key in ["si_sdr", "input_si_sdr", "stoi", "input_stoi", "pesq", "input_pesq"]:
        assert key in md
    assert md["si_sdr"] > md["input_si_sdr"]


def _save_random_checkpoint(tmp_path, model, example_args):
    variables = model.init(jax.random.PRNGKey(0), *example_args)
    ck = CheckpointManager(str(tmp_path / "chkpts"))
    tree = {"epoch": 1, "params": jax.tree.map(np.asarray, variables["params"]),
            "batch_stats": jax.tree.map(np.asarray, variables.get("batch_stats", {}))}
    return ck.save(1, tree, best=True)


def test_bss_inferencer_end_to_end(tmp_path):
    csv = make_mini_librimix(str(tmp_path), n_mix=6, min_sec=1.0, max_sec=2.5)
    test_set = Librimix(csv_path=csv, segment=None)
    model = DPRNNTasNet(**TINY)
    path = _save_random_checkpoint(tmp_path, model, (np.zeros((1, SR), np.float32),))
    config = {"checkpoint_path": path, "test_savedir": str(tmp_path / "metrics"),
              "data": {"sample_rate": SR}, "metrics": ["si_sdr", "stoi"]}
    inf = Inferencer(model, config)
    final = inf.run(test_set, batch_size=3, n_buckets=2, bucket_multiple=4000)
    assert set(final) == {"si_sdr", "si_sdr_imp", "stoi", "stoi_imp"}
    saved = json.loads((tmp_path / "metrics" / "final_metrics.json").read_text())
    assert saved["si_sdr"] == pytest.approx(final["si_sdr"])
    import pandas as pd

    df = pd.read_csv(tmp_path / "metrics" / "all_metrics.csv", index_col=0)
    assert len(df) == 6
    assert {"si_sdr", "input_si_sdr", "stoi", "input_stoi"} <= set(df.columns)


def test_spe_inferencer_end_to_end(tmp_path):
    csv = make_mini_librimix(str(tmp_path), n_mix=6, min_sec=1.0, max_sec=2.0)
    test_set = LibrimixSpe(csv_path=csv, segment=None)
    model = DPRNNSpeTasNet(**TINY, O=8, P=12, embeddings_size=8, num_spks=8, fusion_type="att")
    z = np.zeros((1, SR), np.float32)
    path = _save_random_checkpoint(tmp_path, model, (z, z, np.array([SR], np.float32)))
    config = {"checkpoint_path": path, "test_savedir": str(tmp_path / "metrics_spe"),
              "data": {"sample_rate": SR}, "metrics": ["si_sdr", "stoi"]}
    inf = InferencerSpe(model, config)
    final = inf.run(test_set, batch_size=2, n_buckets=2, bucket_multiple=4000)
    assert np.isfinite(final["si_sdr"])


def test_overlapped_metrics_match_synchronous(tmp_path):
    """The pipelined metric worker (overlap_metrics=True, the default) must
    produce the same final metrics and per-row CSV as the synchronous loop."""
    csv = make_mini_librimix(str(tmp_path), n_mix=6, min_sec=1.0, max_sec=2.5)
    test_set = Librimix(csv_path=csv, segment=None)
    model = DPRNNTasNet(**TINY)
    path = _save_random_checkpoint(tmp_path, model, (np.zeros((1, SR), np.float32),))
    import pandas as pd

    finals, frames = [], []
    for overlap, sub in ((True, "a"), (False, "b")):
        config = {"checkpoint_path": path, "test_savedir": str(tmp_path / sub),
                  "data": {"sample_rate": SR}, "metrics": ["si_sdr", "stoi"]}
        inf = Inferencer(model, config)
        finals.append(inf.run(test_set, batch_size=2, n_buckets=2,
                              bucket_multiple=4000, overlap_metrics=overlap))
        frames.append(pd.read_csv(tmp_path / sub / "all_metrics.csv", index_col=0))
    assert finals[0] == finals[1]
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_spe_inferencer_libri3mix(tmp_path):
    """Target extraction evaluates unchanged on 3-speaker (Libri3Mix)
    mixtures — the reference's published Libri3Mix configuration
    (metrics/dprnn-spe/final_metrics_attention_libri3mix.json): same
    DPRNN-Spe model, dataset-side n_src=3, target = speaker 1."""
    csv = make_mini_librimix(str(tmp_path), n_mix=6, n_speakers=5, n_src=3,
                             min_sec=1.0, max_sec=2.0)
    test_set = LibrimixSpe(csv_path=csv, segment=None, n_src=3)
    model = DPRNNSpeTasNet(**TINY, O=8, P=12, embeddings_size=8, num_spks=8, fusion_type="att")
    z = np.zeros((1, SR), np.float32)
    path = _save_random_checkpoint(tmp_path, model, (z, z, np.array([SR], np.float32)))
    config = {"checkpoint_path": path, "test_savedir": str(tmp_path / "metrics_3mix"),
              "data": {"sample_rate": SR}, "metrics": ["si_sdr", "stoi"]}
    inf = InferencerSpe(model, config)
    final = inf.run(test_set, batch_size=2, n_buckets=2, bucket_multiple=4000)
    assert set(final) == {"si_sdr", "si_sdr_imp", "stoi", "stoi_imp"}
    assert np.isfinite(final["si_sdr"])


def test_inferencer_requires_checkpoint(tmp_path):
    model = DPRNNTasNet(**TINY)
    with pytest.raises(ValueError):
        Inferencer(model, {"checkpoint_path": None, "data": {"sample_rate": SR}})


def test_sharded_eval_equals_single_device(tmp_path):
    """Multi-chip inference (mesh data sharding + pad_to_batch filler rows)
    produces the same per-utterance metrics as the plain single-device path."""
    from tss_dprnn_tpu.parallel import make_mesh

    csv = make_mini_librimix(str(tmp_path), n_mix=6, min_sec=1.0, max_sec=2.0)
    test_set = LibrimixSpe(csv_path=csv, segment=None)
    model = DPRNNSpeTasNet(**TINY, O=8, P=12, embeddings_size=8, num_spks=8,
                           fusion_type="att")
    z = np.zeros((1, SR), np.float32)
    path = _save_random_checkpoint(tmp_path, model, (z, z, np.array([SR], np.float32)))

    def run(savedir, mesh):
        config = {"checkpoint_path": path, "test_savedir": str(tmp_path / savedir),
                  "data": {"sample_rate": SR}, "metrics": ["si_sdr"]}
        inf = InferencerSpe(model, config, mesh=mesh)
        # batch 4 over a 4-way data axis; 6 utterances -> ragged tails padded
        return inf.run(test_set, batch_size=4, n_buckets=2, bucket_multiple=4000)

    single = run("m_single", None)
    sharded = run("m_sharded", make_mesh(data=4))
    import pandas as pd

    df_s = pd.read_csv(tmp_path / "m_single" / "all_metrics.csv", index_col=0)
    df_m = pd.read_csv(tmp_path / "m_sharded" / "all_metrics.csv", index_col=0)
    assert len(df_m) == len(df_s) == 6  # filler rows dropped
    np.testing.assert_allclose(df_m["si_sdr"], df_s["si_sdr"], rtol=0, atol=5e-4)
    assert sharded["si_sdr"] == pytest.approx(single["si_sdr"], abs=5e-4)


def test_spe_inferencer_noisy_condition(tmp_path):
    """Noisy LibriMix (mix_both: mixture = sources + WHAM-style noise) — the
    reference's published noisy configuration
    (metrics/dprnn-spe/final_metrics_attention_noisy.json). The data layer is
    path-driven, so the same model/inferencer evaluates unchanged; *_imp is
    measured against the noisy input mixture."""
    csv = make_mini_librimix(str(tmp_path), n_mix=6, min_sec=1.0, max_sec=2.0,
                             noisy=True)
    assert "mix_both" in csv
    test_set = LibrimixSpe(csv_path=csv, segment=None)
    model = DPRNNSpeTasNet(**TINY, O=8, P=12, embeddings_size=8, num_spks=8,
                           fusion_type="att")
    z = np.zeros((1, SR), np.float32)
    path = _save_random_checkpoint(tmp_path, model, (z, z, np.array([SR], np.float32)))
    config = {"checkpoint_path": path, "test_savedir": str(tmp_path / "metrics_noisy"),
              "data": {"sample_rate": SR}, "metrics": ["si_sdr", "stoi"]}
    inf = InferencerSpe(model, config)
    final = inf.run(test_set, batch_size=2, n_buckets=2, bucket_multiple=4000)
    assert set(final) == {"si_sdr", "si_sdr_imp", "stoi", "stoi_imp"}
    assert np.isfinite(final["si_sdr"]) and np.isfinite(final["si_sdr_imp"])


def test_rawnet_inferencer_end_to_end(tmp_path):
    """InferencerRawNet (reference inferencer_rawnet.py:16-76) drives the full
    bucketed path: 8 kHz dataset references resampled to 16 kHz inside the
    eval collate, eval-mode BatchNorm, final_metrics schema."""
    from tss_dprnn_tpu.inference import InferencerRawNet
    from tss_dprnn_tpu.models import DPRNNRawNetTasNet

    csv = make_mini_librimix(str(tmp_path), n_mix=6, min_sec=1.0, max_sec=2.0)
    test_set = LibrimixSpe(csv_path=csv, segment=None)
    model = DPRNNRawNetTasNet(
        **TINY, embeddings_size=8, num_spks=8, fusion_type="att",
        rawnet_C=32, rawnet_scale=4, rawnet_sinc_stride=16,
    )
    z8, z16 = np.zeros((1, SR), np.float32), np.zeros((1, 2 * SR), np.float32)
    path = _save_random_checkpoint(tmp_path, model,
                                   (z8, z16, np.array([2 * SR], np.float32)))
    config = {"checkpoint_path": path, "test_savedir": str(tmp_path / "metrics_rn"),
              "data": {"sample_rate": SR}, "metrics": ["si_sdr", "stoi"]}
    inf = InferencerRawNet(model, config)
    final = inf.run(test_set, batch_size=2, n_buckets=2, bucket_multiple=4000)
    assert set(final) == {"si_sdr", "si_sdr_imp", "stoi", "stoi_imp"}
    assert np.isfinite(final["si_sdr"])
    saved = json.loads((tmp_path / "metrics_rn" / "final_metrics.json").read_text())
    assert saved["si_sdr"] == pytest.approx(final["si_sdr"])


def test_device_metrics_match_host_bss(tmp_path):
    """device_metrics lane (PIT reorder + SI-SDR + STOI on device) must
    reproduce the host lane's per-row CSV within the fp32 envelope."""
    import pandas as pd

    csv = make_mini_librimix(str(tmp_path), n_mix=6, min_sec=1.0, max_sec=2.5)
    test_set = Librimix(csv_path=csv, segment=None)
    model = DPRNNTasNet(**TINY)
    path = _save_random_checkpoint(tmp_path, model, (np.zeros((1, SR), np.float32),))
    frames = []
    for dev, sub in ((False, "host"), (True, "dev")):
        config = {"checkpoint_path": path, "test_savedir": str(tmp_path / sub),
                  "data": {"sample_rate": SR}, "metrics": ["si_sdr", "stoi"],
                  "device_metrics": dev}
        inf = Inferencer(model, config)
        inf.run(test_set, batch_size=3, n_buckets=2, bucket_multiple=4000)
        frames.append(pd.read_csv(tmp_path / sub / "all_metrics.csv", index_col=0))
    host, dev = frames
    for col in ("si_sdr", "input_si_sdr"):
        np.testing.assert_allclose(dev[col], host[col], atol=2e-3)
    for col in ("stoi", "input_stoi"):
        np.testing.assert_allclose(dev[col], host[col], atol=2e-3)


def test_device_metrics_match_host_spe(tmp_path):
    import pandas as pd

    csv = make_mini_librimix(str(tmp_path), n_mix=6, min_sec=1.0, max_sec=2.0)
    test_set = LibrimixSpe(csv_path=csv, segment=None)
    model = DPRNNSpeTasNet(**TINY, O=8, P=12, embeddings_size=8, num_spks=8,
                           fusion_type="att")
    z = np.zeros((1, SR), np.float32)
    path = _save_random_checkpoint(tmp_path, model, (z, z, np.array([SR], np.float32)))
    frames = []
    for dev, sub in ((False, "host_s"), (True, "dev_s")):
        config = {"checkpoint_path": path, "test_savedir": str(tmp_path / sub),
                  "data": {"sample_rate": SR}, "metrics": ["si_sdr", "stoi"],
                  "device_metrics": dev}
        inf = InferencerSpe(model, config)
        inf.run(test_set, batch_size=2, n_buckets=2, bucket_multiple=4000)
        frames.append(pd.read_csv(tmp_path / sub / "all_metrics.csv", index_col=0))
    host, dev = frames
    for col in ("si_sdr", "input_si_sdr", "stoi", "input_stoi"):
        np.testing.assert_allclose(dev[col], host[col], atol=2e-3)


def test_device_metrics_pesq_wire_matches_host(tmp_path):
    """With 'pesq' in metrics the separated audio crosses to the host as
    int16 PCM (+ per-row scale); PESQ on the decoded audio must match PESQ
    on the full-precision host-lane estimate to well under the metric's
    resolution (quantization sits at -96 dBFS)."""
    import pandas as pd

    csv = make_mini_librimix(str(tmp_path), n_mix=4, min_sec=1.0, max_sec=1.8)
    test_set = LibrimixSpe(csv_path=csv, segment=None)
    model = DPRNNSpeTasNet(**TINY, O=8, P=12, embeddings_size=8, num_spks=8,
                           fusion_type="att")
    z = np.zeros((1, SR), np.float32)
    path = _save_random_checkpoint(tmp_path, model, (z, z, np.array([SR], np.float32)))
    frames = []
    for dev, sub in ((False, "h_p"), (True, "d_p")):
        config = {"checkpoint_path": path, "test_savedir": str(tmp_path / sub),
                  "data": {"sample_rate": SR},
                  "metrics": ["si_sdr", "stoi", "pesq"], "device_metrics": dev}
        inf = InferencerSpe(model, config)
        inf.run(test_set, batch_size=2, n_buckets=2, bucket_multiple=4000)
        frames.append(pd.read_csv(tmp_path / sub / "all_metrics.csv", index_col=0))
    host, dev = frames
    np.testing.assert_allclose(dev["pesq"], host["pesq"], atol=5e-3)
    np.testing.assert_allclose(dev["input_pesq"], host["input_pesq"], atol=5e-3)


def test_device_pesq_full_triple_matches_host(tmp_path):
    """device_pesq: the ENTIRE metric triple runs on device (audio never
    crosses to host). Per-row CSV must match the host lane: si_sdr/stoi to
    the fp32 envelope, pesq to the documented 0.05-MOS device-chain gate."""
    import pandas as pd

    csv = make_mini_librimix(str(tmp_path), n_mix=4, min_sec=1.0, max_sec=1.8)
    test_set = LibrimixSpe(csv_path=csv, segment=None)
    model = DPRNNSpeTasNet(**TINY, O=8, P=12, embeddings_size=8, num_spks=8,
                           fusion_type="att")
    z = np.zeros((1, SR), np.float32)
    path = _save_random_checkpoint(tmp_path, model, (z, z, np.array([SR], np.float32)))
    frames = []
    for cfg_extra, sub in (({}, "h_t"), ({"device_pesq": True}, "d_t")):
        config = {"checkpoint_path": path, "test_savedir": str(tmp_path / sub),
                  "data": {"sample_rate": SR},
                  "metrics": ["si_sdr", "stoi", "pesq"], **cfg_extra}
        inf = InferencerSpe(model, config)
        if cfg_extra:
            assert not inf._need_est_on_host()  # audio stays on device
        inf.run(test_set, batch_size=2, n_buckets=2, bucket_multiple=4000)
        frames.append(pd.read_csv(tmp_path / sub / "all_metrics.csv", index_col=0))
    host, dev = frames
    for col in ("si_sdr", "input_si_sdr", "stoi", "input_stoi"):
        np.testing.assert_allclose(dev[col], host[col], atol=2e-3)
    for col in ("pesq", "input_pesq"):
        np.testing.assert_allclose(dev[col], host[col], atol=0.05)


def test_device_pesq_wideband_16k_matches_host(tmp_path):
    """A 16 kHz config must score WIDEBAND PESQ on the device lane, like the
    host path (ops/metrics.py pesq_score picks 'wb' at sample_rate >= 16000).
    Round-4 advisor finding: the device lane hardcoded narrowband — a whole
    MOS-scale divergence on 16 kHz data."""
    import pandas as pd

    sr16 = 16000
    csv = make_mini_librimix(str(tmp_path), n_mix=3, min_sec=1.0, max_sec=1.5,
                             sample_rate=sr16)
    test_set = LibrimixSpe(csv_path=csv, segment=None, sample_rate=sr16)
    model = DPRNNSpeTasNet(**TINY, O=8, P=12, embeddings_size=8, num_spks=8,
                           fusion_type="att")
    z = np.zeros((1, sr16), np.float32)
    path = _save_random_checkpoint(tmp_path, model, (z, z, np.array([sr16], np.float32)))
    frames = []
    for cfg_extra, sub in (({}, "h16"), ({"device_pesq": True}, "d16")):
        config = {"checkpoint_path": path, "test_savedir": str(tmp_path / sub),
                  "data": {"sample_rate": sr16},
                  "metrics": ["si_sdr", "pesq"], **cfg_extra}
        inf = InferencerSpe(model, config)
        assert inf._pesq_mode == "wb"
        inf.run(test_set, batch_size=3, n_buckets=1, bucket_multiple=4000)
        frames.append(pd.read_csv(tmp_path / sub / "all_metrics.csv", index_col=0))
    host, dev = frames
    # Per-row 0.2 / mean 0.1 (vs the usual 0.05 gate): the synthetic sine
    # fixtures are quasi-periodic, so the constant-delay estimators can
    # resolve a near-tied envelope-correlation peak to different lags (host
    # picked +1287, device -1 on one row — the signals are sample-aligned,
    # so both are admissible P.862 alignments; ~0.15 MOS apart). The nb-vs-wb
    # mode gap this test exists to catch is 0.29-1.01 MOS on these rows.
    np.testing.assert_allclose(dev["pesq"], host["pesq"], atol=0.2)
    assert np.mean(np.abs(dev["pesq"] - host["pesq"])) < 0.1
    np.testing.assert_allclose(dev["input_pesq"], host["input_pesq"], atol=0.2)
    assert np.mean(np.abs(dev["input_pesq"] - host["input_pesq"])) < 0.1


def test_encode_wire_peak_ignores_padding_garbage():
    """The int16 wire scale must come from the VALID region only: model
    output at t >= lengths is garbage-by-contract, and a large padding
    artifact must not coarsen the valid samples' quantization (round-4
    advisor finding). Padding must also decode to exactly zero."""

    class Shim:
        _need_est_on_host = staticmethod(lambda: True)
        _encode_wire = Inferencer._encode_wire
        _decode_wire = staticmethod(Inferencer._decode_wire)

    rng = np.random.default_rng(0)
    B, n, T = 2, 2, 4000
    lengths = np.array([3000, 1500], np.int32)
    est = rng.uniform(-0.5, 0.5, (B, n, T)).astype(np.float32)
    est[0, :, 3000:] = 100.0  # padding artifact 200x the valid peak
    est[1, :, 1500:] = -77.0
    shim = Shim()
    import jax.numpy as jnp

    wire = Inferencer._encode_wire(shim, jnp.asarray(est), jnp.asarray(lengths))
    dec = Inferencer._decode_wire(wire)
    for b in range(B):
        l = int(lengths[b])
        peak = np.abs(est[b, :, :l]).max()
        np.testing.assert_allclose(dec[b, :, :l], est[b, :, :l],
                                   atol=1.2 * peak / 32767)
        assert np.all(dec[b, :, l:] == 0.0)


def test_sharded_device_metrics_equal_single_device(tmp_path):
    """Round-4 VERDICT item 3: the device-metric lane (PIT + SI-SDR + STOI +
    full device PESQ in the jitted graph) composed WITH mesh sharding must
    reproduce the single-device rows — including NaN short-row semantics
    (STOI NaNs under ~0.4 s at 8 kHz) and pad_to_batch filler drops. The
    one-hot compaction matmuls and per-row lax.scan run under GSPMD batch
    sharding here, exactly the composition the multi-chip eval CLI ships."""
    import pandas as pd

    from tss_dprnn_tpu.parallel import make_mesh

    # min_sec 0.3: some rows are long enough for PESQ (>= 0.25 s) but too
    # short for STOI's 30-frame minimum -> NaN rows must survive sharding
    csv = make_mini_librimix(str(tmp_path), n_mix=6, min_sec=0.3, max_sec=2.0)
    test_set = LibrimixSpe(csv_path=csv, segment=None)
    model = DPRNNSpeTasNet(**TINY, O=8, P=12, embeddings_size=8, num_spks=8,
                           fusion_type="att")
    z = np.zeros((1, SR), np.float32)
    path = _save_random_checkpoint(tmp_path, model, (z, z, np.array([SR], np.float32)))

    def run(savedir, mesh):
        config = {"checkpoint_path": path, "test_savedir": str(tmp_path / savedir),
                  "data": {"sample_rate": SR},
                  "metrics": ["si_sdr", "stoi", "pesq"],
                  "device_metrics": True, "device_pesq": True}
        inf = InferencerSpe(model, config, mesh=mesh)
        assert not inf._need_est_on_host()  # audio stays on device
        # batch 4 over a 4-way data axis; 6 utterances -> ragged tails padded
        return inf.run(test_set, batch_size=4, n_buckets=2, bucket_multiple=2000)

    run("dm_single", None)
    run("dm_sharded", make_mesh(data=4))
    df_s = pd.read_csv(tmp_path / "dm_single" / "all_metrics.csv", index_col=0)
    df_m = pd.read_csv(tmp_path / "dm_sharded" / "all_metrics.csv", index_col=0)
    assert len(df_m) == len(df_s) == 6  # filler rows dropped
    assert df_s["stoi"].isna().any(), "fixture should include short STOI-NaN rows"
    for col in ("si_sdr", "input_si_sdr", "stoi", "input_stoi"):
        np.testing.assert_array_equal(np.isnan(df_m[col]), np.isnan(df_s[col]))
        np.testing.assert_allclose(df_m[col], df_s[col], atol=5e-3)
    for col in ("pesq", "input_pesq"):
        np.testing.assert_array_equal(np.isnan(df_m[col]), np.isnan(df_s[col]))
        np.testing.assert_allclose(df_m[col], df_s[col], atol=0.02)
