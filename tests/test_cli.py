"""End-to-end CLI: generate manifests -> train (tiny) -> test, through the
real entry points with a YAML config — the reference's scripts/ workflow."""

import json

import numpy as np
import yaml

from tests.fixtures import make_mini_librimix
from tss_dprnn_tpu.cli import generate_manifests, test as test_cli, train as train_cli

TINY_MODEL = dict(
    target="dprnn_spe_tasnet", input_size=8, feature_size=12, hidden_size=10,
    chunk_length=40, kernel_size=2, hop_length=20, n_repeats=1, norm_type="ln",
    O=8, P=12, embeddings_size=8, num_spks=8, fusion_type="att",
)


def test_cli_full_workflow(tmp_path):
    csv = make_mini_librimix(str(tmp_path / "wavs"), n_mix=8, min_sec=1.0, max_sec=1.5)

    # 1) freeze manifests
    gen_cfg = dict(
        dataset_type="librimix_spe", sample_rate=8000, n_src=2, segment=0.5, seed=0,
        train_path=csv, eval_path=csv, test_path=csv,
        train_out=str(tmp_path / "m/train.json"),
        eval_out=str(tmp_path / "m/eval.json"),
        test_out=str(tmp_path / "m/test.json"),
    )
    p = tmp_path / "gen.yaml"
    p.write_text(yaml.safe_dump(gen_cfg))
    generate_manifests.main(["--config", str(p)])
    assert (tmp_path / "m/test.json").exists()

    # 2) train 1 epoch
    train_cfg = dict(
        name="t", is_test=False,
        data=dict(
            use_generated_train=str(tmp_path / "m/train.json"),
            use_generated_eval=str(tmp_path / "m/eval.json"),
            batch_size=4, sample_rate=8000, seed=0,
        ),
        model=TINY_MODEL,
        optimizer=dict(lr=1e-3, weight_decay=1e-5),
        lr_scheduler=dict(patience=2, factor=0.5, decay_rate=None),
        logs=dict(metadata=dict(ids=[0])),
        print_freq=100, clip_norm=5, cur_epoch=0, epochs=1, early_stop=10,
        ce_gamma=0.5, checkpoint_path=None, n_checkpoints=5,
        new_checkpoints_path=str(tmp_path / "chkpts"),
    )
    p = tmp_path / "train.yaml"
    p.write_text(yaml.safe_dump(train_cfg))
    train_cli.main(["--config", str(p), "--mode", "tss_spe"])
    ckpts = list((tmp_path / "chkpts").iterdir())
    assert ckpts, "training produced no checkpoints"
    best = [c for c in ckpts if "best" in c.name][0]

    # 3) evaluate with the trained checkpoint
    test_cfg = dict(
        name="e", is_test=True,
        data=dict(use_generated_test=str(tmp_path / "m/test.json"), sample_rate=8000),
        model=TINY_MODEL,
        checkpoint_path=str(best),
        test_savedir=str(tmp_path / "metrics"),
        metrics=["si_sdr", "stoi"],
    )
    p = tmp_path / "test.yaml"
    p.write_text(yaml.safe_dump(test_cfg))
    final = test_cli.main(["--config", str(p), "--mode", "tss_spe",
                           "--batch-size", "4", "--n-buckets", "2"])
    assert np.isfinite(final["si_sdr"])
    saved = json.loads((tmp_path / "metrics" / "final_metrics.json").read_text())
    assert set(saved) == {"si_sdr", "si_sdr_imp", "stoi", "stoi_imp"}


def test_cli_workflow_3mix_noisy(tmp_path):
    """The reference's two extra published eval conditions, combined, through
    the full CLI workflow at toy size: a Libri3Mix-style three-speaker corpus
    (final_metrics_attention_libri3mix.json) whose mixtures also carry a
    mix_both noise floor (final_metrics_attention_noisy.json). Exercises the
    n_src=3 spe manifest (target pick among 3 speakers) end to end —
    training, bucketed eval, and the metrics schema."""
    csv = make_mini_librimix(str(tmp_path / "wavs"), n_mix=8, min_sec=1.0,
                             max_sec=1.5, n_src=3, noisy=True)
    assert "mix_both" in csv or "mix_both" in open(csv).read()

    gen_cfg = dict(
        dataset_type="librimix_spe", sample_rate=8000, n_src=3, segment=0.5, seed=0,
        train_path=csv, test_path=csv,
        train_out=str(tmp_path / "m/train.json"),
        test_out=str(tmp_path / "m/test.json"),
    )
    p = tmp_path / "gen.yaml"
    p.write_text(yaml.safe_dump(gen_cfg))
    generate_manifests.main(["--config", str(p)])
    entries = json.loads((tmp_path / "m/train.json").read_text())["entries"]
    assert all(len(e["source_paths"]) == 3 for e in entries)

    train_cfg = dict(
        name="t3", is_test=False,
        data=dict(use_generated_train=str(tmp_path / "m/train.json"),
                  use_generated_eval=str(tmp_path / "m/train.json"),
                  batch_size=4, sample_rate=8000, seed=0),
        model=TINY_MODEL,
        optimizer=dict(lr=1e-3, weight_decay=1e-5),
        lr_scheduler=dict(patience=2, factor=0.5, decay_rate=None),
        logs=dict(metadata=dict(ids=[])),
        print_freq=100, clip_norm=5, cur_epoch=0, epochs=1, early_stop=10,
        ce_gamma=0.5, checkpoint_path=None, n_checkpoints=5,
        new_checkpoints_path=str(tmp_path / "chkpts"),
    )
    p = tmp_path / "train.yaml"
    p.write_text(yaml.safe_dump(train_cfg))
    train_cli.main(["--config", str(p), "--mode", "tss_spe"])
    best = [c for c in (tmp_path / "chkpts").iterdir() if "best" in c.name][0]

    test_cfg = dict(
        name="e3", is_test=True,
        data=dict(use_generated_test=str(tmp_path / "m/test.json"), sample_rate=8000),
        model=TINY_MODEL, checkpoint_path=str(best),
        test_savedir=str(tmp_path / "metrics"), metrics=["si_sdr"],
    )
    p = tmp_path / "test.yaml"
    p.write_text(yaml.safe_dump(test_cfg))
    final = test_cli.main(["--config", str(p), "--mode", "tss_spe",
                           "--batch-size", "4", "--n-buckets", "2"])
    assert np.isfinite(final["si_sdr"]) and np.isfinite(final["si_sdr_imp"])


def test_cli_test_data_parallel(tmp_path):
    """test CLI --data-parallel N: sharded eval over an N-device mesh gives
    the same final metrics as the single-chip path."""
    csv = make_mini_librimix(str(tmp_path / "wavs"), n_mix=6, min_sec=1.0, max_sec=1.5)
    gen_cfg = dict(
        dataset_type="librimix_spe", sample_rate=8000, n_src=2, segment=0.5, seed=0,
        test_path=csv, test_out=str(tmp_path / "m/test.json"),
    )
    p = tmp_path / "gen.yaml"
    p.write_text(yaml.safe_dump(gen_cfg))
    generate_manifests.main(["--config", str(p)])

    import jax

    from tss_dprnn_tpu.models.registry import build_model
    from tss_dprnn_tpu.utils.checkpoint import CheckpointManager

    model = build_model(dict(TINY_MODEL))
    z = np.zeros((1, 8000), np.float32)
    variables = model.init(jax.random.PRNGKey(0), z, z, np.array([8000.0], np.float32))
    ck = CheckpointManager(str(tmp_path / "chkpts"))
    import jax.numpy as jnp  # noqa: F401

    best = ck.save(1, {"epoch": 1,
                       "params": jax.tree.map(np.asarray, variables["params"]),
                       "batch_stats": jax.tree.map(np.asarray,
                                                   variables.get("batch_stats", {}))},
                   best=True)

    def run(savedir, extra):
        cfg = dict(
            name="e", is_test=True,
            data=dict(use_generated_test=str(tmp_path / "m/test.json"), sample_rate=8000),
            model=TINY_MODEL, checkpoint_path=str(best),
            test_savedir=str(tmp_path / savedir), metrics=["si_sdr"],
        )
        pp = tmp_path / f"{savedir}.yaml"
        pp.write_text(yaml.safe_dump(cfg))
        return test_cli.main(["--config", str(pp), "--mode", "tss_spe",
                              "--batch-size", "4", "--n-buckets", "2"] + extra)

    single = run("m1", [])
    sharded = run("m4", ["--data-parallel", "4"])
    assert abs(single["si_sdr"] - sharded["si_sdr"]) < 5e-4


def test_cli_separate_single_file(tmp_path):
    """cli.separate: one-WAV serving entry point — BSS writes per-source
    files, tss_spe writes one target file; the windowed path matches shapes."""
    import jax

    from tss_dprnn_tpu.cli import separate as separate_cli
    from tss_dprnn_tpu.data import wav
    from tss_dprnn_tpu.models.registry import build_model
    from tss_dprnn_tpu.utils.checkpoint import CheckpointManager, to_pure_tree

    sr = 8000
    rng = np.random.default_rng(0)
    mix = (0.3 * rng.standard_normal(int(2.2 * sr))).astype(np.float32)
    ref = (0.3 * rng.standard_normal(int(1.0 * sr))).astype(np.float32)
    wav.write(str(tmp_path / "mix.wav"), mix, sr)
    wav.write(str(tmp_path / "ref.wav"), ref, sr)

    def save_ckpt(model_cfg, example, sub):
        model = build_model(model_cfg)
        variables = model.init(jax.random.PRNGKey(0), *example)
        ck = CheckpointManager(str(tmp_path / sub))
        return ck.save(1, {"epoch": 1, "params": to_pure_tree(variables["params"]),
                           "batch_stats": to_pure_tree(variables.get("batch_stats", {}))},
                       best=True)

    z = np.zeros((1, sr), np.float32)

    # --- BSS, full-length forward
    bss_model = {k: v for k, v in TINY_MODEL.items()
                 if k not in ("O", "P", "embeddings_size", "num_spks", "fusion_type")}
    bss_model["target"] = "dprnn_tasnet"
    ckpt = save_ckpt(dict(bss_model), (z,), "ck_bss")
    cfg = dict(name="s", is_test=True, data=dict(sample_rate=sr),
               model=bss_model, checkpoint_path=ckpt)
    p = tmp_path / "sep_bss.yaml"
    p.write_text(yaml.safe_dump(cfg))
    separate_cli.main(["--config", str(p), "--mode", "bss",
                       "--mix", str(tmp_path / "mix.wav"),
                       "--out", str(tmp_path / "out.wav")])
    for j in (1, 2):
        est, rate = wav.read(str(tmp_path / f"out_s{j}.wav"))
        assert rate == sr and len(est) == len(mix) and np.isfinite(est).all()

    # --- tss_spe, windowed path
    ckpt = save_ckpt(dict(TINY_MODEL), (z, ref[None], np.array([float(len(ref))], np.float32)),
                     "ck_spe")
    cfg = dict(name="s2", is_test=True, data=dict(sample_rate=sr),
               model=dict(TINY_MODEL), checkpoint_path=ckpt)
    p = tmp_path / "sep_spe.yaml"
    p.write_text(yaml.safe_dump(cfg))
    separate_cli.main(["--config", str(p), "--mode", "tss_spe",
                       "--mix", str(tmp_path / "mix.wav"),
                       "--ref", str(tmp_path / "ref.wav"),
                       "--out", str(tmp_path / "target.wav"),
                       "--window-secs", "1.0", "--batch", "2"])
    est, rate = wav.read(str(tmp_path / "target.wav"))
    assert rate == sr and len(est) == len(mix) and np.isfinite(est).all()


def test_cli_separate_rawnet_ref_resample(tmp_path):
    """cli.separate --mode tss_rawnet: the speaker reference arrives at the
    mixture rate (8 kHz) and must be polyphase-resampled to the RawNet3
    front-end's 16 kHz before the forward (reference feeds RawNet 16 kHz
    audio, src/models/dprnn_rawnet.py)."""
    import jax

    from tss_dprnn_tpu.cli import separate as separate_cli
    from tss_dprnn_tpu.data import wav
    from tss_dprnn_tpu.models.registry import build_model
    from tss_dprnn_tpu.utils.checkpoint import CheckpointManager, to_pure_tree

    sr = 8000
    rng = np.random.default_rng(0)
    mix = (0.3 * rng.standard_normal(int(1.5 * sr))).astype(np.float32)
    ref = (0.3 * rng.standard_normal(int(1.0 * sr))).astype(np.float32)  # 8 kHz!
    wav.write(str(tmp_path / "mix.wav"), mix, sr)
    wav.write(str(tmp_path / "ref.wav"), ref, sr)

    model_cfg = dict(
        target="dprnn_rawnet_tasnet", input_size=8, feature_size=12,
        hidden_size=10, chunk_length=40, kernel_size=2, hop_length=20,
        n_repeats=1, norm_type="ln", embeddings_size=8, num_spks=8,
        fusion_type="att", rawnet_C=32, rawnet_scale=4, rawnet_sinc_stride=16,
    )
    model = build_model(dict(model_cfg))
    z8 = np.zeros((1, sr), np.float32)
    z16 = np.zeros((1, 2 * sr), np.float32)
    variables = model.init(jax.random.PRNGKey(0), z8, z16)
    ck = CheckpointManager(str(tmp_path / "ck"))
    ckpt = ck.save(1, {"epoch": 1, "params": to_pure_tree(variables["params"]),
                       "batch_stats": to_pure_tree(variables.get("batch_stats", {}))},
                   best=True)

    cfg = dict(name="sr", is_test=True, data=dict(sample_rate=sr),
               model=model_cfg, checkpoint_path=ckpt)
    p = tmp_path / "sep_rawnet.yaml"
    p.write_text(yaml.safe_dump(cfg))
    separate_cli.main(["--config", str(p), "--mode", "tss_rawnet",
                       "--mix", str(tmp_path / "mix.wav"),
                       "--ref", str(tmp_path / "ref.wav"),
                       "--out", str(tmp_path / "target.wav")])
    est, rate = wav.read(str(tmp_path / "target.wav"))
    assert rate == sr and len(est) == len(mix) and np.isfinite(est).all()


def test_dataset_for_test_split_ignores_segment(tmp_path):
    """The test split must evaluate FULL-LENGTH utterances even when the
    config carries a training segment (reference freezes its test set with
    segment=None, generate_datasets.py:53); a reused training YAML with
    data.segment set must not silently crop the metrics."""
    from tss_dprnn_tpu.cli.common import dataset_for

    csv = make_mini_librimix(str(tmp_path / "wavs"), n_mix=4, min_sec=1.0, max_sec=1.5)
    config = {"data": {"train_path": csv, "test_path": csv, "segment": 0.5,
                       "sample_rate": 8000}}
    train_set = dataset_for(config, "train", spe=False)
    test_set = dataset_for(config, "test", spe=False)
    assert train_set.segment == 0.5
    assert test_set.segment is None
    assert max(test_set.lengths()) > max(train_set.lengths())
