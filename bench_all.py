"""Per-variant benchmark sweep: all 8 reference model variants
(BASELINE.json configs; reference README.md:36-45 variant table).

For each variant, measures jitted batched inference throughput in separated
audio-seconds per wall-clock second per chip (same metric as bench.py, target
>=50x realtime) on 10-second 8 kHz utterances, on the fast path
(bf16 + fused Pallas LSTM scans; RawNet keeps its sinc front-end in fp32).
``--parity`` instead benches the fp32 XLA parity path (the numerical
reference: the exact graph the torch-oracle parity tests run). ``--f32``
benches fp32 + Pallas — full-precision serving without the XLA path's
hoisted [T', 2, rows, 4H] input projection, so the batch is not capped at 8.
``--variant NAME`` restricts the sweep.

Prints one JSON line per variant and writes/updates the BENCH_ALL.md table.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from __graft_entry__ import FLAGSHIP

SR = 8000
SECS = 10.0
TRAIN_SECS = 3.0

# backbone-only hparams for the BSS variant (reference config_bss.yaml —
# same DPRNN trunk, no speaker branch)
BSS = {k: FLAGSHIP[k] for k in (
    "input_size", "feature_size", "hidden_size", "chunk_length", "kernel_size",
    "hop_length", "n_repeats", "bidirectional", "norm_type", "activation_type",
    "dropout",
)}
SPE_FUSIONS = ("add", "att", "cat", "mul", "film")


def build(variant: str, bf16: bool, **extra):
    import jax.numpy as jnp

    from tss_dprnn_tpu.models import (
        DPRNNRawNetTasNet,
        DPRNNSpeIRATasNet,
        DPRNNSpeTasNet,
        DPRNNTasNet,
    )

    dtype = jnp.bfloat16 if bf16 else None
    if variant == "bss":
        return DPRNNTasNet(**BSS, dtype=dtype, **extra), "bss"
    if variant.startswith("spe_"):
        fusion = variant.split("_", 1)[1]
        return (DPRNNSpeTasNet(**{**FLAGSHIP, "fusion_type": fusion}, dtype=dtype,
                               **extra), "spe")
    if variant == "ira":
        return DPRNNSpeIRATasNet(**FLAGSHIP, dtype=dtype, **extra), "spe"
    if variant == "rawnet":
        # RawNet3 speaker branch: 16 kHz raw-wave sinc front-end; embeddings 256
        # (reference config: embeddings_size 256 for dprnn_rawnet_tasnet). The
        # sinc filterbank + res2net stats pooling stay fp32 for fidelity; the
        # DPRNN trunk still uses the fast LSTM path.
        kw = {**FLAGSHIP, "embeddings_size": 256}
        kw.pop("fusion_type", None)
        return (DPRNNRawNetTasNet(**kw, fusion_type="att", dtype=dtype, **extra),
                "rawnet")
    raise SystemExit(f"unknown variant {variant!r}")


PATHS = {
    "fast": ("fast(bf16+pallas)", True, "pallas"),
    "parity": ("parity(fp32+xla)", False, "xla"),
    "f32": ("f32(fp32+pallas)", False, "pallas"),
}


def bench_variant(variant: str, path: str, batch: int, masked: bool = False) -> dict:
    """``masked``: run the bucketed-eval graph (lengths threaded through the
    masked norms/scans/fusion — the shape Inferencer.run executes). Was 160x
    slower than the unmasked graph before the masked_flip/nearest-upsample
    scalar-gather fixes (2026-08-18); this lane keeps it measured."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    from tss_dprnn_tpu.ops import rnn as rnn_ops

    label, bf16, backend = PATHS[path]
    extra = {}
    if variant == "ira" and "--ira-share" in sys.argv:
        extra["share_blocks"] = int(sys.argv[sys.argv.index("--ira-share") + 1])
    model, kind = build(variant, bf16, **extra)
    B, T = batch, int(SECS * SR)
    rng = np.random.default_rng(0)
    mix = rng.standard_normal((B, T)).astype(np.float32)
    args = [mix]
    if kind == "spe":
        aux = rng.standard_normal((B, T)).astype(np.float32)
        args += [aux, np.full((B,), float(T), np.float32)]
    elif kind == "rawnet":
        Ta = 2 * T  # 16 kHz reference waveform
        aux = rng.standard_normal((B, Ta)).astype(np.float32)
        args += [aux, np.full((B,), float(Ta), np.float32)]

    variables = model.init(jax.random.PRNGKey(0), *[a[:1] for a in args])
    lengths = np.full((B,), T, np.int32) if masked else None

    @jax.jit
    def fwd(*a):
        # bf16+pallas lanes run time-major like the shipped Inferencer
        # (round-5 measured win); fp32 lanes stay batch-major
        with rnn_ops.lstm_backend(backend), rnn_ops.lstm_time_major(bf16 and backend == "pallas"):
            if masked:
                out = model.apply(variables, *a, lengths=lengths)
            else:
                out = model.apply(variables, *a)
        return out[0] if isinstance(out, tuple) else out

    dev = [jax.device_put(a) for a in args]
    fwd(*dev).block_until_ready()  # compile
    fwd(*dev).block_until_ready()  # warm (ROUND_NOTES: warm TWO, then time)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(*dev)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    realtime = iters * B * SECS / dt
    return {
        "variant": variant,
        "path": ("masked-" if masked else "") + label,
        "batch": B,
        "metric": "separated_audio_sec_per_sec_per_chip",
        "value": round(realtime, 2),
        "unit": "audio-sec/sec",
        "vs_baseline": round(realtime / 50.0, 3),
    }


def bench_train_variant(variant: str, path: str, batch: int) -> dict:
    """One full jitted train step (loss + grads + clip + Adam) at the
    reference's training shape (3 s crops), fast path remat=False (the fused
    Pallas backward's residuals fit without it — README training section)."""
    import time as _time

    import jax  # noqa: F401
    import numpy as np

    from tss_dprnn_tpu.training import Trainer, TrainerRawNet, TrainerSpe

    label, bf16, backend = PATHS[path]
    # IRA runs the DPRNN stack twice per forward — both passes un-remat blow
    # HBM temp even at B=5 x 3 s (compile fails), so pass 2 runs full-residual
    # and pass 1 keeps fractional remat. k=3 measured best on-chip at the
    # reference shape: 255 ms vs 270 all-remat vs OOM at k=0
    # (scripts/perf/ira_remat_sweep.py, 2026-08-19). The single-pass variants
    # fit remat-free on the fast path.
    remat = variant == "ira" or not (bf16 and backend == "pallas")
    extra = {"pass1_remat": 3} if variant == "ira" and bf16 and backend == "pallas" else {}
    if variant == "ira" and "--ira-share" in sys.argv:
        # shared-early-blocks lane A/B (DPRNNSpeIRA.share_blocks): pass 2
        # reuses pass-1 activations of the first k blocks
        extra["share_blocks"] = int(sys.argv[sys.argv.index("--ira-share") + 1])
    model, kind = build(variant, bf16, remat=remat, **extra)
    B, T = batch, int(TRAIN_SECS * SR)  # 3 s @ 8 kHz, the reference's crop
    rng = np.random.default_rng(0)
    batch_d = {"mix": rng.standard_normal((B, T)).astype(np.float32)}
    config = {
        "optimizer": {"lr": 5e-4, "weight_decay": 1e-5},
        "lr_scheduler": {"patience": 2, "factor": 0.5},
        "clip_norm": 5, "ce_gamma": 0.5, "lstm_backend": backend,
        "new_checkpoints_path": "/tmp/bench_all_chkpts",
        "data": {"sample_rate": 8000},
        # schedule_masks pragma (--sched): all-ones masks, scans unmasked —
        # value-neutral, measured ~4% faster step (trainer.py)
        "schedule_masks": "--sched" in sys.argv,
    }
    if not bf16 and backend == "xla":
        # fp32 XLA full-batch needs the segment-checkpointed residuals
        config["lstm_save_every"] = 10
    if kind == "bss":
        batch_d["sources"] = rng.standard_normal((B, 2, T)).astype(np.float32)
        trainer = Trainer(model, config)
    else:
        Ta = 2 * T if kind == "rawnet" else T
        batch_d.update(
            target=rng.standard_normal((B, T)).astype(np.float32),
            reference=rng.standard_normal((B, Ta)).astype(np.float32),
            ref_len=np.full((B,), float(Ta), np.float32),
            spk_idx=np.arange(B, dtype=np.int32) % FLAGSHIP["num_spks"],
        )
        trainer = (TrainerRawNet if kind == "rawnet" else TrainerSpe)(model, config)
    trainer._ensure_state(batch_d)
    from tss_dprnn_tpu.parallel import shard_batch

    sharded = shard_batch(batch_d, trainer.mesh)
    state = trainer.state
    for _ in range(2):  # compile + warm
        state, loss, aux = trainer._train_step(state, sharded)
    _ = float(loss)
    iters = 10
    t0 = _time.perf_counter()
    for _ in range(iters):
        state, loss, aux = trainer._train_step(state, sharded)
    _ = float(loss)
    dt = (_time.perf_counter() - t0) / iters
    return {
        "variant": variant,
        "path": f"train-{label}",
        "batch": B,
        "metric": "train_step_ms",
        "value": round(dt * 1e3, 1),
        "unit": "ms/step",
        "vs_baseline": round((B * TRAIN_SECS / dt) / 50.0, 3),  # trained audio-sec/sec / 50
    }


VARIANTS = ["bss"] + [f"spe_{f}" for f in SPE_FUSIONS] + ["ira", "rawnet"]


def main():
    from bench import _enable_compile_cache

    try:
        from tss_dprnn_tpu.utils.tpu_jobs import reap_tpu_jobs

        reap_tpu_jobs(log=lambda m: print(m, file=sys.stderr, flush=True))
    except Exception as e:  # reaping is protective, never bench-fatal
        print(f"# tpu job reap skipped: {e}", file=sys.stderr, flush=True)
    _enable_compile_cache()
    path = "parity" if "--parity" in sys.argv else ("f32" if "--f32" in sys.argv else "fast")
    train = "--train" in sys.argv
    masked = "--masked" in sys.argv  # bucketed-eval graph (lengths threaded)
    only = sys.argv[sys.argv.index("--variant") + 1] if "--variant" in sys.argv else None
    # masked lane runs at the same saturated batches as unmasked since the
    # mask-aware no-stack kernel (round 3): no [2,B,T,F] stack, no
    # masked_flip permutation buffers
    default_batch = 5 if train else 32
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else default_batch
    rows = []
    for v in VARIANTS:
        if only and v != only:
            continue
        if train:
            row = bench_train_variant(v, path, batch)
            rows.append(row)
            print(json.dumps(row), flush=True)
            continue
        # IRA runs two full DPRNN passes; RawNet adds the 16 kHz sinc branch —
        # smaller batches keep HBM in bounds at 10 s utterances. RawNet's cap
        # moved //4 -> //2 after a B=16 probe measured +5-6% on both the
        # masked (368.9 -> 390.4) and unmasked (342 -> 359.8) fast lanes
        # (2026-08-20); ira is saturated at //2 (B=24 == B=16 within noise).
        b = {"ira": max(batch // 2, 1), "rawnet": max(batch // 2, 1)}.get(v, batch)
        if path == "parity":
            # fp32 XLA path precomputes the scans' input projections
            # ([T', 2, rows, 4H] fp32 ~ 0.65 GB per batch element at 10 s):
            # B=32 wants 21 GB > 16 GB HBM
            b = min(b, 8)
        elif path == "f32":
            # fp32 pallas streams the projection inside the kernel; HBM holds
            # the fp32 activations fine at B=16 (B=32 10 s is marginal)
            b = min(b, 16)
        row = bench_variant(v, path, b, masked=masked)
        rows.append(row)
        print(json.dumps(row), flush=True)
    if not only and rows:
        label = ("train " if train else "") + ("masked " if masked else "") \
            + ("sched " if train and "--sched" in sys.argv else "") + PATHS[path][0]
        write_table(rows, label, train=train)


def write_table(rows, label, train=False):
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_ALL.md")
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    value_col = "ms/step" if train else "audio-sec/sec/chip"
    lines = [
        f"\n## {label} — {stamp}\n",
        f"| variant | batch | {value_col} | x realtime vs 50x target |",
        "|---|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['variant']} | {r['batch']} | {r['value']} | {r['vs_baseline']}x |")
    header = (
        "# Per-variant benchmark sweep\n\n"
        "All 8 BASELINE.json variants, jitted batched inference on 10 s 8 kHz\n"
        "utterances, one chip. Generated by `python bench_all.py [--parity]`.\n"
    )
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(header)
    with open(path, "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
