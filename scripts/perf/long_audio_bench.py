"""Long-audio streaming lane: throughput + peak HBM of the constant-memory
windowed separator (inference/long_audio.py) on a minutes-long input.

The bucketed eval lanes (bench.py / bench_all.py) measure test-split-shaped
utterances (<= ~15 s); production inputs of minutes-to-hours instead stream
through ONE fixed-window jitted graph with crossfade stitching — this lane
puts a number on that capability (SURVEY.md §5.7; the reference has no
long-input story at all — its eval loop is one full-length eager forward per
utterance, src/inferencers/inferencer.py:48-78, which at 10 minutes would
build a ~14 GB activation graph).

    python scripts/perf/long_audio_bench.py [--minutes 10] [--window-sec 8]
        [--batch 16] [--f32]

Prints one JSON line {audio_sec_per_sec, peak_hbm_gb, ...} and appends a
dated row to BENCH_ALL.md (--no-doc to skip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SR = 8000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--window-sec", type=float, default=8.0)
    ap.add_argument("--hop-sec", type=float, default=None,
                    help="window hop (default window/2 = 50%% overlap)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--f32", action="store_true", help="fp32 lane (default bf16+pallas)")
    ap.add_argument("--no-doc", action="store_true")
    args = ap.parse_args()

    from tss_dprnn_tpu.utils.tpu_jobs import reap_tpu_jobs

    reap_tpu_jobs(log=lambda m: print(m, file=sys.stderr, flush=True))

    from tss_dprnn_tpu.utils.compile_cache import enable as _cc

    _cc()

    import jax

    from bench_all import BSS
    from tss_dprnn_tpu.inference.long_audio import bss_windowed
    from tss_dprnn_tpu.models import DPRNNTasNet

    bf16 = not args.f32
    if bf16:
        os.environ.setdefault("TSS_TM", "1")  # shipped fast-lane layout
        import jax.numpy as jnp

        model = DPRNNTasNet(**BSS, dtype=jnp.bfloat16)
    else:
        model = DPRNNTasNet(**BSS)

    W = int(args.window_sec * SR)
    hop = int(args.hop_sec * SR) if args.hop_sec else None
    rng = np.random.default_rng(0)
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, W), np.float32))
    sep = bss_windowed(model, variables, window=W, hop=hop, batch_size=args.batch,
                       lstm_backend="xla" if args.f32 else "pallas")

    # two-tone synthetic mixture with slow AM so stitching has real structure
    T = int(args.minutes * 60 * SR)
    t = np.arange(T) / SR
    mix = (np.sin(2 * np.pi * 220 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 0.3 * t))
           + np.sin(2 * np.pi * 541 * t) * (0.6 + 0.4 * np.cos(2 * np.pi * 0.2 * t))
           ).astype(np.float32) * 0.3
    mix += 0.01 * rng.standard_normal(T).astype(np.float32)

    # warmup: compile the single fixed-window graph on a short input
    _ = sep(mix[: W * 2])

    dev = jax.devices()[0]
    t0 = time.perf_counter()
    est = sep(mix)
    wall = time.perf_counter() - t0
    stats = dev.memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")  # None when the axon tunnel
    # backend doesn't expose allocator stats; the capability claim
    # (O(window) memory) is structural — one fixed [batch, window] graph

    audio_sec = T / SR
    result = {
        "lane": "long_audio_stream",
        "dtype": "fp32" if args.f32 else "bf16",
        "minutes": args.minutes,
        "window_sec": args.window_sec,
        "batch": args.batch,
        "audio_sec_per_sec": round(audio_sec / wall, 2),
        "x_realtime_vs_50": round(audio_sec / wall / 50.0, 3),
        "wall_s": round(wall, 2),
        "peak_hbm_gb": round(peak / 2**30, 3) if peak else None,
        "est_shape": list(est.shape),
    }
    print(json.dumps(result), flush=True)

    if not args.no_doc:
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        with open(os.path.join(REPO, "BENCH_ALL.md"), "a") as f:
            f.write(
                f"\n## long-audio stream ({result['dtype']}) — {stamp}\n\n"
                f"Constant-memory windowed separation (inference/long_audio.py): "
                f"{args.minutes:g}-min input, {args.window_sec:g} s window "
                f"(50% overlap crossfade), batch {args.batch}, flagship-size BSS.\n\n"
                "| input | audio-sec/sec/chip | x vs 50x target | peak HBM |\n"
                "|---|---|---|---|\n"
                f"| {args.minutes:g} min | {result['audio_sec_per_sec']} | "
                f"{result['x_realtime_vs_50']}x | "
                f"{result['peak_hbm_gb'] or 'n/a (tunnel backend)'} |\n"
            )


if __name__ == "__main__":
    main()
