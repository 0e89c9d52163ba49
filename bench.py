"""Headline benchmark: separated audio-seconds per wall-clock second per chip.

Flagship DPRNN-Spe-TasNet (attention fusion, reference shipped hparams,
SURVEY.md §2.1) running jitted batched inference on 10-second 8 kHz
utterances. The north-star target is >=50x realtime per chip (BASELINE.json);
``vs_baseline`` is the achieved realtime factor divided by 50.

LANE: the headline measures the MASKED bucketed-eval graph — ``lengths``
threaded through the norms/scans/fusion, i.e. the exact shape the shipped
test CLI (Inferencer.run) executes — not a lengths-free demo forward
(round-2 VERDICT weak #2). Since the mask-aware no-stack scan kernel
(ops/pallas_lstm.bilstm2_forward_masked, round 3) the masked lane matches
the unmasked one within noise; ``--unmasked`` benches the lengths-free
graph for comparison.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _enable_compile_cache():
    import os

    import jax

    cache = os.path.expanduser("~/.cache/tss_dprnn_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _probe_backend(attempts: int = 3, timeout_s: int = 300) -> bool:
    """Bounded device-backend probe in a subprocess.

    A TPU-tunnel outage makes in-process jax backend init hang forever
    (observed 2026-08-17); probing in a killable child keeps the bench — and
    the driver that runs it — bounded. Retries cover transient outages."""
    import os
    import subprocess
    import sys as _sys
    import time as _time

    attempts = int(os.environ.get("TSS_BENCH_PROBE_ATTEMPTS", attempts))
    timeout_s = int(os.environ.get("TSS_BENCH_PROBE_TIMEOUT", timeout_s))
    code = "import jax; d = jax.devices(); print('ok', d[0].platform)"
    for i in range(attempts):
        try:
            r = subprocess.run([_sys.executable, "-c", code], timeout=timeout_s,
                               capture_output=True, text=True)
            if r.returncode == 0 and "ok" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"# backend probe attempt {i + 1}/{attempts} failed; retrying",
              file=_sys.stderr, flush=True)
        _time.sleep(30)
    return False


def main():
    # the box has ONE chip: evict any registered long-running TPU job (e.g.
    # a convergence sweep left by an unattended session) so it can't share
    # the chip with — and corrupt — this measurement
    try:
        from tss_dprnn_tpu.utils.tpu_jobs import reap_tpu_jobs

        reap_tpu_jobs(log=lambda m: print(m, file=sys.stderr, flush=True))
    except Exception as e:  # reaping is protective, never bench-fatal
        print(f"# tpu job reap skipped: {e}", file=sys.stderr, flush=True)

    if not _probe_backend():
        print(json.dumps({
            "metric": "separated_audio_sec_per_sec_per_chip",
            "value": 0.0,
            "unit": "audio-sec/sec",
            "vs_baseline": 0.0,
            "error": "device backend init hung (TPU tunnel outage) — bench not run",
        }))
        return

    import jax

    _enable_compile_cache()

    from tss_dprnn_tpu.models import DPRNNSpeTasNet

    from __graft_entry__ import FLAGSHIP

    # B=32 saturates the scans' row dimension (~4% over B=8, measured)
    B = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 32
    secs = float(sys.argv[sys.argv.index("--secs") + 1]) if "--secs" in sys.argv else 10.0
    sr = 8000
    T = int(secs * sr)

    import jax.numpy as jnp

    from tss_dprnn_tpu.ops import rnn as rnn_ops

    # fast path: bf16 compute + fused Pallas LSTM scans (47 dB output
    # fidelity vs the fp32 XLA parity path — far below the 0.1 dB SI-SDR
    # budget); pass --parity for the fp32 XLA path
    fast = "--parity" not in sys.argv
    # masked bucketed-eval graph (the shipped test-CLI lane) is the headline;
    # --unmasked restores the lengths-free forward for A/B
    masked = "--unmasked" not in sys.argv
    model = DPRNNSpeTasNet(**FLAGSHIP, dtype=jnp.bfloat16 if fast else None)
    backend = "pallas" if fast else "xla"
    rng = np.random.default_rng(0)
    mix = rng.standard_normal((B, T)).astype(np.float32)
    aux = rng.standard_normal((B, T)).astype(np.float32)
    aux_len = np.full((B,), float(T), np.float32)
    lengths = np.full((B,), T, np.int32)
    variables = model.init(jax.random.PRNGKey(0), mix[:1], aux[:1], aux_len[:1])

    @jax.jit
    def fwd(mix, aux, aux_len):
        # time-major block layout for the bf16+pallas lane (round-5 measured
        # win, masked 426->437x / unmasked 413->439x) — same default the
        # Inferencer ships; TSS_TM=1/0 still force-overrides
        with rnn_ops.lstm_backend(backend), rnn_ops.lstm_time_major(fast):
            if masked:
                wav, _ = model.apply(variables, mix, aux, aux_len, lengths=lengths)
            else:
                wav, _ = model.apply(variables, mix, aux, aux_len)
        return wav

    mix_d = jax.device_put(mix)
    aux_d = jax.device_put(aux)
    len_d = jax.device_put(aux_len)

    # compile + warmup
    fwd(mix_d, aux_d, len_d).block_until_ready()
    fwd(mix_d, aux_d, len_d).block_until_ready()

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(mix_d, aux_d, len_d)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    audio_sec = iters * B * secs
    realtime = audio_sec / dt
    lane = ("masked-bucketed-eval" if masked else "unmasked") + \
        (" (bf16+pallas)" if fast else " (fp32+xla)")
    result = {
        "metric": "separated_audio_sec_per_sec_per_chip",
        "value": round(realtime, 2),
        "unit": "audio-sec/sec",
        "vs_baseline": round(realtime / 50.0, 3),
        "lane": lane,
    }
    try:
        result.update(_roofline(fwd, (mix_d, aux_d, len_d), B, T, dt / iters,
                                bf16=fast))
    except Exception as e:  # roofline is reporting, never bench-fatal
        print(f"# roofline skipped: {e}", file=sys.stderr, flush=True)
    print(json.dumps(result))


def _roofline(fwd, args, B, T, iter_s, bf16):
    """Roofline context for the headline number (round-3 VERDICT item 4):

    - ``hbm_gbps`` / ``hbm_util``: achieved HBM bandwidth from the ANALYTIC
      byte model blessed in BENCH_ALL.md's mega-fusion close-out (per
      scan-adjacent tensor = positions x 128 ch x itemsize; ~10 tensor
      round-trips per scan across kernel + SplitDense + norm/residual,
      12 scans, +8% for encoder/fusion/mask-head glue; +-20% estimate),
      divided by the v5e sustained peak (819 GB/s x 70%).
    - ``scan_share``: measured fraction of device time inside the Mosaic
      scan kernels (VPU-latency-bound floor — this part cannot be bought
      back with bandwidth), from a 2-iteration jax.profiler trace.
    - ``mxu_share``: measured fraction in convolution/dot ops.
    """
    import glob
    import gzip
    import os
    import shutil
    import tempfile
    from collections import defaultdict

    import jax

    K, HOP, N = 250, 125, 128
    Lf = T - 1
    S = (Lf + K) // HOP + 1
    pos = B * S * K
    itemsize = 2 if bf16 else 4
    bytes_t = pos * N * itemsize
    bytes_iter = 12 * 10 * bytes_t * 1.08
    hbm_gbps = bytes_iter / iter_s / 1e9
    sustained = 819.0 * 0.70

    td = tempfile.mkdtemp(prefix="bench_roofline_")
    try:
        jax.profiler.start_trace(td)
        for _ in range(2):
            out = fwd(*args)
        out.block_until_ready()
        jax.profiler.stop_trace()
        paths = glob.glob(os.path.join(td, "**", "*.trace.json.gz"), recursive=True)
        scan = mxu = total = 0.0
        if paths:
            import json as _json

            with gzip.open(sorted(paths)[-1], "rt") as f:
                tr = _json.load(f)
            ev = tr["traceEvents"]
            pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                         if e.get("ph") == "M" and e.get("name") == "process_name"}
            for e in ev:
                if e.get("ph") != "X":
                    continue
                pname = pid_names.get(e.get("pid"), "")
                if "TPU" not in pname and "/device" not in pname.lower():
                    continue
                name = e.get("name", "").lower()
                if name.startswith("jit_"):
                    continue  # enclosing envelope event — would double-count
                d = e.get("dur", 0)
                total += d
                # Mosaic kernels carry their kernel function name (bilstm*/
                # lstm*); "custom" covers other pallas entry points
                if "lstm" in name or "custom" in name:
                    scan += d
                elif "convolution" in name or name.startswith("dot") or "einsum" in name:
                    mxu += d
    finally:
        shutil.rmtree(td, ignore_errors=True)
    out = {"hbm_gbps": round(hbm_gbps, 1),
           "hbm_util": round(hbm_gbps / sustained, 3)}
    if total > 0:
        out["scan_share"] = round(scan / total, 3)
        out["mxu_share"] = round(mxu / total, 3)
    return out


if __name__ == "__main__":
    main()
