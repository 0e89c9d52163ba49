"""Single-file separation CLI — serve a checkpoint on one WAV file.

No reference equivalent (the reference can only evaluate metric datasets or
run the notebook by hand); this is the deployment-shaped entry point:

    # blind separation -> out_s1.wav, out_s2.wav
    python -m tss_dprnn_tpu.cli.separate --config configs/test_bss.yaml \
        --mode bss --mix mixture.wav --out out.wav

    # target speech separation -> out.wav
    python -m tss_dprnn_tpu.cli.separate --config configs/test_tss.yaml \
        --mode tss_spe --mix mixture.wav --ref speaker.wav --out out.wav

``--window-secs N`` streams arbitrarily long inputs through the windowed
separator (O(window) device memory, one compile); 0 (default) runs one
full-length forward. Model hparams, checkpoint_path, lstm_backend, and
model.dtype come from the config (``--set`` overrides apply).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from tss_dprnn_tpu.cli.common import MODES
from tss_dprnn_tpu.data import wav
from tss_dprnn_tpu.models.registry import build_model
from tss_dprnn_tpu.utils.checkpoint import load_checkpoint_variables
from tss_dprnn_tpu.utils.config import load_config, model_config
from tss_dprnn_tpu.utils.logging_util import get_logger


def _mono(x: np.ndarray) -> np.ndarray:
    return x.mean(axis=1) if x.ndim == 2 else x


def main(argv=None):
    from tss_dprnn_tpu.utils.compile_cache import enable as _cc

    _cc()  # persistent XLA cache: later runs skip the 30-120 s compiles
    parser = argparse.ArgumentParser(description="tss_dprnn_tpu single-file separation")
    parser.add_argument("--config", required=True)
    parser.add_argument("--mode", default="bss", choices=MODES)
    parser.add_argument("--set", action="extend", nargs="*", default=[])
    parser.add_argument("--mix", required=True, help="input mixture WAV")
    parser.add_argument("--ref", help="speaker reference WAV (tss modes)")
    parser.add_argument("--out", required=True, help="output WAV path; BSS writes "
                        "<out>_s1/_s2 per source")
    parser.add_argument("--window-secs", type=float, default=0.0,
                        help="stream through fixed windows of this many seconds "
                             "(0 = one full-length forward)")
    parser.add_argument("--hop-secs", type=float, default=None,
                        help="window hop (default: half the window)")
    parser.add_argument("--batch", type=int, default=4, help="windows per forward")
    args = parser.parse_args(argv)

    import jax

    from tss_dprnn_tpu.ops import rnn as rnn_ops

    logger = get_logger("separate")
    config = load_config(args.config, args.set)
    sr = int(config.get("data", {}).get("sample_rate", 8000))
    backend = config.get("lstm_backend", "xla")
    spe = args.mode != "bss"
    if spe and not args.ref:
        raise ValueError(f"--ref is required for mode {args.mode}")

    mix, mix_rate = wav.read(args.mix)
    mix = _mono(mix)
    if mix_rate != sr:
        raise ValueError(f"{args.mix} is {mix_rate} Hz; config expects {sr} Hz")
    logger.info("mixture: %s (%.2f s @ %d Hz)", args.mix, len(mix) / sr, sr)

    ref = ref_len = None
    if spe:
        ref, ref_rate = wav.read(args.ref)
        ref = _mono(ref)
        want = 16000 if args.mode == "tss_rawnet" else sr
        if ref_rate != want:
            from tss_dprnn_tpu.data.resample import resample

            logger.info("resampling reference %d -> %d Hz", ref_rate, want)
            ref = resample(ref, ref_rate, want)
        ref_len = float(len(ref))

    model = build_model(model_config(config))
    checkpoint_path = config.get("checkpoint_path")
    if not checkpoint_path:
        raise ValueError("checkpoint_path is required (config or --set)")
    if spe:
        z = np.zeros((1, sr), np.float32)
        example = (z, ref[None].astype(np.float32),
                   np.array([ref_len], np.float32))
    else:
        example = (np.zeros((1, sr), np.float32),)
    target = model.init(jax.random.PRNGKey(0), *example)
    variables = load_checkpoint_variables(checkpoint_path, target)["variables"]
    logger.info("loaded checkpoint: %s", checkpoint_path)

    if args.window_secs > 0:
        from tss_dprnn_tpu.inference.long_audio import bss_windowed, spe_windowed

        window = int(args.window_secs * sr)
        hop = int(args.hop_secs * sr) if args.hop_secs else None
        if spe:
            sep = spe_windowed(model, variables, ref, ref_len, window=window,
                               hop=hop, batch_size=args.batch, lstm_backend=backend)
        else:
            sep = bss_windowed(model, variables, window=window, hop=hop,
                               batch_size=args.batch, lstm_backend=backend)
        est = sep(mix)  # [n_src, T]
    else:
        @jax.jit
        def fwd(*a):
            with rnn_ops.lstm_backend(backend):
                out = model.apply(variables, *a, train=False) if spe \
                    else model.apply(variables, *a)
            return out[0] if isinstance(out, tuple) else out

        if spe:
            est = np.asarray(fwd(mix[None].astype(np.float32),
                                 ref[None].astype(np.float32),
                                 np.array([ref_len], np.float32)))  # [1, T]
        else:
            est = np.asarray(fwd(mix[None].astype(np.float32)))[0]  # [n_src, T]

    est = np.atleast_2d(np.asarray(est, np.float32))
    peak = np.abs(est).max()
    if peak > 1.0:  # normalize only if clipping, preserve level otherwise
        est = est / peak
        logger.info("peak-normalized output by %.3f", peak)
    if est.shape[0] == 1:
        wav.write(args.out, est[0], sr)
        logger.info("wrote %s", args.out)
    else:
        base, ext = os.path.splitext(args.out)
        for j in range(est.shape[0]):
            p = f"{base}_s{j + 1}{ext or '.wav'}"
            wav.write(p, est[j], sr)
            logger.info("wrote %s", p)


if __name__ == "__main__":
    main()
