"""Export a trained model to a serving artifact (StableHLO via jax.export).

    python -m tss_dprnn_tpu.cli.export_model --config test.yaml --mode tss_spe \
        --out dprnn_spe.tssx --batch 8 --secs 10 --secs 20 --backend pallas --dtype bf16

The artifact bakes the checkpoint weights in as constants, one compiled
bucket per ``--secs`` value (each also at batch 1 for low-latency single
requests), and is driven without any model code:

    from tss_dprnn_tpu.inference.export import load_artifact
    sep = load_artifact("dprnn_spe.tssx")
    wav = sep.call(mix, aux, aux_len)     # [b, n_src, t]

No deployment equivalent exists in the reference (inference requires the
full torch model stack, src/inferencers/inferencer.py:33-46).
"""

from __future__ import annotations

import argparse

from tss_dprnn_tpu.cli.common import MODES
from tss_dprnn_tpu.models.registry import build_model
from tss_dprnn_tpu.utils.config import load_config, model_config
from tss_dprnn_tpu.utils.logging_util import get_logger


def main(argv=None):
    parser = argparse.ArgumentParser(description="tss_dprnn_tpu serving export")
    parser.add_argument("--config", required=True)
    parser.add_argument("--mode", default="tss_spe", choices=MODES)
    parser.add_argument("--set", action="extend", nargs="*", default=[])
    parser.add_argument("--out", required=True, help="output artifact path (.tssx)")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--secs", type=float, action="append",
                        help="bucket length(s) in seconds (repeatable; default 10)")
    parser.add_argument("--backend", default="pallas", choices=("pallas", "xla"),
                        help="pallas = fused TPU kernels (artifact pinned to the "
                             "producing libtpu); xla = pure StableHLO, hermetic")
    parser.add_argument("--dtype", default="bf16", choices=("bf16", "fp32"))
    parser.add_argument("--platform", action="append",
                        help="lowering platform(s), e.g. tpu, cpu (default: current)")
    args = parser.parse_args(argv)

    logger = get_logger("export")
    config = load_config(args.config, args.set)

    import jax
    import jax.numpy as jnp

    from tss_dprnn_tpu.inference.export import (
        _aux_rate_factor,
        _spe_like,
        example_args,
        export_separation,
        save_artifact,
    )
    from tss_dprnn_tpu.utils.checkpoint import load_checkpoint_variables

    mc = model_config(config)
    if args.dtype == "bf16":
        mc["dtype"] = "bfloat16"
    model = build_model(mc)

    sr = int(config.get("data", {}).get("sample_rate", 8000))
    secs = args.secs or [10.0]
    checkpoint_path = config.get("checkpoint_path")
    if checkpoint_path is None:
        raise ValueError("checkpoint_path is required for export")
    target = model.init(
        jax.random.PRNGKey(0), *example_args(model, 1, int(secs[0] * sr))
    )
    variables = load_checkpoint_variables(checkpoint_path, target)["variables"]
    if args.dtype == "bf16":
        # params stay fp32 (flax promotes per-op); activations ride bf16 via
        # the model's dtype — matches the bench fast path exactly
        pass

    buckets = []
    shapes = sorted({(b, int(s * sr)) for s in secs for b in {1, args.batch}})
    for B, T in shapes:
        logger.info("Exporting bucket batch=%d samples=%d (%s, %s)...",
                    B, T, args.backend, args.dtype)
        buckets.append(
            export_separation(model, variables, B, T,
                              lstm_backend=args.backend, platforms=args.platform)
        )
    meta = {
        "mode": args.mode,
        "spe": _spe_like(model),
        "aux_factor": _aux_rate_factor(model),
        "sample_rate": sr,
        "backend": args.backend,
        "dtype": args.dtype,
        "model": mc,
        "checkpoint": str(checkpoint_path),
    }
    save_artifact(args.out, buckets, meta)
    logger.info("Wrote %s (%d buckets, platforms=%s).", args.out, len(buckets),
                buckets[0].platforms)


if __name__ == "__main__":
    main()
