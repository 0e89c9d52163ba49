"""Full-test-set evaluation entry point (reference scripts/test/test.py —
with the mode-choices bug fixed: the reference's argparse only accepts
'bss'/'tss' while its dispatcher needs 'tss_spe'/'tss_rawnet', test.py:32).

    python -m tss_dprnn_tpu.cli.test --config cfg.yaml --mode tss_spe
"""

from __future__ import annotations

import argparse

from tss_dprnn_tpu.cli.common import MODES, dataset_for, inference_components
from tss_dprnn_tpu.models.registry import build_model
from tss_dprnn_tpu.reporters import Reporter
from tss_dprnn_tpu.utils.config import load_config, model_config
from tss_dprnn_tpu.utils.logging_util import get_logger


def main(argv=None):
    from tss_dprnn_tpu.utils.compile_cache import enable as _cc

    _cc()  # persistent XLA cache: later runs skip the 30-120 s compiles
    parser = argparse.ArgumentParser(description="tss_dprnn_tpu evaluation")
    parser.add_argument("--config", required=True)
    parser.add_argument("--mode", default="bss", choices=MODES)
    parser.add_argument("--set", action="extend", nargs="*", default=[])
    parser.add_argument("--batch-size", type=int, default=None,
                        help="eval batch size (default 8; 16 when the "
                             "device-metric lane is on — the device triple "
                             "amortizes per-batch dispatch, measured 130.7x "
                             "-> 136.5x e2e at B=16, BENCH_ALL.md)")
    parser.add_argument("--n-buckets", type=int, default=8)
    parser.add_argument("--data-parallel", type=int, default=1, metavar="N",
                        help="shard eval batches over an N-device mesh "
                             "(0 = all devices; default 1 = single-chip)")
    parser.add_argument("--device-metrics", action="store_true",
                        help="compute PIT reorder + SI-SDR + STOI on the TPU "
                             "inside the forward graph (only PESQ stays on "
                             "host); values match the host metrics within "
                             "the fp32 envelope (tests/test_stoi_jax.py)")
    parser.add_argument("--device-pesq", action="store_true",
                        help="also run PESQ on the TPU (ops/pesq_jax.py, "
                             "|delta| <= 0.05 MOS vs the host chain) — the "
                             "whole metric triple then stays on device and "
                             "the separated audio never crosses to host")
    args = parser.parse_args(argv)

    logger = get_logger("test")
    config = load_config(args.config, args.set)
    config.setdefault("is_test", True)
    if args.device_metrics:
        config["device_metrics"] = True
    if args.device_pesq:
        config["device_pesq"] = True
    if args.batch_size is None:
        device_lane = config.get("device_metrics") or config.get("device_pesq")
        args.batch_size = 16 if device_lane else 8
    spe, InferencerClass = inference_components(args.mode)

    logger.info("Initializing test set....")
    test_set = dataset_for(config, "test", spe)
    logger.info("test set len: %d", len(test_set))

    reporter = Reporter(config, logger)
    model = build_model(model_config(config))
    mesh = None
    n_dp = args.data_parallel
    if n_dp != 1:
        import jax

        from tss_dprnn_tpu.parallel import make_mesh

        # Eval is HOST-LOCAL on multi-host runs: BucketedEvalLoader already
        # gives each host a disjoint slice of the batch plan (batches differ
        # in bucket shape across hosts, so a cross-host global batch cannot
        # exist). Each process shards over its own devices and writes to its
        # own proc<i> savedir; aggregate the per-host all_metrics.csv after.
        local = jax.local_devices()
        avail = len(local)
        n_dp = avail if n_dp == 0 else n_dp
        if n_dp > 1:
            if args.batch_size % n_dp:
                parser.error(f"--batch-size {args.batch_size} must be divisible "
                             f"by the data-parallel degree {n_dp}")
            mesh = make_mesh(data=n_dp, devices=local)
            if jax.process_count() > 1:
                import os

                config["test_savedir"] = os.path.join(
                    config.get("test_savedir", "."), f"proc{jax.process_index()}")
            logger.info("Sharded eval over %d local devices.", n_dp)
    inferencer = InferencerClass(model, config, logger=logger, reporter=reporter, mesh=mesh)
    final = inferencer.run(test_set, batch_size=args.batch_size, n_buckets=args.n_buckets)
    logger.info("FINAL: %s", final)
    reporter.wandb_finish()
    return final


if __name__ == "__main__":
    main()
