"""Training entry point (reference scripts/train/train.py).

    python -m tss_dprnn_tpu.cli.train --config cfg.yaml --mode tss_spe \
        [--set data.batch_size=8 optimizer.lr=5e-4 ...]
"""

from __future__ import annotations

import argparse

from tss_dprnn_tpu.cli.common import MODES, dataset_for, eval_mixtures_from, train_components
from tss_dprnn_tpu.data.loader import TrainLoader
from tss_dprnn_tpu.models.registry import build_model
from tss_dprnn_tpu.reporters import Reporter
from tss_dprnn_tpu.utils.config import load_config, model_config
from tss_dprnn_tpu.utils.logging_util import get_logger


def main(argv=None):
    from tss_dprnn_tpu.utils.compile_cache import enable as _cc

    _cc()  # persistent XLA cache: later runs skip the 30-120 s compiles
    parser = argparse.ArgumentParser(description="tss_dprnn_tpu training")
    parser.add_argument("--config", required=True)
    parser.add_argument("--mode", default="bss", choices=MODES)
    parser.add_argument("--set", action="extend", nargs="*", default=[],
                        help="dotted config overrides (repeatable)")
    args = parser.parse_args(argv)

    logger = get_logger("train")
    config = load_config(args.config, args.set)
    spe, collate_fn, TrainerClass = train_components(args.mode)

    logger.info("RUN %s", config.get("name"))
    logger.info("Initializing Datasets and Dataloaders....")
    data_cfg = config["data"]
    train_set = dataset_for(config, "train", spe)
    eval_set = dataset_for(config, "eval", spe)
    if data_cfg.get("variable_length"):
        # variable-length training: length-bucketed ragged batches with true
        # per-row lengths feeding the masked scans (requires datasets built
        # with segment=null; data.max_segment caps row length in seconds)
        from tss_dprnn_tpu.data.loader import (
            VarLenTrainLoader, collate_bss_eval, make_collate_spe_eval)

        sr = data_cfg.get("sample_rate", 8000)
        if spe:
            # one static reference length across the run (compile count:
            # one program per mixture bucket, not per (bucket, ref-max))
            rmax = max(max(train_set.ref_lengths()), max(eval_set.ref_lengths()))
            resample_to = 16000 if args.mode == "tss_rawnet" else None
            if resample_to:
                rmax = -(-(rmax * resample_to) // sr)
            vcollate = make_collate_spe_eval(
                resample_ref_to=resample_to, sample_rate=sr,
                ref_pad_to=int(-(-rmax // 2000) * 2000))
        else:
            vcollate = collate_bss_eval
        max_seg = data_cfg.get("max_segment")
        vl_kw = dict(
            batch_size=data_cfg.get("batch_size", 5), collate_fn=vcollate,
            seed=data_cfg.get("seed", 0),
            n_buckets=int(data_cfg.get("n_buckets", 4)),
            max_len=int(max_seg * sr) if max_seg else None,
        )
        train_loader = VarLenTrainLoader(
            train_set, lengths=train_set.lengths(), shuffle=True, **vl_kw)
        eval_loader = VarLenTrainLoader(
            eval_set, lengths=eval_set.lengths(), shuffle=False, **vl_kw)
    else:
        train_loader = TrainLoader(
            train_set, data_cfg.get("batch_size", 5), collate_fn,
            shuffle=True, drop_last=True, seed=data_cfg.get("seed", 0),
        )
        eval_loader = TrainLoader(
            eval_set, data_cfg.get("batch_size", 5), collate_fn,
            shuffle=False, drop_last=True, seed=data_cfg.get("seed", 0),
        )
    logger.info("train dataloader len: %d", len(train_loader))
    logger.info("eval dataloader len: %d", len(eval_loader))

    eval_mixtures = eval_mixtures_from(config, eval_set, spe, logger)
    reporter = Reporter(config, logger) if spe or (config.get("logs") or {}) else None

    logger.info("Initializing model....")
    model = build_model(model_config(config))

    logger.info("Initializing trainer....")
    trainer = TrainerClass(model, config, logger=logger, reporter=reporter,
                           eval_mixtures=eval_mixtures,
                           seed=config.get("seed", 0))

    logger.info("Initiating trainer run...")
    trainer.run(train_loader, eval_loader, config.get("epochs", 10),
                config.get("early_stop", 10))
    logger.info("trainer run COMPLETED")
    if reporter:
        reporter.wandb_finish()


if __name__ == "__main__":
    main()
