"""TSS trainer (reference src/trainers/trainer_spe.py:8-138): loss =
PIT-SI-SDR(est, target as single source) + ce_gamma * CrossEntropy(speaker
logits, speaker idx); eval uses SI-SDR only (trainer_spe.py:39-43, 95)."""

from __future__ import annotations

import numpy as np

from tss_dprnn_tpu.ops import losses
from tss_dprnn_tpu.training.trainer import Trainer


class TrainerSpe(Trainer):
    mode = "tss_spe"

    def __init__(self, model, config, **kwargs):
        super().__init__(model, config, **kwargs)
        self.ce_gamma = float(config.get("ce_gamma", 0.5))

    def _example_args(self, batch):
        return (batch["mix"][:1], batch["reference"][:1], batch["ref_len"][:1]), {}

    def _model_out(self, variables, batch, train: bool):
        mutable = ["batch_stats"] if (train and "batch_stats" in variables) else False
        sl, _ = self._lengths_for(batch)
        kw = {"lengths": sl} if sl is not None else {}
        if mutable:
            (est, logits), updates = self.model.apply(
                variables, batch["mix"], batch["reference"], batch["ref_len"],
                train=True, mutable=mutable, **kw,
            )
            return est, logits, updates.get("batch_stats", {})
        est, logits = self.model.apply(
            variables, batch["mix"], batch["reference"], batch["ref_len"], train=False,
            **kw,
        )
        return est, logits, {}

    def _forward_loss(self, variables, batch, train: bool):
        est, logits, new_bs = self._model_out(variables, batch, train)
        _, ll = self._lengths_for(batch)
        sisdr = losses.pit_sisdr_loss(est[:, None, :], batch["target"][:, None, :],
                                      lengths=ll)
        extra = {"est": est} if self.is_metrics else {}
        if train:
            ce = losses.cross_entropy(logits, batch["spk_idx"])
            loss = sisdr + self.ce_gamma * ce
            return loss, new_bs, {"l": sisdr, "ce": ce, **extra}
        return sisdr, new_bs, extra

    def _log_step(self, step, total_loss, aux):
        if aux:
            self.logger.info("l: %s, ce: %s", float(aux["l"]), float(aux["ce"]))
        super()._log_step(step, total_loss, aux)

    def _mixtures_inference(self):
        if not self.eval_mixtures or self.state is None:
            return
        mixtures = self.eval_mixtures
        for mid, item in mixtures.items():
            mix = np.asarray(item["mix"], np.float32)[None]
            ref = np.asarray(item["reference"], np.float32)[None]
            ref_len = np.array([ref.shape[1]], np.float32)
            est, _ = self.model.apply(self.state.variables, mix, ref, ref_len, train=False)
            item["estimated"] = np.asarray(est)[0]
        if self.reporter is not None:
            self.reporter.add_and_report(
                logs={"step": self.cur_epoch, "mixtures": mixtures}, mode="inference_spe"
            )
