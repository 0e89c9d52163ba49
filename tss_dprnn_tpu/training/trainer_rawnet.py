"""RawNet TSS trainer (reference src/trainers/trainer_rawnet.py:9-140): same
loss as TrainerSpe; the 8->16 kHz reference resample happens in the input
pipeline (loader collate ``resample_ref_to=16000``), not here — the jitted
step stays purely on-device."""

from __future__ import annotations

import numpy as np

from tss_dprnn_tpu.training.trainer_spe import TrainerSpe


class TrainerRawNet(TrainerSpe):
    mode = "tss_rawnet"

    def _model_out(self, variables, batch, train: bool):
        mutable = ["batch_stats"] if (train and "batch_stats" in variables) else False
        kwargs = dict(aux_len=batch["ref_len"], train=train)
        sl, _ = self._lengths_for(batch)
        if sl is not None:
            kwargs["lengths"] = sl
        if mutable:
            (est, logits), updates = self.model.apply(
                variables, batch["mix"], batch["reference"], mutable=mutable, **kwargs
            )
            return est, logits, updates.get("batch_stats", {})
        est, logits = self.model.apply(variables, batch["mix"], batch["reference"], **kwargs)
        return est, logits, {}

    def _mixtures_inference(self):
        if not self.eval_mixtures or self.state is None:
            return
        mixtures = self.eval_mixtures
        for mid, item in mixtures.items():
            mix = np.asarray(item["mix"], np.float32)[None]
            ref = np.asarray(item["reference"], np.float32)[None]  # 16 kHz, from pipeline
            ref_len = np.array([ref.shape[1]], np.float32)
            est, _ = self.model.apply(
                self.state.variables, mix, ref, aux_len=ref_len, train=False
            )
            item["estimated"] = np.asarray(est)[0]
        if self.reporter is not None:
            self.reporter.add_and_report(
                logs={"step": self.cur_epoch, "mixtures": mixtures}, mode="inference_spe"
            )
