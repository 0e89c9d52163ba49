"""RawNet TSS inferencer — reference src/inferencers/inferencer_rawnet.py:16-76:
identical to the Spe flavor except the reference waveform is resampled to
16 kHz (in our input pipeline, ref :36) and the model runs in eval mode
(which here is the default everywhere)."""

from __future__ import annotations

from tss_dprnn_tpu.inference.inferencer_spe import InferencerSpe


class InferencerRawNet(InferencerSpe):
    mode = "tss_rawnet"

    resample_ref_to = 16000

    def _forward(self, batch):
        est, _ = self.model.apply(
            self.variables, batch["mix"], batch["reference"],
            aux_len=batch["ref_len"], lengths=batch["lengths"], train=False,
        )
        return est
