"""TSS inferencer — reference src/inferencers/inferencer_spe.py:14-68: the
forward takes the reference waveform + its length; metrics are single-source
(target vs estimate); each utterance can emit a wandb test-table row."""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from tss_dprnn_tpu.data.loader import BucketedEvalLoader, make_collate_spe_eval
from tss_dprnn_tpu.inference.inferencer import Inferencer
from tss_dprnn_tpu.ops import metrics as metrics_mod


class InferencerSpe(Inferencer):
    mode = "tss_spe"

    resample_ref_to = None  # RawNet subclass overrides

    def _forward(self, batch):
        est, _ = self.model.apply(
            self.variables, batch["mix"], batch["reference"], batch["ref_len"],
            lengths=batch["lengths"], train=False,
        )
        return est

    _batch_keys = ("mix", "target", "reference", "ref_len", "lengths")

    def _forward_with_metrics(self, batch):
        """Single-source TSS: no PIT — SI-SDR/STOI of (target, est) and
        (target, mix) on device; PESQ stays host."""
        from tss_dprnn_tpu.ops import losses
        from tss_dprnn_tpu.ops.stoi_jax import stoi_batch

        est = self._forward(batch)  # [B, T]
        lens = batch["lengths"]
        target = batch["target"]
        dm = {}
        if "si_sdr" in self.metrics:
            dm["si_sdr"] = losses.masked_si_sdr(est, target, lens)
            dm["input_si_sdr"] = losses.masked_si_sdr(batch["mix"], target, lens)
        if "stoi" in self.metrics:
            dm["stoi"] = stoi_batch(target, est, lens, self.sample_rate)
            dm["input_stoi"] = stoi_batch(target, batch["mix"], lens, self.sample_rate)
        if "pesq" in self.metrics and self.device_pesq:
            from tss_dprnn_tpu.ops.pesq_jax import pesq_batch

            dm["pesq"] = pesq_batch(target, est, lens, self.sample_rate,
                                    mode=self._pesq_mode)
            dm["input_pesq"] = pesq_batch(target, batch["mix"], lens, self.sample_rate,
                                          mode=self._pesq_mode)
        return self._encode_wire(est, lens), dm

    _nodm_keys = ("mix", "reference", "ref_len", "lengths")

    def _make_loader(self, test_set, batch_size, n_buckets, multiple):
        collate = make_collate_spe_eval(
            resample_ref_to=self.resample_ref_to, sample_rate=self.sample_rate
        )
        return BucketedEvalLoader(
            test_set, batch_size, collate, test_set.lengths(),
            n_buckets=n_buckets, multiple=multiple, pad_to_batch=self.mesh is not None,
        )

    def _metric_rows(self, batch, out, dm=None) -> List[Dict[str, Any]]:
        rows = []
        for b in range(batch["mix"].shape[0]):
            if int(batch["indices"][b]) < 0:
                continue  # pad_to_batch filler row
            l = int(batch["lengths"][b])
            mix = batch["mix"][b, :l]
            target = batch["target"][b, :l]
            if dm is None:
                est = np.asarray(out[b])[:l]
                md = metrics_mod.get_metrics(mix, target, est, self.sample_rate,
                                             self.metrics)
            else:
                md = self._rows_from_device(batch, b, dm)
                if "pesq" in self.metrics and "pesq" not in dm:
                    est = np.asarray(out[b])[:l]
                    md.update(metrics_mod.get_metrics(
                        mix, target, est, self.sample_rate, ["pesq"]))
            md["index"] = int(batch["indices"][b])
            md["_batch_row"] = b  # consumed by _emit_rows, dropped before save
            rows.append(md)
        return rows

    def _emit_rows(self, batch, out, rows) -> None:
        if self.reporter is None:
            for md in rows:
                md.pop("_batch_row", None)
            return
        for md in rows:
            b = md.pop("_batch_row")
            l = int(batch["lengths"][b])
            rl = int(batch["ref_len"][b])

            def imp(name):
                a, ia = md.get(name), md.get("input_" + name)
                return (a - ia) if (a is not None and ia is not None) else None

            self.reporter.add_and_report(
                logs={
                    "id": md["index"],
                    "mix": batch["mix"][b, :l], "target": batch["target"][b, :l],
                    "estimated": np.asarray(out[b])[:l],
                    "reference": batch["reference"][b, :rl],
                    "si_sdr": md.get("si_sdr"), "stoi": md.get("stoi"),
                    "pesq": md.get("pesq"),
                    "si_sdr_imp": imp("si_sdr"), "stoi_imp": imp("stoi"),
                    "pesq_imp": imp("pesq"),
                },
                mode="test",
            )
