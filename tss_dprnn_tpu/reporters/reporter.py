"""Observability reporter (L5) — reference src/reporters/reporter.py:3-137.

Same mode API ('train' / 'eval' / 'test' / 'test_final' / 'inference' /
'inference_spe' / 'inference_no_ref') and the same wandb table schemas; wandb
is optional — with no credentials (or no wandb package, it is not part of
this image) everything degrades to structured log lines, exactly like the
reference's graceful off-switch (reporter.py:9-14).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from tss_dprnn_tpu.utils.logging_util import get_logger

try:  # optional
    import wandb as _wandb  # type: ignore
except Exception:  # pragma: no cover
    _wandb = None

TEST_COLUMNS = [
    "mix_id", "mix", "target", "estimated", "reference",
    "si-sdr", "stoi", "pesq", "si-sdr_imp", "stoi_imp", "pesq_imp",
]


class Reporter:
    def __init__(self, config: Dict[str, Any], logger=None):
        self.logger = logger or get_logger("reporter")
        self.sample_rate = int(config.get("data", {}).get("sample_rate", 8000))
        self.is_test = bool(config.get("is_test", False))
        creds = (config.get("logs") or {}).get("wandb_credentials")
        self.wandb = None
        if creds and creds.get("wandb_key") and _wandb is not None:
            _wandb.login(key=creds["wandb_key"])
            _wandb.init(
                project=creds.get("wandb_project"),
                entity=creds.get("wandb_entity"),
                name=creds.get("run_name", "report"),
                config=dict(config),
            )
            self.wandb = _wandb
        else:
            self.logger.info(
                "Reporter: wandb disabled (no credentials%s) — logging locally.",
                "" if _wandb is not None else ", package unavailable",
            )
        self.test_table = None
        if self.is_test and self.wandb:
            self.test_table = self.wandb.Table(columns=TEST_COLUMNS)
        self.mode = "train"

    # -- helpers -----------------------------------------------------------

    def _audio(self, x):
        return self.wandb.Audio(np.asarray(x), sample_rate=self.sample_rate)

    def _log_scalars(self, logs):
        step = logs["step"]
        if self.wandb:
            self.wandb.log({f"loss_{self.mode}": logs["loss"]}, step=step)
            if logs.get("metrics"):
                for metric, value in logs["metrics"].items():
                    self.wandb.log({f"{metric}_{self.mode}": value}, step=step)
        else:
            self.logger.info("[%s] step=%s loss=%.4f metrics=%s",
                             self.mode, step, logs["loss"], logs.get("metrics"))

    # -- public API (reference reporter.py:46-137) -------------------------

    def add_and_report(self, logs: Optional[Dict[str, Any]] = None, mode: str = "train"):
        self.mode = mode
        if mode in ("train", "eval"):
            self._log_scalars(logs)
        elif mode == "test":
            if self.test_table is not None:
                self.test_table.add_data(
                    logs["id"], self._audio(logs["mix"]), self._audio(logs["target"]),
                    self._audio(logs["estimated"]), self._audio(logs["reference"]),
                    logs["si_sdr"], logs["stoi"], logs["pesq"],
                    logs["si_sdr_imp"], logs["stoi_imp"], logs["pesq_imp"],
                )
            else:
                self.logger.info(
                    "[test] id=%s si_sdr=%s stoi=%s pesq=%s",
                    logs["id"], logs["si_sdr"], logs["stoi"], logs["pesq"],
                )
        elif mode == "test_final":
            self.logger.info("ADDING FINAL RESULTS!")
            if self.wandb:
                self.wandb.log({"final results: ": self.wandb.Table(dataframe=logs)})
        elif mode == "inference":
            self._inference_table(logs, ["mix_name", "mix", "s1", "s2"], spe=False)
        elif mode == "inference_spe":
            self._inference_table(
                logs, ["mix_name", "mix", "target", "estimated", "reference"], spe=True
            )
        elif mode == "inference_no_ref":
            self._inference_table(
                logs, ["mix_name", "mix", "target", "estimated"], spe=True, with_ref=False
            )
        else:
            raise ValueError(f"unknown reporter mode {mode!r}")

    def _inference_table(self, logs, columns, spe: bool, with_ref: bool = True):
        mixtures = logs["mixtures"]
        if not self.wandb:
            self.logger.info("[%s] %d demo mixtures at step %s",
                             self.mode, len(mixtures), logs["step"])
            return
        table = self.wandb.Table(columns=columns)
        for mid, item in mixtures.items():
            if spe:
                row = [str(mid), self._audio(item["mix"]), self._audio(item["target"]),
                       self._audio(item["estimated"])]
                if with_ref:
                    row.append(self._audio(item["reference"]))
                table.add_data(*row)
            else:
                table.add_data(str(mid) + "_target", self._audio(item["mix"]),
                               self._audio(item["s1_target"]), self._audio(item["s2_target"]))
                table.add_data(str(mid) + "_estimated", None,
                               self._audio(item["s1_estimated"]), self._audio(item["s2_estimated"]))
        self.wandb.log({f"{self.mode} (using best model)": table}, step=logs["step"])

    def wandb_finish(self):
        if self.wandb:
            if self.test_table is not None:
                self.logger.info("ADDING TEST TABLE!")
                self.wandb.log({"test results: ": self.test_table})
            self.wandb.finish()
