"""Reporter live-wandb path against an API-compatible mock.

The wandb package is absent from this image, so the credentialed branch of
`Reporter` (reference src/reporters/reporter.py:5-14 login/init, :46-137 the
seven report modes) would otherwise never execute. A fake `wandb` module that
records every call lets us assert the exact payload schemas the reference
produces: scalar loss/metric logs, the 11-column test table, the final-results
dataframe table, and the three inference demo tables.
"""

import numpy as np
import pandas as pd
import pytest

import tss_dprnn_tpu.reporters.reporter as reporter_mod
from tss_dprnn_tpu.reporters.reporter import TEST_COLUMNS, Reporter


class FakeAudio:
    def __init__(self, data, sample_rate):
        self.data = np.asarray(data)
        self.sample_rate = sample_rate


class FakeTable:
    def __init__(self, columns=None, dataframe=None):
        self.columns = columns
        self.dataframe = dataframe
        self.rows = []

    def add_data(self, *row):
        assert self.columns is not None and len(row) == len(self.columns)
        self.rows.append(row)


class FakeWandb:
    """Records the wandb surface Reporter touches: login/init/log/finish/Table/Audio."""

    def __init__(self):
        self.logins = []
        self.inits = []
        self.logged = []  # (payload, step) tuples
        self.finished = 0

    def login(self, key):
        self.logins.append(key)

    def init(self, **kwargs):
        self.inits.append(kwargs)

    def log(self, payload, step=None):
        self.logged.append((payload, step))

    def finish(self):
        self.finished += 1

    Table = FakeTable

    def Audio(self, data, sample_rate):
        return FakeAudio(data, sample_rate)


CONFIG = {
    "data": {"sample_rate": 8000},
    "is_test": True,
    "logs": {"wandb_credentials": {
        "wandb_key": "k3y", "wandb_project": "proj",
        "wandb_entity": "ent", "run_name": "run7",
    }},
}


@pytest.fixture
def live(monkeypatch):
    fake = FakeWandb()
    monkeypatch.setattr(reporter_mod, "_wandb", fake)
    rep = Reporter(dict(CONFIG))
    return rep, fake


def test_login_init_and_test_table(live):
    rep, fake = live
    assert fake.logins == ["k3y"]
    (init,) = fake.inits
    assert (init["project"], init["entity"], init["name"]) == ("proj", "ent", "run7")
    assert init["config"]["is_test"] is True
    assert rep.wandb is fake
    assert rep.test_table.columns == TEST_COLUMNS


def test_scalar_logs_train_eval(live):
    rep, fake = live
    rep.add_and_report({"step": 3, "loss": -11.5, "metrics": None}, mode="train")
    rep.add_and_report(
        {"step": 4, "loss": -9.0, "metrics": {"si_sdr": 10.0, "stoi": 0.9}}, mode="eval")
    assert ({"loss_train": -11.5}, 3) in fake.logged
    assert ({"loss_eval": -9.0}, 4) in fake.logged
    assert ({"si_sdr_eval": 10.0}, 4) in fake.logged
    assert ({"stoi_eval": 0.9}, 4) in fake.logged


def test_test_rows_and_finish(live, rng):
    rep, fake = live
    wav = rng.standard_normal(800).astype(np.float32)
    for mid in range(2):
        rep.add_and_report(
            {"id": mid, "mix": wav, "target": wav, "estimated": wav, "reference": wav,
             "si_sdr": 10.0 + mid, "stoi": 0.9, "pesq": 3.1,
             "si_sdr_imp": 5.0, "stoi_imp": 0.1, "pesq_imp": 0.5},
            mode="test",
        )
    assert len(rep.test_table.rows) == 2
    row = rep.test_table.rows[0]
    assert row[0] == 0 and row[5] == 10.0  # mix_id, si-sdr
    audio = row[1]
    assert isinstance(audio, FakeAudio) and audio.sample_rate == 8000
    assert audio.data.shape == (800,)

    rep.wandb_finish()  # flushes the test table, then finishes the run
    payload, _ = fake.logged[-1]
    assert payload == {"test results: ": rep.test_table}
    assert fake.finished == 1


def test_final_results_dataframe(live):
    rep, fake = live
    df = pd.DataFrame([{"si_sdr": 12.0, "stoi": 0.91}])
    rep.add_and_report(df, mode="test_final")
    payload, _ = fake.logged[-1]
    table = payload["final results: "]
    assert isinstance(table, FakeTable) and table.dataframe is df


def test_inference_tables(live, rng):
    rep, fake = live
    wav = rng.standard_normal(800).astype(np.float32)

    rep.add_and_report(
        {"step": 9, "mixtures": {7: {"mix": wav, "s1_target": wav, "s2_target": wav,
                                     "s1_estimated": wav, "s2_estimated": wav}}},
        mode="inference",
    )
    payload, step = fake.logged[-1]
    table = payload["inference (using best model)"]
    assert step == 9 and table.columns == ["mix_name", "mix", "s1", "s2"]
    assert len(table.rows) == 2  # target row + estimated row per mixture
    assert table.rows[0][0] == "7_target" and table.rows[1][0] == "7_estimated"
    assert table.rows[1][1] is None  # estimated row repeats no mix audio

    rep.add_and_report(
        {"step": 10, "mixtures": {1: {"mix": wav, "target": wav, "estimated": wav,
                                      "reference": wav}}},
        mode="inference_spe",
    )
    payload, step = fake.logged[-1]
    table = payload["inference_spe (using best model)"]
    assert step == 10
    assert table.columns == ["mix_name", "mix", "target", "estimated", "reference"]
    assert len(table.rows) == 1 and len(table.rows[0]) == 5

    rep.add_and_report(
        {"step": 11, "mixtures": {1: {"mix": wav, "target": wav, "estimated": wav}}},
        mode="inference_no_ref",
    )
    payload, _ = fake.logged[-1]
    table = payload["inference_no_ref (using best model)"]
    assert table.columns == ["mix_name", "mix", "target", "estimated"]
    assert len(table.rows[0]) == 4
