"""Config system (utils/config.py): YAML + dotted overrides, the jax:
section (platform pinning, compile cache, multi-host bring-up), and the
reference-config normalization helpers (_target_ passthrough)."""

import yaml

import tss_dprnn_tpu.parallel as parallel_pkg
from tss_dprnn_tpu.utils import config as cfg_mod


def _write(tmp_path, payload):
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(payload))
    return str(p)


def test_overrides_and_model_normalization(tmp_path):
    p = _write(tmp_path, {
        "model": {"_target_": "src.models.dprnn_spe.DPRNNSpeTasNet", "O": 128},
        "optimizer": {"_target_": "torch.optim.Adam", "lr": 1e-3},
        "data": {"batch_size": 5},
    })
    c = cfg_mod.load_config(p, ["data.batch_size=8", "optimizer.lr=5e-4",
                                "new.dotted.key=7"])
    assert c["data"]["batch_size"] == 8
    assert c["optimizer"]["lr"] == 5e-4
    assert c["new"]["dotted"]["key"] == 7
    mc = cfg_mod.model_config(c)
    assert mc["target"] == "src.models.dprnn_spe.DPRNNSpeTasNet"
    assert "_target_" not in mc
    oc = cfg_mod.optimizer_config(c)
    assert oc == {"lr": 5e-4}


def test_jax_distributed_bringup_wiring(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setattr(parallel_pkg, "initialize_distributed",
                        lambda **kw: calls.append(kw))

    # absent -> not called
    cfg_mod.load_config(_write(tmp_path, {"jax": {"compilation_cache_dir": None}}))
    assert calls == []

    # present -> one bring-up call with the coordinator args
    cfg_mod.load_config(_write(tmp_path, {"jax": {
        "compilation_cache_dir": None, "distributed": True,
        "coordinator_address": "10.0.0.1:1234", "num_processes": 4,
        "process_id": 2,
    }}))
    assert calls == [dict(coordinator_address="10.0.0.1:1234",
                          num_processes=4, process_id=2)]
