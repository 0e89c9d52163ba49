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


def test_override_coercion_is_scoped_to_sci_notation():
    p = cfg_mod._parse_override
    # the YAML 1.1 gap: bare sci-notation floats
    assert p("5e-4") == 5e-4 and isinstance(p("5e-4"), float)
    assert p("1E3") == 1000.0 and p("-2.5e2") == -250.0
    # intentional strings must survive the fallback (a blanket int()/float()
    # would eat these; note "1_2" -> 12 is PyYAML's own YAML 1.1 underscore
    # rule, not our coercion)
    assert p("2_best") == "2_best"
    assert p("007f") == "007f"
    assert p("tss_spe") == "tss_spe"
    # YAML-native scalars untouched
    assert p("8") == 8 and p("0.5") == 0.5
    assert p("null") is None and p("true") is True
    assert p("[1, 2]") == [1, 2]


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
