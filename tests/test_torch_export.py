"""Round-trip: reference state_dict -> flax -> reference state_dict must be
value-exact (portability both ways)."""

import numpy as np

from tests.torch_oracle import Cfg, make_bss_sd, make_spe_sd
from tss_dprnn_tpu.utils.torch_convert import convert_state_dict
from tss_dprnn_tpu.utils.torch_export import export_state_dict


def _roundtrip(sd, norm_type, fusion_type=None):
    variables = convert_state_dict(sd)
    back = export_state_dict(variables, norm_type=norm_type, kernel_size=2,
                             fusion_type=fusion_type)
    ref_keys = {k for k in sd if not k.endswith("num_batches_tracked")}
    back_keys = {k for k in back if not k.endswith("num_batches_tracked")}
    assert ref_keys == back_keys, (
        f"missing={sorted(ref_keys - back_keys)[:5]} extra={sorted(back_keys - ref_keys)[:5]}"
    )
    for k in ref_keys:
        np.testing.assert_allclose(
            back[k], np.asarray(sd[k]), atol=0, err_msg=k
        )


def test_bss_roundtrip():
    for norm_type in ("ln", "gLN"):
        cfg = Cfg(norm_type=norm_type)
        _roundtrip(make_bss_sd(cfg, seed=7), norm_type)


def test_spe_roundtrip_all_fusions():
    for fusion in ("cat", "add", "mul", "film", "att"):
        cfg = Cfg(fusion_type=fusion)
        _roundtrip(make_spe_sd(cfg, seed=8), "ln", fusion_type=fusion)


def test_ira_roundtrip():
    cfg = Cfg(fusion_type="cat")
    _roundtrip(make_spe_sd(cfg, seed=9, ira=True), "ln", fusion_type="cat")


def test_rawnet_roundtrip():
    """RawNet export round-trip. The synthesized tensors differ from the
    synthetic dict where the reference's values are untrained/dead (bn1) or
    buffers the synthetic dict omits (ParamSincFB window_/n_): those compare
    by shape/formula; every learned tensor must be value-exact, and
    re-converting the export must reproduce the flax tree bitwise."""
    from tests.torch_oracle import RawCfg, make_rawnet_model_sd

    cfg = Cfg(fusion_type="att")
    rcfg = RawCfg()
    sd = make_rawnet_model_sd(cfg, rcfg, seed=11)
    variables = convert_state_dict(sd)
    back = export_state_dict(variables, norm_type="ln", kernel_size=cfg.kernel_size,
                             fusion_type="att", sinc_kernel=rcfg.sinc_kernel,
                             sinc_sample_rate=rcfg.sample_rate)

    # keys: export ⊇ synthetic; extras are exactly the sinc buffers
    ref_keys = {k for k in sd if not k.endswith("num_batches_tracked")}
    back_keys = {k for k in back if not k.endswith("num_batches_tracked")}
    extra = back_keys - ref_keys
    assert extra == {
        "separation.spk_encoder.conv1.filterbank.window_",
        "separation.spk_encoder.conv1.filterbank.n_",
    }, extra
    missing = ref_keys - back_keys
    assert not missing, sorted(missing)[:5]

    dead_bn1 = "separation.spk_encoder.bn1."
    for k in ref_keys:
        if k.startswith(dead_bn1):  # untrained in the reference: shape-only
            assert back[k].shape == tuple(np.asarray(sd[k]).shape), k
            continue
        np.testing.assert_allclose(back[k], np.asarray(sd[k]), atol=0, err_msg=k)

    # deterministic buffers match the shared sinc formulas
    half = rcfg.sinc_kernel // 2
    np.testing.assert_allclose(
        back["separation.spk_encoder.conv1.filterbank.window_"],
        np.hamming(rcfg.sinc_kernel)[:half].astype(np.float32), atol=0)
    assert back["separation.spk_encoder.conv1.filterbank.n_"].shape == (1, half)

    # full circle: converting the export reproduces the flax tree bitwise
    again = convert_state_dict(back)

    def flat(tree, p=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from flat(v, p + (k,))
            else:
                yield p + (k,), v

    a, b = dict(flat(variables)), dict(flat(again))
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=str(k))
