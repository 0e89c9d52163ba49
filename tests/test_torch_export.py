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
