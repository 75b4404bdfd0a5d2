"""Config serialisation and preset invariants."""


from yolofastest_tpu.configs import Config, get_config
import pytest

pytestmark = pytest.mark.gate


def test_config_json_roundtrip():
    cfg = get_config("512x640")
    back = Config.from_json(cfg.to_json())
    assert back == cfg
    assert back.io.anchors == cfg.io.anchors  # nested tuples preserved


def test_presets_match_reference_layout():
    c256 = get_config("256x320")
    assert c256.io.input_shape == (256, 320, 1)
    assert c256.io.anchors[0][0] == (10.0, 13.0)  # group 0 finest
    assert c256.io.head_hw == ((16, 20), (8, 10))
    c512 = get_config("512x640")
    assert c512.io.anchors[0][0] == (150.0, 75.0)  # groups 1-2
    assert c512.io.num_out == 24
