"""Config round-trips and sweep validation (reference: specify_parameters.py,
main.py:86-111, execute_project.py:78-142)."""

import pytest

from sparse_vision_tpu.config import RunConfig, Sweep, get_img_size
from sparse_vision_tpu.utils.paths import get_file_path, run_id


def test_legacy_line_roundtrip():
    cfg = RunConfig(sae_lambda_sparse=5.0, sae_expansion_factor=8, dataset_name="imagenet")
    line = cfg.to_legacy_line()
    cfg2 = RunConfig.from_legacy_line(line)
    assert cfg2.sae_lambda_sparse == 5.0
    assert cfg2.sae_expansion_factor == 8
    assert cfg2.dataset_name == "imagenet"
    assert cfg2.to_legacy_line() == line


def test_json_roundtrip():
    cfg = RunConfig(mesh_shape=(4, 2), compute_dtype="bfloat16")
    assert RunConfig.from_json(cfg.to_json()) == cfg


def test_sweep_expansion_and_validation():
    sweep = Sweep(axes={"sae_lambda_sparse": [0.1, 5.0], "sae_expansion_factor": [2, 8]})
    configs = list(sweep)
    assert len(configs) == 4
    assert {c.sae_lambda_sparse for c in configs} == {0.1, 5.0}

    bad = Sweep(
        axes={"compute_ie": ["1"]},
        base=RunConfig(original_model=True, training=False),
    )
    with pytest.raises(ValueError):
        list(bad)


def test_run_id_excludes_sae_epochs():
    a = RunConfig(sae_epochs=3)
    b = RunConfig(sae_epochs=30)
    assert run_id(a) == run_id(b)
    c = RunConfig(sae_lambda_sparse=9.9)
    assert run_id(a) != run_id(c)


def test_get_file_path_matches_reference_shape(tmp_path):
    p = get_file_path(
        folder_path=str(tmp_path),
        sae_layer="fc1",
        params={"a": 1, "b": "x"},
        file_name=".pth",
    )
    assert p.endswith("fc1_1_x.pth")


def test_img_sizes_channels_last():
    assert get_img_size("mnist") == (28, 28, 1)
    assert get_img_size("imagenet") == (229, 229, 3)  # the lucent crop the pipeline produces
    with pytest.raises(ValueError):
        get_img_size("nope")
