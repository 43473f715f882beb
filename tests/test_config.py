"""Config-layer tests: the 5 reference SERVER_*.txt files must load verbatim."""

import glob
import os

import pytest

from seld_tpu.config import SELDConfig, load_config, parse_text_args, tokens_to_config

REF_CONFIG_DIR = "/root/reference/config"
LOCAL_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "config")


def _all_reference_configs():
    if os.path.isdir(REF_CONFIG_DIR):
        return sorted(glob.glob(os.path.join(REF_CONFIG_DIR, "SERVER_*.txt")))
    return []


def test_defaults_match_reference_argparse():
    cfg = SELDConfig()
    assert cfg.lr == 0.0001
    assert cfg.batch_size == 1
    assert cfg.domain == "DQ"
    assert cfg.D == [10]
    assert cfg.pool_size == [[8, 2], [8, 2], [2, 2], [1, 1]]
    assert cfg.cnn_filters == [64, 64, 64]
    assert cfg.fc_layers == [128]
    assert cfg.sed_loss_weight == 1.0 and cfg.doa_loss_weight == 5.0
    assert cfg.patience == 250 and cfg.min_n_epochs == 1000
    assert cfg.use_bias_conv is True and cfg.use_bias_linear is True


def test_readfile_token_semantics(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("--phase=True\n--verbose=False\n#a comment line\n--lr=0.01\n")
    toks = parse_text_args(str(p))
    # True -> '1', False -> '0', comment dropped
    assert toks == ["--phase", "1", "--verbose", "0", "--lr", "0.01"]
    cfg = tokens_to_config(toks)
    assert cfg.phase is True
    assert cfg.verbose is False
    assert cfg.lr == 0.01


@pytest.mark.parametrize("path", _all_reference_configs())
def test_reference_server_configs_load_verbatim(path):
    if "phm_n" in open(path).read():
        with pytest.warns(UserWarning):
            cfg = load_config(path)
    else:
        cfg = load_config(path)
    assert cfg.output_classes == 14
    assert cfg.pool_size == [[8, 2], [8, 2], [2, 2]]
    assert cfg.dilation_mode == "fibonacci"
    assert cfg.D == [10]
    name = os.path.basename(path)
    if name.startswith("SERVER_DQSELD"):
        assert cfg.domain == "DQ"
        assert cfg.cnn_filters == [192, 192, 192]
        assert cfg.G == cfg.U == 384
    elif name.startswith("SERVER_QSELD"):
        assert cfg.domain == "Q"
        assert cfg.domain_classifier == "R"
    elif name.startswith("SERVER_SELD"):
        assert cfg.domain == "R"


def test_unknown_key_tolerated(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("--phm_n=4\n--domain=Q\n")
    with pytest.warns(UserWarning, match="phm_n"):
        cfg = load_config(str(p))
    assert cfg.domain == "Q"


def test_list_coercions(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("--pool_size=[[8,2],[8,2],[2,2]]\n--D=[5,5]\n--fc_layers=[64]\n")
    cfg = load_config(str(p))
    assert cfg.pool_size == [[8, 2], [8, 2], [2, 2]]
    assert cfg.D == [5, 5]
    assert cfg.fc_layers == [64]


def test_overrides():
    cfg = load_config(overrides={"domain": "R", "batch_size": "4"})
    assert cfg.domain == "R" and cfg.batch_size == 4


def test_use_remat_tristate(tmp_path):
    """use_remat defaults to 'auto' (dtype-resolved: ON for f32, OFF for
    bf16 — BENCH.md's measured recommendation) and still accepts bool
    tokens from text configs."""
    from seld_tpu.config import resolve_use_remat

    cfg = SELDConfig()
    assert cfg.use_remat == "auto"
    assert resolve_use_remat(cfg) is True  # default compute_dtype=float32
    assert resolve_use_remat(cfg.replace(compute_dtype="bfloat16")) is False
    p = tmp_path / "c.txt"
    p.write_text("--use_remat=False\n")
    cfg = load_config(str(p))
    assert cfg.use_remat is False
    assert resolve_use_remat(cfg) is False
    p.write_text("--use_remat=True\n")
    cfg = load_config(str(p)).replace(compute_dtype="bfloat16")
    assert cfg.use_remat is True
    assert resolve_use_remat(cfg) is True
    p.write_text("--use_remat=auto\n")
    assert load_config(str(p)).use_remat == "auto"


def test_use_remat_reaches_model():
    from seld_tpu.models import model_from_config

    cfg = SELDConfig(compute_dtype="bfloat16")
    assert model_from_config(cfg).remat is False
    cfg = SELDConfig(compute_dtype="float32")
    assert model_from_config(cfg).remat is True


def test_local_configs_load():
    for path in sorted(glob.glob(os.path.join(LOCAL_CONFIG_DIR, "*.txt"))):
        cfg = load_config(path)
        assert cfg.output_classes == 14
