"""CLI surface tests: train → config.json + checkpoint → generate.

The reference has no CLI ("port over CLI" is an unfinished TODO,
reference README.md:227); gigagan_tpu/cli.py provides one.  These tests
drive it end-to-end on the tiny-model mock-data path.
"""

import json

import numpy as np
import pytest

from gigagan_tpu.cli import main

# end-to-end CLI train loops are compile-bound (~15 min on one CPU core)
pytestmark = pytest.mark.slow

TINY = {
    # smallest config that exercises the full CLI surface: 16px, no attn
    # (attention is covered extensively elsewhere), one multiscale input,
    # one aux-recon head — keeps the compile-bound fixture ~4x cheaper
    # than a 32px model on the 1-core CI box
    "generator": {
        "dim_capacity": 4,
        "style_network": {"dim": 16, "depth": 1},
        "image_size": 16,
        "dim_max": 32,
        "self_attn_resolutions": (),
        "cross_attn_resolutions": (),
        "unconditional": True,
    },
    "discriminator": {
        "dim_capacity": 4,
        "dim_max": 32,
        "image_size": 16,
        "attn_resolutions": (),
        "multiscale_input_resolutions": (8,),
        "aux_recon_resolutions": (8,),
        "unconditional": True,
    },
    "amp": False,
    "apply_gradient_penalty_every": 0,
    "log_steps_every": 10 ** 9,
    "save_and_sample_every": 2,
    "early_save_thres_steps": 0,
    "num_samples": 4,
    "seed": 0,
}


@pytest.fixture(scope="module")
def trained_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    cfg = dict(TINY)
    cfg_path = root / "cfg.json"
    cfg_path.write_text(json.dumps(cfg, default=list))
    models = root / "models"
    results = root / "results"
    rc = main([
        "train",
        "--config", str(cfg_path),
        "--mock-data",
        "--image-size", "16",
        "--batch-size", "8",
        "--steps", "2",
        "--models", str(models),
        "--results", str(results),
    ])
    assert rc == 0
    return models, results


def test_train_writes_config_and_checkpoint(trained_folder):
    models, results = trained_folder
    cfg = json.loads((models / "config.json").read_text())
    assert cfg["generator"]["image_size"] == 16
    assert cfg["model_folder"] == str(models)
    assert list(models.glob("model-*.ckpt")), "no checkpoint written"
    assert list(results.glob("sample-*.png")), "no sample grid written"


def test_generate_from_model_folder(trained_folder, tmp_path):
    models, _ = trained_folder
    out = tmp_path / "grid.png"
    rc = main([
        "generate", "--models", str(models),
        "--num", "4", "--seed", "0", "--out", str(out),
    ])
    assert rc == 0
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.ndim == 3 and img.shape[-1] in (3, 4)
    assert img.std() > 0  # not a constant image


def test_evaluate_from_model_folder(trained_folder, tmp_path, capsys):
    """`evaluate` computes CLIP-FID of EMA samples vs a real set and is
    honest about mock CLIP weights (no asset on this box)."""
    models, _ = trained_folder
    out = tmp_path / "eval.json"
    rc = main([
        "evaluate", "--models", str(models), "--mock-data",
        "--num", "8", "--batch", "4", "--out", str(out),
    ])
    assert rc == 0
    rec = json.loads(out.read_text())
    assert rec["metric"] == "clip_fid"
    assert rec["n_real"] == rec["n_fake"] == 8
    assert np.isfinite(rec["clip_fid"]) and rec["clip_fid"] >= 0
    assert rec["clip_is_real"] is False and rec["mock_reasons"]


def test_resume_auto(trained_folder):
    models, results = trained_folder
    rc = main([
        "train",
        "--config", str(models / "config.json"),
        "--mock-data",
        "--batch-size", "8",
        "--steps", "1",
        "--models", str(models),
        "--results", str(results),
        "--resume",
    ])
    assert rc == 0


def test_train_requires_data():
    with pytest.raises(AssertionError, match="--data"):
        main(["train", "--steps", "1", "--image-size", "16"])


TINY_UP = {
    "train_upsampler": True,
    "generator": {
        "style_network": {"dim": 16, "depth": 1},
        "dim": 8,
        "image_size": 16,
        "input_image_size": 8,
        "dim_mults": (1, 2),
        "full_attn": (False, True),
        "cross_attn": (False, False),
        "attn_depths": (1, 1),
        "temporal_attn_depths": (1, 1),
        "num_conv_kernels": 2,
        "unconditional": True,
    },
    "discriminator": {
        "dim_capacity": 4,
        "dim_max": 32,
        "image_size": 16,
        "attn_resolutions": (),
        "multiscale_input_resolutions": (8,),
        "aux_recon_resolutions": (),
        "aux_recon_patch_dims": (),
        "aux_recon_frac_patches": (),
        "unconditional": True,
    },
    "amp": False,
    "apply_gradient_penalty_every": 0,
    "log_steps_every": 10 ** 9,
    "save_and_sample_every": 1,
    "early_save_thres_steps": 0,
    "num_samples": 2,
    "seed": 0,
}


def test_upsampler_cli_roundtrip(tmp_path):
    """train-upsampler for 1 step, then `upsample` a PNG via the CLI."""
    cfg_path = tmp_path / "up.json"
    cfg_path.write_text(json.dumps(TINY_UP, default=list))
    models = tmp_path / "models"
    rc = main([
        "train-upsampler",
        "--config", str(cfg_path),
        "--mock-data",
        "--input-size", "8",
        "--image-size", "16",
        "--batch-size", "8",
        "--steps", "1",
        "--models", str(models),
        "--results", str(tmp_path / "results"),
    ])
    assert rc == 0

    from PIL import Image

    low = tmp_path / "low.png"
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (8, 8, 3), dtype=np.uint8), "RGB"
    ).save(low)
    out = tmp_path / "high.png"
    rc = main([
        "upsample", "--models", str(models),
        "--input", str(low), "--seed", "0", "--out", str(out),
    ])
    assert rc == 0
    img = np.asarray(Image.open(out))
    assert img.shape[0] == 16 and img.shape[1] == 16
