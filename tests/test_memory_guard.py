"""HBM preflight for the scan samplers (VERDICT r4 #4).

The round-4 sampler batch sweep crashed the TPU worker outright on an
ancestral B=1024 64² request (BENCH_NOTES "Sampler batch sweep") — a
program `generate.py --num_samples 1024` can build today. These tests
pin the planner (`utils/memory.py`) on CPU: the crash-anchor config must
chunk, impossible configs must refuse with a message, and the generate
CLI must transparently produce the full sample count through the
chunked path.
"""

import numpy as np
import pytest

from diffusion_model_universal_tpu.utils.memory import (
    SamplerMemoryError, estimate_sampler_bytes, plan_sampler_chunks)

GIB = 1024 ** 3


def test_small_requests_are_one_chunk():
    chunk, n = plan_sampler_chunks(64, image_size=64, model_channels=128,
                                   budget_bytes=8 * GIB)
    assert (chunk, n) == (64, 1)


def test_no_budget_means_no_chunking(monkeypatch):
    # CPU backend + no env override → device_memory_budget() is None.
    monkeypatch.delenv("DMU_SAMPLER_HBM_BYTES", raising=False)
    chunk, n = plan_sampler_chunks(4096, image_size=64, model_channels=128)
    assert (chunk, n) == (4096, 1)


def test_crash_anchor_b1024_chunks_on_16gib_budget():
    """The exact config that killed the TPU worker in round 4: B=1024,
    64², C=128 bf16, 16 GiB chip (planner budget = 50% = 8 GiB). The
    plan must split it, every chunk must fit, and the chunks must cover
    the request."""
    params_bytes = 64 * 10**6 * 2  # ~64M params in bf16
    budget = 8 * GIB
    chunk, n = plan_sampler_chunks(1024, image_size=64, model_channels=128,
                                   params_bytes=params_bytes,
                                   budget_bytes=budget)
    assert n >= 2, "B=1024 @ 64² must be chunked on a 16 GiB chip"
    assert chunk * n >= 1024
    assert estimate_sampler_bytes(chunk, 64, 128,
                                  params_bytes=params_bytes) <= budget
    # The estimate itself must flag the whole request as over budget.
    assert estimate_sampler_bytes(1024, 64, 128,
                                  params_bytes=params_bytes) > budget
    # ...while the measured-working B=256 run fits comfortably.
    assert estimate_sampler_bytes(256, 64, 128,
                                  params_bytes=params_bytes) <= budget


def test_chunks_are_device_aligned():
    # Budget is PER DEVICE: ceil(1000/8)=125 samples/device ≈ 1.06 GB,
    # over a 0.5 GiB budget → must chunk, on 8-device boundaries.
    chunk, n = plan_sampler_chunks(1000, image_size=64, model_channels=128,
                                   n_devices=8, budget_bytes=GIB // 2)
    assert n >= 2 and chunk % 8 == 0 and chunk * n >= 1000


def test_impossible_request_refuses_with_message():
    with pytest.raises(SamplerMemoryError, match="GB"):
        plan_sampler_chunks(4, image_size=1024, model_channels=256,
                            budget_bytes=1 * GIB)


def test_env_override_reaches_planner(monkeypatch):
    monkeypatch.setenv("DMU_SAMPLER_HBM_BYTES", str(4 * GIB))
    chunk, n = plan_sampler_chunks(1024, image_size=64, model_channels=128)
    assert n >= 2  # budget = 2 GiB after the 50% fraction


def test_generate_cli_chunked_path(tmp_path, monkeypatch, capsys):
    """End-to-end: a budget small enough to force chunking still yields
    the full sample count (ragged last chunk included), and the
    preflight announces the split."""
    import jax

    from diffusion_model_universal_tpu.models import DDPM
    from diffusion_model_universal_tpu.scripts import generate as gen_cli
    from tests.test_cli import _write_config

    cfg_path = _write_config(tmp_path)
    model = DDPM({"num_timesteps": 8, "image_size": 32, "in_channels": 3,
                  "model_channels": 8, "compute_dtype": "float32",
                  "use_pallas": False, "remat": False})
    params = model.init_params(jax.random.PRNGKey(0))
    ckpt = tmp_path / "model.ckpt"
    model.save(str(ckpt), params)

    # Budget sized so 7 samples don't fit but exactly 3 do → 3 chunks
    # with a ragged tail (7 = 3 + 3 + 1). params_bytes mirrors the CLI's
    # own computation so the boundary is exact.
    params_bytes = sum(a.size * a.dtype.itemsize
                       for a in jax.tree_util.tree_leaves(params))
    fit3 = estimate_sampler_bytes(3, 32, 8, dtype_bytes=4,
                                  params_bytes=params_bytes)
    monkeypatch.setenv("DMU_SAMPLER_HBM_BYTES", str(int(fit3 / 0.5)))
    out_dir = tmp_path / "gen"
    # --num_devices 1: the planner budgets PER DEVICE, and on the suite's
    # 8-virtual-device mesh 7 samples are 1/device — pin one device so
    # the chunk boundary is the whole batch.
    rc = gen_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                       "--checkpoint", str(ckpt), "--num_devices", "1",
                       "--num_samples", "7", "--output_dir", str(out_dir)])
    assert rc == 0
    assert "HBM preflight" in capsys.readouterr().out
    pngs = sorted(out_dir.glob("sample_*.png"))
    assert len(pngs) == 7
    assert (out_dir / "samples_grid.png").exists()


def test_generate_cli_refusal_is_clean(tmp_path, monkeypatch):
    import jax

    from diffusion_model_universal_tpu.models import DDPM
    from diffusion_model_universal_tpu.scripts import generate as gen_cli
    from tests.test_cli import _write_config

    cfg_path = _write_config(tmp_path)
    model = DDPM({"num_timesteps": 8, "image_size": 32, "in_channels": 3,
                  "model_channels": 8, "compute_dtype": "float32",
                  "use_pallas": False, "remat": False})
    ckpt = tmp_path / "model.ckpt"
    model.save(str(ckpt), model.init_params(jax.random.PRNGKey(0)))

    monkeypatch.setenv("DMU_SAMPLER_HBM_BYTES", "1000")  # absurd
    with pytest.raises(SystemExit, match="budget"):
        gen_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                      "--checkpoint", str(ckpt), "--num_samples", "4",
                      "--output_dir", str(tmp_path / "g")])
