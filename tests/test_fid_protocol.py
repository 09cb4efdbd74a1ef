"""The literature-FID command path (VERDICT r4 #5).

The single missing reference capability is literature-comparable FID —
blocked only on real InceptionV3 weights this zero-egress environment
cannot download (`/root/reference/utils/benchmarks.py:33-40`). These
tests pre-wire the payoff so the one documented command (README
"Literature FID") produces the reference-protocol 50k CIFAR-10 FID the
moment ``$DMU_INCEPTION_WEIGHTS`` exists:

* the command is smoke-tested END-TO-END with a random-weights npz —
  the full `--eval_only --benchmark` CLI drives the pure-JAX InceptionV3
  through the env-var path, no fallback;
* the 50k-sample default of the reference's `--eval_only` protocol
  (`scripts/train.py:138`) is pinned, as is the 2k post-train default.
"""

import json

import numpy as np
import pytest

from tests.test_cli import _write_config


@pytest.mark.slow
def test_eval_only_real_inception_fid_smoke(tmp_path, monkeypatch, capsys):
    """README's literature-FID command, end-to-end with random weights:
    `DMU_INCEPTION_WEIGHTS=... train --eval_only --benchmark` must route
    through the real InceptionV3 (no random-extractor fallback) and
    write finite FID/IS."""
    import jax

    import diffusion_model_universal_tpu.utils.inception as inc
    from diffusion_model_universal_tpu.scripts import train as train_cli

    npz = str(tmp_path / "inception_random.npz")
    inc.save_inception_npz(
        inc.init_inception_params(jax.random.PRNGKey(0)), npz)
    monkeypatch.setenv("DMU_INCEPTION_WEIGHTS", npz)

    # Tiny n_samples via the config block (the 50k default is pinned
    # separately below — running it would be a day of CPU).
    cfg_path = _write_config(tmp_path, benchmark=True,
                             bench_extra="  use_inception: true\n")
    rc = train_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                         "--eval_only", "--benchmark"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Falling back" not in out and "unavailable" not in out, out
    results = json.loads(
        (tmp_path / "out" / "benchmark_results.json").read_text())
    for k in ("fid", "is_mean", "is_std", "ssim", "psnr"):
        assert k in results and np.isfinite(results[k]), (k, results)


def test_eval_only_benchmark_defaults_to_reference_50k(tmp_path,
                                                       monkeypatch):
    """With no benchmark.n_samples configured, `--eval_only --benchmark`
    must use the reference's 50,000-sample protocol
    (`/root/reference/scripts/train.py:138`) and request the real
    InceptionV3; the post-train default is 2,000 (`:172`)."""
    import diffusion_model_universal_tpu.utils.benchmarks as B
    from diffusion_model_universal_tpu.scripts import train as train_cli

    captured = {}

    class FakeBenchmark:
        def __init__(self, n_samples, batch_size, use_inception, **kw):
            captured.update(n_samples=n_samples, batch_size=batch_size,
                            use_inception=use_inception)

        def evaluate(self, model, params, loader, sample_dir=None):
            return {"fid": 1.0, "is_mean": 1.0, "is_std": 0.0,
                    "ssim": 0.5, "psnr": 10.0}

    monkeypatch.setattr(B, "DiffusionBenchmark", FakeBenchmark)
    cfg_path = _write_config(tmp_path)  # no benchmark block at all
    rc = train_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                         "--eval_only", "--benchmark"])
    assert rc == 0
    assert captured["n_samples"] == 50000
    assert captured["use_inception"] is True

    captured.clear()
    rc = train_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                         "--benchmark"])
    assert rc == 0
    assert captured["n_samples"] == 2000
