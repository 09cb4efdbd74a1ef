"""End-to-end CLI tests: the minimum slice from SURVEY.md §7 —
config → data → model → trainer → checkpoint → generate reload."""

import textwrap

import numpy as np
import pytest


def _write_config(tmp_path, model_type="ddpm", benchmark=False,
                  bench_extra=""):
    extra = ""
    if model_type == "ddim":
        extra = "  ddim_sampling_steps: 4\n  eta: 0.0\n"
    bench_block = ""
    if benchmark:
        bench_block = textwrap.dedent("""\
            benchmark:
              n_samples: 8
              batch_size: 8
              save_samples: true
              use_inception: false
        """) + bench_extra
    cfg = textwrap.dedent(f"""
        model_name: "{model_type.upper()}"
        model_config:
          time_steps: 8
          beta_start: 0.0001
          beta_end: 0.02
          image_size: 32
          image_channels: 3
          hidden_channels: 8
          compute_dtype: float32
          use_pallas: false
          remat: false
          loss_type: mse
          loss_config:
            use_time_weighting: false
        {extra}
        training:
          num_epochs: 1
          batch_size: 8
          learning_rate: 1e-3
          ema_decay: 0.99
          scheduler:
            type: constant
          val_interval: 0
          sample_interval: 0
          checkpoint_interval: 1
        data:
          dataset: "synthetic"
          data_dir: "unused"
          num_samples: 256
        logging:
          use_wandb: false
          use_tensorboard: false
          log_interval: 1000
        output:
          output_dir: "{tmp_path}/out"
    """) + bench_block
    path = tmp_path / f"{model_type}.yaml"
    path.write_text(cfg)
    return path


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    """train.py runs a full tiny epoch, writes checkpoints, then
    generate.py reloads and samples — the reference's primary user flow
    (`scripts/train.py` + `scripts/generate.py`)."""
    from diffusion_model_universal_tpu.scripts import train as train_cli

    cfg_path = _write_config(tmp_path)
    rc = train_cli.main(["--config", str(cfg_path), "--model_type", "ddpm"])
    assert rc == 0
    ckpt_dir = tmp_path / "out" / "checkpoints"
    names = {p.name for p in ckpt_dir.iterdir()}
    assert "checkpoint_epoch_0" in names
    assert "final_model" in names

    from diffusion_model_universal_tpu.scripts import generate as gen_cli
    out_dir = tmp_path / "gen"
    rc = gen_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                       "--checkpoint", str(ckpt_dir / "final_model"),
                       "--num_samples", "4", "--output_dir", str(out_dir),
                       "--grid_only"])
    assert rc == 0
    assert (out_dir / "samples_grid.png").exists()


@pytest.mark.slow
def test_train_cli_resume(tmp_path):
    from diffusion_model_universal_tpu.scripts import train as train_cli

    cfg_path = _write_config(tmp_path)
    assert train_cli.main(["--config", str(cfg_path),
                           "--model_type", "ddpm"]) == 0
    # Resume from latest; num_epochs(1) − start_epoch(1) = 0 further epochs.
    assert train_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                           "--resume", "latest"]) == 0


def test_argparser_surface():
    """CLI flag parity with the reference (`train.py:211-220`,
    `generate.py:81-89`)."""
    from diffusion_model_universal_tpu.scripts import generate as gen_cli
    from diffusion_model_universal_tpu.scripts import train as train_cli

    tp = train_cli.build_argparser()
    args = tp.parse_args(["--config", "c.yaml", "--model_type", "ddpm",
                          "--resume", "x", "--eval_only", "--benchmark"])
    assert args.eval_only and args.benchmark and args.resume == "x"

    gp = gen_cli.build_argparser()
    args = gp.parse_args(["--config", "c.yaml", "--model_type", "ddim",
                          "--checkpoint", "ck", "--num_samples", "9",
                          "--output_dir", "o"])
    assert args.num_samples == 9
    with pytest.raises(SystemExit):
        tp.parse_args(["--config", "c.yaml", "--model_type", "bogus"])

    # The reference's --num_gpus spelling (train.py:219) is a drop-in
    # alias for --num_devices.
    args = tp.parse_args(["--config", "c.yaml", "--model_type", "ddpm",
                          "--num_gpus", "4"])
    assert args.num_devices == 4


@pytest.mark.slow
def test_eval_only_benchmark_cli(tmp_path):
    """--eval_only --benchmark: test loss + FID/IS/SSIM/PSNR results file
    (reference `scripts/train.py:127-156`)."""
    import json
    from diffusion_model_universal_tpu.scripts import train as train_cli

    cfg_path = _write_config(tmp_path, benchmark=True)
    rc = train_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                         "--eval_only", "--benchmark"])
    assert rc == 0
    results = json.loads(
        (tmp_path / "out" / "benchmark_results.json").read_text())
    for k in ("fid", "is_mean", "is_std", "ssim", "psnr"):
        assert k in results and np.isfinite(results[k]), (k, results)
    # save_samples: true → at least one sample batch written
    sample_dir = tmp_path / "out" / "benchmark_samples"
    assert sample_dir.exists() and any(sample_dir.iterdir())


@pytest.mark.slow
def test_eval_only_benchmark_dpm_sampler_cli(tmp_path):
    """benchmark.sampler: dpm++ flows from YAML through train.py into
    DiffusionBenchmark (the fast-ODE-sampler fidelity path)."""
    import json
    from diffusion_model_universal_tpu.scripts import train as train_cli

    cfg_path = _write_config(
        tmp_path, benchmark=True,
        bench_extra="  sampler: \"dpm++\"\n  sampler_steps: 4\n")
    rc = train_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                         "--eval_only", "--benchmark"])
    assert rc == 0
    results = json.loads(
        (tmp_path / "out" / "benchmark_results.json").read_text())
    for k in ("fid", "is_mean", "ssim", "psnr"):
        assert k in results and np.isfinite(results[k]), (k, results)


@pytest.mark.slow
def test_generate_cli_inpaint(tmp_path):
    """--inpaint_image/--inpaint_mask: known region kept exactly, masked
    region regenerated, misuse exits cleanly."""
    import jax

    from diffusion_model_universal_tpu.models import DDPM
    from diffusion_model_universal_tpu.scripts import generate as gen_cli

    cfg_path = _write_config(tmp_path)
    model = DDPM({"num_timesteps": 8, "image_size": 32, "in_channels": 3,
                  "model_channels": 8, "compute_dtype": "float32",
                  "use_pallas": False, "remat": False})
    params = model.init_params(jax.random.PRNGKey(0))
    ckpt = tmp_path / "model.ckpt"
    model.save(str(ckpt), params)

    image = np.linspace(-0.5, 0.5, 32, dtype=np.float32)[:, None, None]
    image = np.broadcast_to(image, (32, 32, 3)).copy()
    mask = np.zeros((32, 32), np.float32)
    mask[:16] = 1.0
    np.save(tmp_path / "img.npy", image)
    np.save(tmp_path / "mask.npy", mask)

    out_dir = tmp_path / "inpaint"
    rc = gen_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                       "--checkpoint", str(ckpt),
                       "--inpaint_image", str(tmp_path / "img.npy"),
                       "--inpaint_mask", str(tmp_path / "mask.npy"),
                       "--num_samples", "2", "--output_dir", str(out_dir)])
    assert rc == 0
    assert (out_dir / "samples_grid.png").exists()

    # misuse: mask missing → clean SystemExit, not a traceback
    with pytest.raises(SystemExit):
        gen_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                      "--checkpoint", str(ckpt),
                      "--inpaint_image", str(tmp_path / "img.npy")])
    # misuse: dpm++ sampler with inpainting
    with pytest.raises(SystemExit):
        gen_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                      "--checkpoint", str(ckpt), "--sampler", "dpm++",
                      "--inpaint_image", str(tmp_path / "img.npy"),
                      "--inpaint_mask", str(tmp_path / "mask.npy")])


def test_generate_cli_heun_sampler(tmp_path):
    """--sampler heun: Karras-spaced Heun runs end-to-end from a saved
    checkpoint; bad step counts exit cleanly like the dpm++ path."""
    import jax

    from diffusion_model_universal_tpu.models import DDPM
    from diffusion_model_universal_tpu.scripts import generate as gen_cli

    cfg_path = _write_config(tmp_path)
    model = DDPM({"num_timesteps": 8, "image_size": 32, "in_channels": 3,
                  "model_channels": 8, "compute_dtype": "float32",
                  "use_pallas": False, "remat": False})
    params = model.init_params(jax.random.PRNGKey(0))
    ckpt = tmp_path / "model.ckpt"
    model.save(str(ckpt), params)

    out_dir = tmp_path / "heun"
    rc = gen_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                       "--checkpoint", str(ckpt), "--sampler", "heun",
                       "--sampler_steps", "4",
                       "--num_samples", "2", "--output_dir", str(out_dir),
                       "--grid_only"])
    assert rc == 0
    assert (out_dir / "samples_grid.png").exists()

    # misuse: steps out of [2, T] → clean SystemExit, not a traceback
    with pytest.raises(SystemExit):
        gen_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                      "--checkpoint", str(ckpt), "--sampler", "heun",
                      "--sampler_steps", "1", "--num_samples", "2",
                      "--output_dir", str(out_dir)])


def test_generate_cli_strided_sampler(tmp_path):
    """--sampler strided: respaced ancestral sampling end-to-end from a
    saved checkpoint (incl. a learn_sigma checkpoint); bad step counts
    exit cleanly."""
    import jax

    from diffusion_model_universal_tpu.models import DDPM
    from diffusion_model_universal_tpu.scripts import generate as gen_cli

    cfg_path = _write_config(tmp_path)
    model = DDPM({"num_timesteps": 8, "image_size": 32, "in_channels": 3,
                  "model_channels": 8, "compute_dtype": "float32",
                  "use_pallas": False, "remat": False, "learn_sigma": True})
    params = model.init_params(jax.random.PRNGKey(0))
    ckpt = tmp_path / "model.ckpt"
    model.save(str(ckpt), params)

    out_dir = tmp_path / "strided"
    rc = gen_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                       "--checkpoint", str(ckpt), "--sampler", "strided",
                       "--sampler_steps", "4",
                       "--num_samples", "2", "--output_dir", str(out_dir),
                       "--grid_only"])
    assert rc == 0
    assert (out_dir / "samples_grid.png").exists()

    with pytest.raises(SystemExit):
        gen_cli.main(["--config", str(cfg_path), "--model_type", "ddpm",
                      "--checkpoint", str(ckpt), "--sampler", "strided",
                      "--sampler_steps", "1", "--num_samples", "2",
                      "--output_dir", str(out_dir)])
