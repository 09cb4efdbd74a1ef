"""Serving endpoint tests: the HTTP sampler server end-to-end on the
virtual CPU mesh (a deployment surface the reference lacks — its
pipeline stops at `scripts/generate.py` batch generation)."""

import io
import json
import tempfile
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest
import yaml

from diffusion_model_universal_tpu.models import DDPM
from diffusion_model_universal_tpu.scripts.serve import (build_argparser,
                                                         make_server)

TINY = {"num_timesteps": 8, "image_size": 32, "in_channels": 3,
        "model_channels": 8, "compute_dtype": "float32"}


@pytest.fixture(scope="module")
def server():
    tmp = tempfile.mkdtemp()
    model = DDPM(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    ckpt = f"{tmp}/model.ckpt"
    model.save(ckpt, params)
    cfg_path = f"{tmp}/cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"model_config": TINY}, f)
    args = build_argparser().parse_args([
        "--config", cfg_path, "--model_type", "ddpm",
        "--checkpoint", ckpt, "--port", "0", "--serve_batch", "8"])
    srv = make_server(args)
    srv.service.warmup()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _url(srv, path):
    host, port = srv.server_address[:2]
    return f"http://{host}:{port}{path}"


def _post(srv, body: dict):
    req = urllib.request.Request(
        _url(srv, "/generate"), data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=120)


def test_healthz(server):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["model"] == "ddpm"
    assert info["serve_batch"] == 8
    assert info["devices"] == 8


def test_generate_png(server):
    with _post(server, {"num_samples": 4, "seed": 1}) as r:
        assert r.headers["Content-Type"] == "image/png"
        body = r.read()
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_generate_npy_shape_and_determinism(server):
    def fetch(seed):
        with _post(server, {"num_samples": 3, "seed": seed,
                            "format": "npy"}) as r:
            return np.load(io.BytesIO(r.read()))

    a, b, c = fetch(5), fetch(5), fetch(6)
    assert a.shape == (3, 32, 32, 3) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)       # same seed → same images
    assert np.abs(a - c).max() > 0            # different seed differs


def test_generate_rejects_oversized_batch(server):
    try:
        _post(server, {"num_samples": 99})
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "serve_batch" in json.loads(e.read())["error"]


def test_generate_rejects_bad_format_and_types(server):
    """ADVICE r1: unknown "format" must 400 (not silently fall through to
    PNG), and malformed field TYPES (null num_samples, string
    guidance_scale) must 400 as client errors, not 500."""
    for body in ({"num_samples": 2, "format": "jpeg"},
                 {"num_samples": None},
                 {"num_samples": 2, "class_id": 0, "guidance_scale": "x"}):
        try:
            _post(server, body)
            raise AssertionError(f"expected HTTP 400 for {body}")
        except urllib.error.HTTPError as e:
            assert e.code == 400, body


def test_unknown_path_404(server):
    try:
        urllib.request.urlopen(_url(server, "/nope"), timeout=30)
        raise AssertionError("expected HTTP 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_generate_class_id_rejected_on_unconditional(server):
    try:
        _post(server, {"num_samples": 2, "class_id": 3})
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "unconditional" in json.loads(e.read())["error"]


def test_conditional_server_cfg(tmp_path):
    """A conditional checkpoint serves CFG requests: valid class_id →
    PNG; out-of-range class_id → 400."""
    cond = dict(TINY, num_classes=10)
    model = DDPM(cond)
    params = model.init_params(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "model.ckpt")
    model.save(ckpt, params)
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"model_config": cond}, f)
    args = build_argparser().parse_args([
        "--config", cfg_path, "--model_type", "ddpm",
        "--checkpoint", ckpt, "--port", "0", "--serve_batch", "4"])
    srv = make_server(args)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            _url(srv, "/generate"),
            data=json.dumps({"num_samples": 2, "class_id": 5,
                             "guidance_scale": 2.0}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=180) as r:
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
        req2 = urllib.request.Request(
            _url(srv, "/generate"),
            data=json.dumps({"num_samples": 2, "class_id": 10}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req2, timeout=60)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()
        srv.server_close()


def test_serve_bench_script(tmp_path):
    """scripts/serve_bench.py end-to-end on the CPU mesh: all four
    phases (sequential PNG, sequential npy, concurrent clients,
    per-request dpm++ fast-sampler override) complete and the JSON
    summary has finite latency stats."""
    import runpy
    import sys
    from pathlib import Path

    script = str(Path(__file__).resolve().parent.parent / "scripts"
                 / "serve_bench.py")
    out = tmp_path / "serve_latency.json"
    argv = sys.argv
    sys.argv = ["serve_bench.py", "--model_channels", "8", "--steps", "4",
                "--serve_batch", "8", "--requests", "2",
                "--concurrency", "2", "--out", str(out)]
    try:
        with pytest.raises(SystemExit) as exc:
            runpy.run_path(script, run_name="__main__")
        assert exc.value.code == 0
    finally:
        sys.argv = argv
    results = json.loads(out.read_text())
    for phase in ("sequential_1_png", "sequential_batch_npy", "concurrent",
                  "sequential_1_png_dpmpp_20"):
        assert results[phase]["p50_ms"] > 0, (phase, results)
    assert results["concurrent"]["errors"] == 0
    assert results["sequential_batch_npy"]["images_per_sec"] > 0
    assert results["dpmpp_20_compile_s"] >= 0


def test_generate_fast_samplers(server):
    """POST /generate with a fast sampler: dpm++/strided produce valid
    .npy batches; unknown sampler names and non-int steps are 400s."""
    outs = {}
    for sampler in ("dpm++", "strided"):
        with _post(server, {"num_samples": 2, "seed": 3, "format": "npy",
                            "sampler": sampler, "sampler_steps": 4}) as r:
            arr = np.load(io.BytesIO(r.read()))
        assert arr.shape == (2, 32, 32, 3)
        assert np.isfinite(arr).all()
        outs[sampler] = arr
    # distinct samplers, same seed → different trajectories
    assert np.abs(outs["dpm++"] - outs["strided"]).max() > 1e-4

    for body in ({"num_samples": 2, "sampler": "euler"},
                 {"num_samples": 2, "sampler": "dpm++",
                  "sampler_steps": "many"},
                 {"num_samples": 2, "sampler": "dpm++",
                  "sampler_steps": 1}):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, body)
        assert e.value.code == 400
