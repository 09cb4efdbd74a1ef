"""Distributed-correctness tests on the 8-device virtual CPU mesh
(SURVEY.md §4 'Distributed': the pmean-synced loss must equal the
single-device loss on the same global batch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from diffusion_model_universal_tpu.models import DDPM
from diffusion_model_universal_tpu.parallel import mesh as M
from diffusion_model_universal_tpu.trainers import DDPMTrainer
from diffusion_model_universal_tpu.datasets import (DeviceDataLoader,
                                                    make_augment_fn)
from diffusion_model_universal_tpu.datasets.sources import make_synthetic

TINY = {
    "num_timesteps": 8, "image_size": 32, "in_channels": 3,
    "model_channels": 8, "compute_dtype": "float32", "use_pallas": False,
    "remat": False, "loss_config": {"use_time_weighting": False},
}


def _config(tmp_path, batch_size=16):
    return {
        "model_name": "DDPM",
        "training": {"num_epochs": 1, "batch_size": batch_size,
                     "learning_rate": 1e-3,
                     "scheduler": {"type": "constant"}, "ema_decay": 0.99,
                     "val_interval": 0, "sample_interval": 0,
                     "checkpoint_interval": 0},
        "logging": {"use_wandb": False, "use_tensorboard": False},
        "output": {"output_dir": str(tmp_path / "out")},
    }


def _loader(batch_size=16, n=64):
    imgs = make_synthetic(num_samples=n, image_size=32)
    aug = make_augment_fn([{"name": "normalize"}], [0.5] * 3, [0.5] * 3,
                          train=True)
    return DeviceDataLoader(imgs, batch_size=batch_size, augment=aug)


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = M.make_mesh()
    assert mesh.shape == {"data": 8, "spatial": 1, "model": 1}
    assert not M.uses_activation_sharding(mesh)
    mesh2 = M.make_mesh(model_parallel=2)
    assert mesh2.shape == {"data": 4, "spatial": 1, "model": 2}
    mesh3 = M.make_mesh(model_parallel=2, spatial_parallel=2)
    assert mesh3.shape == {"data": 2, "spatial": 2, "model": 2}
    assert M.uses_activation_sharding(mesh3)
    with pytest.raises(ValueError):
        M.make_mesh(data_parallel=3, model_parallel=2)


def test_batch_sharding_places_shards():
    mesh = M.make_mesh()
    x = jnp.zeros((16, 4, 4, 3))
    xs = M.shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == 8
    # Each device holds 16/8 = 2 rows.
    shard = xs.addressable_shards[0]
    assert shard.data.shape == (2, 4, 4, 3)


def test_param_sharding_fsdp_axis():
    mesh = M.make_mesh(model_parallel=2)
    params = {"big": jnp.zeros((512, 512)), "small": jnp.zeros((4,))}
    shardings = M.param_sharding(mesh, params)
    assert shardings["big"].spec != P()     # sharded somewhere
    assert shardings["small"].spec == P()   # replicated


def test_dp_train_step_matches_single_device(tmp_path, monkeypatch):
    """8-way DP on a replicated model must produce the same loss, gradient
    norm, and updated params as a 1-device run on the same global batch.

    Uses SGD for the param comparison: a first Adam step is sign-like
    (update ≈ ±lr·sign(g)), so reduction-order float noise on noise-floor
    gradients flips whole updates — not a distributed-correctness signal.
    With SGD, update = lr·grad, and parity holds to float precision.
    """
    import optax as _optax
    from diffusion_model_universal_tpu.trainers import optim as optim_mod

    def sgd_optimizer(training_cfg, steps_per_epoch, num_epochs):
        sched = _optax.constant_schedule(1e-3)
        return _optax.sgd(sched), sched

    monkeypatch.setattr(optim_mod, "make_optimizer", sgd_optimizer)

    cfg = _config(tmp_path)
    loader = _loader()
    batch = next(iter(loader))

    model = DDPM(TINY)
    tr8 = DDPMTrainer(model, loader, loader, loader, cfg,
                      mesh=M.make_mesh())
    tr1 = DDPMTrainer(model, loader, loader, loader, cfg,
                      mesh=M.make_mesh(jax.devices()[:1]))

    key = tr8._step_key(0)
    m8 = tr8.step(batch, key)
    m1 = tr1.step(batch, key)
    s8, s1 = tr8.state, tr1.state

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m8["grad_norm"]),
                               float(m1["grad_norm"]), rtol=1e-5)
    l8 = jax.tree_util.tree_leaves(s8.params)
    l1 = jax.tree_util.tree_leaves(s1.params)
    for a, b in zip(l8, l1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)
    tr8.cleanup()
    tr1.cleanup()


def test_fsdp_mesh_train_step_runs(tmp_path):
    """4×2 (data×model) mesh: sharded params + sharded batch compile and
    produce a finite loss matching the replicated run."""
    cfg = _config(tmp_path)
    loader = _loader()
    batch = next(iter(loader))
    model = DDPM(dict(TINY, model_channels=16))

    tr = DDPMTrainer(model, loader, loader, loader, cfg,
                     mesh=M.make_mesh(model_parallel=2))
    trr = DDPMTrainer(model, loader, loader, loader, cfg,
                      mesh=M.make_mesh(jax.devices()[:1]))
    key = tr._step_key(0)
    m = tr.step(batch, key)
    mr = trr.step(batch, key)
    assert np.isfinite(float(m["loss"]))
    np.testing.assert_allclose(float(m["loss"]), float(mr["loss"]),
                               rtol=1e-4)
    tr.cleanup()
    trr.cleanup()


def test_tp_sp_train_step_matches_single_device(tmp_path):
    """2×2×2 (data×spatial×model) mesh with activation sharding — true
    tensor parallelism ("embed"→model) + spatial parallelism
    ("height"→spatial) via the UNet's logical constraints — must compile
    and match the single-device loss on the same global batch."""
    cfg = _config(tmp_path)
    loader = _loader()
    # Fixed-order val loader (as get_dataset builds: registry.py shuffle=
    # False for val/test) — a SHUFFLED loader advances its epoch cursor
    # per iteration, so two validate() calls would draw different
    # batch/key pairings and differ by eval-noise, not sharding error.
    vload = DeviceDataLoader(loader.images, batch_size=16,
                             augment=loader.augment, shuffle=False)
    batch = next(iter(loader))
    model = DDPM(dict(TINY, model_channels=16))

    tr = DDPMTrainer(model, loader, vload, vload, cfg,
                     mesh=M.make_mesh(model_parallel=2, spatial_parallel=2))
    trr = DDPMTrainer(model, loader, vload, vload, cfg,
                      mesh=M.make_mesh(jax.devices()[:1]))
    # Sharded eval path first, on IDENTICAL params (after an Adam step the
    # sign-like first update amplifies reduction-order noise — see the SGD
    # note in test_dp_train_step_matches_single_device).
    v, vr = tr.validate(), trr.validate()
    np.testing.assert_allclose(v, vr, rtol=1e-4)
    key = tr._step_key(0)
    m = tr.step(batch, key)
    mr = trr.step(batch, key)
    assert np.isfinite(float(m["loss"]))
    np.testing.assert_allclose(float(m["loss"]), float(mr["loss"]),
                               rtol=1e-4)
    tr.cleanup()
    trr.cleanup()


def test_activation_sharding_inserts_collectives():
    """The TP/SP annotations must be REAL: under the activation sharding
    scope the compiled forward contains XLA collectives (channel gathers /
    halo exchanges), and without the scope it contains none."""
    from jax.sharding import NamedSharding

    mesh = M.make_mesh(model_parallel=2, spatial_parallel=2)
    model = DDPM(dict(TINY, model_channels=16))
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((4, 32, 32, 3))
    t = jnp.zeros((4,), jnp.int32)

    f = jax.jit(model.apply,
                in_shardings=(None,
                              NamedSharding(mesh, P(M.DATA_AXIS)), None))
    with M.activation_sharding_scope(mesh):
        txt = f.lower(params, x, t).compile().as_text()
    colls = ("all-gather", "all-reduce", "collective-permute",
             "reduce-scatter", "all-to-all")
    assert any(c in txt for c in colls), "TP/SP produced no collectives"

    plain = jax.jit(model.apply).lower(params, x, t).compile().as_text()
    assert not any(c in plain for c in colls)


def test_sampling_scope_distributes_generation():
    """`sampling_scope` runs the jitted sampler sharded over the mesh:
    DP (8-way) generation is bitwise identical to single-device (the
    partitionable threefry PRNG is value-semantic under sharding) and the
    result is actually placed across all devices. TP/SP sampling runs and
    stays close (float noise compounds through the reverse scan)."""
    model = DDPM(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)

    ref = np.asarray(model.generate_samples(params, key, 8))
    with M.sampling_scope(M.make_mesh()):          # 8-way DP
        out = model.generate_samples(params, key, 8)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out), ref)

    with M.sampling_scope(M.make_mesh(model_parallel=2,
                                      spatial_parallel=2)):
        out2 = model.generate_samples(params, key, 8)
    assert len(out2.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out2), ref, atol=0.1)

    with M.sampling_scope(None):                    # no mesh → no-op
        out3 = model.generate_samples(params, key, 8)
    np.testing.assert_array_equal(np.asarray(out3), ref)


def test_sampling_ragged_batch_with_offmesh_inputs(tmp_path):
    """Regression: a batch that does NOT divide the data axis, with jit
    inputs created OUTSIDE the mesh scope (the CLI/serving pattern —
    params loaded from a checkpoint, key built at argparse time). Without
    mesh_replicated, GSPMD picks a partial output sharding (e.g. tile
    [2,1,1,1,4] for batch 2 on an 8-way data axis) that JAX cannot map
    back to a NamedSharding → compile-time ValueError."""
    model = DDPM(TINY)
    model.save(str(tmp_path / "m.ckpt"), model.init_params(
        jax.random.PRNGKey(0)))
    params = model.load(str(tmp_path / "m.ckpt"))   # committed off-mesh
    key = jax.random.PRNGKey(7)                     # committed off-mesh
    image = np.zeros((2,) + tuple(model.sample_shape(1)[1:]), np.float32)
    mask = np.zeros((1,) + image.shape[1:3] + (1,), np.float32)

    mesh = M.make_mesh()                            # 8-way DP
    params, key, image, mask = M.mesh_replicated(
        mesh, (params, key, image, mask))
    with M.sampling_scope(mesh):
        out = model.generate_samples(params, key, 2)
        out_dpm = model.generate_samples_dpm(params, key, 2, num_steps=4)
        out_inp = model.generate_samples_inpaint(params, key, image, mask)
    assert np.asarray(out).shape[0] == 2
    assert np.asarray(out_dpm).shape[0] == 2
    assert np.asarray(out_inp).shape[0] == 2

    # mesh=None / size-1 mesh: helper is an exact no-op
    assert M.mesh_replicated(None, key) is key


def test_graft_entry_dryrun():
    """The driver's multi-chip dry run must pass on the CPU mesh."""
    import importlib.util
    import pathlib
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        pathlib.Path(__file__).resolve().parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_opt_state_sharding_structure():
    import optax
    mesh = M.make_mesh(model_parallel=2)
    params = {"w": jnp.zeros((256, 128)), "b": jnp.zeros((4,))}
    p_shard = M.param_sharding(mesh, params)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt_state = opt.init(params)
    o_shard = M.opt_state_sharding(opt_state, params, p_shard, mesh)
    placed = jax.device_put(opt_state, o_shard)  # structure-compatible
    assert jax.tree_util.tree_structure(placed) == \
        jax.tree_util.tree_structure(opt_state)


def test_global_batch_contract(tmp_path):
    """_global_batch places a host batch with batch-axis sharding over the
    'data' mesh axis; shape is preserved and each device holds B/data rows
    (docs/multihost.md contract)."""
    cfg = _config(tmp_path)
    loader = _loader()
    model = DDPM(TINY)
    tr = DDPMTrainer(model, loader, loader, loader, cfg,
                     mesh=M.make_mesh())  # 8-way data parallel
    batch = next(iter(loader))
    g = tr._global_batch(batch)
    assert g.shape == batch.shape
    assert len(g.sharding.device_set) == 8
    assert g.addressable_shards[0].data.shape[0] == batch.shape[0] // 8
    # Loader length (steps/epoch) is rank-invariant for even shards.
    ls = [len(type(loader)(loader.images, batch_size=4,
                           augment=loader.augment, world_size=2, rank=r))
          for r in range(2)]
    assert ls[0] == ls[1]
    tr.cleanup()


def test_sharded_checkpoint_roundtrip_fsdp_mesh(tmp_path):
    """Orbax checkpoint save/restore with FSDP-SHARDED params + opt state
    (4×2 data×model mesh): restored arrays must be value-identical and
    re-placed with the correct shardings, and the next step must run."""
    cfg = _config(tmp_path)
    cfg["training"]["checkpoint_interval"] = 0
    loader = _loader()
    model = DDPM(dict(TINY, model_channels=16))
    mesh = M.make_mesh(model_parallel=2)
    tr = DDPMTrainer(model, loader, loader, loader, cfg, mesh=mesh)
    batch = next(iter(loader))
    tr.step(batch)
    assert tr.save_checkpoint("checkpoint_epoch_0", 0) is not None

    tr2 = DDPMTrainer(DDPM(dict(TINY, model_channels=16)), loader, loader,
                      loader, cfg, mesh=mesh)
    assert tr2.load_checkpoint() == 1
    specs = []
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.params),
                    jax.tree_util.tree_leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # Restored placement must match the trainer's sharding plan.
        assert b.sharding.spec == a.sharding.spec, (a.sharding, b.sharding)
        specs.append(b.sharding.spec)
    # At least one parameter is genuinely model-sharded after restore
    # (not silently replicated).
    assert any(s != P() for s in specs), "no sharded leaves restored"
    m2 = tr2.step(batch)
    assert np.isfinite(float(m2["loss"]))
    tr.cleanup()
    tr2.cleanup()


def test_local_devices_helper():
    """--num_devices contract shared by train/generate/serve CLIs."""
    assert len(M.local_devices()) == 8
    assert len(M.local_devices(None)) == 8
    assert M.local_devices(3) == jax.devices()[:3]


def test_eval_counts_every_sample_any_layout(tmp_path):
    """VERDICT r1 #8: eval must pad+mask ragged batches (not trim), so the
    val/test loss covers EVERY sample and is invariant to batch_size and
    data-axis size on a fixed, unshuffled set (50 samples: ragged under
    both batch 16 on 8 devices and batch 12 on 1 device)."""
    cfg = _config(tmp_path)
    imgs = make_synthetic(num_samples=50, image_size=32)
    aug = make_augment_fn([{"name": "normalize"}], [0.5] * 3, [0.5] * 3,
                          train=False)
    model = DDPM(TINY)
    vals = []
    for bs, mesh in [(16, M.make_mesh()),
                     (16, M.make_mesh(jax.devices()[:1])),
                     (12, M.make_mesh()),
                     (50, M.make_mesh(jax.devices()[:2]))]:
        loader = DeviceDataLoader(imgs, batch_size=bs, augment=aug,
                                  shuffle=False, drop_last=False)
        tr = DDPMTrainer(model, loader, loader, loader, cfg, mesh=mesh)
        vals.append(tr.validate())
        tr.cleanup()
    assert np.isfinite(vals[0])
    for v in vals[1:]:
        np.testing.assert_allclose(vals[0], v, rtol=1e-5)


def test_grad_accum_step_matches_single_device(tmp_path, monkeypatch):
    """The gradient-accumulation step under 8-way DP equals the same
    accumulation on one device — the in-jit scan + mean-of-grads must
    commute with batch sharding (SGD for the same float-noise rationale
    as test_dp_train_step_matches_single_device)."""
    import optax as _optax
    from diffusion_model_universal_tpu.trainers import optim as optim_mod

    def sgd_optimizer(training_cfg, steps_per_epoch, num_epochs):
        sched = _optax.constant_schedule(1e-3)
        return _optax.sgd(sched), sched

    monkeypatch.setattr(optim_mod, "make_optimizer", sgd_optimizer)

    cfg = _config(tmp_path)
    cfg["training"]["grad_accum_steps"] = 2
    loader = _loader()
    it = iter(loader)
    mbs = [next(it), next(it)]

    model = DDPM(TINY)
    tr8 = DDPMTrainer(model, loader, loader, loader, cfg,
                      mesh=M.make_mesh())
    tr1 = DDPMTrainer(model, loader, loader, loader, cfg,
                      mesh=M.make_mesh(jax.devices()[:1]))

    key = jax.random.PRNGKey(7)
    m8 = tr8.accum_step(mbs, key=key)
    m1 = tr1.accum_step(mbs, key=key)

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(tr8.state.params),
                    jax.tree_util.tree_leaves(tr1.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)
    assert int(tr8.state.step) == int(tr1.state.step) == 1
    tr8.cleanup()
    tr1.cleanup()
