"""Multi-device tests on the virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vickers_tpu.core.config import AugmentConfig, TrainConfig
from vickers_tpu.core.mesh import create_mesh
from vickers_tpu.models.unet import build_model, init_model
from vickers_tpu.parallel.dp import (
    make_dp_train_step,
    make_spmd_infer_fn,
    replicate,
    shard_batch,
)
from vickers_tpu.train.engine import create_train_state, make_optimizer, make_train_step


@pytest.fixture()
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = create_mesh(num_devices=8)
    model = build_model(dtype=jnp.float32)
    params, stats = init_model(model, jax.random.PRNGKey(0), img_size=64)
    cfg = TrainConfig(lr=1e-3, epochs=10)
    tx = make_optimizer(cfg)
    state = create_train_state(model, params, stats, tx)
    return mesh, model, tx, state


def _batch(n=8, s=64, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 256, (n, s, s, 3)).astype(np.uint8)
    masks = (rng.random((n, s, s)) > 0.7).astype(np.uint8)
    w = np.ones(n, np.float32)
    return imgs, masks, w


def test_dp_step_runs_and_syncs(setup):
    mesh, model, tx, state = setup
    step = make_dp_train_step(model, tx, None, mesh)
    imgs, masks, w = _batch()
    imgs, masks, w = shard_batch(mesh, imgs, masks, w)
    state_r = replicate(mesh, jax.tree.map(jnp.copy, state))
    new_state, loss = step(state_r, imgs, masks, w, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # params advanced and stayed replicated
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     new_state.params, state.params)
    assert max(jax.tree.leaves(d)) > 0


def test_dp_matches_single_device_step(setup):
    """DP over 8 shards ~= single-device step on the same full batch.

    BCE and dice use global-batch semantics (psum-reduced), but BatchNorm
    normalizes with *per-shard* batch statistics in train mode (the standard
    DDP semantic), so the losses agree only to ~1e-3 at batch-1-per-shard —
    the tolerance below checks the collectives wiring, not bit equality."""
    mesh, model, tx, state = setup
    imgs, masks, w = _batch(seed=1)

    single = make_train_step(model, tx, None)
    s1, loss1 = single(jax.tree.map(jnp.copy, state), imgs, masks, w,
                       jax.random.PRNGKey(0))

    dp = make_dp_train_step(model, tx, None, mesh)
    sharded = shard_batch(mesh, imgs, masks, w)
    state_copy = jax.tree.map(jnp.copy, state)
    s2, loss2 = dp(replicate(mesh, state_copy), *sharded,
                   jax.random.PRNGKey(0))

    assert abs(float(loss1) - float(loss2)) < 5e-3
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         s1.params, s2.params)
    # one AdamW step is bounded by ~lr per weight; BN-stat differences may
    # flip low-signal coordinates, so allow a fraction of 2*lr
    assert max(jax.tree.leaves(diffs)) < 2.5e-3


def test_spmd_infer_batch_sharded(setup):
    mesh, model, tx, state = setup
    fn = make_spmd_infer_fn(model, mesh, spatial=False)
    imgs, _, _ = _batch(n=16)
    probs = fn({"params": state.params, "batch_stats": state.batch_stats},
               shard_batch(mesh, imgs))
    assert probs.shape == (16, 64, 64)
    assert np.all(np.isfinite(np.asarray(probs)))


def test_spmd_infer_spatial_sharding():
    """2-axis mesh: batch over data, image height over model (halo exchange
    via GSPMD)."""
    mesh = create_mesh(num_devices=8, model_parallel=2)
    model = build_model(dtype=jnp.float32)
    params, stats = init_model(model, jax.random.PRNGKey(0), img_size=64)
    fn_sp = make_spmd_infer_fn(model, mesh, spatial=True)
    fn_np = make_spmd_infer_fn(model, mesh, spatial=False)
    imgs, _, _ = _batch(n=4)
    v = {"params": params, "batch_stats": stats}
    p1 = np.asarray(fn_sp(v, jax.device_put(imgs)))
    p2 = np.asarray(fn_np(v, jax.device_put(imgs)))
    # sharding must not change numerics beyond float reassociation
    assert np.max(np.abs(p1 - p2)) < 1e-5
