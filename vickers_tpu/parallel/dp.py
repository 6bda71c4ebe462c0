"""Parallelism layer: data-parallel training + SPMD inference over a mesh.

The reference is strictly single-device (SURVEY §2.3: no torch.distributed,
no NCCL, DataLoader num_workers=0).  This layer is the TPU-native scaling
story (BASELINE config 5):

- ``make_dp_train_step``: shard_map over the ``data`` mesh axis — each shard
  computes grads on its batch slice, grads and BatchNorm running-stat
  updates are ``psum``-averaged over ICI, and every shard applies the same
  AdamW update to its replicated params.  This is the explicit-collective
  formulation (grad all-reduce == DDP semantics, plus synced BN stats which
  DDP does not give).
- ``make_spmd_infer_fn``: jit with sharding annotations — the batch axis is
  sharded over ``data`` and, optionally, the image height over ``model``
  (spatial partitioning, the conv-net analog of sequence parallelism; XLA
  GSPMD inserts the conv halo exchanges automatically).
- ``shard_batch`` / ``replicate``: placement helpers.

Everything here runs identically on a real pod slice and on the virtual
``xla_force_host_platform_device_count`` CPU mesh used in tests.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from vickers_tpu.core.config import AugmentConfig
from vickers_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
from vickers_tpu.models.unet import VickersUNet
from vickers_tpu.train.engine import TrainState, _prepare_batch
from vickers_tpu.train.losses import bce_dice_loss_sharded


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with their leading axis sharded over the data axis."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def make_dp_train_step(model: VickersUNet, tx: optax.GradientTransformation,
                       aug: Optional[AugmentConfig], mesh: Mesh):
    """Data-parallel train step.  Batch must divide the data-axis size.

    Per-shard: augment -> forward/backward (bf16) -> local grads.
    Cross-shard: psum-mean of grads, loss and BN stats over ICI.
    """

    def shard_fn(state: TrainState, imgs_u8, masks_u8, weights, key):
        # decorrelate augmentation RNG across shards
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        x, y = _prepare_batch(imgs_u8, masks_u8, key, aug)

        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            loss = bce_dice_loss_sharded(logits, y, weights, DATA_AXIS)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # the loss already contains the cross-shard collectives, so grads are
        # global; the pmean below is an idempotent safety net for numerics
        grads = jax.lax.pmean(grads, DATA_AXIS)
        new_stats = jax.lax.pmean(new_stats, DATA_AXIS)   # SyncBN running stats
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt,
        ), loss

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_spmd_infer_fn(model: VickersUNet, mesh: Mesh, spatial: bool = False):
    """Batched sharded forward: imgs (B, S, S, 3) uint8 -> probs (B, S, S).

    ``spatial=True`` additionally shards image height over the model axis —
    XLA GSPMD materializes the halo exchanges for every conv/pool window.
    """
    in_spec = P(DATA_AXIS, MODEL_AXIS if spatial else None, None, None)

    @functools.partial(
        jax.jit,
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, in_spec)),
        out_shardings=NamedSharding(mesh, P(DATA_AXIS)),
    )
    def fn(variables, imgs_u8):
        from vickers_tpu.ops.image import normalize_imagenet

        x = normalize_imagenet(imgs_u8.astype(jnp.float32))
        logits = model.apply(variables, x, train=False)[..., 0]
        return jax.nn.sigmoid(logits)

    return fn
