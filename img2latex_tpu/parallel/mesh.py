"""Device mesh + sharding: data-parallel scale-out, optional model axis.

The reference is strictly single-device (``SURVEY.md`` §2: no
torch.distributed/NCCL/MPI anywhere; "device backend" = mps|cuda|cpu
selection, ``img2latex/utils/mps_utils.py:50-75``).  The TPU-native scale
story is the idiomatic JAX one:

* a ``Mesh`` over ``('data', 'model')`` (shape from config; ``-1`` = all
  remaining devices);
* batches sharded ``P('data')``, params replicated except an optional
  tensor-parallel group — the decoder's vocab projection and token embedding
  shard over ``'model'`` (the only >=O(V) matrices in this model family);
* ``jax.jit`` with explicit in/out shardings compiles one SPMD program; XLA
  inserts the gradient ``psum`` (over ICI within a slice) automatically.
  Multi-host extends via ``jax.distributed.initialize`` + the same mesh over
  DCN — no framework code changes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from img2latex_tpu.config import Config


def create_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    mesh_axes: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; ``-1`` in mesh_shape absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    shape = list(mesh_shape if mesh_shape is not None else (-1, 1))
    if len(shape) != len(mesh_axes):
        raise ValueError(f"mesh_shape {shape} rank != mesh_axes {mesh_axes}")
    known = int(np.prod([s for s in shape if s != -1])) if any(s != -1 for s in shape) else 1
    if any(s == -1 for s in shape):
        if n % known:
            raise ValueError(f"{n} devices not divisible by fixed mesh dims {known}")
        fill = n // known
        shape = [fill if s == -1 else s for s in shape]
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(mesh_axes))


def mesh_from_config(cfg: Config, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    return create_mesh(cfg.hardware.mesh_shape, cfg.hardware.mesh_axes, devices)


def product_mesh(cfg: Config, *batch_sizes: int, local_only: bool = False) -> Optional[Mesh]:
    """The mesh the product paths (Trainer/Predictor/Evaluator) should use,
    or ``None`` for the plain single-device jit.

    Activation follows ``hardware.use_mesh``: ``None`` auto-enables whenever
    more than one device is visible, ``False`` forces single-device, ``True``
    requires a mesh.  Every ``batch_sizes`` entry must divide over the data
    axis; when the configured shape cannot (e.g. tiny test batches on the
    8-device CPU mesh), the data axis shrinks to the largest compatible
    divisor (gcd of the batch sizes and the available device count) over a
    device subset, so the product path degrades gracefully instead of
    erroring.
    """
    import math

    want = cfg.hardware.use_mesh
    pool = jax.local_devices() if local_only else jax.devices()
    n = len(pool)
    if want is False or (want is None and n <= 1):
        return None
    if n <= 1:
        if want:
            raise ValueError("hardware.use_mesh=True but only one device is visible")
        return None
    axes = tuple(cfg.hardware.mesh_axes)
    shape = list(cfg.hardware.mesh_shape)
    model = 1
    if "model" in axes:
        m = shape[axes.index("model")]
        model = m if m not in (-1, 0) else 1
    if n % model:
        raise ValueError(f"{n} devices not divisible by model axis {model}")
    data = n // model
    if "data" in axes:
        d = shape[axes.index("data")]
        if d not in (-1, 0):
            data = min(data, d)
    for b in batch_sizes:
        data = math.gcd(data, int(b))
    if data <= 1 and model <= 1:
        if want:
            # Explicit use_mesh=True must never silently fall back to the
            # single-device jit (1-of-N-chips training with no error).
            raise ValueError(
                f"hardware.use_mesh=True but batch sizes {batch_sizes} share no "
                f"common divisor with the {n} visible devices (model axis "
                f"{model}); choose batch sizes divisible by the data-parallel "
                f"degree"
            )
        return None
    if data * model != n:
        import logging

        logging.getLogger("img2latex_tpu").warning(
            "product mesh degraded to %dx%d over %d of %d visible devices "
            "(batch sizes %s); choose batches divisible by the device count "
            "to use every chip",
            data, model, data * model, n, batch_sizes,
        )
    if not local_only and jax.process_count() > 1 and data * model != n:
        raise ValueError(
            f"multi-host run: batch sizes {batch_sizes} force a {data}x{model} "
            f"mesh that would not cover all {n} devices; choose batch sizes "
            f"divisible by the global data-parallel degree"
        )
    devs = pool[: data * model]
    dev_array = np.asarray(devs).reshape(
        [data if a == "data" else model if a == "model" else 1 for a in axes]
    )
    return Mesh(dev_array, axes)


# ---------------------------------------------------------------------------
# Sharding rules
# ---------------------------------------------------------------------------


def batch_pspec() -> P:
    return P("data")


def param_pspec(path_keys: Tuple, leaf) -> P:
    """Tensor-parallel rules for the vocab-sized matrices; everything else
    replicated.  Paths follow the flax param tree of ``Seq2SeqModel``."""
    keys = [getattr(k, "key", str(k)) for k in path_keys]
    if "out" in keys and keys[-1] == "kernel":
        return P(None, "model")  # (H, V) split over vocab
    if "out" in keys and keys[-1] == "bias":
        return P("model")
    if "embedding" in keys and keys[-1] == "embedding":
        return P("model", None)  # (V, E) split over vocab rows
    return P()


def state_shardings(mesh: Mesh, state: Any, shard_model_axis: bool = True) -> Any:
    """NamedSharding pytree for a TrainState (params get TP rules; opt-state
    moments mirror their params via matching paths; scalars replicated)."""

    def one(path, leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        if not shard_model_axis or mesh.shape.get("model", 1) == 1:
            return NamedSharding(mesh, P())
        spec = param_pspec(path, leaf)
        # Guard: only apply when the spec's axes divide the leaf dims.
        dims = list(spec)
        for i, ax in enumerate(dims):
            if ax is None:
                continue
            if i >= leaf.ndim or leaf.shape[i] % mesh.shape[ax] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, state)


def batch_shardings(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, batch_pspec()), batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Placement helpers
# ---------------------------------------------------------------------------


def put_replicated(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def put_state(state: Any, mesh: Mesh, shard_model_axis: bool = True) -> Any:
    return jax.device_put(state, state_shardings(mesh, state, shard_model_axis))


def put_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    sharding = NamedSharding(mesh, batch_pspec())
    return jax.device_put(batch, sharding)


def put_global_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Host batch -> P('data')-sharded global array.

    Single-process: a plain sharded ``device_put``.  Multi-host: each process
    passes only its LOCAL rows (``B_global / process_count`` of them — the
    loader's per-process shard) and the result is the global array assembled
    across processes (``jax.make_array_from_process_local_data``) — batch row
    ``p*B_local + j`` lives on process ``p``, matching the loader's slicing.
    """
    sharding = NamedSharding(mesh, batch_pspec())
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)), batch
    )


def host_local_view(arr: Any) -> np.ndarray:
    """The rows of a P('data')-sharded array addressable from this process,
    concatenated in row order (the whole array on single-process runs).

    With a model axis > 1 the array is replicated over 'model', so each data
    block appears once PER model-axis device in ``addressable_shards`` —
    keep exactly one shard per distinct row range or the view would contain
    duplicated rows."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    by_start: Dict[int, Any] = {}
    for s in arr.addressable_shards:
        start = (s.index[0].start or 0) if s.index else 0
        if start not in by_start:
            by_start[start] = s
    shards = [by_start[k] for k in sorted(by_start)]
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def shard_train_step(train_step, mesh: Mesh, state: Any, batch: Dict[str, Any],
                     shard_model_axis: bool = True):
    """jit the pure train step with explicit in/out shardings over the mesh.

    The compiled program is SPMD across all mesh devices; gradient reduction
    over 'data' rides ICI via XLA-inserted collectives.
    """
    st_sh = state_shardings(mesh, state, shard_model_axis)
    b_sh = batch_shardings(mesh, batch)
    return jax.jit(
        train_step,
        in_shardings=(st_sh, b_sh, None),
        out_shardings=(st_sh, None),
        donate_argnums=(0,),
    )
