"""Trainer: epoch orchestration, validation, LR plateau, early stop, checkpoints.

Capability parity with reference ``img2latex/training/trainer.py:27-822``:
label-smoothed masked CE, Adam(+L2) with grad accumulation and clip (inside
the compiled step, see ``steps.py``/``optim.py``), ReduceLROnPlateau + early
stopping on val loss, epoch- and step-cadence checkpointing with a best
pointer, experiment registry status transitions initialized->training->
completed, per-epoch ``metrics.json`` and enhanced-metrics JSON artifacts.

TPU-native differences: the device never syncs mid-epoch (one small metrics
pytree is pulled per step); validation BLEU uses the same teacher-forced
argmax convention as the reference (``trainer.py:537-563``); OOM
batch-halving (``trainer.py:782-814``) is intentionally absent — XLA shapes
are static, memory is a compile-time property.
"""

from __future__ import annotations

from functools import partial
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from img2latex_tpu.config import Config
from img2latex_tpu.data.tokenizer import LaTeXTokenizer
from img2latex_tpu.parallel.distributed import is_primary_host
from img2latex_tpu.parallel.mesh import (
    host_local_view,
    product_mesh,
    put_global_batch,
    put_state,
    state_shardings,
)
from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model
from img2latex_tpu.ops.metrics import calculate_metrics, compute_all_metrics
from img2latex_tpu.training.optim import (
    EarlyStopping,
    PlateauScheduler,
    build_optimizer,
    get_learning_rate,
    set_learning_rate,
)
from img2latex_tpu.training.steps import TrainState, create_train_state, make_eval_step, make_train_step
from img2latex_tpu.utils import checkpoint as ckpt_lib
from img2latex_tpu.utils.logging import get_logger
from img2latex_tpu.utils.paths import PathManager
from img2latex_tpu.utils.registry import ExperimentRegistry

logger = get_logger(__name__)


def _trim_batch_ids(ids: np.ndarray, targets: np.ndarray, pad_id: int, end_id: int):
    """Per-row: cut prediction/target at target's non-PAD length and at END,
    mirroring how the reference collects validation BLEU inputs
    (``trainer.py:537-563``)."""
    preds, tgts = [], []
    for p_row, t_row in zip(ids, targets):
        t_list = [int(t) for t in t_row if t != pad_id]
        if end_id in t_list:
            t_list = t_list[: t_list.index(end_id)]
        p_list = [int(x) for x in p_row[: len(t_list)]]
        preds.append(p_list)
        tgts.append(t_list)
    return preds, tgts


class Trainer:
    def __init__(
        self,
        cfg: Config,
        tokenizer: LaTeXTokenizer,
        loaders: Dict[str, Iterable],
        model: Optional[Seq2SeqModel] = None,
        paths: Optional[PathManager] = None,
        registry: Optional[ExperimentRegistry] = None,
        experiment_name: Optional[str] = None,
    ):
        self.cfg = cfg
        from img2latex_tpu.utils.profiling import apply_rng_impl, enable_compilation_cache

        # Before any PRNGKey exists: dropout keys derive from the ones made
        # below, so the impl switch must come first.
        apply_rng_impl(cfg.hardware.rng_impl)
        enable_compilation_cache(cfg.hardware.compilation_cache_dir)
        self.tokenizer = tokenizer
        self.loaders = loaders
        self.model = model or build_model(cfg, tokenizer.vocab_size)
        self.paths = paths
        self.registry = registry
        self.experiment_name = experiment_name or cfg.training.experiment_name

        self.tx = build_optimizer(cfg)
        self._train_step_fn = make_train_step(self.model, self.tx, cfg, tokenizer.pad_token_id)
        self._eval_step_fn = make_eval_step(self.model, cfg, tokenizer.pad_token_id)

        rng = jax.random.PRNGKey(cfg.training.seed)
        self.rng, init_rng = jax.random.split(rng)
        self.state: TrainState = create_train_state(self.model, self.tx, cfg, init_rng)

        # Converted torchvision backbone weights (reference loads
        # IMAGENET1K_V1 at encoder construction, encoder.py:184-199; here it
        # is an explicit artifact produced by scripts/convert_torchvision_resnet.py).
        pretrained = cfg.model.encoder.resnet.pretrained_path
        if cfg.model.name == "resnet_lstm" and pretrained:
            from img2latex_tpu.models.pretrained import load_converted_resnet

            variables = {"params": self.state.params, "batch_stats": self.state.batch_stats}
            variables = load_converted_resnet(variables, pretrained)
            self.state = self.state.replace(
                params=variables["params"],
                batch_stats=variables["batch_stats"],
                opt_state=self.tx.init(variables["params"]),
            )
            logger.info("Loaded pretrained backbone from %s", pretrained)

        # --- device mesh: the product path scales past one chip (pjit/SPMD
        # over ICI).  Auto-enabled whenever >1 device is visible; batches
        # shard P('data'), params replicate (or TP-shard the vocab matrices
        # when hardware.mesh_shape has a model axis >1).  The same step
        # functions compile either way — mesh presence only changes the
        # in/out shardings handed to jax.jit.
        train_bs = self.loaders["train"].batch_size if "train" in self.loaders else cfg.data.batch_size
        eval_loader = self.loaders.get("validate")
        eval_bs = eval_loader.batch_size if eval_loader is not None else train_bs
        self.mesh = product_mesh(cfg, train_bs, eval_bs)
        if self.mesh is not None:
            self.state = put_state(self.state, self.mesh)
            logger.info(
                "mesh active: %s over %d devices",
                dict(self.mesh.shape),
                self.mesh.size,
            )
        self._compile_steps()

        self.scheduler = PlateauScheduler(
            cfg.training.learning_rate,
            factor=cfg.training.lr_plateau_factor,
            patience=cfg.training.lr_plateau_patience,
        )
        self.early_stopping = EarlyStopping(cfg.training.early_stopping_patience)
        self.start_epoch = 0
        self.best_val_loss = float("inf")
        self.history: Dict[int, Dict[str, float]] = {}
        self._device_cache = None  # lazy HBM-resident train split (data.device_cache)
        self._cached_step = None

        if (
            self.registry is not None
            and is_primary_host()
            and self.registry.get(self.experiment_name) is None
        ):
            self.registry.register_experiment(
                self.experiment_name,
                description=f"{cfg.model.name} on {cfg.data.data_dir}",
                auto_version=False,
            )

    # ------------------------------------------------------------------
    def _compile_steps(self) -> None:
        """jit the train/eval steps — plain single-device, or SPMD over the
        mesh with explicit in/out shardings (state: TP rules via
        ``state_shardings``; batch: P('data'))."""
        if self.mesh is None:
            self.train_step = jax.jit(self._train_step_fn, donate_argnums=(0,))
            self.eval_step = jax.jit(self._eval_step_fn)
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        st_sh = state_shardings(self.mesh, self.state)
        data_sh = NamedSharding(self.mesh, P("data"))
        self.train_step = jax.jit(
            self._train_step_fn,
            in_shardings=(st_sh, data_sh, None),
            out_shardings=(st_sh, None),
            donate_argnums=(0,),
        )
        self.eval_step = jax.jit(
            self._eval_step_fn,
            in_shardings=(st_sh, data_sh),
        )

    def _place_batch(self, batch: Dict[str, Any]):
        """Host batch -> device: sharded P('data') over the mesh, or a plain
        transfer on the single-device path."""
        device_batch = {
            "images": batch["images"],
            "formulas": batch["formulas"],
        }
        if self.mesh is not None:
            return put_global_batch(device_batch, self.mesh)
        return {k: jnp.asarray(v) for k, v in device_batch.items()}

    # ------------------------------------------------------------------
    @property
    def ckpt_dir(self):
        if self.paths is not None:
            return self.paths.get_dir(self.experiment_name, "checkpoints")
        return None

    def _metrics_dir(self):
        if self.paths is not None:
            return str(self.paths.get_dir(self.experiment_name, "metrics"))
        return None

    # ------------------------------------------------------------------
    def save_checkpoint(self, epoch: int, is_best: bool = False) -> None:
        if self.ckpt_dir is None:
            return
        if not is_primary_host():
            # Multi-host: params/opt-state are replicated, every host holds
            # the full state — only the primary writes (VERDICT r1 item 2).
            return
        state_tree = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "batch_stats": self.state.batch_stats,
            "step": self.state.step,
        }
        meta = {
            "epoch": epoch,
            "step": int(self.state.step),
            "best_val_loss": self.best_val_loss,
            "config": self.cfg.to_dict(),
            "tokenizer_config": self.tokenizer.to_config(),
            "metrics": self.history.get(epoch, {}),
            # Host-side loop state: without these a resume restarts the
            # plateau scheduler at the config LR (the first post-resume
            # plateau would then RAISE the effective LR) and resets the
            # early-stop patience window.
            "scheduler": self.scheduler.state_dict(),
            "early_stopping": self.early_stopping.state_dict(),
        }
        ckpt_lib.save_checkpoint(
            self.ckpt_dir, state_tree, meta, step=int(self.state.step), is_best=is_best
        )
        logger.info("Saved checkpoint at step %d (best=%s)", int(self.state.step), is_best)

    def load_checkpoint(self, path: str, step: Optional[int] = None) -> None:
        ckpt_dir, found_step = ckpt_lib.resolve_checkpoint_path(path)
        template = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "batch_stats": self.state.batch_stats,
            "step": self.state.step,
        }
        state_tree, meta = ckpt_lib.restore_checkpoint(
            ckpt_dir, step if step is not None else found_step, template=template
        )
        self.state = TrainState(
            step=jnp.asarray(state_tree["step"], jnp.int32),
            params=state_tree["params"],
            opt_state=state_tree["opt_state"],
            batch_stats=state_tree["batch_stats"],
        )
        if self.mesh is not None:
            self.state = put_state(self.state, self.mesh)
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.best_val_loss = float(meta.get("best_val_loss", float("inf")))
        if "scheduler" in meta:
            self.scheduler.load_state_dict(meta["scheduler"])
        else:
            # Older checkpoint without host loop state: at least re-sync the
            # scheduler's LR from the restored opt_state so a post-resume
            # plateau can't RAISE the learning rate.
            lr = get_learning_rate(self.state.opt_state)
            if lr is not None:
                self.scheduler.lr = float(lr)
        if "early_stopping" in meta:
            self.early_stopping.load_state_dict(meta["early_stopping"])
        logger.info(
            "Resumed from %s at step %d (epoch %d, lr %.3e)",
            path, int(self.state.step), self.start_epoch, self.scheduler.lr,
        )

    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    def _use_device_cache(self) -> bool:
        want = bool(getattr(self.cfg.data, "device_cache", False))
        if want and jax.process_count() > 1:
            if not getattr(self, "_warned_cache_multihost", False):
                logger.warning(
                    "data.device_cache=true is ignored on multi-host runs "
                    "(per-process loaders stream instead)"
                )
                self._warned_cache_multihost = True
            return False
        if want and self.cfg.data.augment:
            if not getattr(self, "_warned_cache_augment", False):
                logger.warning(
                    "data.device_cache=true is ignored with data.augment=true "
                    "(augmentation is host-side PIL); using the host loader. "
                    "data.augment_device=true composes with the cache — the "
                    "warp runs inside the jitted step (ops/augment.py)"
                )
                self._warned_cache_augment = True
            return False
        return want

    def _cache_budget(self, fallback_gib: float, share: float) -> int:
        """HBM budget for a device cache: the explicit config knob if set,
        else ``share`` of the device's free HBM (live memory_stats), else the
        fixed fallback (backends that report no stats, e.g. CPU)."""
        knob = getattr(self.cfg.data, "device_cache_budget_gb", None)
        if knob:
            return int(knob * 1024**3)
        from img2latex_tpu.utils.device import free_device_memory_bytes

        free = free_device_memory_bytes()
        if free:
            return int(free * share)
        return int(fallback_gib * 1024**3)

    def _cache_store_channels(self, c: int) -> int:
        """Channel count to STORE in a device cache: 1 when
        ``data.device_cache_grayscale`` is set and the model eats multi-
        channel images (the gathered batch is tiled back to ``c`` on
        device), else ``c``."""
        if getattr(self.cfg.data, "device_cache_grayscale", False) and c > 1:
            return 1
        return c

    @staticmethod
    def _tile_channels(images, c: int):
        """(B,H,W,1) uint8 -> (B,H,W,c): undo grayscale cache storage."""
        return jnp.broadcast_to(
            images, images.shape[:-1] + (c,)
        ) if images.shape[-1] == 1 and c > 1 else images

    def _get_device_cache(self):
        """HBM-resident train split: images (N,H,W,C) uint8 + token ids
        (N,L) int32, uploaded ONCE.  Batches are gathered on device by a
        per-epoch permutation — no per-step host->device traffic.

        Under a mesh the cache shards P('data') over the sample axis (each
        device holds N/dp samples) and the per-epoch permutation is
        *per-shard*: every global batch takes B/dp samples from each shard's
        local permutation, so the gather stays device-local (shard_map, no
        collectives).  Batch composition is a different — statistically
        equivalent — shuffle than the host loader's global permutation."""
        if self._device_cache is not None:
            return self._device_cache
        ds = self.loaders["train"].dataset
        n = len(ds)
        h, w, c = self.cfg.image_shape
        c_store = self._cache_store_channels(c)
        dp = self.mesh.shape["data"] if self.mesh is not None else 1
        est = n * (h * w * c_store + self.tokenizer.max_sequence_length * 4)
        budget = self._cache_budget(fallback_gib=4.0, share=0.6) * dp
        if est > budget:
            logger.warning(
                "device_cache would use %.2f GiB of HBM (> %.2f GiB budget); "
                "falling back to the host loader",
                est / 1024**3,
                budget / 1024**3,
            )
            self._device_cache = False
            return False
        # Pad the sample axis to a multiple of dp (wrap-around duplicates)
        # so every shard holds the same count; n_pad == n when dp == 1.
        n_pad = ((n + dp - 1) // dp) * dp
        forms = np.zeros((n_pad, self.tokenizer.max_sequence_length), np.int32)

        def fill(c_s: int):
            arr = np.zeros((n_pad, h, w, c_s), np.uint8)
            for i in range(n_pad):
                img = ds.image(i % n)
                if c_s != c and not np.array_equal(
                    img, np.broadcast_to(img[..., :1], img.shape)
                ):
                    # Non-grayscale source: 1-channel storage would be lossy.
                    logger.warning(
                        "device_cache_grayscale: image %d has unequal "
                        "channels; storing the full %d-channel cache", i % n, c
                    )
                    return None
                arr[i] = img[..., :c_s]
                forms[i] = ds.token_ids(i % n)
            return arr

        imgs = fill(c_store)
        if imgs is None:
            c_store = c
            est = n * (h * w * c + self.tokenizer.max_sequence_length * 4)
            if est > budget:
                logger.warning(
                    "full-channel device_cache would use %.2f GiB (> %.2f GiB "
                    "budget); falling back to the host loader",
                    est / 1024**3, budget / 1024**3,
                )
                self._device_cache = False
                return False
            imgs = fill(c)
        self._cache_tile_train = c_store != c
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P("data"))
            images_dev = jax.device_put(imgs, sh)
            formulas_dev = jax.device_put(forms, sh)
        else:
            images_dev = jnp.asarray(imgs)
            formulas_dev = jnp.asarray(forms)
        self._device_cache = {
            "images": images_dev,
            "formulas": formulas_dev,
            "n": n,
            "n_pad": n_pad,
            "dp": dp,
        }
        logger.info(
            "device_cache: %d samples (%.2f GiB%s) resident in HBM over %d device(s)",
            n,
            est / 1024**3,
            ", grayscale-stored" if self._cache_tile_train else "",
            dp,
        )
        return self._device_cache

    def _get_cached_step(self):
        if self._cached_step is not None:
            return self._cached_step
        B = self.cfg.data.batch_size
        C = self.cfg.image_shape[2]  # tile grayscale-stored caches back
        step_fn = self._train_step_fn

        if self.mesh is None:
            # donate the state like the plain path does (train_step's own
            # donate_argnums is ignored when it is inlined under this jit).
            @partial(jax.jit, donate_argnums=(0,))
            def cached_step(state, images_all, formulas_all, perm, i, rng):
                idx = jax.lax.dynamic_slice(perm, (i * B,), (B,))
                batch = {
                    "images": self._tile_channels(
                        jnp.take(images_all, idx, axis=0), C
                    ),
                    "formulas": jnp.take(formulas_all, idx, axis=0),
                }
                return step_fn(state, batch, rng)

            self._cached_step = cached_step
            return cached_step

        # Mesh path: the cache is sharded P('data') over samples and the
        # permutation is per-shard local indices — each device gathers its
        # own B/dp rows (shard_map keeps the gather collective-free), and the
        # result is already the P('data')-sharded global batch.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from img2latex_tpu.parallel.mesh import state_shardings as _st_sh

        mesh = self.mesh
        dp = mesh.shape["data"]
        Bl = B // dp
        try:
            from jax import shard_map  # jax >= 0.5
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map

        def local_gather(im, fo, pe, i):
            idx = jax.lax.dynamic_slice(pe, (i * Bl,), (Bl,))
            return jnp.take(im, idx, axis=0), jnp.take(fo, idx, axis=0)

        gather = shard_map(
            local_gather,
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P()),
            out_specs=(P("data"), P("data")),
        )
        st_sh = _st_sh(mesh, self.state)
        data_sh = NamedSharding(mesh, P("data"))

        @partial(
            jax.jit,
            in_shardings=(st_sh, data_sh, data_sh, data_sh, None, None),
            out_shardings=(st_sh, None),
            donate_argnums=(0,),
        )
        def cached_step_mesh(state, images_all, formulas_all, perm, i, rng):
            imgs, fos = gather(images_all, formulas_all, perm, i)
            imgs = self._tile_channels(imgs, C)
            return step_fn(state, {"images": imgs, "formulas": fos}, rng)

        self._cached_step = cached_step_mesh
        return cached_step_mesh

    def _get_val_device_cache(self):
        """HBM-resident validate split, padded to a whole number of eval
        batches (pad rows: zero images + all-PAD formulas, which contribute
        zero to the masked loss/accuracy — the same contract as the host
        loader's padded tail)."""
        if getattr(self, "_val_device_cache", None) is not None:
            return self._val_device_cache
        loader = self.loaders.get("validate")
        if loader is None:
            self._val_device_cache = False
            return False
        ds = loader.dataset
        n = len(ds)
        B = loader.batch_size
        h, w, c = self.cfg.image_shape
        c_store = self._cache_store_channels(c)
        n_pad = ((n + B - 1) // B) * B
        est = n_pad * (h * w * c_store + self.tokenizer.max_sequence_length * 4)
        if est > self._cache_budget(fallback_gib=2.0, share=0.3):
            logger.warning("val device_cache over HBM budget; using the host loader")
            self._val_device_cache = False
            return False
        forms = np.full(
            (n_pad, self.tokenizer.max_sequence_length),
            self.tokenizer.pad_token_id,
            np.int32,
        )

        def fill(c_s: int):
            arr = np.zeros((n_pad, h, w, c_s), np.uint8)
            for i in range(n):
                img = ds.image(i)
                if c_s != c and not np.array_equal(
                    img, np.broadcast_to(img[..., :1], img.shape)
                ):
                    logger.warning(
                        "device_cache_grayscale: val image %d has unequal "
                        "channels; storing the full %d-channel cache", i, c
                    )
                    return None
                arr[i] = img[..., :c_s]
                forms[i] = ds.token_ids(i)
            return arr

        imgs = fill(c_store)
        if imgs is None:
            est = n_pad * (h * w * c + self.tokenizer.max_sequence_length * 4)
            if est > self._cache_budget(fallback_gib=2.0, share=0.3):
                logger.warning("val device_cache over HBM budget; using the host loader")
                self._val_device_cache = False
                return False
            imgs = fill(c)
        if self.mesh is not None:
            # Replicated (val splits are small; the budget check above holds
            # per device) — sequential batch slices then stay local and the
            # eval compute still shards P('data') via the cached step's
            # sharding constraint.
            from img2latex_tpu.parallel.mesh import put_replicated

            images_dev = put_replicated(jnp.asarray(imgs), self.mesh)
            formulas_dev = put_replicated(jnp.asarray(forms), self.mesh)
        else:
            images_dev = jnp.asarray(imgs)
            formulas_dev = jnp.asarray(forms)
        self._val_device_cache = {
            "images": images_dev,
            "formulas": formulas_dev,
            "formulas_host": forms,
            "n": n,
            "batch": B,
        }
        return self._val_device_cache

    def _get_cached_eval_step(self):
        if getattr(self, "_cached_eval_step", None) is not None:
            return self._cached_eval_step
        eval_fn = self._eval_step_fn
        B = self.loaders["validate"].batch_size
        C = self.cfg.image_shape[2]  # tile grayscale-stored caches back
        mesh = self.mesh

        if mesh is None:

            @jax.jit
            def cached_eval(state, images_all, formulas_all, i):
                start = i * B
                batch = {
                    "images": self._tile_channels(
                        jax.lax.dynamic_slice_in_dim(images_all, start, B, 0), C
                    ),
                    "formulas": jax.lax.dynamic_slice_in_dim(formulas_all, start, B, 0),
                }
                return eval_fn(state, batch)

            self._cached_eval_step = cached_eval
            return cached_eval

        from jax.sharding import NamedSharding, PartitionSpec as P

        st_sh = state_shardings(mesh, self.state)
        data_sh = NamedSharding(mesh, P("data"))

        @partial(jax.jit, in_shardings=(st_sh, None, None, None))
        def cached_eval_mesh(state, images_all, formulas_all, i):
            start = i * B
            batch = {
                "images": self._tile_channels(
                    jax.lax.dynamic_slice_in_dim(images_all, start, B, 0), C
                ),
                "formulas": jax.lax.dynamic_slice_in_dim(formulas_all, start, B, 0),
            }
            # The cache is replicated; constrain the sliced batch (and with
            # it the eval compute) to shard over the data axis.
            batch = jax.lax.with_sharding_constraint(batch, data_sh)
            return eval_fn(state, batch)

        self._cached_eval_step = cached_eval_mesh
        return cached_eval_mesh

    def _val_batches(self):
        """Yield (eval_step output, host formulas (B, L), n_valid) — from the
        HBM cache (device_cache) or the host loader."""
        vc = self._get_val_device_cache() if self._use_device_cache() else False
        if vc:
            B = vc["batch"]
            total = vc["images"].shape[0] // B
            step = self._get_cached_eval_step()
            for i in range(total):
                out = step(self.state, vc["images"], vc["formulas"], jnp.int32(i))
                n_valid = max(0, min(B, vc["n"] - i * B))
                yield out, vc["formulas_host"][i * B : (i + 1) * B], n_valid
            return
        loader = self.loaders["validate"]
        for batch in loader:
            # BLEU trimming happens on this host's local rows — use the
            # local valid count (== global n_valid on single-process runs).
            n_valid = int(batch.get("n_valid_local", batch.get("n_valid", batch["images"].shape[0])))
            yield self.eval_step(self.state, self._place_batch(batch)), batch["formulas"], n_valid

    def _epoch_steps(self, epoch: int):
        """Yield zero-arg step thunks for one epoch — either gathered on
        device from the HBM cache or uploaded per batch by the host loader."""
        cache = self._get_device_cache() if self._use_device_cache() else False
        if cache:
            B = self.cfg.data.batch_size
            n_steps = cache["n"] // B  # matches the host loader's drop_last
            loader = self.loaders["train"]
            if hasattr(loader, "set_epoch"):
                loader.set_epoch(epoch)
            if self.mesh is None:
                # Reuse the host loader's epoch ordering (seed + epoch) so
                # toggling device_cache reproduces the same batch composition.
                perm_dev = jnp.asarray(loader._order().astype(np.int32))
            else:
                # Per-shard local permutations (same seed stream): shard d's
                # slice permutes its own n_pad/dp rows, so the on-device
                # gather never crosses shards.
                from jax.sharding import NamedSharding, PartitionSpec as P

                dp = cache["dp"]
                n_local = cache["n_pad"] // dp
                ep_rng = np.random.default_rng(getattr(loader, "seed", 0) + epoch)
                perm = np.concatenate(
                    [ep_rng.permutation(n_local).astype(np.int32) for _ in range(dp)]
                )
                perm_dev = jax.device_put(perm, NamedSharding(self.mesh, P("data")))
            step = self._get_cached_step()
            for i in range(n_steps):
                yield lambda st, rng, i=i: step(
                    st, cache["images"], cache["formulas"], perm_dev, jnp.int32(i), rng
                )
            return
        loader = self.loaders["train"]
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(epoch)
        for batch in loader:
            device_batch = self._place_batch(batch)
            yield lambda st, rng, db=device_batch: self.train_step(st, db, rng)

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        step_ckpt_every = self.cfg.training.save_checkpoint_steps
        t0 = time.time()
        self.rng, epoch_rng = jax.random.split(self.rng)
        # Metrics accumulate ON DEVICE; the host fetches once per epoch (or at
        # the log cadence).  A per-step float()/int() sync would serialize the
        # pipeline — and on a tunneled TPU costs a ~25ms round trip per step.
        totals = None
        n_batches = 0
        host_step = getattr(self, "_host_step", None)
        if host_step is None:
            host_step = int(self.state.step)
        for i, invoke in enumerate(self._epoch_steps(epoch)):
            self.state, metrics = invoke(self.state, epoch_rng)
            acc = {k: metrics[k] for k in ("loss", "correct", "total")}
            totals = acc if totals is None else jax.tree_util.tree_map(jnp.add, totals, acc)
            n_batches += 1
            host_step += 1
            if (i + 1) % max(self.cfg.data.log_frequency, 1) == 0:
                snap = jax.device_get(totals)  # single sync at log cadence
                logger.info(
                    "epoch %d step %d loss %.4f acc %.4f",
                    epoch + 1,
                    host_step,
                    float(snap["loss"]) / n_batches,
                    int(snap["correct"]) / max(int(snap["total"]), 1),
                )
            if step_ckpt_every and (host_step % step_ckpt_every == 0):
                self.save_checkpoint(epoch)
        self._host_step = host_step
        snap = jax.device_get(totals) if totals is not None else {"loss": 0.0, "correct": 0, "total": 0}
        total_loss = float(snap["loss"])
        total_correct = int(snap["correct"])
        total_tokens = int(snap["total"])
        elapsed = time.time() - t0
        n_images = n_batches * self.cfg.data.batch_size
        return {
            "train_loss": total_loss / max(n_batches, 1),
            "train_accuracy": total_correct / max(total_tokens, 1),
            "train_time_s": elapsed,
            "train_images_per_sec": n_images / elapsed if elapsed > 0 else 0.0,
            "steps": n_batches,
        }

    # ------------------------------------------------------------------
    def validate(self, epoch: int) -> Dict[str, float]:
        loader = self.loaders.get("validate")
        if loader is None:
            return {}
        totals = None
        n_batches = 0
        bleu_outs = []  # device outputs for the first bleu_batches (pulled once)
        ecfg = self.cfg.evaluation
        for i, (out, formulas_host, n_valid) in enumerate(self._val_batches()):
            acc = {
                "loss_tokens": out["loss"] * out["total"].astype(jnp.float32),
                "correct": out["correct"],
                "total": out["total"],
            }
            totals = acc if totals is None else jax.tree_util.tree_map(jnp.add, totals, acc)
            n_batches += 1
            if i < ecfg.bleu_batches:
                bleu_outs.append((out["pred_ids"], out["probs_max"], formulas_host, n_valid))
        snap = jax.device_get(totals) if totals is not None else {"loss_tokens": 0.0, "correct": 0, "total": 0}
        total_tokens = int(snap["total"])
        bleu_preds, bleu_tgts = [], []
        sample_probs = sample_preds = sample_tgts = None
        for pred_dev, probs_dev, formulas, n_valid in bleu_outs:
            # host_local_view: this process's addressable rows (the whole
            # batch on single-process runs) — aligned with the loader's
            # local formulas rows.
            pred_ids = host_local_view(pred_dev)[:n_valid]
            targets = np.asarray(formulas[:, 1:])[:n_valid]
            p, t = _trim_batch_ids(
                pred_ids, targets, self.tokenizer.pad_token_id, self.tokenizer.end_token_id
            )
            bleu_preds.extend(p)
            bleu_tgts.extend(t)
            if sample_probs is None:
                sample_probs = host_local_view(probs_dev)[:n_valid]
                sample_preds = pred_ids
                sample_tgts = targets
        val_loss = float(snap["loss_tokens"]) / max(total_tokens, 1)
        val_acc = int(snap["correct"]) / max(total_tokens, 1)
        quality = calculate_metrics(bleu_preds, bleu_tgts, ecfg.bleu_n) if bleu_preds else {
            "bleu": 0.0,
            "levenshtein": 0.0,
        }
        result = {
            "val_loss": val_loss,
            "val_accuracy": val_acc,
            "val_bleu": quality["bleu"],
            "val_levenshtein": quality["levenshtein"],
        }
        # Enhanced metrics cadence (reference trainer.py:610-630).
        freq = max(self.cfg.logging.detailed_eval_frequency, 1)
        if (
            self.paths is not None
            and is_primary_host()
            and ((epoch + 1) % freq == 0)
            and bleu_preds
        ):
            compute_all_metrics(
                bleu_preds,
                bleu_tgts,
                self.tokenizer,
                probs_max=sample_probs,
                pred_ids=sample_preds,
                dense_targets=sample_tgts,
                num_samples=ecfg.enhanced_samples,
                experiment_name=self.experiment_name,
                metrics_dir=self._metrics_dir(),
                save_to_file=True,
                epoch=epoch + 1,
                bleu_n=ecfg.bleu_n,
            )
        return result

    # ------------------------------------------------------------------
    def train(self) -> Dict[str, Any]:
        cfg = self.cfg.training
        from img2latex_tpu.utils.profiling import apply_numerics_flags, maybe_trace

        apply_numerics_flags(self.cfg.hardware.debug_nans)
        if self.cfg.hardware.profile and self.paths is not None:
            # Trace the first epoch only; artifacts land under logs/traces/.
            log_dir = str(self.paths.get_dir(self.experiment_name, "logs"))
            self._trace_ctx = maybe_trace(True, log_dir, "train_epoch0")
        else:
            self._trace_ctx = None
        if self.registry is not None and is_primary_host():
            self.registry.update_status(self.experiment_name, "training")
        stopped_early = False
        epoch = self.start_epoch - 1
        for epoch in range(self.start_epoch, cfg.epochs):
            if self._trace_ctx is not None and epoch == self.start_epoch:
                with self._trace_ctx:
                    train_metrics = self.train_epoch(epoch)
            else:
                train_metrics = self.train_epoch(epoch)
            val_metrics = self.validate(epoch)
            epoch_metrics = {**train_metrics, **val_metrics, "learning_rate": self.scheduler.lr}
            self.history[epoch] = epoch_metrics
            logger.info(
                "epoch %d/%d: train_loss %.4f val_loss %.4f val_acc %.4f bleu %.4f lev %.4f lr %.2e",
                epoch + 1,
                cfg.epochs,
                train_metrics.get("train_loss", 0),
                val_metrics.get("val_loss", 0),
                val_metrics.get("val_accuracy", 0),
                val_metrics.get("val_bleu", 0),
                val_metrics.get("val_levenshtein", 0),
                self.scheduler.lr,
            )
            if self.registry is not None and is_primary_host():
                # 1-based epoch keys, reference trainer.py:650-664.
                self.registry.log_metrics(self.experiment_name, epoch + 1, epoch_metrics)
            elif self.paths is not None and is_primary_host() and self.cfg.evaluation.save_basic_metrics:
                # metrics.json is written even without a registry (reference
                # trainer.py:650-664 writes it directly).
                import json

                mfile = self.paths.get_dir(self.experiment_name, "metrics") / "metrics.json"
                data = {}
                if mfile.exists():
                    try:
                        data = json.loads(mfile.read_text())
                    except json.JSONDecodeError:
                        data = {}
                data.setdefault("steps", {})[str(epoch + 1)] = {
                    "step": epoch + 1,
                    **{k: float(v) for k, v in epoch_metrics.items() if isinstance(v, (int, float))},
                }
                mfile.write_text(json.dumps(data, indent=2))

            val_loss = val_metrics.get("val_loss", train_metrics["train_loss"])
            if self.scheduler.step(val_loss):
                self.state = self.state.replace(
                    opt_state=set_learning_rate(self.state.opt_state, self.scheduler.lr)
                )
                if self.mesh is not None:
                    # The replaced LR scalar lands on the default device —
                    # restore the mesh placement (no-op for unchanged leaves).
                    self.state = self.state.replace(
                        opt_state=jax.device_put(
                            self.state.opt_state,
                            state_shardings(self.mesh, self.state).opt_state,
                        )
                    )
                logger.info("Plateau: reduced learning rate to %.3e", self.scheduler.lr)

            if val_loss < self.best_val_loss:
                self.best_val_loss = val_loss
                self.save_checkpoint(epoch, is_best=True)
            elif cfg.save_checkpoint_epochs and (epoch + 1) % cfg.save_checkpoint_epochs == 0:
                self.save_checkpoint(epoch)

            if self.early_stopping.step(val_loss):
                logger.info("Early stopping at epoch %d", epoch + 1)
                stopped_early = True
                break
        # Final checkpoint so resume/predict always has the last state.
        self.save_checkpoint(max(epoch, 0))
        if self.registry is not None and is_primary_host():
            self.registry.update_status(self.experiment_name, "completed")
        return {
            "epochs_run": (epoch + 1) - self.start_epoch,
            "best_val_loss": self.best_val_loss,
            "stopped_early": stopped_early,
            "history": self.history,
        }
