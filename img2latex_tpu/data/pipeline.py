"""Host data pipeline: dataset parsing, static-shape batching, prefetch.

Capability parity with the reference's ``Im2LatexDataset`` / ``Im2LatexCollator``
/ ``create_data_loaders`` (``img2latex/data/dataset.py:29-557``) re-designed
for XLA:

* every batch has the SAME static shape — images ``(B, H, W, C)`` uint8 NHWC,
  formulas ``(B, max_seq_length)`` int32 — so the compiled step never
  recompiles (the reference pads formulas to the per-batch max, which would
  retrace XLA every batch);
* short final batches are padded to ``B`` and carry ``n_valid`` so eval code
  can mask them out (the reference drops or ragged-batches);
* image decode/geometry runs in a thread pool (PIL releases the GIL) with a
  background prefetcher, replacing torch ``DataLoader`` worker processes;
* normalization intentionally does NOT happen here — batches stay uint8 and
  are normalized on device (``img2latex_tpu.ops.preprocess``).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from img2latex_tpu.config import Config
from img2latex_tpu.data.tokenizer import LaTeXTokenizer
from img2latex_tpu.data.transforms import load_image_u8
from img2latex_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def read_formulas(path: str) -> List[str]:
    with open(path, encoding="utf-8", errors="replace") as f:
        return [line.rstrip("\n") for line in f]


def parse_split_file(path: str, n_formulas: int) -> List[Tuple[str, int]]:
    """Parse ``<image> <formula_idx>`` lines, skipping malformed/out-of-range
    entries with a logged count (reference ``dataset.py:220-274``)."""
    pairs: List[Tuple[str, int]] = []
    skipped = 0
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) != 2:
                if line.strip():
                    skipped += 1
                continue
            name, idx_s = parts
            try:
                idx = int(idx_s)
            except ValueError:
                # Some IM2LaTeX variants use "<idx> <image>" order.
                try:
                    idx = int(name)
                    name = idx_s
                except ValueError:
                    skipped += 1
                    continue
            if not 0 <= idx < n_formulas:
                skipped += 1
                continue
            pairs.append((name, idx))
    if skipped:
        logger.warning("Skipped %d malformed/out-of-range lines in %s", skipped, path)
    return pairs


class Im2LatexDataset:
    """Map-style dataset over an IM2LaTeX split (host side, uint8 output)."""

    def __init__(
        self,
        split_file: str,
        formulas: Sequence[str],
        img_dir: str,
        tokenizer: LaTeXTokenizer,
        img_size: Tuple[int, int] = (64, 800),
        channels: int = 1,
        pad_value: int = 255,
        load_in_memory: bool = False,
        augment: bool = False,
        seed: int = 0,
        canvas_cache_dir: Optional[str] = None,
    ):
        self.samples = parse_split_file(split_file, len(formulas))
        self.formulas = formulas
        self.img_dir = img_dir
        self.tokenizer = tokenizer
        self.img_size = img_size
        self.channels = channels
        self.pad_value = pad_value
        self.augment = augment
        # Augmentation RNG: numpy Generators are not thread-safe, and the
        # BatchLoader decodes with a thread pool — give each worker thread
        # its own stream (independent via SeedSequence.spawn).
        self._aug_seed_seq = np.random.SeedSequence(seed)
        self._aug_spawn_lock = threading.Lock()
        self._aug_local = threading.local()
        self._cache: Optional[List[np.ndarray]] = None
        # Disk-persistent prepared-canvas cache (data.canvas_cache_dir): the
        # PIL decode/resize/pad pass runs once per (corpus, geometry) ever;
        # every later pass — trainer/evaluator device_cache builds, bucketed
        # eval, repeated benches — reads the memory-mapped uint8 array.
        # Host-side augmentation changes pixels per epoch, so it skips the
        # cache (device-side augment_device composes fine: host canvases
        # stay deterministic).
        self._mmap: Optional[np.ndarray] = None
        if canvas_cache_dir and not augment:
            try:
                self._mmap = self._open_canvas_cache(canvas_cache_dir)
            except Exception:
                logger.warning(
                    "canvas cache unavailable at %s; falling back to per-image "
                    "loads", canvas_cache_dir, exc_info=True,
                )
        if load_in_memory and not augment:
            # RAM estimate before preloading (reference interactive confirm,
            # dataset.py:166-212; non-interactive here: warn + skip if the
            # estimate exceeds 50% of available RAM).
            est_bytes = len(self.samples) * img_size[0] * img_size[1] * channels
            try:
                import psutil

                avail = psutil.virtual_memory().available
            except ImportError:  # pragma: no cover
                avail = None
            if avail is not None and est_bytes > avail * 0.5:
                logger.warning(
                    "load_in_memory would use ~%.1f GB (>50%% of available %.1f GB); "
                    "falling back to lazy loading",
                    est_bytes / 1e9,
                    avail / 1e9,
                )
            else:
                self._cache = [self.image(i) for i in range(len(self.samples))]

    def __len__(self) -> int:
        return len(self.samples)

    def _open_canvas_cache(self, cache_dir: str) -> np.ndarray:
        """mmap the prepared-canvas array for this split, building it on the
        first miss.  The key covers everything that determines canvas bytes:
        sample names, image dir, geometry, pad value, AND a per-file
        size+mtime fingerprint of every image — re-rendering a corpus in
        place (same dir, same file names, new pixels: the /tmp corpus
        workflow across seeds) changes the fingerprint and forces a rebuild
        instead of silently serving stale canvases.  Concurrent builders
        race benignly (per-pid tmp file + atomic ``os.replace``); an aborted
        build unlinks its tmp memmap (potentially GBs) instead of leaking it."""
        import hashlib
        import time

        h, w = self.img_size
        hsh = hashlib.sha1()
        for name, _ in self.samples:
            hsh.update(name.encode())
            p = os.path.join(self.img_dir, name)
            if not os.path.exists(p) and not os.path.splitext(name)[1]:
                p += ".png"
            try:
                st = os.stat(p)
                hsh.update(f"|{st.st_size}:{st.st_mtime_ns}\n".encode())
            except OSError:
                hsh.update(b"|missing\n")  # missing file -> zero canvas
        hsh.update(
            f"|{os.path.abspath(self.img_dir)}|{h}x{w}x{self.channels}"
            f"|pad{self.pad_value}|v2".encode()
        )
        key = hsh.hexdigest()[:16]
        path = os.path.join(cache_dir, f"canvas_{key}.npy")
        if not os.path.exists(path):
            os.makedirs(cache_dir, exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            done = False
            try:
                arr = np.lib.format.open_memmap(
                    tmp, mode="w+", dtype=np.uint8,
                    shape=(len(self.samples), h, w, self.channels),
                )
                t0 = time.perf_counter()
                for i in range(len(self.samples)):
                    arr[i] = self._load_image(i)
                arr.flush()
                del arr
                os.replace(tmp, path)
                done = True
                logger.info(
                    "canvas cache built: %s (%d canvases, %.0f MB, %.1f s)",
                    path, len(self.samples),
                    len(self.samples) * h * w * self.channels / 1e6,
                    time.perf_counter() - t0,
                )
            finally:
                if not done:
                    try:
                        os.unlink(tmp)
                    except OSError:
                        pass
        return np.load(path, mmap_mode="r")

    def _aug_rng(self) -> np.random.Generator:
        rng = getattr(self._aug_local, "rng", None)
        if rng is None:
            # SeedSequence.spawn is NOT thread-safe (non-atomic read+bump of
            # n_children_spawned); decode-pool threads first call this
            # concurrently, and an unguarded race could hand two workers the
            # same child stream (identical augmentation sequences).
            with self._aug_spawn_lock:
                child = self._aug_seed_seq.spawn(1)[0]
            rng = np.random.default_rng(child)
            self._aug_local.rng = rng
        return rng

    def _load_image(self, i: int) -> np.ndarray:
        name, _ = self.samples[i]
        path = os.path.join(self.img_dir, name)
        if not os.path.exists(path) and not os.path.splitext(name)[1]:
            path = path + ".png"
        if not os.path.exists(path):
            logger.warning("Image not found: %s (zero canvas substituted)", path)
            return np.zeros((self.img_size[0], self.img_size[1], self.channels), dtype=np.uint8)
        if self.augment:
            from PIL import Image

            from img2latex_tpu.data.transforms import augment_image, resize_with_aspect_ratio

            try:
                img = Image.open(path)
                img = img.convert("L" if self.channels == 1 else "RGB")
                img = augment_image(img, self._aug_rng(), self.pad_value)
                img = resize_with_aspect_ratio(img, self.img_size[0], self.img_size[1], self.pad_value)
                arr = np.asarray(img, dtype=np.uint8)
                return arr[:, :, None] if self.channels == 1 else arr
            except Exception:
                return np.zeros(
                    (self.img_size[0], self.img_size[1], self.channels), dtype=np.uint8
                )
        return load_image_u8(path, self.img_size, self.channels, self.pad_value)

    def image(self, i: int) -> np.ndarray:
        if self._cache is not None:
            return self._cache[i]
        if self._mmap is not None:
            return np.asarray(self._mmap[i])
        return self._load_image(i)

    def token_ids(self, i: int) -> np.ndarray:
        """``<START> formula <END>`` padded/truncated to max_seq_length."""
        _, fidx = self.samples[i]
        ids = self.tokenizer.encode(self.formulas[fidx], add_special_tokens=True)
        L = self.tokenizer.max_sequence_length
        out = np.full((L,), self.tokenizer.pad_token_id, dtype=np.int32)
        ids = ids[:L]
        out[: len(ids)] = ids
        return out

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        return self.image(i), self.token_ids(i)


class BatchLoader:
    """Static-shape batch iterator with threaded decode + background prefetch."""

    def __init__(
        self,
        dataset: Im2LatexDataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        num_threads: int = 8,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.prefetch = max(1, prefetch)
        self._epoch = 0
        # Multi-host: every process computes the SAME global epoch order
        # (same seed) and loads only its contiguous slice of each global
        # batch — rows [p*B/P, (p+1)*B/P) — so the per-process local batches
        # assemble into exactly the single-process global batch
        # (``parallel.mesh.put_global_batch``).
        self.process_index = int(process_index)
        self.process_count = int(process_count)
        if self.batch_size % self.process_count:
            raise ValueError(
                f"batch_size {self.batch_size} not divisible by "
                f"process_count {self.process_count}"
            )
        self.local_batch_size = self.batch_size // self.process_count

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def _make_batch(
        self, pool: ThreadPoolExecutor, indices: np.ndarray, global_valid: Optional[int] = None
    ) -> Dict[str, np.ndarray]:
        B = self.local_batch_size
        h, w = self.dataset.img_size
        c = self.dataset.channels
        L = self.dataset.tokenizer.max_sequence_length
        images = np.zeros((B, h, w, c), dtype=np.uint8)
        # Padded tail rows must be ALL-PAD formulas (the eval-step masking
        # contract); PAD is id 0 for the standard specials, but a tokenizer
        # built with a custom special_tokens order may place it elsewhere.
        formulas = np.full((B, L), self.dataset.tokenizer.pad_token_id, dtype=np.int32)
        loaded = list(pool.map(self.dataset.__getitem__, indices.tolist()))
        for j, (img, ids) in enumerate(loaded):
            images[j] = img
            formulas[j] = ids
        return {
            "images": images,
            "formulas": formulas,
            # n_valid is the GLOBAL count (the metric contract); n_valid_local
            # counts this process's rows (== n_valid on single-process runs).
            "n_valid": np.int32(global_valid if global_valid is not None else len(indices)),
            "n_valid_local": np.int32(len(indices)),
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        n = len(order)
        starts = range(0, n - self.batch_size + 1, self.batch_size) if self.drop_last else range(0, n, self.batch_size)
        chunks = [order[s : s + self.batch_size] for s in starts]
        if self.process_count > 1:
            lo = self.process_index * self.local_batch_size
            hi = lo + self.local_batch_size
            chunks = [(c[lo:hi], len(c)) for c in chunks]
        else:
            chunks = [(c, len(c)) for c in chunks]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def bounded_put(item) -> bool:
            """Enqueue unless the consumer has gone away (stop set)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            err: Optional[BaseException] = None
            with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
                try:
                    for chunk, global_valid in chunks:
                        if stop.is_set():
                            break
                        if not bounded_put(self._make_batch(pool, chunk, global_valid)):
                            break
                except BaseException as e:  # forwarded to the consumer
                    err = e
                finally:
                    bounded_put((sentinel, err))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if isinstance(item, tuple) and len(item) == 2 and item[0] is sentinel:
                    if item[1] is not None:
                        raise item[1]
                    break
                yield item
        finally:
            # Early exit (evaluator max_batches, an exception mid-epoch, a
            # dropped iterator): unblock + reap the producer and its pool —
            # otherwise one blocked thread + ThreadPoolExecutor would leak
            # per abandoned epoch.
            stop.set()
            try:
                while True:
                    out_q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=30.0)


def create_data_loaders(
    cfg: Config, tokenizer: LaTeXTokenizer, splits: Sequence[str] = ("train", "validate", "test")
) -> Dict[str, BatchLoader]:
    """Build loaders from config (reference ``dataset.py:367-557`` surface).

    Image size/channels follow the active model type; eval batch size =
    ``min(batch_size * eval_batch_size_multiplier, max_eval_batch_size)``
    (reference ``dataset.py:527-539``).
    """
    h, w, c = cfg.image_shape
    data_dir = cfg.data.data_dir
    formulas = read_formulas(os.path.join(data_dir, cfg.data.formulas_file))
    img_dir = os.path.join(data_dir, cfg.data.img_dir)
    split_files = {
        "train": cfg.data.train_file,
        "validate": cfg.data.validate_file,
        "test": cfg.data.test_file,
    }
    eval_bs = min(
        cfg.data.batch_size * cfg.data.eval_batch_size_multiplier,
        cfg.data.max_eval_batch_size,
    )
    # Multi-host: shard every loader by process (jax is imported lazily so
    # the host pipeline stays usable without a device runtime).
    process_index, process_count = 0, 1
    try:
        import jax

        if jax.process_count() > 1:
            process_index, process_count = jax.process_index(), jax.process_count()
    except Exception:  # pragma: no cover - no jax runtime
        pass
    loaders: Dict[str, BatchLoader] = {}
    for split in splits:
        ds = Im2LatexDataset(
            split_file=os.path.join(data_dir, split_files[split]),
            formulas=formulas,
            img_dir=img_dir,
            tokenizer=tokenizer,
            img_size=(h, w),
            channels=c,
            pad_value=cfg.preprocessing.pad_value,
            load_in_memory=cfg.data.load_in_memory,
            augment=cfg.data.augment and split == "train",
            seed=cfg.training.seed,
            canvas_cache_dir=getattr(cfg.data, "canvas_cache_dir", None),
        )
        is_train = split == "train"
        loaders[split] = BatchLoader(
            ds,
            batch_size=cfg.data.batch_size if is_train else eval_bs,
            shuffle=is_train,
            drop_last=is_train,
            seed=cfg.training.seed,
            num_threads=max(cfg.data.num_workers, 4),
            prefetch=cfg.data.device_prefetch,
            process_index=process_index,
            process_count=process_count,
        )
    return loaders
