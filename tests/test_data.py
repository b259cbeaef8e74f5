import numpy as np
import pytest
from PIL import Image

from img2latex_tpu.config import Config
from img2latex_tpu.data.pipeline import (
    BatchLoader,
    Im2LatexDataset,
    create_data_loaders,
    parse_split_file,
    read_formulas,
)
from img2latex_tpu.data.synthetic import (
    render_formula_image,
    synthetic_batch,
    token_glyph,
    write_synthetic_corpus,
)
from img2latex_tpu.data.tokenizer import LaTeXTokenizer
from img2latex_tpu.data.transforms import load_image_u8, resize_with_aspect_ratio


class TestTransforms:
    def test_resize_exact_height_pad_width(self):
        img = Image.new("L", (100, 50), 0)  # black, aspect 2:1
        out = resize_with_aspect_ratio(img, 64, 800)
        assert out.size == (800, 64)
        arr = np.asarray(out)
        # resized content occupies round(64*2)=128 px; right side is white pad
        assert arr[:, 200:].min() == 255
        assert arr[:, :100].max() < 255

    def test_resize_extreme_tall_narrow_no_crash(self):
        """A 1xN sliver must clamp to a 1px column, not crash PIL's resize
        with width 0."""
        img = Image.fromarray(np.zeros((200, 1), np.uint8), mode="L")
        out = resize_with_aspect_ratio(img, 64, 800)
        assert out.size == (800, 64)

    def test_resize_center_crop_when_wide(self):
        img = Image.new("L", (4000, 50), 0)
        out = resize_with_aspect_ratio(img, 64, 800)
        assert out.size == (800, 64)
        assert np.asarray(out).max() == 0  # fully content, cropped

    def test_matches_reference_transform(self):
        """Pixel-exact parity with the reference ResizeWithAspectRatio."""
        import importlib.util
        import sys
        import types

        # The reference module imports torchvision but never uses it in the
        # transform class; stub it (torchvision is not installed here).
        if "torchvision" not in sys.modules:
            tv = types.ModuleType("torchvision")
            tv_t = types.ModuleType("torchvision.transforms")
            tv_f = types.ModuleType("torchvision.transforms.functional")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = tv_t
            sys.modules["torchvision.transforms.functional"] = tv_f
        spec = importlib.util.spec_from_file_location(
            "ref_transforms", "/root/reference/img2latex/data/transforms.py"
        )
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        rng = np.random.default_rng(3)
        for _ in range(5):
            w, h = int(rng.integers(20, 1200)), int(rng.integers(10, 200))
            arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            img = Image.fromarray(arr, mode="L")
            ours = np.asarray(resize_with_aspect_ratio(img, 64, 320))
            theirs = np.asarray(ref.ResizeWithAspectRatio(64, 320)(img))
            np.testing.assert_array_equal(ours, theirs)

    def test_load_image_u8(self, tmp_path):
        p = tmp_path / "x.png"
        Image.fromarray(np.full((40, 90), 128, np.uint8), mode="L").save(p)
        arr = load_image_u8(str(p), (64, 800), channels=1)
        assert arr.shape == (64, 800, 1) and arr.dtype == np.uint8
        rgb = load_image_u8(str(p), (64, 800), channels=3)
        assert rgb.shape == (64, 800, 3)

    def test_rgb_padding_is_white_not_red(self):
        """The reference passes int 255 to Image.new on RGB canvases, which
        PIL renders as RED (255,0,0) — contradicting its own "White padding"
        comment (reference transforms.py:44-48).  We implement the intent:
        padding replicates pad_value across bands, so a grayscale-origin RGB
        image stays channel-equal end to end."""
        arr = np.full((40, 90), 128, np.uint8)
        rgb = Image.fromarray(arr, mode="L").convert("RGB")
        out = np.asarray(resize_with_aspect_ratio(rgb, 64, 320))
        pad_region = out[:, 200:, :]  # content ends at width 144
        assert (pad_region == 255).all()
        np.testing.assert_array_equal(out[..., 0], out[..., 1])
        np.testing.assert_array_equal(out[..., 0], out[..., 2])

    def test_load_image_error_returns_zero_canvas(self, tmp_path):
        p = tmp_path / "bad.png"
        p.write_bytes(b"not a png")
        arr = load_image_u8(str(p), (32, 100), channels=1)
        assert arr.shape == (32, 100, 1) and arr.max() == 0


class TestDevicePreprocess:
    def test_normalize_gray(self):
        import jax.numpy as jnp

        from img2latex_tpu.ops.preprocess import normalize_images

        x = jnp.array([[[[0], [255]]]], dtype=jnp.uint8)
        out = normalize_images(x)
        np.testing.assert_allclose(np.asarray(out), [[[[-1.0], [1.0]]]], atol=1e-6)

    def test_normalize_rgb_matches_reference_math(self):
        import jax.numpy as jnp

        from img2latex_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize_images

        rng = np.random.default_rng(0)
        x = rng.integers(0, 256, size=(2, 4, 5, 3), dtype=np.uint8)
        out = np.asarray(normalize_images(jnp.array(x)))
        expected = (x / 255.0 - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_gray_to_rgb(self):
        import jax.numpy as jnp

        from img2latex_tpu.ops.preprocess import grayscale_to_rgb

        x = jnp.ones((2, 4, 4, 1))
        assert grayscale_to_rgb(x).shape == (2, 4, 4, 3)


class TestSynthetic:
    def test_glyph_deterministic_distinct(self):
        np.testing.assert_array_equal(token_glyph(5), token_glyph(5))
        assert not np.array_equal(token_glyph(5), token_glyph(6))

    def test_render(self):
        img = render_formula_image([1, 2, 3], img_height=32)
        assert img.ndim == 2 and img.shape[0] == 32 and img.dtype == np.uint8

    def test_synthetic_batch_shapes(self):
        images, formulas = synthetic_batch(4, (32, 128, 1), 16, vocab_size=20)
        assert images.shape == (4, 32, 128, 1)
        assert formulas.shape == (4, 16)
        assert (formulas[:, 0] == 1).all()  # START


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return write_synthetic_corpus(str(root), n_train=12, n_val=6, n_test=6, seed=1)


class TestPipeline:
    def test_corpus_layout(self, corpus):
        import os

        assert os.path.exists(os.path.join(corpus, "im2latex_train_filter.lst"))
        formulas = read_formulas(os.path.join(corpus, "im2latex_formulas.norm.lst"))
        assert len(formulas) == 24
        pairs = parse_split_file(os.path.join(corpus, "im2latex_train_filter.lst"), len(formulas))
        assert len(pairs) == 12

    def test_parse_skips_malformed(self, tmp_path):
        p = tmp_path / "bad.lst"
        p.write_text("img1.png 0\nmalformed\nimg2.png 999\nimg3.png notanint x\n")
        pairs = parse_split_file(str(p), 5)
        assert pairs == [("img1.png", 0)]

    def test_dataset_and_loader(self, corpus):
        import os

        formulas = read_formulas(os.path.join(corpus, "im2latex_formulas.norm.lst"))
        tok = LaTeXTokenizer(max_sequence_length=20)
        tok.fit(formulas)
        ds = Im2LatexDataset(
            os.path.join(corpus, "im2latex_train_filter.lst"),
            formulas,
            os.path.join(corpus, "img"),
            tok,
            img_size=(32, 128),
            channels=1,
        )
        assert len(ds) == 12
        img, ids = ds[0]
        assert img.shape == (32, 128, 1) and img.dtype == np.uint8
        assert ids.shape == (20,) and ids[0] == tok.start_token_id

        loader = BatchLoader(ds, batch_size=5, shuffle=True, drop_last=False, seed=0)
        batches = list(loader)
        assert len(batches) == 3
        for b in batches:
            assert b["images"].shape == (5, 32, 128, 1)  # static even when short
            assert b["formulas"].shape == (5, 20)
        assert int(batches[-1]["n_valid"]) == 2

    def _dataset(self, corpus, tok=None, max_len=20):
        import os

        formulas = read_formulas(os.path.join(corpus, "im2latex_formulas.norm.lst"))
        if tok is None:
            tok = LaTeXTokenizer(max_sequence_length=max_len)
            tok.fit(formulas)
        return Im2LatexDataset(
            os.path.join(corpus, "im2latex_train_filter.lst"),
            formulas,
            os.path.join(corpus, "img"),
            tok,
            img_size=(32, 128),
            channels=1,
        )

    def _cache_dataset(self, corpus, cache_dir, img_size=(32, 128), augment=False):
        import os

        formulas = read_formulas(os.path.join(corpus, "im2latex_formulas.norm.lst"))
        tok = LaTeXTokenizer(max_sequence_length=20)
        tok.fit(formulas)
        return Im2LatexDataset(
            os.path.join(corpus, "im2latex_train_filter.lst"),
            formulas,
            os.path.join(corpus, "img"),
            tok,
            img_size=img_size,
            channels=1,
            augment=augment,
            canvas_cache_dir=str(cache_dir),
        )

    def test_canvas_cache_identical_and_reused(self, corpus, tmp_path):
        """data.canvas_cache_dir: byte-identical canvases; the second open
        reads the mmap without touching PIL (a poisoned _load_image proves
        it); a different geometry keys a different file."""
        import os

        plain = self._dataset(corpus)
        cached = self._cache_dataset(corpus, tmp_path / "cc")
        files = os.listdir(tmp_path / "cc")
        assert len(files) == 1 and files[0].startswith("canvas_")
        for i in range(len(plain)):
            np.testing.assert_array_equal(plain.image(i), cached.image(i))

        reopened = self._cache_dataset(corpus, tmp_path / "cc")
        reopened._load_image = None  # would raise if any image were PIL-loaded
        np.testing.assert_array_equal(plain.image(3), reopened.image(3))

        other = self._cache_dataset(corpus, tmp_path / "cc", img_size=(16, 64))
        assert other.image(0).shape == (16, 64, 1)
        assert len(os.listdir(tmp_path / "cc")) == 2

    def test_canvas_cache_skipped_under_host_augment(self, corpus, tmp_path):
        import os

        ds = self._cache_dataset(corpus, tmp_path / "cc2", augment=True)
        assert ds._mmap is None
        assert not os.path.exists(tmp_path / "cc2")

    def test_canvas_cache_invalidated_on_rerendered_corpus(self, corpus, tmp_path):
        """Advisor r3 (pipeline.py medium): re-rendering an image in place —
        same dir, same file name, new pixels — must key a NEW cache file and
        serve the new canvas, not the stale mmap."""
        import os
        import shutil
        import time

        from PIL import Image

        work = tmp_path / "corpus_copy"
        shutil.copytree(corpus, work)
        cached = self._cache_dataset(str(work), tmp_path / "cc3")
        name = cached.samples[0][0]
        p = os.path.join(str(work), "img", name)
        if not os.path.exists(p) and not os.path.splitext(name)[1]:
            p += ".png"
        before = cached.image(0).copy()
        Image.new("L", (40, 20), 0).save(p)  # re-render: all-black image
        # mtime granularity guard (the fingerprint includes size+mtime_ns)
        os.utime(p, ns=(time.time_ns(), time.time_ns() + 1))
        fresh = self._cache_dataset(str(work), tmp_path / "cc3")
        assert len(os.listdir(tmp_path / "cc3")) == 2  # new key -> new file
        after = fresh.image(0)
        assert not np.array_equal(before, after)
        assert after.min() == 0  # the re-rendered black content is served

    def test_canvas_cache_aborted_build_leaves_no_tmp(self, corpus, tmp_path):
        """Advisor r3 (pipeline.py low): a build that dies mid-way must
        unlink its per-pid .tmp memmap instead of leaking it."""
        import os

        from img2latex_tpu.data.pipeline import Im2LatexDataset

        orig = Im2LatexDataset._load_image

        def boom(self, i):
            if i >= 2:
                raise RuntimeError("disk full")
            return orig(self, i)

        try:
            Im2LatexDataset._load_image = boom
            ds = self._cache_dataset(corpus, tmp_path / "cc4")
        finally:
            Im2LatexDataset._load_image = orig
        # constructor fell back to per-image loads...
        assert ds._mmap is None
        # ...and no tmp (or cache) file was left behind
        leftovers = os.listdir(tmp_path / "cc4") if os.path.exists(tmp_path / "cc4") else []
        assert leftovers == []

    def test_loader_early_break_reaps_producer(self, corpus):
        """Abandoning the iterator (evaluator max_batches, mid-epoch error)
        must not leak the producer thread or its decode pool."""
        import threading
        import time

        ds = self._dataset(corpus)
        loader = BatchLoader(ds, batch_size=4, prefetch=1, num_threads=2)
        baseline = threading.active_count()
        for _ in range(3):
            for batch in loader:
                break  # GeneratorExit at the yield
        deadline = time.time() + 10.0
        while threading.active_count() > baseline and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= baseline
        # and the loader still works end-to-end afterwards
        assert len(list(loader)) == len(loader)

    def test_loader_forwards_producer_exception(self, corpus):
        """A decode failure inside the producer thread must surface in the
        consuming loop, not silently truncate the epoch."""
        ds = self._dataset(corpus)

        class Boom(Exception):
            pass

        def broken(i):
            raise Boom("decode failed")

        ds.__getitem__ = broken  # instance attribute shadows the method
        loader = BatchLoader(ds, batch_size=4)
        with pytest.raises(Boom):
            list(loader)

    def test_loader_final_batch_pads_with_pad_id(self, corpus):
        """Padded tail rows must be ALL-PAD even when PAD is not id 0
        (custom special-token order)."""
        import os

        formulas = read_formulas(os.path.join(corpus, "im2latex_formulas.norm.lst"))
        tok = LaTeXTokenizer(
            special_tokens={"START": "<START>", "PAD": "<PAD>", "END": "<END>", "UNK": "<UNK>"},
            max_sequence_length=20,
        )
        tok.fit(formulas)
        assert tok.pad_token_id == 1  # custom order: START=0, PAD=1
        ds = self._dataset(corpus, tok=tok)
        batches = list(BatchLoader(ds, batch_size=5))
        last = batches[-1]
        n_valid = int(last["n_valid"])
        assert n_valid < last["formulas"].shape[0]
        assert (last["formulas"][n_valid:] == tok.pad_token_id).all()

    def test_loader_drop_last_and_shuffle_determinism(self, corpus):
        import os

        formulas = read_formulas(os.path.join(corpus, "im2latex_formulas.norm.lst"))
        tok = LaTeXTokenizer(max_sequence_length=20)
        tok.fit(formulas)
        ds = Im2LatexDataset(
            os.path.join(corpus, "im2latex_train_filter.lst"),
            formulas,
            os.path.join(corpus, "img"),
            tok,
            img_size=(32, 128),
            channels=1,
        )
        loader = BatchLoader(ds, batch_size=5, shuffle=True, drop_last=True, seed=7)
        a = [b["formulas"].copy() for b in loader]
        b = [b["formulas"].copy() for b in loader]
        assert len(a) == 2
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)  # same epoch -> same order
        loader.set_epoch(1)
        c = [bb["formulas"].copy() for bb in loader]
        assert any(not np.array_equal(x, y) for x, y in zip(a, c))

    def test_create_data_loaders(self, corpus):
        cfg = Config()
        cfg.data.data_dir = corpus
        cfg.data.batch_size = 4
        cfg.data.max_seq_length = 20
        cfg.model.encoder.cnn.img_height = 32
        cfg.model.encoder.cnn.img_width = 128
        tok = LaTeXTokenizer(max_sequence_length=20)
        tok.fit(read_formulas(f"{corpus}/im2latex_formulas.norm.lst"))
        loaders = create_data_loaders(cfg, tok)
        assert set(loaders) == {"train", "validate", "test"}
        batch = next(iter(loaders["train"]))
        assert batch["images"].shape == (4, 32, 128, 1)
        # eval batch = min(4*2, 128) = 8
        vb = next(iter(loaders["validate"]))
        assert vb["images"].shape[0] == 8


class TestMathtext:
    def test_formula_grammar(self):
        from img2latex_tpu.data.mathtext import random_latex_formulas

        fs = random_latex_formulas(20, seed=0)
        assert len(fs) == 20
        for f in fs:
            toks = f.split()
            assert toks, "empty formula"
            assert f.count("{") == f.count("}"), f"unbalanced braces in {f!r}"

    def test_render(self):
        from img2latex_tpu.data.mathtext import render_mathtext

        arr = render_mathtext("\\frac { a } { b } + x ^ { 2 }")
        assert arr.ndim == 2 and arr.dtype == np.uint8
        assert arr.min() < 128 < arr.max()  # has ink and paper

    def test_corpus_layout(self, tmp_path):
        from img2latex_tpu.data.mathtext import write_mathtext_corpus
        from img2latex_tpu.data.pipeline import parse_split_file, read_formulas

        root, failed = write_mathtext_corpus(str(tmp_path), 6, 2, 2, seed=1)
        formulas = read_formulas(str(tmp_path / "im2latex_formulas.norm.lst"))
        assert len(formulas) == 10
        pairs = parse_split_file(str(tmp_path / "im2latex_train_filter.lst"), 10)
        assert len(pairs) == 6
