"""jax.export serving artifacts: roundtrip, parity with the live Predictor,
chunking, and the CLI surface."""

import json
import os

import numpy as np
import pytest

from img2latex_tpu.export import ExportedPredictor, export_checkpoint


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Tiny trained checkpoint + its Predictor + test images (same recipe as
    the serving tests)."""
    from img2latex_tpu.config import Config
    from img2latex_tpu.data.pipeline import create_data_loaders, read_formulas
    from img2latex_tpu.data.synthetic import write_synthetic_corpus
    from img2latex_tpu.data.tokenizer import LaTeXTokenizer
    from img2latex_tpu.training.predictor import Predictor
    from img2latex_tpu.training.trainer import Trainer
    from img2latex_tpu.utils.paths import PathManager

    root = tmp_path_factory.mktemp("exportcorpus")
    corpus = write_synthetic_corpus(str(root / "data"), n_train=16, n_val=4, n_test=4, seed=11)
    cfg = Config()
    cfg.data.data_dir = corpus
    cfg.data.batch_size = 8
    cfg.data.max_seq_length = 12
    cfg.model.embedding_dim = 24
    cfg.model.decoder.hidden_dim = 24
    cfg.model.decoder.lstm_layers = 1
    cfg.model.decoder.dropout = 0.0
    cfg.model.encoder.cnn.img_height = 32
    cfg.model.encoder.cnn.img_width = 64
    cfg.model.encoder.cnn.conv_filters = [4]
    cfg.training.epochs = 1
    cfg.inference.max_length = 11
    cfg.hardware.compute_dtype = "float32"
    tok = LaTeXTokenizer(max_sequence_length=12)
    tok.fit(read_formulas(os.path.join(corpus, "im2latex_formulas.norm.lst")))
    paths = PathManager(str(root))
    paths.outputs_dir.mkdir(parents=True, exist_ok=True)
    Trainer(cfg, tok, create_data_loaders(cfg, tok), paths=paths, experiment_name="exp").train()
    ckpt = str(paths.get_dir("exp", "checkpoints"))
    pred = Predictor.from_checkpoint(
        ckpt, batch_size=4,
        use_pallas_conv1=False,
        config_overrides={"hardware.use_pallas_decode": False, "hardware.use_mesh": False},
    )
    imgs = sorted(str(p) for p in (root / "data" / "img").iterdir())
    return ckpt, pred, imgs


class TestExportRoundtrip:
    def test_greedy_parity_and_manifest(self, trained, tmp_path):
        ckpt, pred, imgs = trained
        out = tmp_path / "art"
        manifest = export_checkpoint(ckpt, str(out), batch_sizes=(2, 4))
        assert (out / "manifest.json").exists()
        assert (out / "decode_b2.jaxexport").exists()
        assert (out / "decode_b4.jaxexport").exists()
        assert manifest["decode"]["beam_size"] == 0
        assert manifest["vocab_size"] == pred.tokenizer.vocab_size
        # Manifest is valid JSON on disk and matches the returned dict.
        on_disk = json.loads((out / "manifest.json").read_text())
        assert on_disk == json.loads(json.dumps(manifest))

        exported = ExportedPredictor.load(str(out))
        live = pred.predict_batch(imgs, batch_size=4)
        art = exported.predict_batch(imgs)
        assert art == live
        assert all(isinstance(s, str) for s in art)

    def test_chunking_padding_and_batch_pick(self, trained, tmp_path):
        ckpt, pred, imgs = trained
        out = tmp_path / "art"
        export_checkpoint(ckpt, str(out), batch_sizes=(2, 4))
        exported = ExportedPredictor.load(str(out))
        # 3 images: picks the 4-batch (smallest >= 3) and zero-pads row 4.
        assert exported._pick_batch(3) == 4
        assert exported._pick_batch(5) == 4  # larger than any export: chunk
        three = exported.predict_batch(imgs[:3], return_ids=True)
        allofit = exported.predict_batch(imgs, return_ids=True)
        assert three == allofit[:3]
        # Single predict == first row of batch predict.
        assert exported.predict(imgs[0]) == exported.predict_batch(imgs[:1])[0]

    def test_beam_parity(self, trained, tmp_path):
        ckpt, pred, imgs = trained
        out = tmp_path / "beam"
        export_checkpoint(ckpt, str(out), batch_sizes=(4,), beam_size=3, length_penalty=1.0)
        exported = ExportedPredictor.load(str(out))
        live = pred.predict_batch(imgs, batch_size=4, beam_size=3, length_penalty=1.0)
        assert exported.predict_batch(imgs) == live

    def test_sampling_seed_parity(self, trained, tmp_path):
        ckpt, pred, imgs = trained
        out = tmp_path / "samp"
        export_checkpoint(ckpt, str(out), batch_sizes=(4,), top_k=5, temperature=0.8)
        exported = ExportedPredictor.load(str(out))
        # Identical seed + identical chunking => identical token draws.
        live = pred.predict_batch(imgs[:4], batch_size=4, top_k=5, temperature=0.8, seed=7)
        art = exported.predict_batch(imgs[:4], seed=7)
        assert art == live
        # A different seed changes at least one sampled sequence (tiny
        # 1-epoch model: distributions are near-uniform).
        art2 = exported.predict_batch(imgs[:4], seed=8)
        assert isinstance(art2, list) and len(art2) == 4

    def test_numpy_input_and_manifest_version_guard(self, trained, tmp_path):
        ckpt, pred, imgs = trained
        out = tmp_path / "art"
        export_checkpoint(ckpt, str(out), batch_sizes=(2,))
        exported = ExportedPredictor.load(str(out))
        arr = np.asarray(
            __import__("PIL.Image", fromlist=["Image"]).open(imgs[0]).convert("L")
        )
        r = exported.predict(arr)
        assert isinstance(r, str)
        # Version guard.
        m = json.loads((out / "manifest.json").read_text())
        m["version"] = 999
        (out / "manifest.json").write_text(json.dumps(m))
        with pytest.raises(ValueError, match="manifest version"):
            ExportedPredictor.load(str(out))

    def test_multi_platform_artifact(self, trained, tmp_path):
        # One artifact lowered for BOTH tpu and cpu (pure-StableHLO scan
        # path): exports from the CPU test env and still runs here.
        ckpt, _, imgs = trained
        out = tmp_path / "mp"
        m = export_checkpoint(ckpt, str(out), batch_sizes=(2,), platforms=("tpu", "cpu"))
        assert m["platforms"] == ["tpu", "cpu"]
        exported = ExportedPredictor.load(str(out))
        assert isinstance(exported.predict(imgs[0]), str)

    def test_bad_batch_sizes_rejected(self, trained, tmp_path):
        ckpt, _, _ = trained
        with pytest.raises(ValueError, match="batch_sizes"):
            export_checkpoint(ckpt, str(tmp_path / "x"), batch_sizes=(0,))


class TestSymbolicBatch:
    def test_one_artifact_any_batch(self, trained, tmp_path):
        """--symbolic-batch: a single batch-polymorphic executable serves
        every request size with no padding rows."""
        ckpt, pred, imgs = trained
        out = tmp_path / "dyn"
        m = export_checkpoint(ckpt, str(out), batch_sizes=(4,), symbolic_batch=True)
        assert m["symbolic_batch"] is True
        assert list(m["artifacts"]) == ["dyn"]
        assert (out / "decode_bdyn.jaxexport").exists()
        exported = ExportedPredictor.load(str(out))
        # Odd request sizes run exactly (greedy is row-independent, so the
        # live path is the oracle regardless of its own chunking).
        live = pred.predict_batch(imgs, batch_size=4)
        assert exported.predict_batch(imgs[:3]) == live[:3]
        assert exported.predict_batch(imgs, batch_size=5) == live
        assert exported.predict(imgs[0]) == live[0]

    def test_symbolic_beam(self, trained, tmp_path):
        ckpt, pred, imgs = trained
        out = tmp_path / "dynbeam"
        export_checkpoint(
            ckpt, str(out), batch_sizes=(4,), beam_size=3, length_penalty=1.0,
            symbolic_batch=True,
        )
        exported = ExportedPredictor.load(str(out))
        live = pred.predict_batch(imgs[:5], batch_size=4, beam_size=3, length_penalty=1.0)
        assert exported.predict_batch(imgs[:5]) == live

    def test_symbolic_rejects_selective_beam(self, trained, tmp_path):
        ckpt, _, _ = trained
        with pytest.raises(ValueError, match="selective_beam_frac"):
            export_checkpoint(
                ckpt, str(tmp_path / "x"), batch_sizes=(4,), beam_size=3,
                selective_beam_frac=0.2, symbolic_batch=True,
            )


class TestExportGridMemory:
    def test_grid_flagship_exports(self, tmp_path):
        """The grid-memory (real additive attention) flagship configuration —
        the quality-bearing family in PARITY.md — exports and matches the
        live scan path."""
        import os

        from img2latex_tpu.config import Config
        from img2latex_tpu.data.pipeline import create_data_loaders, read_formulas
        from img2latex_tpu.data.synthetic import write_synthetic_corpus
        from img2latex_tpu.data.tokenizer import LaTeXTokenizer
        from img2latex_tpu.training.predictor import Predictor
        from img2latex_tpu.training.trainer import Trainer
        from img2latex_tpu.utils.paths import PathManager

        root = tmp_path
        corpus = write_synthetic_corpus(str(root / "data"), n_train=16, n_val=4, n_test=4, seed=12)
        cfg = Config()
        cfg.data.data_dir = corpus
        cfg.data.batch_size = 8
        cfg.data.max_seq_length = 12
        cfg.model.memory = "grid"
        cfg.model.embedding_dim = 24
        cfg.model.decoder.hidden_dim = 24
        cfg.model.decoder.lstm_layers = 1
        cfg.model.decoder.dropout = 0.0
        cfg.model.encoder.cnn.img_height = 32
        cfg.model.encoder.cnn.img_width = 64
        cfg.model.encoder.cnn.conv_filters = [4]
        cfg.training.epochs = 1
        cfg.inference.max_length = 11
        cfg.hardware.compute_dtype = "float32"
        tok = LaTeXTokenizer(max_sequence_length=12)
        tok.fit(read_formulas(os.path.join(corpus, "im2latex_formulas.norm.lst")))
        paths = PathManager(str(root))
        paths.outputs_dir.mkdir(parents=True, exist_ok=True)
        Trainer(cfg, tok, create_data_loaders(cfg, tok), paths=paths, experiment_name="g").train()
        ckpt = str(paths.get_dir("g", "checkpoints"))
        out = root / "art"
        m = export_checkpoint(ckpt, str(out), batch_sizes=(4,), beam_size=2)
        assert m["decode"]["beam_size"] == 2
        pred = Predictor.from_checkpoint(
            ckpt, batch_size=4, use_pallas_conv1=False,
            config_overrides={"hardware.use_pallas_decode": False, "hardware.use_mesh": False},
        )
        imgs = sorted(str(p) for p in (root / "data" / "img").iterdir())[:4]
        exported = ExportedPredictor.load(str(out))
        assert exported.predict_batch(imgs) == pred.predict_batch(imgs, batch_size=4, beam_size=2)


class TestSharedImagePrep:
    def test_exported_prep_matches_live(self, trained, tmp_path):
        """Live and artifact serving share one input dispatch
        (data/transforms.prepare_image_u8): PIL RGB, CHW float arrays, and
        HWC uint8 RGB all produce identical canvases on both paths."""
        from PIL import Image

        ckpt, pred, imgs = trained
        out = tmp_path / "prep"
        export_checkpoint(ckpt, str(out), batch_sizes=(2,))
        exported = ExportedPredictor.load(str(out))

        pil_rgb = Image.open(imgs[0]).convert("RGB")
        hwc_rgb = np.asarray(pil_rgb)
        chw_float = hwc_rgb.transpose(2, 0, 1).astype(np.float32) / 255.0
        for inp in (pil_rgb, hwc_rgb, chw_float):
            live = pred._prepare_image(inp)
            art = exported._prepare_image(inp)
            np.testing.assert_array_equal(live, art)
        # RGB->gray uses ITU-R 601 luma (PIL convert('L')), so the array
        # input agrees with the PIL input exactly.
        np.testing.assert_array_equal(
            exported._prepare_image(hwc_rgb), exported._prepare_image(pil_rgb)
        )


class TestExportServing:
    def test_inference_server_over_artifact(self, trained, tmp_path):
        """The dynamic-batching server accepts an ExportedPredictor drop-in:
        the full serve path runs with zero model code loaded."""
        from img2latex_tpu.serving import InferenceServer

        ckpt, pred, imgs = trained
        out = tmp_path / "srvart"
        export_checkpoint(ckpt, str(out), batch_sizes=(2, 4))
        exported = ExportedPredictor.load(str(out))
        assert exported.batch_size == 4
        with InferenceServer(exported, max_wait_ms=20) as srv:
            results = srv.predict_many(imgs[:6], timeout=120)
        assert results == pred.predict_batch(imgs[:6], batch_size=4)
        assert srv.stats.requests == 6

    def test_http_rejects_baked_options_with_400(self, trained, tmp_path):
        """Per-request decode query params against an exported artifact are a
        client mistake: clean 400, and the batch still serves option-free
        requests afterwards."""
        import urllib.error
        import urllib.request

        from img2latex_tpu.serving import InferenceServer
        from img2latex_tpu.serving_http import serve_in_thread

        ckpt, pred, imgs = trained
        out = tmp_path / "srvart400"
        export_checkpoint(ckpt, str(out), batch_sizes=(2,))
        exported = ExportedPredictor.load(str(out))
        with InferenceServer(exported, max_wait_ms=20) as srv:
            httpd, port = serve_in_thread(srv)
            try:
                img_bytes = open(imgs[0], "rb").read()
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/predict?beam_size=3",
                    data=img_bytes, headers={"Content-Type": "image/png"},
                )
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(req, timeout=60)
                assert ei.value.code == 400
                assert "baked" in json.loads(ei.value.read())["error"]
                # Option-free request still serves fine.
                ok = urllib.request.urlopen(
                    urllib.request.Request(
                        f"http://127.0.0.1:{port}/predict", data=img_bytes,
                        headers={"Content-Type": "image/png"},
                    ),
                    timeout=60,
                )
                assert json.loads(ok.read())["latex"] == pred.predict_batch(
                    [imgs[0]], batch_size=4
                )[0]
            finally:
                httpd.shutdown()

    def test_serve_exported_rejects_overrides(self, trained, tmp_path):
        from img2latex_tpu.serving_http import serve

        ckpt, _, _ = trained
        out = tmp_path / "srvart2"
        export_checkpoint(ckpt, str(out), batch_sizes=(2,))
        with pytest.raises(ValueError, match="re-export"):
            serve(str(out), exported=True, config_overrides={"a.b": 1})


class TestExportCLI:
    def test_export_then_predict_exported(self, trained, tmp_path, capsys):
        from img2latex_tpu.cli import main

        ckpt, pred, imgs = trained
        out = tmp_path / "cliart"
        rc = main(["export", ckpt, str(out), "--batch-sizes", "2"])
        assert rc == 0
        assert (out / "manifest.json").exists()
        capsys.readouterr()
        rc = main(["predict", "--exported", str(out), imgs[0]])
        assert rc == 0
        printed = capsys.readouterr().out.strip()
        assert printed == pred.predict_batch([imgs[0]], batch_size=4)[0]

    def test_exported_batch_size_is_runtime_chunk_cap(self, trained, tmp_path, capsys):
        """--batch-size stays live on the artifact path (a runtime chunk
        cap), unlike the baked decode flags which are rejected."""
        from img2latex_tpu.cli import main

        ckpt, pred, imgs = trained
        out = tmp_path / "clibs"
        assert main(["export", ckpt, str(out), "--batch-sizes", "2,4"]) == 0
        capsys.readouterr()
        rc = main(["predict", "--exported", str(out), "--batch-size", "2", imgs[0]])
        assert rc == 0
        assert capsys.readouterr().out.strip() == pred.predict_batch(
            [imgs[0]], batch_size=4
        )[0]
        # The cap clamps chunking for fixed-batch artifacts.
        exported = ExportedPredictor.load(str(out))
        assert exported._pick_batch(3, cap=2) == 2

    def test_exported_rejects_baked_flags(self, trained, tmp_path):
        from img2latex_tpu.cli import main

        ckpt, _, imgs = trained
        out = tmp_path / "cliart2"
        assert main(["export", ckpt, str(out), "--batch-sizes", "2"]) == 0
        with pytest.raises(SystemExit, match="bake"):
            main(["predict", "--exported", str(out), imgs[0], "--beam-size", "3"])


class TestBucketedExport:
    """VERDICT r2 #6: the bucketed serving mode is deployable via the
    artifact path — one executable per (batch, bucket width), routed through
    the same ``assign_bucket`` rule as the live ``Predictor._predict_bucketed``
    (reference has no export story at all; decode semantics per
    ``seq2seq.py:192-232``)."""

    # Fixture geometry: stride 2 (one conv block, pool 2), margin 8,
    # full canvas 64 -> widths 32/48 are eligible buckets.
    WIDTHS = (32, 48)

    def _inputs(self, imgs):
        """File paths + synthetic narrow arrays so every bucket (incl. the
        full-canvas fallback) is exercised regardless of corpus geometry."""
        rng = np.random.default_rng(3)
        narrow = (rng.random((32, 20)) * 255).astype(np.uint8)   # nat_w 20 -> bucket 32
        mid = (rng.random((32, 38)) * 255).astype(np.uint8)      # nat_w 38 -> bucket 48
        wide = (rng.random((32, 120)) * 255).astype(np.uint8)    # nat_w 120 -> full
        return list(imgs[:3]) + [narrow, mid, wide]

    def test_bucketed_artifact_parity(self, trained, tmp_path):
        ckpt, pred, imgs = trained
        out = tmp_path / "art"
        manifest = export_checkpoint(
            ckpt, str(out), batch_sizes=(2,), bucket_widths=self.WIDTHS
        )
        assert manifest["bucket_widths"] == [32, 48]
        assert manifest["bucket_stride"] == 2 and manifest["bucket_margin"] == 8
        for key, name in manifest["artifacts"].items():
            assert (out / name).exists(), key
        assert "2_w32" in manifest["artifacts"] and "2_w48" in manifest["artifacts"]

        inputs = self._inputs(imgs)
        # Sanity: the inputs really spread over >1 bucket group.
        from img2latex_tpu.data.transforms import assign_bucket
        assigned = {assign_bucket(i, self.WIDTHS, 32, 64, 2, 8) for i in inputs}
        assert len(assigned) > 1

        exported = ExportedPredictor.load(str(out))
        art = exported.predict_batch(inputs)
        live_bucketed = pred.predict_batch(
            inputs, batch_size=2, bucket_widths=list(self.WIDTHS)
        )
        live_fixed = pred.predict_batch(inputs, batch_size=2)
        assert art == live_bucketed == live_fixed

    def test_bucketed_beam_artifact(self, trained, tmp_path):
        ckpt, pred, imgs = trained
        out = tmp_path / "art"
        export_checkpoint(
            ckpt, str(out), batch_sizes=(2,), bucket_widths=(32,), beam_size=2
        )
        inputs = self._inputs(imgs)
        exported = ExportedPredictor.load(str(out))
        art = exported.predict_batch(inputs)
        live = pred.predict_batch(
            inputs, batch_size=2, beam_size=2, bucket_widths=[32]
        )
        assert art == live

    def test_bucket_validation(self, trained, tmp_path):
        ckpt, _, _ = trained
        with pytest.raises(ValueError, match="symbolic_batch"):
            export_checkpoint(
                ckpt, str(tmp_path / "a"), bucket_widths=(32,), symbolic_batch=True
            )
        with pytest.raises(ValueError, match="stride"):
            export_checkpoint(ckpt, str(tmp_path / "b"), bucket_widths=(33,))
        with pytest.raises(ValueError, match="narrower"):
            export_checkpoint(ckpt, str(tmp_path / "c"), bucket_widths=(62,))

    def test_cli_export_bucketed(self, trained, tmp_path, capsys):
        from img2latex_tpu.cli import main as cli

        ckpt, pred, imgs = trained
        out = tmp_path / "art"
        rc = cli(["export", ckpt, str(out), "--batch-sizes", "2",
                  "--bucket-widths", "32,48"])
        assert rc == 0
        manifest = json.loads((out / "manifest.json").read_text())
        assert manifest["bucket_widths"] == [32, 48]
        rc = cli(["predict", str(out), *imgs[:3], "--exported",
                  "--output", str(tmp_path / "p.json")])
        assert rc == 0
        preds = json.loads((tmp_path / "p.json").read_text())["predictions"]
        live = pred.predict_batch(imgs[:3], batch_size=2)
        assert [p["prediction"] for p in preds] == live
