import json
import os

import pytest

from img2latex_tpu.config import Config
from img2latex_tpu.data.pipeline import create_data_loaders, read_formulas
from img2latex_tpu.data.synthetic import write_synthetic_corpus
from img2latex_tpu.data.tokenizer import LaTeXTokenizer
from img2latex_tpu.training.evaluator import evaluate_checkpoint
from img2latex_tpu.training.trainer import Trainer
from img2latex_tpu.utils.paths import PathManager


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalcorpus")
    corpus = write_synthetic_corpus(str(root / "data"), n_train=16, n_val=8, n_test=8, seed=4)
    cfg = Config()
    cfg.data.data_dir = corpus
    cfg.data.batch_size = 8
    cfg.data.max_seq_length = 14
    cfg.model.embedding_dim = 24
    cfg.model.decoder.hidden_dim = 24
    cfg.model.decoder.lstm_layers = 1
    cfg.model.decoder.dropout = 0.0
    cfg.model.encoder.cnn.img_height = 32
    cfg.model.encoder.cnn.img_width = 64
    cfg.model.encoder.cnn.conv_filters = [4]
    cfg.training.epochs = 1
    cfg.inference.max_length = 13
    cfg.hardware.compute_dtype = "float32"
    tok = LaTeXTokenizer(max_sequence_length=14)
    tok.fit(read_formulas(os.path.join(corpus, "im2latex_formulas.norm.lst")))
    paths = PathManager(str(root))
    paths.outputs_dir.mkdir(parents=True, exist_ok=True)
    t = Trainer(cfg, tok, create_data_loaders(cfg, tok), paths=paths, experiment_name="ev")
    t.train()
    return str(paths.get_dir("ev", "checkpoints")), corpus, root


class TestEvaluator:
    def test_greedy_eval(self, trained_ckpt, tmp_path):
        ckpt, corpus, _ = trained_ckpt
        out = evaluate_checkpoint(
            ckpt, data_dir=corpus, split="test", output_dir=str(tmp_path)
        )
        assert out["num_images"] == 8
        assert 0.0 <= out["bleu"] <= 1.0
        assert out["images_per_second"] > 0
        data = json.loads((tmp_path / "predictions.json").read_text())
        assert len(data["predictions"]) == 8
        assert all("reference" in r and "prediction" in r for r in data["predictions"])
        # unshuffled eval keeps image names aligned
        assert data["predictions"][0]["image"].endswith(".png")

    def test_beam_eval(self, trained_ckpt):
        ckpt, corpus, _ = trained_ckpt
        out = evaluate_checkpoint(ckpt, data_dir=corpus, split="validate", beam_size=2)
        assert out["decode"]["beam_size"] == 2
        assert out["num_images"] == 8

    def test_device_cache_eval_matches_streaming(self, trained_ckpt):
        """data.device_cache=true (one stacked upload, device-side batch
        views) must produce identical metrics to the streaming loader."""
        ckpt, corpus, _ = trained_ckpt
        plain = evaluate_checkpoint(ckpt, data_dir=corpus, split="test")
        cached = evaluate_checkpoint(
            ckpt, data_dir=corpus, split="test",
            config_overrides={"data.device_cache": True},
        )
        assert cached["num_images"] == plain["num_images"] == 8
        assert cached["bleu"] == pytest.approx(plain["bleu"], abs=1e-9)
        assert cached["cache_build_seconds"] > 0.0

    def test_whole_split_matches_per_batch_loop(self, trained_ckpt, tmp_path):
        """The one-dispatch whole-split program (inference.whole_split, the
        device_cache default) must produce byte-identical predictions to the
        per-batch loop, with the whole-split accounting fields present."""
        ckpt, corpus, _ = trained_ckpt
        loop = evaluate_checkpoint(
            ckpt, data_dir=corpus, split="test", batch_size=4,
            output_dir=str(tmp_path / "loop"),
            config_overrides={
                "data.device_cache": True, "inference.whole_split": False,
            },
        )
        whole = evaluate_checkpoint(
            ckpt, data_dir=corpus, split="test", batch_size=4,
            output_dir=str(tmp_path / "whole"),
            config_overrides={"data.device_cache": True},
            passes=2,
        )
        assert whole.get("whole_split") is True
        assert "whole_split" not in loop
        a = json.loads((tmp_path / "loop" / "predictions.json").read_text())
        b = json.loads((tmp_path / "whole" / "predictions.json").read_text())
        assert [r["prediction"] for r in a["predictions"]] == [
            r["prediction"] for r in b["predictions"]
        ]
        assert [r["image"] for r in a["predictions"]] == [
            r["image"] for r in b["predictions"]
        ]
        assert whole["bleu"] == pytest.approx(loop["bleu"], abs=1e-9)
        # passes=2: a measured steady window exists (2nd dispatch+fetch)
        assert whole["decode_passes"] == 2
        assert whole["steady_images"] == 8
        assert whole["decode_seconds"] > 0
        assert whole["images_per_second_includes_compile"] is False
        # passes=1: only a compile-inclusive rate exists
        once = evaluate_checkpoint(
            ckpt, data_dir=corpus, split="test", batch_size=4,
            config_overrides={"data.device_cache": True},
        )
        assert once["images_per_second_includes_compile"] is True
        assert once["bleu"] == pytest.approx(loop["bleu"], abs=1e-9)
        # passes=4: the pipelined steady loop (dispatch N+1 -> post N ->
        # fetch N+1) interleaves repeatedly; outputs and metrics must be
        # unchanged and every steady pass must charge a post window.
        many = evaluate_checkpoint(
            ckpt, data_dir=corpus, split="test", batch_size=4,
            output_dir=str(tmp_path / "many"),
            config_overrides={"data.device_cache": True},
            passes=4,
        )
        c = json.loads((tmp_path / "many" / "predictions.json").read_text())
        assert [r["prediction"] for r in c["predictions"]] == [
            r["prediction"] for r in b["predictions"]
        ]
        assert many["bleu"] == pytest.approx(loop["bleu"], abs=1e-9)
        assert many["decode_passes"] == 4
        assert many["steady_images"] == 8 * 3
        assert many["host_post_seconds"] > 0

    def test_whole_split_beam_and_sampling(self, trained_ckpt):
        """Whole-split covers every decode family: beam (deterministic — must
        match the loop) and top-k sampling (same seed schedule: the per-batch
        keys are the same jax.random.split(PRNGKey(0)) schedule the loop
        uses, so tokens match row for row)."""
        ckpt, corpus, _ = trained_ckpt
        for kwargs in ({"beam_size": 2}, {"top_k": 3, "temperature": 0.9}):
            loop = evaluate_checkpoint(
                ckpt, data_dir=corpus, split="validate", batch_size=4, **kwargs,
                config_overrides={
                    "data.device_cache": True, "inference.whole_split": False,
                },
            )
            whole = evaluate_checkpoint(
                ckpt, data_dir=corpus, split="validate", batch_size=4, **kwargs,
                config_overrides={"data.device_cache": True},
            )
            assert whole.get("whole_split") is True
            assert whole["bleu"] == pytest.approx(loop["bleu"], abs=1e-9), kwargs

    def test_whole_split_compile_failure_falls_back(self, trained_ckpt, monkeypatch):
        """A whole-split program that fails to build (r5 finding: hidden-640
        grid kernels scoped-VMEM-OOM inside the nested lax.map while the
        same kernel compiles per-batch) must degrade LOUDLY to the
        per-batch device-cached loop, not fail the evaluation."""
        import jax

        from img2latex_tpu.training.predictor import Predictor

        ckpt, corpus, _ = trained_ckpt
        plain = evaluate_checkpoint(ckpt, data_dir=corpus, split="test", batch_size=4)

        def boom(self, n_batches, batch, dcfg, width=None):
            def run(images, keys):
                raise jax.errors.JaxRuntimeError("INTERNAL: scoped vmem OOM (test)")
            return run

        monkeypatch.setattr(Predictor, "_decode_split_fn", boom)
        out = evaluate_checkpoint(
            ckpt, data_dir=corpus, split="test", batch_size=4,
            config_overrides={"data.device_cache": True},
        )
        assert "whole_split" not in out  # fell back to the per-batch loop
        assert out["bleu"] == pytest.approx(plain["bleu"], abs=1e-9)
        assert out["num_images"] == plain["num_images"]

    def test_bucketed_wholesplit_compile_failure_falls_back(
        self, trained_ckpt, monkeypatch
    ):
        import jax

        from img2latex_tpu.training.predictor import Predictor

        ckpt, corpus, _ = trained_ckpt
        stream = evaluate_checkpoint(
            ckpt, data_dir=corpus, split="test", batch_size=4,
            bucket_widths=[32, 48],
        )

        def boom(self, *a, **k):
            raise jax.errors.JaxRuntimeError("INTERNAL: scoped vmem OOM (test)")

        monkeypatch.setattr(Predictor, "predict_split_bucketed", boom)
        out = evaluate_checkpoint(
            ckpt, data_dir=corpus, split="test", batch_size=4,
            bucket_widths=[32, 48],
            config_overrides={"data.device_cache": True},
        )
        assert out["bucketed"] is True and "whole_split" not in out
        assert out["bleu"] == pytest.approx(stream["bleu"], abs=1e-9)

    def test_max_batches_cap(self, trained_ckpt):
        ckpt, corpus, _ = trained_ckpt
        out = evaluate_checkpoint(
            ckpt, data_dir=corpus, split="train", batch_size=4, max_batches=2
        )
        assert out["num_images"] == 8  # 2 batches x 4

    def test_does_not_mutate_predictor_cfg(self, trained_ckpt):
        """Per-evaluation overrides (data_dir, batch sizes) must not stick to
        a caller-supplied predictor's config."""
        from img2latex_tpu.training.predictor import Predictor

        ckpt, corpus, _ = trained_ckpt
        pred = Predictor.from_checkpoint(ckpt)
        before = pred.cfg.to_dict()
        evaluate_checkpoint(
            ckpt, predictor=pred, data_dir=corpus, split="test",
            batch_size=4, max_batches=1,
        )
        assert pred.cfg.to_dict() == before

    def test_train_throughput_metric(self, trained_ckpt):
        _, _, root = trained_ckpt
        metrics = json.loads(
            (root / "outputs" / "ev" / "metrics" / "metrics.json").read_text()
        )
        step1 = metrics["steps"]["1"]
        assert step1["train_images_per_sec"] > 0
