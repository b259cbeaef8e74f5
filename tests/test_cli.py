import json
import os

import numpy as np
import pytest
import yaml

from img2latex_tpu.cli import build_parser, main
from img2latex_tpu.data.synthetic import write_synthetic_corpus


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    write_synthetic_corpus(str(root / "data"), n_train=24, n_val=8, n_test=8, seed=11)
    cfg = {
        "data": {"data_dir": str(root / "data"), "batch_size": 8, "max_seq_length": 16},
        "model": {
            "name": "cnn_lstm",
            "embedding_dim": 32,
            "encoder": {"cnn": {"img_height": 32, "img_width": 96, "conv_filters": [4, 8]}},
            "decoder": {"hidden_dim": 32, "lstm_layers": 1, "dropout": 0.0},
        },
        "training": {"epochs": 1, "experiment_name": "cli_t", "accumulation_steps": 1},
        "evaluation": {"bleu_batches": 1},
        "inference": {"max_length": 15},
        "hardware": {"compute_dtype": "float32"},
    }
    cfg_path = root / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return root


class TestParser:
    def test_all_commands_present(self):
        parser = build_parser()
        # mirrors the reference command surface (cli.py:62-80)
        for argv in (
            ["train", "--epochs", "1"],
            ["predict", "c", "i"],
            ["evaluate", "c"],
            ["visualize"],
            ["debug-logs"],
            ["analyze", "images"],
            ["analyze", "project"],
            ["analyze", "curves", "-e", "x"],
            ["analyze", "tokens", "--predictions-file", "p"],
            ["analyze", "errors", "--predictions-file", "p"],
            ["analyze", "preprocess", "--image", "i"],
            ["analyze", "metrics", "latest", "-e", "x"],
            ["analyze", "report", "-e", "x"],
            ["analyze", "predictions", "--predictions-file", "p"],
        ):
            args = parser.parse_args(argv)
            assert callable(args.func)

    def test_set_override_parsing(self):
        parser = build_parser()
        args = parser.parse_args(["train", "--set", "training.learning_rate=0.01"])
        from img2latex_tpu.cli import _parse_overrides

        ov = _parse_overrides(args)
        assert ov["training.learning_rate"] == 0.01

    def test_bad_set_raises(self):
        parser = build_parser()
        args = parser.parse_args(["train", "--set", "nonsense"])
        from img2latex_tpu.cli import _parse_overrides

        with pytest.raises(SystemExit):
            _parse_overrides(args)


class TestLifecycle:
    def test_train_predict_evaluate(self, workdir, capsys):
        rc = main(
            ["train", "--config", str(workdir / "cfg.yaml"), "--output-dir", str(workdir)]
        )
        assert rc == 0
        exp_dir = workdir / "outputs" / "cli_t"
        assert (exp_dir / "checkpoints").is_dir()
        assert (exp_dir / "config.yaml").exists()
        assert (exp_dir / "tokenizer.json").exists()
        assert (exp_dir / "metrics" / "metrics.json").exists()

        img = sorted((workdir / "data" / "img").iterdir())[0]
        rc = main(["predict", str(exp_dir / "checkpoints"), str(img)])
        assert rc == 0

        rc = main(
            [
                "evaluate",
                str(exp_dir / "checkpoints"),
                "--data-dir",
                str(workdir / "data"),
                "--split",
                "test",
                "--output-dir",
                str(exp_dir / "predictions"),
            ]
        )
        assert rc == 0
        preds = json.loads((exp_dir / "predictions" / "predictions.json").read_text())
        assert len(preds["predictions"]) == 8
        out = capsys.readouterr().out
        assert "token_accuracy" in out

    def test_registry_not_double_registered(self, workdir):
        reg = json.loads(
            (workdir / "outputs" / "registry" / "experiment_registry.json").read_text()
        )
        assert "cli_t" in reg
        # training metrics survived (a second register would have reset them)
        assert reg["cli_t"]["metrics"]["steps"]
        assert reg["cli_t"]["status"] == "completed"

    def test_analyze_tools_on_artifacts(self, workdir):
        exp_dir = workdir / "outputs" / "cli_t"
        pf = str(exp_dir / "predictions" / "predictions.json")
        out = workdir / "an"
        assert main(["analyze", "tokens", "--predictions-file", pf,
                     "--output-dir", str(out / "tokens")]) == 0
        assert main(["analyze", "errors", "--predictions-file", pf,
                     "--output-dir", str(out / "errors")]) == 0
        assert main(["analyze", "predictions", "--predictions-file", pf,
                     "--output-dir", str(out / "pred")]) == 0
        assert (out / "tokens" / "token_report.md").exists()
        assert (out / "errors" / "error_buckets.json").exists()
        assert (out / "pred" / "prediction_comparison.png").exists()

    def test_visualize_and_debug_logs(self, workdir):
        assert main(["visualize", "-e", "cli_t", "--output-dir", str(workdir)]) == 0
        assert main(["debug-logs", "-e", "cli_t", "--output-dir", str(workdir), "--tail", "1"]) == 0


class TestSite:
    def test_site_generation(self, workdir):
        rc = main(["analyze", "site", "-e", "cli_t", "--output-dir", str(workdir)])
        assert rc == 0
        page = workdir / "outputs" / "cli_t" / "reports" / "index.html"
        text = page.read_text()
        assert "Training metrics" in text
        assert "val_bleu" in text
        assert "Sample predictions" in text


class TestAnalyzeSuiteFull:
    """The remaining analyze tools (images/project/curves/preprocess/metrics/
    report) driven through the CLI on real artifacts."""

    def test_images(self, workdir):
        out = workdir / "an2" / "images"
        rc = main(["analyze", "images", "--data-dir", str(workdir / "data"),
                   "--num-samples", "10", "--output-dir", str(out)])
        assert rc == 0
        stats = json.loads((out / "image_stats.json").read_text())
        assert stats["num_analyzed"] == 10
        assert (out / "image_grid.png").exists()

    def test_project_valid_config(self, workdir):
        out = workdir / "an2" / "project"
        rc = main(["analyze", "project", "--config", str(workdir / "cfg.yaml"),
                   "--check", "all", "--output-dir", str(out)])
        assert rc == 0
        report = json.loads((out / "project_report.json").read_text())
        assert report["config"]["valid"]
        assert report["files"]["all_present"]
        assert (out / "environment.txt").exists()

    def test_project_detects_missing_files(self, workdir, tmp_path):
        import yaml as _yaml

        cfg = _yaml.safe_load((workdir / "cfg.yaml").read_text())
        cfg["data"]["data_dir"] = str(tmp_path / "nowhere")
        bad = tmp_path / "bad.yaml"
        bad.write_text(_yaml.safe_dump(cfg))
        rc = main(["analyze", "project", "--config", str(bad), "--check", "files",
                   "--output-dir", str(tmp_path / "out")])
        assert rc == 1

    def test_project_git_diff(self, workdir, tmp_path):
        """--check git: dotted-key diff of the config vs its committed version
        (reference project.py:231-293)."""
        import subprocess

        import yaml as _yaml

        repo = tmp_path / "gitrepo"
        repo.mkdir()
        subprocess.run(["git", "init", "-q", str(repo)], check=True)
        cfg = _yaml.safe_load((workdir / "cfg.yaml").read_text())
        cfg_path = repo / "cfg.yaml"
        cfg_path.write_text(_yaml.safe_dump(cfg))
        env = {"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t", "GIT_COMMITTER_NAME": "t",
               "GIT_COMMITTER_EMAIL": "t@t", "PATH": os.environ["PATH"], "HOME": os.environ.get("HOME", "/tmp")}
        subprocess.run(["git", "-C", str(repo), "add", "cfg.yaml"], check=True, env=env)
        subprocess.run(["git", "-C", str(repo), "commit", "-qm", "base"], check=True, env=env)
        # mutate: modify one scalar, add one key, delete one key
        cfg["training"]["epochs"] = 99
        cfg["training"]["new_knob"] = True
        del cfg["inference"]["max_length"]
        cfg_path.write_text(_yaml.safe_dump(cfg))

        from img2latex_tpu.analysis.project import compare_config_with_git

        diff = compare_config_with_git(str(cfg_path))
        assert "training.epochs: 1 -> 99" in diff["modified"]
        assert "training.new_knob" in diff["added"]
        assert "inference.max_length" in diff["deleted"]

        out = tmp_path / "gitreport"
        rc = main(["analyze", "project", "--config", str(cfg_path),
                   "--check", "git", "--output-dir", str(out)])
        assert rc == 0
        report = json.loads((out / "project_report.json").read_text())
        assert report["git"]["added"] == ["training.new_knob"]

    def test_project_git_untracked_config(self, workdir, tmp_path):
        from img2latex_tpu.analysis.project import compare_config_with_git

        loose = tmp_path / "loose.yaml"
        loose.write_text("a: 1\n")
        diff = compare_config_with_git(str(loose))
        assert "error" in diff

    def test_project_checkpoint_consistency(self, workdir, tmp_path):
        """--check consistency --checkpoint: param shapes cross-checked
        against the checkpoint's embedded config/tokenizer (deepens reference
        project.py:412-514 to checkpoint-vs-config agreement)."""
        ckpt = str(workdir / "outputs" / "cli_t" / "checkpoints")
        out = tmp_path / "consistency"
        rc = main(["analyze", "project", "--config", str(workdir / "cfg.yaml"),
                   "--check", "consistency", "--checkpoint", ckpt,
                   "--output-dir", str(out)])
        assert rc == 0
        report = json.loads((out / "project_report.json").read_text())
        cc = report["checkpoint_consistency"]
        assert cc["consistent"], cc["issues"]
        assert cc["model"] == "cnn_lstm"
        assert cc["config_drift"] == []  # same config as the training run

    def test_project_checkpoint_consistency_detects_mismatch(self, workdir):
        """A checkpoint whose embedded config disagrees with its own param
        shapes must be flagged; a *current* config that disagrees shows drift."""
        import shutil

        from img2latex_tpu.analysis.project import check_checkpoint_consistency
        from img2latex_tpu.config import load_config

        src = workdir / "outputs" / "cli_t" / "checkpoints"
        broken = workdir / "broken_ckpt"
        if not broken.exists():
            shutil.copytree(src, broken)
        step_dirs = sorted(broken.glob("step_*"))
        meta_file = step_dirs[-1] / "meta.json"
        meta = json.loads(meta_file.read_text())
        meta["config"]["model"]["embedding_dim"] = 777
        meta["config"]["model"]["decoder"]["lstm_layers"] = 3
        meta_file.write_text(json.dumps(meta))

        rep = check_checkpoint_consistency(str(broken))
        assert not rep["consistent"]
        joined = " ".join(rep["issues"])
        assert "embedding_dim 777" in joined
        assert "lstm_layers 3" in joined

        # drift vs a different current config
        cfg = load_config(str(workdir / "cfg.yaml"), {"model.decoder.hidden_dim": 64})
        rep2 = check_checkpoint_consistency(str(src), cfg)
        assert rep2["consistent"]
        assert any("hidden_dim" in d for d in rep2["config_drift"])

    def test_curves(self, workdir):
        out = workdir / "an2" / "curves"
        rc = main(["analyze", "curves", "-e", "cli_t",
                   "--metrics-file", str(workdir / "outputs" / "cli_t" / "metrics" / "metrics.json"),
                   "--output-dir", str(out), "--smoothing", "0.5"])
        assert rc == 0
        assert list(out.glob("curve_*.png"))

    def test_preprocess(self, workdir):
        img = sorted((workdir / "data" / "img").iterdir())[0]
        out = workdir / "an2" / "pre"
        rc = main(["analyze", "preprocess", "--image", str(img), "--output-dir", str(out)])
        assert rc == 0
        assert (out / "preprocessing.png").exists()

    def test_metrics_actions(self, workdir, capsys):
        assert main(["analyze", "metrics", "visualize", "-e", "cli_t",
                     "--output-dir", str(workdir)]) == 0
        assert main(["analyze", "metrics", "latest", "-e", "cli_t",
                     "--output-dir", str(workdir)]) == 0
        assert main(["analyze", "metrics", "export", "-e", "cli_t", "--format", "json",
                     "--output-dir", str(workdir)]) == 0
        assert "epoch" in capsys.readouterr().out

    def test_report_figures(self, workdir, monkeypatch):
        monkeypatch.chdir(workdir)
        out = workdir / "an2" / "report"
        rc = main(["analyze", "report", "-e", "cli_t", "--output-dir", str(out)])
        assert rc == 0
        assert (out / "report_composite.png").exists()


class TestBatchPredict:
    def test_predict_directory_to_file(self, workdir):
        exp_dir = workdir / "outputs" / "cli_t"
        out_file = workdir / "batch_preds.json"
        rc = main([
            "predict", str(exp_dir / "checkpoints"), str(workdir / "data" / "img"),
            "--batch-size", "4", "-o", str(out_file),
        ])
        assert rc == 0
        data = json.loads(out_file.read_text())
        assert len(data["predictions"]) == 40  # 24+8+8 corpus images
        assert all("image" in r and "prediction" in r for r in data["predictions"])

    def test_predict_multiple_files_stdout(self, workdir, capsys):
        exp_dir = workdir / "outputs" / "cli_t"
        imgs = [str(p) for p in sorted((workdir / "data" / "img").iterdir())[:2]]
        rc = main(["predict", str(exp_dir / "checkpoints"), *imgs])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 2
        assert all("\t" in line for line in out)

    def test_predict_single_image_honors_output(self, workdir):
        """-o must write the file even for exactly one image (the
        single-image fast path previously printed and returned early)."""
        exp_dir = workdir / "outputs" / "cli_t"
        out_file = workdir / "single_pred.json"
        img = sorted((workdir / "data" / "img").iterdir())[0]
        rc = main([
            "predict", str(exp_dir / "checkpoints"), str(img), "-o", str(out_file),
        ])
        assert rc == 0
        data = json.loads(out_file.read_text())
        assert len(data["predictions"]) == 1

    def test_evaluate_set_data_dir_applies(self, workdir, capsys):
        """--set data.data_dir=... must route to the loader like --data-dir
        (it was previously filtered out and silently ignored)."""
        ckpt = str(workdir / "outputs" / "cli_t" / "checkpoints")
        rc = main([
            "evaluate", ckpt, "--split", "test", "--max-batches", "1",
            "--set", f"data.data_dir={workdir / 'data'}",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["num_images"] > 0

    def test_predict_empty_dir_errors(self, workdir, tmp_path):
        exp_dir = workdir / "outputs" / "cli_t"
        with pytest.raises(SystemExit):
            main(["predict", str(exp_dir / "checkpoints"), str(tmp_path)])

    def test_set_overrides_reach_checkpoint_config(self, workdir, capsys):
        """predict/evaluate --set applies dotted overrides on top of the
        checkpoint's embedded config (hardware fast-path toggles are
        reachable from the CLI, not just the Python API)."""
        from img2latex_tpu.training.predictor import Predictor

        ckpt = str(workdir / "outputs" / "cli_t" / "checkpoints")
        pred = Predictor.from_checkpoint(
            ckpt, config_overrides={"hardware.int8_encoder": True}
        )
        assert pred.cfg.hardware.int8_encoder is True
        assert pred.model.int8_encoder is True  # reached build_model
        # overrides win over the inference-side pallas_conv1 enable
        pred2 = Predictor.from_checkpoint(
            ckpt, config_overrides={"hardware.pallas_conv1": False}
        )
        assert pred2.cfg.hardware.pallas_conv1 is False

        img = sorted((workdir / "data" / "img").iterdir())[0]
        rc = main(["predict", ckpt, str(img), "--set", "hardware.int8_encoder=true"])
        assert rc == 0
        capsys.readouterr()
        rc = main([
            "evaluate", ckpt, "--data-dir", str(workdir / "data"),
            "--split", "test", "--max-batches", "1",
            "--set", "hardware.use_pallas_decode=false",
        ])
        assert rc == 0
        assert "token_accuracy" in capsys.readouterr().out
