"""Multi-host training is real: 2 JAX processes, gloo CPU collectives, the
product Trainer path with per-process data sharding and primary-host-gated
writes (VERDICT r1 item 2; SURVEY §5 comms row).

Each worker is a separate OS process (``multihost_worker.py``) because a JAX
distributed runtime owns the whole process.  The coordinator is a local TCP
port; each process exposes 2 virtual CPU devices (4 global).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from img2latex_tpu.data.synthetic import write_synthetic_corpus

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mh_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh")
    corpus = write_synthetic_corpus(str(root / "data"), n_train=32, n_val=8, n_test=8, seed=5)
    port = _free_port()
    procs, results = [], []
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    for pid in range(2):
        outdir = str(root / f"out{pid}")
        result = str(root / f"result{pid}.json")
        results.append((outdir, result))
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(HERE, "multihost_worker.py"),
                    str(pid),
                    "2",
                    str(port),
                    corpus,
                    outdir,
                    result,
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    return [json.load(open(r)) for _, r in results], results


class TestMultiHost:
    def test_both_processes_agree_on_global_metrics(self, mh_run):
        res, _ = mh_run
        a, b = sorted(res, key=lambda r: r["pid"])
        assert a["mesh"] == {"data": 4, "model": 1}
        # loss/accuracy are global (psum over all shards) — identical views
        assert a["train_loss"] == pytest.approx(b["train_loss"], rel=1e-6)
        assert a["val_loss"] == pytest.approx(b["val_loss"], rel=1e-6)
        assert a["train_accuracy"] == pytest.approx(b["train_accuracy"], abs=1e-9)

    def test_only_primary_writes_checkpoints(self, mh_run):
        res, _ = mh_run
        a, b = sorted(res, key=lambda r: r["pid"])
        assert a["wrote_checkpoint"] is True
        assert b["wrote_checkpoint"] is False

    def test_matches_single_process_run(self, mh_run, tmp_path):
        """The 2-process run computes the same first-epoch loss as a
        single-process run on the same corpus/seed (same global batches)."""
        res, results = mh_run
        corpus = None  # recover corpus path from the worker's outdir sibling
        # simpler: retrain single-process here with the same tiny config
        from img2latex_tpu.config import Config
        from img2latex_tpu.data.pipeline import create_data_loaders, read_formulas
        from img2latex_tpu.data.tokenizer import LaTeXTokenizer
        from img2latex_tpu.training.trainer import Trainer

        corpus = os.path.join(os.path.dirname(results[0][0]), "data")
        cfg = Config()
        cfg.data.data_dir = corpus
        cfg.data.batch_size = 8
        cfg.data.max_seq_length = 16
        cfg.model.embedding_dim = 32
        cfg.model.decoder.hidden_dim = 32
        cfg.model.decoder.lstm_layers = 1
        cfg.model.decoder.dropout = 0.0
        cfg.model.encoder.cnn.img_height = 32
        cfg.model.encoder.cnn.img_width = 96
        cfg.model.encoder.cnn.conv_filters = [4]
        cfg.training.epochs = 1
        cfg.training.accumulation_steps = 1
        cfg.hardware.compute_dtype = "float32"
        cfg.hardware.use_mesh = False
        tok = LaTeXTokenizer(max_sequence_length=cfg.data.max_seq_length)
        tok.fit(read_formulas(os.path.join(corpus, "im2latex_formulas.norm.lst")))
        tr = Trainer(cfg, tok, create_data_loaders(cfg, tok), experiment_name="mh_single")
        m = tr.train_epoch(0)
        assert res[0]["train_loss"] == pytest.approx(m["train_loss"], rel=1e-5)
