"""Frozen-pretrained-backbone regime through the PRODUCT config path
(VERDICT r2 #3): ``model.encoder.resnet.pretrained_path`` +
``freeze_backbone`` drive a real ``Trainer.train()`` — the backbone outside
layer4 must come out bit-identical to the loaded weights while layer4 and
the heads train.  Reference regime: ``img2latex/model/encoder.py:184-210``.
"""

import os

import jax
import numpy as np
import pytest

from img2latex_tpu.config import Config
from img2latex_tpu.data.pipeline import create_data_loaders, read_formulas
from img2latex_tpu.data.synthetic import write_synthetic_corpus
from img2latex_tpu.data.tokenizer import LaTeXTokenizer
from img2latex_tpu.training.trainer import Trainer
from img2latex_tpu.utils import checkpoint as ckpt_lib
from img2latex_tpu.utils.paths import PathManager


def _cfg(corpus):
    cfg = Config()
    cfg.data.data_dir = corpus
    cfg.data.batch_size = 8
    cfg.data.max_seq_length = 12
    cfg.model.name = "resnet_lstm"
    cfg.model.encoder.resnet.model_name = "resnet18"
    cfg.model.embedding_dim = 24
    cfg.model.decoder.hidden_dim = 24
    cfg.model.decoder.lstm_layers = 1
    cfg.model.decoder.dropout = 0.0
    cfg.model.encoder.resnet.img_height = 32
    cfg.model.encoder.resnet.img_width = 64
    cfg.training.epochs = 1
    cfg.inference.max_length = 11
    cfg.hardware.compute_dtype = "float32"
    return cfg


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = np.asarray(v)
    return out


@pytest.fixture(scope="module")
def source_ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("freezecorpus")
    corpus = write_synthetic_corpus(str(root / "data"), n_train=16, n_val=8, n_test=8, seed=21)
    cfg = _cfg(corpus)
    tok = LaTeXTokenizer(max_sequence_length=12)
    tok.fit(read_formulas(os.path.join(corpus, "im2latex_formulas.norm.lst")))
    paths = PathManager(str(root))
    paths.outputs_dir.mkdir(parents=True, exist_ok=True)
    Trainer(cfg, tok, create_data_loaders(cfg, tok), paths=paths,
            experiment_name="src").train()
    return str(paths.get_dir("src", "checkpoints")), corpus, root, tok


class TestFreezeRegime:
    def test_extract_backbone_layout(self, source_ckpt):
        """extract_backbone emits the converted-npz layout pretrained_path
        consumes: flax leaf names, mean/var stats included."""
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
        from extract_backbone import extract

        ckpt, _, _, _ = source_ckpt
        flat = extract(ckpt)
        leaves = {p.split("/")[-1] for p in flat}
        assert "kernel" in leaves and "scale" in leaves
        assert "mean" in leaves and "var" in leaves  # batch stats ride along
        assert any(p.startswith("layer4") for p in flat)
        assert all(v.dtype == np.float32 or v.dtype == np.dtype("float32")
                   or v.dtype.kind == "f" for v in flat.values())

    def test_frozen_training_preserves_backbone(self, source_ckpt, tmp_path):
        """Train with pretrained_path + freeze_backbone=true: backbone params
        outside layer4 are bit-identical to the source; layer4 + encoder head
        + decoder actually move."""
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
        from extract_backbone import extract

        ckpt, corpus, root, tok = source_ckpt
        flat = extract(ckpt)
        npz = tmp_path / "backbone.npz"
        np.savez(npz, **{k: v.astype(np.float32) for k, v in flat.items()})

        cfg = _cfg(corpus)
        cfg.model.encoder.resnet.pretrained_path = str(npz)
        cfg.model.encoder.resnet.freeze_backbone = True
        paths = PathManager(str(root))
        t = Trainer(cfg, tok, create_data_loaders(cfg, tok), paths=paths,
                    experiment_name="frz")
        t.train()

        frz_dir, step = ckpt_lib.resolve_checkpoint_path(
            str(paths.get_dir("frz", "checkpoints")))
        state, _ = ckpt_lib.restore_checkpoint(frz_dir, step if step is not None else -1)
        got = _flatten(state["params"]["encoder"]["backbone"])
        src_params = {k: v for k, v in flat.items()
                      if k.split("/")[-1] not in ("mean", "var")}

        frozen_moved, layer4_moved = [], False
        for path, src in src_params.items():
            if path.startswith("layer4"):
                if not np.array_equal(got[path], src):
                    layer4_moved = True
            else:
                if not np.array_equal(got[path], src):
                    frozen_moved.append(path)
        assert not frozen_moved, f"frozen params moved: {frozen_moved[:5]}"
        assert layer4_moved, "layer4 should train in the frozen regime"
