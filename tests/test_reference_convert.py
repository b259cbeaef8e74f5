"""Reference-checkpoint conversion: FORWARD EQUIVALENCE with the reference
architecture executed in torch.

Builds the reference's cnn_lstm Seq2Seq topology in PyTorch (structure per
``img2latex/model/{encoder,decoder,seq2seq}.py`` — attention path with
length-1 memory), runs it on random input, converts its state_dict with
``convert_cnn_lstm_state_dict``, and asserts our flax model produces the
same logits.  This is the "bring your trained reference checkpoint" path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from img2latex_tpu.models.convert_reference import (  # noqa: E402
    convert_cnn_lstm_state_dict,
    convert_reference_checkpoint,
    flatten_permutation,
)
from img2latex_tpu.models.seq2seq import Seq2SeqModel  # noqa: E402

V, E, H, L = 23, 20, 24, 2
IMG_H, IMG_W = 32, 64
FILTERS = [8, 16]


class TorchRefEncoder(nn.Module):
    """Reference CNNEncoder topology (encoder.py:74-107)."""

    def __init__(self):
        super().__init__()
        layers = []
        in_c = 1
        for f in FILTERS:
            layers += [nn.Conv2d(in_c, f, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2)]
            in_c = f
        self.cnn_layers = nn.Sequential(*layers)
        flat = FILTERS[-1] * (IMG_H // 2 ** len(FILTERS)) * (IMG_W // 2 ** len(FILTERS))
        self.embedding_layer = nn.Linear(flat, E)

    def forward(self, x):
        y = self.cnn_layers(x)
        y = y.flatten(1)
        return torch.relu(self.embedding_layer(y))


class TorchRefAttention(nn.Module):
    """Reference Attention (decoder.py:287-343)."""

    def __init__(self):
        super().__init__()
        self.attn = nn.Linear(H + E, H)
        self.v = nn.Linear(H, 1, bias=False)

    def forward(self, hidden, encoder_outputs):
        src_len = encoder_outputs.shape[1]
        hidden = hidden.repeat(1, src_len, 1)
        energy = torch.tanh(self.attn(torch.cat((hidden, encoder_outputs), dim=2)))
        attention = self.v(energy).squeeze(2)
        weights = torch.softmax(attention, dim=1).unsqueeze(1)
        return torch.bmm(weights, encoder_outputs)


class TorchRefDecoder(nn.Module):
    """Reference LSTMDecoder, attention path (decoder.py:100-195)."""

    def __init__(self):
        super().__init__()
        self.embedding = nn.Embedding(V, E)
        self.lstm = nn.LSTM(2 * E, H, num_layers=L, batch_first=True)
        self.attention = TorchRefAttention()
        self.output_layer = nn.Linear(H, V)

    def forward(self, encoder_output, target_sequence):
        B, T = target_sequence.shape
        embedded = self.embedding(target_sequence)
        h = torch.zeros(L, B, H)
        c = torch.zeros(L, B, H)
        outputs = []
        for t in range(T):
            current = embedded[:, t, :].unsqueeze(1)
            context = self.attention(h[-1].unsqueeze(1), encoder_output.unsqueeze(1))
            lstm_in = torch.cat([current, context], dim=2)
            out, (h, c) = self.lstm(lstm_in, (h, c))
            outputs.append(self.output_layer(out))
        return torch.cat(outputs, dim=1)


class TorchRefSeq2Seq(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TorchRefEncoder()
        self.decoder = TorchRefDecoder()

    def forward(self, images, targets):
        enc = self.encoder(images)
        return self.decoder(enc, targets[:, :-1])


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tmodel = TorchRefSeq2Seq().eval()
    fmodel = Seq2SeqModel(
        model_type="cnn_lstm",
        vocab_size=V,
        embedding_dim=E,
        hidden_dim=H,
        lstm_layers=L,
        dropout=0.0,
        use_attention=True,
        conv_filters=tuple(FILTERS),
    )
    c_after = (FILTERS[-1], IMG_H // 2 ** len(FILTERS), IMG_W // 2 ** len(FILTERS))
    converted = convert_cnn_lstm_state_dict(tmodel.state_dict(), c_after)
    return tmodel, fmodel, converted


class TestFlattenPermutation:
    def test_permutation_roundtrip(self):
        c, h, w = 3, 2, 4
        perm = flatten_permutation(c, h, w)
        x = np.random.default_rng(0).normal(size=(c, h, w))
        np.testing.assert_array_equal(
            x.reshape(-1)[perm], np.transpose(x, (1, 2, 0)).reshape(-1)
        )


class TestForwardEquivalence:
    def test_teacher_forced_logits_match(self, models):
        tmodel, fmodel, converted = models
        rng = np.random.default_rng(1)
        images = rng.normal(size=(2, IMG_H, IMG_W, 1)).astype(np.float32)
        targets = rng.integers(0, V, size=(2, 7)).astype(np.int32)

        with torch.no_grad():
            ref = tmodel(
                torch.tensor(np.transpose(images, (0, 3, 1, 2))),  # NHWC->NCHW
                torch.tensor(targets, dtype=torch.long),
            ).numpy()

        # sanity: converted tree covers every param a fresh init creates (the
        # vector-memory fast path never executes attention, so the converted
        # tree carries attention params the init tree lacks — flax ignores
        # unvisited extras at apply time).
        init = fmodel.init(
            jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(targets)
        )["params"]
        init_paths = {
            jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(init)[0]
        }
        conv_paths = {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(converted)[0]
        }
        assert init_paths <= conv_paths, init_paths - conv_paths
        got = fmodel.apply(
            {"params": converted}, jnp.asarray(images), jnp.asarray(targets)
        )
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)

    def test_decode_step_matches(self, models):
        tmodel, fmodel, converted = models
        rng = np.random.default_rng(2)
        images = rng.normal(size=(2, IMG_H, IMG_W, 1)).astype(np.float32)
        with torch.no_grad():
            enc_t = tmodel.encoder(torch.tensor(np.transpose(images, (0, 3, 1, 2))))
        memory = fmodel.apply(
            {"params": converted}, jnp.asarray(images), method=Seq2SeqModel.encode
        )
        np.testing.assert_allclose(np.asarray(memory[:, 0, :]), enc_t.numpy(), atol=1e-4)

    def test_full_checkpoint_wrapper(self, models):
        tmodel, _, _ = models
        ckpt = {
            "model_state_dict": tmodel.state_dict(),
            "config": {
                "model": {
                    "name": "cnn_lstm",
                    "encoder": {"cnn": {"img_height": IMG_H, "img_width": IMG_W,
                                        "conv_filters": FILTERS, "pool_size": 2}},
                }
            },
            "tokenizer_config": {"token_to_id": {"<PAD>": 0}, "max_sequence_length": 10,
                                 "special_tokens": {"PAD": "<PAD>", "START": "<S>",
                                                    "END": "<E>", "UNK": "<U>"}},
        }
        variables, cfg, tok_cfg = convert_reference_checkpoint(ckpt)
        params = variables["params"]
        assert "encoder" in params and "decoder" in params
        assert variables["batch_stats"] == {}
        assert tok_cfg["max_sequence_length"] == 10

    def test_unknown_model_rejected(self):
        with pytest.raises(NotImplementedError):
            convert_reference_checkpoint(
                {"model_state_dict": {}, "config": {"model": {"name": "transformer"}}}
            )

    def test_unmatched_keys_warn(self, models):
        """A variant checkpoint with keys no mapping recognizes must WARN —
        silently dropping trained weights would let the converted model run
        with fresh inits in their place."""
        import logging

        from img2latex_tpu.models.convert_reference import convert_cnn_lstm_state_dict
        from img2latex_tpu.utils.logging import get_logger

        torch_model, *_ = models
        sd = dict(torch_model.state_dict())
        sd["decoder.lstm.weight_ih_l0_reverse"] = sd["decoder.lstm.weight_ih_l0"]
        c_after = (FILTERS[-1], IMG_H // 2 ** len(FILTERS), IMG_W // 2 ** len(FILTERS))
        records = []

        class Capture(logging.Handler):
            def emit(self, record):
                records.append(record.getMessage())

        log = get_logger("img2latex_tpu.models.convert_reference")
        h = Capture()
        log.addHandler(h)
        try:
            convert_cnn_lstm_state_dict(sd, c_after)
        finally:
            log.removeHandler(h)
        assert any("DROPPED" in m and "_reverse" in m for m in records)


# ---------------------------------------------------------------------------
# resnet_lstm checkpoint conversion (reference encoder.py:132-249): torch
# resnet18 replica with torchvision naming wrapped in the reference's
# nn.Sequential(children[:-1]) form -> our flax tree, forward-equivalent.
# ---------------------------------------------------------------------------


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idn)


class TorchResNet18(nn.Module):
    """torchvision resnet18 topology with torchvision attribute naming."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        chans = [64, 128, 256, 512]
        for s_i, c in enumerate(chans, start=1):
            cin = 64 if s_i == 1 else chans[s_i - 2]
            stride = 1 if s_i == 1 else 2
            blocks = [TorchBasicBlock(cin, c, stride), TorchBasicBlock(c, c, 1)]
            setattr(self, f"layer{s_i}", nn.Sequential(*blocks))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512, 1000)

    def children_list(self):
        return [
            self.conv1, self.bn1, self.relu, self.maxpool,
            self.layer1, self.layer2, self.layer3, self.layer4, self.avgpool,
        ]


class TorchRefResNetEncoder(nn.Module):
    """Reference ResNetEncoder (encoder.py:199-228): Sequential(children[:-1])
    + flatten + Linear + ReLU."""

    def __init__(self):
        super().__init__()
        backbone = TorchResNet18()
        self.resnet = nn.Sequential(*backbone.children_list())
        self.flatten = nn.Flatten()
        self.embedding_layer = nn.Linear(512, E)

    def forward(self, x):
        y = self.resnet(x)
        y = self.flatten(y)
        return torch.relu(self.embedding_layer(y))


class TorchRefResNetSeq2Seq(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TorchRefResNetEncoder()
        self.decoder = TorchRefDecoder()

    def forward(self, images, targets):
        enc = self.encoder(images)
        return self.decoder(enc, targets[:, :-1])


@pytest.fixture(scope="module")
def resnet_models():
    from img2latex_tpu.models.convert_reference import convert_resnet_lstm_state_dict

    torch.manual_seed(1)
    tmodel = TorchRefResNetSeq2Seq().eval()
    # Perturb BN running stats so their conversion is actually exercised.
    rng = np.random.default_rng(7)
    for m in tmodel.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(rng.normal(0, 0.3, m.running_mean.shape), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(np.abs(rng.normal(1.0, 0.2, m.running_var.shape)), dtype=torch.float32))
    fmodel = Seq2SeqModel(
        model_type="resnet_lstm",
        resnet_name="resnet18",
        vocab_size=V,
        embedding_dim=E,
        hidden_dim=H,
        lstm_layers=L,
        dropout=0.0,
        use_attention=True,
    )
    params, batch_stats = convert_resnet_lstm_state_dict(tmodel.state_dict())
    return tmodel, fmodel, params, batch_stats


class TestResNetForwardEquivalence:
    def test_teacher_forced_logits_match(self, resnet_models):
        tmodel, fmodel, params, batch_stats = resnet_models
        rng = np.random.default_rng(3)
        B, T = 2, 6
        images = rng.normal(size=(B, 32, 64, 3)).astype(np.float32)
        targets = rng.integers(0, V, size=(B, T)).astype(np.int32)
        with torch.no_grad():
            ref = tmodel(
                torch.tensor(np.transpose(images, (0, 3, 1, 2))), torch.tensor(targets, dtype=torch.long)
            ).numpy()
        got = fmodel.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(images),
            jnp.asarray(targets),
        )
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)

    def test_converted_tree_covers_fresh_init(self, resnet_models):
        _, fmodel, params, batch_stats = resnet_models
        variables = fmodel.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), jnp.zeros((1, 4), jnp.int32)
        )
        fresh = {
            "/".join(str(getattr(k, "key", k)) for k, _ in [(p, None) for p in path])
            for path, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        }
        conv = {
            "/".join(str(getattr(k, "key", k)) for k, _ in [(p, None) for p in path])
            for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        # the vector-memory fast path never executes attention in apply, but
        # init creates it; everything else must be covered by the conversion
        missing = {p for p in fresh - conv if "attention" not in p}
        assert not missing, f"unconverted params: {sorted(missing)[:10]}"

    def test_full_checkpoint_roundtrip(self, resnet_models):
        tmodel, _, _, _ = resnet_models
        ckpt = {
            "model_state_dict": tmodel.state_dict(),
            "config": {"model": {"name": "resnet_lstm"}},
            "tokenizer_config": {"max_sequence_length": 12},
        }
        variables, cfg, tok_cfg = convert_reference_checkpoint(ckpt)
        assert "backbone" in variables["params"]["encoder"]
        assert variables["batch_stats"]["encoder"]["backbone"]["bn1"]["mean"].shape == (64,)
        assert tok_cfg["max_sequence_length"] == 12
