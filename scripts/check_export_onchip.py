"""Export-once-run-anywhere check for `img2latex-tpu export` artifacts.

Parent process (forced CPU): train a tiny model on the synthetic corpus via
the CLI, export its decode path for BOTH cpu and tpu, and record the
artifact's CPU prediction.  Child process (default backend — the real chip
when present): load the same artifact and assert the prediction string is
identical.  Proves the serialized StableHLO is genuinely cross-platform.

Run: python scripts/check_export_onchip.py [workdir]
(2026-08-19 on a v5e chip: on-chip compile+run 7.0s, strings identical.)
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
import jax
from img2latex_tpu.export import ExportedPredictor

ep = ExportedPredictor.load({art!r})
t0 = time.time()
out = ep.predict({img!r})
print(f"child backend={{jax.default_backend()}} predict ({{time.time()-t0:.1f}}s):", repr(out))
expected = {expected!r}
assert out == expected, f"platform mismatch: {{out!r}} != {{expected!r}}"
print("CROSS-PLATFORM ARTIFACT PARITY OK")
"""


def main() -> int:
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from img2latex_tpu.cli import main as cli
    from img2latex_tpu.data.synthetic import write_synthetic_corpus
    from img2latex_tpu.export import ExportedPredictor

    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="export_onchip_")
    os.makedirs(work, exist_ok=True)
    os.chdir(work)
    corpus = write_synthetic_corpus("data", n_train=16, n_val=4, n_test=4, seed=3)
    tiny = [
        "data.batch_size=8", "data.max_seq_length=12", "model.embedding_dim=24",
        "model.decoder.hidden_dim=24", "model.decoder.lstm_layers=1",
        "model.decoder.dropout=0.0", "model.encoder.cnn.img_height=32",
        "model.encoder.cnn.img_width=64", "model.encoder.cnn.conv_filters=[4]",
        "training.epochs=1", "inference.max_length=11",
        "hardware.compute_dtype=float32",
    ]
    args = ["train", "--data-dir", corpus, "--experiment", "xp", "--output-dir", "."]
    for kv in tiny:
        args += ["--set", kv]
    assert cli(args) == 0
    assert cli([
        "export", "outputs/xp/checkpoints", "art",
        "--batch-sizes", "1,4", "--platforms", "cpu,tpu",
    ]) == 0

    img = os.path.abspath(sorted(
        os.path.join(corpus, "img", f) for f in os.listdir(os.path.join(corpus, "img"))
    )[0])
    art = os.path.abspath("art")
    expected = ExportedPredictor.load(art).predict(img)
    print("parent (cpu) prediction:", repr(expected))

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # child: default backend (chip when present)
    child = CHILD.format(repo=REPO, art=art, img=img, expected=expected)
    proc = subprocess.run([sys.executable, "-c", child], env=env, timeout=900)
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
