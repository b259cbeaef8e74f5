"""Dynamic-batching inference server."""

import os
import threading

import numpy as np
import pytest

from img2latex_tpu.serving import InferenceServer


@pytest.fixture(scope="module")
def predictor(tmp_path_factory):
    """Tiny trained predictor (reuses the training fixtures' recipe)."""
    import jax

    from img2latex_tpu.config import Config
    from img2latex_tpu.data.pipeline import create_data_loaders, read_formulas
    from img2latex_tpu.data.synthetic import write_synthetic_corpus
    from img2latex_tpu.data.tokenizer import LaTeXTokenizer
    from img2latex_tpu.training.predictor import Predictor
    from img2latex_tpu.training.trainer import Trainer
    from img2latex_tpu.utils.paths import PathManager

    root = tmp_path_factory.mktemp("servecorpus")
    corpus = write_synthetic_corpus(str(root / "data"), n_train=16, n_val=4, n_test=4, seed=8)
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
    Trainer(cfg, tok, create_data_loaders(cfg, tok), paths=paths, experiment_name="srv").train()
    pred = Predictor.from_checkpoint(str(paths.get_dir("srv", "checkpoints")), batch_size=4)
    imgs = sorted((root / "data" / "img").iterdir())
    return pred, [str(p) for p in imgs]


class TestServer:
    def test_submit_and_batch(self, predictor):
        pred, imgs = predictor
        with InferenceServer(pred, max_batch=4, max_wait_ms=50) as srv:
            futures = [srv.submit(img) for img in imgs[:6]]
            results = [f.result(timeout=60) for f in futures]
        assert len(results) == 6
        assert all(isinstance(r, str) for r in results)
        assert srv.stats.requests == 6
        assert srv.stats.batches >= 2  # 6 requests > one 4-batch
        assert 0 < srv.stats.mean_batch_fill <= 1

    def test_results_match_direct_predict(self, predictor):
        pred, imgs = predictor
        direct = pred.predict_batch(imgs[:3], batch_size=4)
        with InferenceServer(pred, max_batch=4, max_wait_ms=20) as srv:
            served = srv.predict_many(imgs[:3], timeout=60)
        assert served == direct

    def test_concurrent_submitters(self, predictor):
        pred, imgs = predictor
        results = {}

        def client(i, srv):
            results[i] = srv.submit(imgs[i % len(imgs)]).result(timeout=60)

        with InferenceServer(pred, max_batch=4, max_wait_ms=20) as srv:
            threads = [threading.Thread(target=client, args=(i, srv)) for i in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        assert len(results) == 8

    def test_submit_before_start_raises(self, predictor):
        pred, imgs = predictor
        srv = InferenceServer(pred)
        with pytest.raises(RuntimeError):
            srv.submit(imgs[0])

    def test_cancelled_future_does_not_poison_batch(self, predictor):
        """A client-side cancel() on a queued request must not break the
        other requests in the same batch (set_result on a cancelled future
        raises InvalidStateError)."""
        pred, imgs = predictor
        srv = InferenceServer(pred, max_batch=4, max_wait_ms=200)
        srv.start()
        try:
            futures = [srv.submit(img) for img in imgs[:3]]
            assert futures[1].cancel()  # queued, not running -> cancellable
            r0 = futures[0].result(timeout=60)
            r2 = futures[2].result(timeout=60)
            assert isinstance(r0, str) and isinstance(r2, str)
            assert futures[1].cancelled()
        finally:
            srv.stop()

    def test_submit_after_stop_raises(self, predictor):
        pred, imgs = predictor
        srv = InferenceServer(pred).start()
        srv.stop()
        with pytest.raises(RuntimeError):
            srv.submit(imgs[0])

    def test_mixed_options_split_batches(self, predictor):
        pred, imgs = predictor
        with InferenceServer(pred, max_batch=4, max_wait_ms=20) as srv:
            f1 = srv.submit(imgs[0])
            f2 = srv.submit(imgs[1], beam_size=2)
            r1, r2 = f1.result(60), f2.result(60)
        assert isinstance(r1, str) and isinstance(r2, str)
        assert srv.stats.batches >= 2


class TestHTTPServer:
    def test_endpoints(self, predictor):
        import base64
        import http.client
        import json

        from img2latex_tpu.serving_http import serve_in_thread

        pred, images = predictor
        with InferenceServer(pred, max_wait_ms=2.0) as srv:
            httpd, port = serve_in_thread(srv)
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)

                conn.request("GET", "/healthz")
                r = conn.getresponse()
                assert r.status == 200 and json.loads(r.read())["status"] == "ok"

                # raw-bytes predict
                raw = open(images[0], "rb").read()
                conn.request("POST", "/predict", body=raw,
                             headers={"Content-Type": "image/png"})
                r = conn.getresponse()
                assert r.status == 200
                out1 = json.loads(r.read())["latex"]
                assert isinstance(out1, str)

                # base64-JSON predict matches raw-bytes predict
                conn.request(
                    "POST", "/predict",
                    body=json.dumps({"image_b64": base64.b64encode(raw).decode()}),
                    headers={"Content-Type": "application/json"},
                )
                r = conn.getresponse()
                assert json.loads(r.read())["latex"] == out1

                # batch endpoint matches direct predict_batch
                blobs = [base64.b64encode(open(p, "rb").read()).decode() for p in images[:3]]
                conn.request(
                    "POST", "/predict_batch",
                    body=json.dumps({"images_b64": blobs}),
                    headers={"Content-Type": "application/json"},
                )
                r = conn.getresponse()
                preds = json.loads(r.read())["predictions"]
                assert len(preds) == 3 and preds[0] == out1

                conn.request("GET", "/stats")
                stats = json.loads(conn.getresponse().read())
                assert stats["requests"] >= 5 and stats["batches"] >= 1

                # unknown path -> 404 JSON
                conn.request("GET", "/nope")
                r = conn.getresponse()
                assert r.status == 404

                # malformed body -> 400 JSON error, server keeps serving
                conn.request("POST", "/predict", body=b"not an image",
                             headers={"Content-Type": "image/png"})
                r = conn.getresponse()
                assert r.status == 400 and "error" in json.loads(r.read())

                # malformed NUMERIC QUERY PARAM -> 400 JSON (regression: used
                # to crash the handler before the try block and drop the
                # connection with no response)
                conn.request("POST", "/predict?beam_size=abc", body=raw,
                             headers={"Content-Type": "image/png"})
                r = conn.getresponse()
                assert r.status == 400 and "error" in json.loads(r.read())
                conn.request("GET", "/healthz")
                assert conn.getresponse().status == 200
            finally:
                httpd.shutdown()

    def test_cli_has_serve_command(self):
        from img2latex_tpu.cli import build_parser

        args = build_parser().parse_args(["serve", "ckpt", "--port", "0"])
        assert callable(args.func) and args.port == 0


class TestLatencyPercentiles:
    def test_percentiles_from_recent_window(self):
        from img2latex_tpu.serving import ServerStats

        s = ServerStats()
        assert s.latency_percentiles_ms() == {"p50": 0.0, "p95": 0.0, "p99": 0.0}
        for ms in range(1, 101):  # 1..100 ms
            s.record_latency(ms / 1e3)
        p = s.latency_percentiles_ms()
        assert 45 <= p["p50"] <= 55
        assert 90 <= p["p95"] <= 100
        assert p["p99"] >= p["p95"] >= p["p50"]
        # ring caps memory
        s.recent_cap = 10
        for ms in range(50):
            s.record_latency(0.001)
        assert len(s.recent_latencies) <= 10
