import logging
import os

import numpy as np
import pytest

from img2latex_tpu.utils.device import batch_size_finder, device_info, live_device_memory_mb, set_device, set_seed
from img2latex_tpu.utils.logging import ImmediateFileHandler, configure_logging, get_logger, log_execution_params
from img2latex_tpu.utils.paths import PathManager
from img2latex_tpu.utils.profiling import StepTimer, maybe_trace
from img2latex_tpu.utils.registry import ExperimentRegistry


class TestDevice:
    def test_device_info(self):
        info = device_info()
        assert info["backend"] == "cpu"
        assert info["device_count"] == 8

    def test_set_device_falls_back(self):
        assert set_device("tpu") == "cpu"

    def test_seed(self):
        set_seed(7)
        a = np.random.rand(3)
        set_seed(7)
        np.testing.assert_array_equal(a, np.random.rand(3))

    def test_live_memory(self):
        assert live_device_memory_mb() >= 0.0

    def test_batch_size_finder_stops_on_failure(self):
        def builder(b):
            if b > 64:
                raise MemoryError("too big")
            return lambda: sum(range(b))

        res = batch_size_finder(builder, start=16, max_batch=1024)
        assert set(res) == {16, 32, 64}
        assert all(v > 0 for v in res.values())


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer()
        for _ in range(3):
            with t:
                pass
        assert t.count == 3
        assert t.mean_ms >= 0

    def test_maybe_trace_noop(self, tmp_path):
        with maybe_trace(False, str(tmp_path)):
            pass
        assert not (tmp_path / "traces").exists()

    def test_maybe_trace_enabled(self, tmp_path):
        import jax
        import jax.numpy as jnp

        with maybe_trace(True, str(tmp_path), "t"):
            jax.jit(lambda x: x * 2)(jnp.ones(4)).block_until_ready()
        assert (tmp_path / "traces" / "t").exists()

    def test_compilation_cache_toggle(self, tmp_path, monkeypatch):
        import jax

        from img2latex_tpu.utils.profiling import enable_compilation_cache

        prev = jax.config.jax_compilation_cache_dir
        try:
            # "" disables: no config change, no directory created
            enable_compilation_cache("")
            assert jax.config.jax_compilation_cache_dir == prev
            target = tmp_path / "jaxcache"
            enable_compilation_cache(str(target))
            assert jax.config.jax_compilation_cache_dir == str(target)
            assert target.is_dir()
            # idempotent second call
            enable_compilation_cache(str(target))
            assert jax.config.jax_compilation_cache_dir == str(target)
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)

    def test_compilation_cache_default_in_config(self):
        from img2latex_tpu.config import Config, config_from_dict

        assert Config().hardware.compilation_cache_dir  # enabled by default
        # checkpoints embedding pre-knob configs get the default back
        cfg = config_from_dict({"hardware": {"compute_dtype": "bfloat16"}})
        assert cfg.hardware.compilation_cache_dir == Config().hardware.compilation_cache_dir


class TestPathsRegistry:
    def test_versioning(self, tmp_path):
        pm = PathManager(str(tmp_path))
        pm.outputs_dir.mkdir(parents=True)
        assert pm.next_version_name("exp") == "exp"
        pm.create_experiment_structure("exp")
        assert pm.next_version_name("exp") == "exp_v1"

    def test_invalid_subdir(self, tmp_path):
        pm = PathManager(str(tmp_path))
        with pytest.raises(ValueError):
            pm.get_dir("e", "nonsense")

    def test_registry_lifecycle(self, tmp_path):
        pm = PathManager(str(tmp_path))
        pm.outputs_dir.mkdir(parents=True)
        reg = ExperimentRegistry(pm)
        name = reg.register_experiment("exp", tags=["a"])
        name2 = reg.register_experiment("exp")
        assert name == "exp" and name2 == "exp_v1"
        reg.update_status("exp", "training")
        reg.log_metrics("exp", 1, {"val_loss": 0.5})
        reg.log_metrics("exp", 2, {"val_loss": 0.4})
        assert reg.get("exp")["status"] == "training"
        assert reg.get("exp")["metrics"]["steps"]["2"]["val_loss"] == 0.4
        with pytest.raises(ValueError):
            reg.update_status("exp", "bogus")
        df = reg.compare_experiments(metric="val_loss")
        assert df.loc[df.experiment == "exp", "best_val_loss"].iloc[0] == 0.4
        assert reg.delete_experiment("exp_v1")
        assert reg.get("exp_v1") is None
        # per-experiment metrics.json dual write
        assert (pm.get_dir("exp", "metrics") / "metrics.json").exists()


class TestLoggingUtils:
    def test_immediate_file_handler_flushes(self, tmp_path):
        path = tmp_path / "x.log"
        h = ImmediateFileHandler(str(path))
        logger = logging.getLogger("img2latex_tpu.test_flush")
        logger.addHandler(h)
        logger.warning("hello")
        assert "hello" in path.read_text()  # visible without close
        logger.removeHandler(h)
        h.close()

    def test_log_execution_params(self):
        # Package-root propagation is cut (absl/jax double-logging fix), so
        # capture with an explicit handler on the logger itself.
        records = []

        class Capture(logging.Handler):
            def emit(self, record):
                records.append(record.getMessage())

        logger = get_logger("img2latex_tpu.test_exec")
        h = Capture()
        logger.addHandler(h)
        try:
            log_execution_params(logger, {"a": 1})
        finally:
            logger.removeHandler(h)
        assert any("a: 1" in m for m in records)


class TestCheckpointRobustness:
    def test_incomplete_checkpoint_skipped(self, tmp_path):
        import jax.numpy as jnp

        from img2latex_tpu.utils import checkpoint as ck

        tree = {"w": jnp.arange(4.0)}
        ck.save_checkpoint(tmp_path, tree, {"epoch": 1}, step=10)
        # simulate an interrupted later save: step dir without state payload
        (tmp_path / "step_20").mkdir()
        (tmp_path / "step_20" / "state").mkdir()
        assert ck.latest_step(tmp_path) == 10
        state, meta = ck.restore_checkpoint(tmp_path)
        assert meta["epoch"] == 1

    def test_missing_meta_sidecar_skipped(self, tmp_path):
        """A crash between the Orbax state save and the meta.json write must
        not make that step 'latest' (restore would lose config/tokenizer
        sidecars and the resume counters)."""
        import jax.numpy as jnp

        from img2latex_tpu.utils import checkpoint as ck

        tree = {"w": jnp.arange(4.0)}
        ck.save_checkpoint(tmp_path, tree, {"epoch": 1}, step=10)
        ck.save_checkpoint(tmp_path, tree, {"epoch": 2}, step=20)
        (tmp_path / "step_20" / "meta.json").unlink()
        assert ck.latest_step(tmp_path) == 10
        _, meta = ck.restore_checkpoint(tmp_path)
        assert meta["epoch"] == 1

    def test_best_step_zero_honored(self, tmp_path):
        """A 'best' pointer at step 0 is valid — step=-1 must not fall
        through to latest (0 is falsy)."""
        import jax.numpy as jnp

        from img2latex_tpu.utils import checkpoint as ck

        ck.save_checkpoint(tmp_path, {"w": jnp.zeros(2)}, {"epoch": 0}, step=0, is_best=True)
        ck.save_checkpoint(tmp_path, {"w": jnp.ones(2)}, {"epoch": 5}, step=50)
        _, meta = ck.restore_checkpoint(tmp_path, step=-1)
        assert meta["epoch"] == 0


class TestErrorPatterns:
    """LaTeX error-pattern detectors (analysis/errors.py) — intended behavior
    of the reference's 8 regexes (errors.py:245-297) on space-tokenized text."""

    def _hits(self, s):
        from img2latex_tpu.analysis.errors import identify_error_patterns

        return {k for k, v in identify_error_patterns([{"prediction": s}]).items() if v}

    def test_well_formed_scripts_not_flagged(self):
        assert self._hits("x _ { k } + y ^ { 2 }") == set()
        assert self._hits("\\frac { a } { b }") == set()

    def test_dangling_scripts_flagged(self):
        assert "dangling_subscript" in self._hits("x _")
        assert "dangling_subscript" in self._hits("x _ + 2")
        assert "dangling_superscript" in self._hits("y ^ }")
        assert "double_script" in self._hits("x _ _ { k }")

    def test_structure_errors(self):
        assert "unbalanced_braces" in self._hits("x _ { k")
        assert "unbalanced_parens" in self._hits("\\sin ( x")
        assert "bad_frac" in self._hits("\\frac x y")
        assert "missing_backslash_command" in self._hits("frac { a } { b }")


class TestQuantizeParams:
    def test_casts_float_leaves_only(self):
        import jax.numpy as jnp

        from img2latex_tpu.utils.device import param_bytes, quantize_params

        tree = {"w": jnp.ones((4, 4), jnp.float32), "step": jnp.array(3, jnp.int32)}
        q = quantize_params(tree, "bfloat16")
        assert q["w"].dtype == jnp.bfloat16
        assert q["step"].dtype == jnp.int32  # non-float untouched
        assert param_bytes(q) < param_bytes(tree)
        # original is intact (the "restore" story)
        assert tree["w"].dtype == jnp.float32
