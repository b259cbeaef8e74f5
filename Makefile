# Developer targets (reference Makefile:56-188 surface, TPU-native commands).

PY ?= python
CONFIG ?= img2latex_tpu/configs/cnn_lstm.yaml
EXPERIMENT ?= img2latex_cnn
CHECKPOINT ?= outputs/$(EXPERIMENT)/checkpoints
DATA_DIR ?= data

.PHONY: help test test-fast lint train train-resnet predict evaluate serve metrics \
        curves report analyze-images analyze-project bench bench-beam bench-train \
        bench-kernels quality-run dryrun native clean prime

help:
	@grep -E '^[a-z-]+:' Makefile | sed 's/:.*//' | sort | uniq

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

lint:
	ruff check img2latex_tpu tests || true

train:
	$(PY) -m img2latex_tpu train --config $(CONFIG) --data-dir $(DATA_DIR)

train-resnet:
	$(PY) -m img2latex_tpu train --config img2latex_tpu/configs/resnet_lstm.yaml --data-dir $(DATA_DIR)

predict:
	$(PY) -m img2latex_tpu predict $(CHECKPOINT) $(IMAGE)

evaluate:
	$(PY) -m img2latex_tpu evaluate $(CHECKPOINT) --data-dir $(DATA_DIR) --split test

metrics:
	$(PY) -m img2latex_tpu analyze metrics visualize -e $(EXPERIMENT)

curves:
	$(PY) -m img2latex_tpu analyze curves -e $(EXPERIMENT)

report:
	$(PY) -m img2latex_tpu analyze report -e $(EXPERIMENT)

analyze-images:
	$(PY) -m img2latex_tpu analyze images --data-dir $(DATA_DIR)

analyze-project:
	$(PY) -m img2latex_tpu analyze project --config $(CONFIG)

bench:
	$(PY) bench.py

bench-beam:
	$(PY) bench_beam.py

bench-train:
	$(PY) bench_train.py

bench-kernels:  # decode paths + conv1 kernel microbenches (real TPU)
	$(PY) scripts/bench_decode_paths.py
	$(PY) scripts/bench_conv1.py

serve:
	$(PY) -m img2latex_tpu serve $(CHECKPOINT) --port 8000

prime:  # pre-compile decode executables into the persistent compilation cache
	$(PY) -m img2latex_tpu prime $(CHECKPOINT) --batch-sizes 16,256

quality-run:  # rendered-LaTeX corpus -> train -> free-running eval -> artifacts
	$(PY) scripts/run_mathtext_quality.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 $(PY) __graft_entry__.py

native:
	$(MAKE) -C native

clean:
	rm -rf build dist *.egg-info .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
