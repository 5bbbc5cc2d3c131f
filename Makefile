# Developer entry points. Tests force the CPU backend with 8 virtual devices
# (see tests/conftest.py); bench targets use the real TPU chip.

.PHONY: test test-fast bench bench-train native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not parity and not discriminators and not parallel"

bench:
	python bench.py

bench-train:
	python bench_train.py

native:
	$(MAKE) -C flow2gan_tpu/data/native

clean:
	$(MAKE) -C flow2gan_tpu/data/native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
