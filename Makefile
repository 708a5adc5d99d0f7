# Convenience targets (reference Makefile parity: lint/test_environment → lint/test)

.PHONY: test test-fast lint bench clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_metrics.py tests/test_losses.py \
	  tests/test_image_ops.py tests/test_fastconv.py tests/test_optim.py -q

lint:
	python -c "import importlib, pkgutil, eyediseasesegmentation_tpu as p; [importlib.import_module(m.name) for m in pkgutil.walk_packages(p.__path__, p.__name__ + '.')]; print('imports ok')"

bench:
	python bench.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} +; true
