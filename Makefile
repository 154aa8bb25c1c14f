# Convenience targets (reference parity: Makefile / hack scripts)

.PHONY: test test-fast bench native lint clean

test:
	python -m pytest tests/ -q

# fast iteration tier (~2 min): shapes, metric/split goldens, dispatch,
# sharding primitives; training loops / CLI smoke / interpret-mode
# collectives are marked `slow` (tests/conftest.py) and stay in `make test`.
test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

bench-full:
	python bench.py --full

native:
	$(MAKE) -C beta_recsys_tpu/native

lint:
	flake8 beta_recsys_tpu --max-line-length=120 --extend-ignore=E203,W503,E731,E741,E501 --count || true

clean:
	$(MAKE) -C beta_recsys_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
