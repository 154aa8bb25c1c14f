# Convenience targets (reference parity: Makefile / hack scripts)

.PHONY: test bench native lint clean

test:
	python -m pytest tests/ -q

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
